"""Plan-shape regression locks — the pytest-speed subset of
tools/lint_plans.py (which lints all 215 registered plans per round).

A silent Catalyst degradation — an equi-join losing its key and
becoming a BroadcastNestedLoopJoin, or a filter rewrite producing a
CartesianProduct — passes every value-level oracle on small fixtures
and only explodes at scale.  These locks pin the join SHAPE for a
fast, build-cheap sample spanning the main query families."""

from __future__ import annotations

import pytest

# build-cheap queries spanning the main families: no fixture stores or
# expensive fits at build time (the LR/LM/DSIR entries run a few small
# training/checkpoint jobs — seconds, not minutes)
FAST_PURE = [
    "flagship_top_customers",
    "join_multi_key",
    "agg_pricing_summary",
    "dedup_jaccard_pairs",
    "dedup_minhash_pairs",
    "lm_bigram_score",
    "dsir_importance_weights",
    "text_tfidf_terms",
    "lr_quality_score",
    "window_keep_first_dedupe",
]


@pytest.mark.parametrize("name", FAST_PURE)
def test_no_unbounded_join_shapes(spark, sf_dir, name):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs

    df = all_specs()[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
