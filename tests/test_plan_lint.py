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


def test_global_funnel_detector_shapes():
    """The funnel rule must flag SinglePartition exchanges feeding
    Sort/Window and must NOT flag scalar-aggregate merges."""
    import importlib.util
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[1] / "tools" / \
        "lint_plans.py"
    spec = importlib.util.spec_from_file_location("lint_plans", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    funnel_plan = (
        "+- Window [last(x) windowspecdefinition(a ASC, ...)]\n"
        "   +- Sort [a ASC NULLS FIRST], false, 0\n"
        "      +- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "         +- FileScan parquet [a]\n")
    assert mod.global_funnels(funnel_plan)
    scalar_plan = (
        "+- HashAggregate(keys=[], functions=[sum(c)])\n"
        "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "      +- HashAggregate(keys=[], functions=[partial_sum(c)])\n")
    assert not mod.global_funnels(scalar_plan)
    # round-9 review shapes: structural parent matching must not flag
    # a SIBLING branch's Sort sitting textually above an unrelated
    # exchange, must see through AQE wrappers, and must treat the
    # `*(n)` codegen marker as label, not indentation
    sibling_plan = (
        ":- Sort [a]\n"
        ":  +- LocalTableScan\n"
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "   +- Scan parquet\n")
    assert not mod.global_funnels(sibling_plan)
    aqe_plan = (
        "+- Window [w]\n"
        "   +- Sort [a]\n"
        "      +- AQEShuffleRead coalesced\n"
        "         +- ShuffleQueryStage 1\n"
        "            +- Exchange SinglePartition\n")
    assert mod.global_funnels(aqe_plan)
    aqe_scalar_plan = (
        "+- HashAggregate(keys=[], functions=[sum(c)])\n"
        "   +- AQEShuffleRead\n"
        "      +- Exchange SinglePartition\n")
    assert not mod.global_funnels(aqe_scalar_plan)
    codegen_plan = (
        "*(3) Sort [a ASC NULLS FIRST]\n"
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "   +- *(2) HashAggregate\n")
    assert mod.global_funnels(codegen_plan)


def test_committed_lint_artifact_covers_current_registry():
    """Round-8 verdict: a query registered after the end-of-round lint
    run shipped without the committed safety net.  The full-registry
    lint writes PLANS_LINT.json; this lock fails the suite the moment
    the registry grows past the last committed lint run (same pattern
    as test_every_spec_has_an_oracle)."""
    import json
    import pathlib

    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs

    art = pathlib.Path(__file__).resolve().parents[1] / "PLANS_LINT.json"
    assert art.exists(), (
        "PLANS_LINT.json missing — run `python tools/lint_plans.py` "
        "over the full registry before closing the round")
    data = json.loads(art.read_text())
    assert data["n_plans"] == len(all_specs()), (
        f"committed lint covered {data['n_plans']} plans but the "
        f"registry now has {len(all_specs())} — re-run tools/lint_plans.py")
    # name-SET lock, not just a count: an add + a remove cancelling
    # out must not let an unlinted query ship (round-9 review)
    assert sorted(data["names"]) == sorted(all_specs()), (
        "committed lint name list diverges from the registry — "
        "re-run tools/lint_plans.py")
    assert data["flagged"] == [] and data["errors"] == []
