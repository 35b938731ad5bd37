"""Physical-plan regression tests — lock in the scale properties that
PLANS.md documents: pushdown, pruning, broadcast choices, top-k rank
pushdown.  A correctness-preserving refactor that silently loses one of
these would pass every oracle check and still be 100× slower at 100 TB;
these tests make the plan itself part of the contract."""

from __future__ import annotations

import pytest


def _plan(spark, name, sf_dir):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs

    df = all_specs()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_pricing_scan_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, "agg_pricing_summary", sf_dir)
    assert "LessThanOrEqual(l_shipdate" in plan        # predicate reached the scan
    assert "l_orderkey" not in plan                    # unused columns pruned
    assert "partial_sum" in plan                       # map-side combine


def test_time_range_pushdown_on_ts(spark, sf_dir):
    """The time-range predicate must reach the parquet scan whatever the
    physical ``ts`` type the driver's testdata ships: raw int64-nanos
    (filtered as long literals) or timestamp[us]/NTZ (filtered with NTZ
    literals *before* the tz cast).  Either way ``PushedFilters`` shows
    the bounds on the scanned ``ts`` column, so row-group stats prune."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = _plan(spark, "filter_time_range", sf_dir)
    if dict(raw.dtypes).get("ts") == "bigint":
        assert "GreaterThanOrEqual(ts,1704153600000000000)" in plan
        assert "LessThan(ts,1704240000000000000)" in plan
    else:
        assert "GreaterThanOrEqual(ts,2024-01-02T00:00" in plan
        assert "LessThan(ts,2024-01-03T00:00" in plan


def test_flagship_broadcasts_dims_and_pushes_topk(spark, sf_dir):
    plan = _plan(spark, "flagship_top_customers", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3        # customer/nation/region
    assert "WindowGroupLimit" in plan                  # top-k pruned pre-shuffle
    assert "CartesianProduct" not in plan


def test_ivf_probe_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, "ann_ivf_topk", sf_dir)
    assert "SortMergeJoin" not in plan
    # SortMergeJoin absence alone would also pass on a nested-loop /
    # cartesian plan — the O(corpus × queries) shape this lock exists
    # to forbid
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blocked_similarity_has_no_cross_join(spark, sf_dir):
    plan = _plan(spark, "er_cosine_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_banding_is_equi_join(spark, sf_dir):
    """The pigeonhole band join must stay an equi (hash) join on
    (band, chunk) with the Hamming refine as a post-condition — never a
    cross join over all signature pairs."""
    plan = _plan(spark, "dedup_simhash_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_surrogate_keys_has_no_global_sort(spark, sf_dir):
    """The dense-id plan must never funnel the table through one task:
    no single-partition exchange, no global Sort — range partitioning +
    per-partition assignment only (VERDICT r1 'What's wrong' #2).
    The registry query's lineage is truncated at the between-pass
    checkpoint (a correctness requirement — see dense_ids), so the
    rangepartitioning node is asserted on the lazy variant."""
    plan = _plan(spark, "window_surrogate_keys", sf_dir)
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan                        # no row_number window at all

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        dense_ids,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    lazy = dense_ids(t(spark, sf_dir, "customer").select("c_name"),
                     ["c_name"], out="name_id", materialize_parted=False)
    lazy_plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in lazy_plan            # the two-pass plan
    assert "Exchange SinglePartition" not in lazy_plan


def test_gazetteer_is_blocked_equi_join(spark, sf_dir):
    """Gazetteer NER must block on k-grams and probe a broadcast hash
    table — never the docs × terms nested-loop scan (VERDICT r1 #3)."""
    plan = _plan(spark, "ner_gazetteer", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decon_join_is_hashed_never_all_pairs(spark, sf_dir):
    """Decontamination must join on the md5 gram hash (shuffle ∝
    matching grams) — an all-pairs doc×eval comparison would be
    quadratic in corpus size."""
    plan = _plan(spark, "decon_ngram_overlap", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_window_is_partitioned(spark, sf_dir):
    """Sequence packing's running sum must stay per-shard — a global
    cumulative sum would single-partition the corpus."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs

    df = all_specs()["pack_sequences"].fn(spark, sf_dir)
    simple = df._jdf.queryExecution().executedPlan().toString()
    window_lines = [line for line in simple.splitlines()
                    if "Window" in line and "windowspecdefinition" in line]
    # at least one window must be present and checked — an empty match
    # list would pass vacuously while the windowless refactor this
    # test exists to catch ships
    assert window_lines
    for line in window_lines:
        assert "shard" in line


def test_mix_domains_rates_are_broadcast(spark, sf_dir):
    """The per-source rate dimension joins broadcast — no shuffle of
    the corpus on source."""
    plan = _plan(spark, "mix_domains", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the CORPUS joins the rate dimension hash-wise; the only nested
    # loop allowed is the documented 1-row totals broadcast onto the
    # per-source counts (dimension-side, never the corpus)
    assert "BroadcastHashJoin" in plan
    import re

    # formatted plans print each node twice (tree + detail) — count
    # physical nodes via their detail headers "(n) BroadcastNested..."
    bnlj_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(bnlj_nodes) <= 1, plan


def test_sparql_aggregation_is_partial(spark, sf_dir):
    """G12: the SPARQL-text GROUP BY must plan as partial → final
    HashAggregate (map-side combine), shuffling one row per
    (partition, group), never the full binding set."""
    plan = _plan(spark, "sparql_year_histogram", sf_dir)
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_er_lsh_banding_is_equi_join(spark, sf_dir):
    """The minhash band join and the jaccard refine must stay hash
    (equi) joins — candidate cost ∝ collisions, never all-pairs."""
    plan = _plan(spark, "er_lsh_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_bits_join_is_broadcast(spark, sf_dir):
    """The Bloom bit table (≤ k·65536 rows at ANY eval-set size) must
    broadcast — the training corpus is never shuffled on gram."""
    plan = _plan(spark, "decon_bloom_prefilter", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_overlap_spans_is_anchor_equi_join(spark, sf_dir):
    """Exact-substring span detection must stay an equi-join on the
    k-gram anchor hash (shuffle ∝ true duplication), with the islands
    merge as a keyed window — never all-pairs, never a global sort."""
    for name in ("dedup_overlap_spans", "dedup_excise_spans"):
        plan = _plan(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "Exchange SinglePartition" not in plan, name


def test_range_interval_join_is_binned_equi_join(spark, sf_dir):
    """The point-in-interval join must stay the binned equi-join on
    (user_id, bin) with the range predicate as a post-filter — the
    naive BETWEEN formulation plans a BroadcastNestedLoopJoin whose
    work is the per-key cross product."""
    plan = _plan(spark, "join_range_interval", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_multi_key_join_preaggregates_fact(spark, sf_dir):
    """join_multi_key must keep the eager-aggregation shape: the fact
    table is aggregated to (pk, sk) grain BEFORE the composite-key
    join, so no join operator ever carries a row-level fact column.
    The robust string-level witness: ``l_quantity`` appears only below
    the aggregates (scan + partial/final sum) — never in any join
    node's Input/Output lists — and the partial aggregate exists
    (map-side combine before the one fact shuffle per side)."""
    plan = _plan(spark, "join_multi_key", sf_dir)
    assert "partial_count" in plan and "partial_sum" in plan
    # parse the formatted detail blocks: any block headed by a Join
    # operator must not mention the fact measure column
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if "Join" in head:
            assert "l_quantity" not in block, head
    assert plan.count("BroadcastHashJoin") >= 2   # both dims broadcast


def test_cc_fast_path_mapping_broadcasts(spark, sf_dir):
    """The connected-components driver fast path returns a bounded
    local relation (≤ 2×gate nodes), but an ExistingRDD has no size
    stats — without the r13 broadcast hint its consumers planned a
    SortMergeJoin that shuffled the CORPUS side (docs/entities) against
    a few-MB mapping.  Pin the BroadcastHashJoin so a refactor cannot
    silently reintroduce the corpus shuffle; the distributed CC path is
    unhinted (its label table is corpus-sized) and unaffected here
    because the test scale is far below the gate."""
    for name in ("er_resolve_entities", "dedup_near_cluster_keep"):
        plan = _plan(spark, name, sf_dir)
        for block in plan.split("\n\n"):
            head = block.strip().splitlines()[0] if block.strip() else ""
            if "SortMergeJoin" in head:
                # blanket negative check: at THIS fixture scale these
                # two plans contain no legitimate SMJ anywhere, so any
                # appearance is a regression — but it need not be the
                # CC-mapping join itself (r13 ADVICE: a different join
                # crossing the broadcast threshold would land here too,
                # so the message must not presume the culprit)
                raise AssertionError(
                    f"{name}: unexpected SortMergeJoin in plan "
                    f"(expected all-broadcast at test scale): {head}")
        assert "BroadcastHashJoin LeftOuter BuildRight" in plan, name


def test_rtemplate_handles_r_escapes(tmp_path):
    """R escape sequences in paste0 strings: \\' must not end the
    string, \\n must contribute a real newline (round-6 review
    finding — both previously corrupted the extracted template)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.rtemplate import (
        load_r_query_template,
        render,
    )

    src = r"""
# see query_x below (comment must not anchor extraction)
query_x_v2 <- function(a) paste0('WRONG ', a)
query_x <- function(item) paste0('SELECT * WHERE {\n  ?s ?p ', item,
                                 ' .\n  FILTER(?l = \'x\')\n}')
"""
    p = tmp_path / "queries.R"
    p.write_text(src)
    tpl = load_r_query_template(str(p), "query_x")
    got = render(tpl, item="<urn:i>")
    assert got == ('SELECT * WHERE {\n  ?s ?p <urn:i> .\n'
                   "  FILTER(?l = 'x')\n}")


def test_registry_rejects_duplicate_names(monkeypatch):
    """A query name colliding across modules must fail loudly, not
    silently shadow the earlier spec out of the verified surface."""
    import pytest

    import remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm2 as m2
    import remove_na_lgbtiq_queer_knowledge_graph_spark.queries_relational as m1
    from remove_na_lgbtiq_queer_knowledge_graph_spark import registry

    assert registry.all_specs()  # sanity: registry loads clean
    taken = next(iter(m1.SPECS))  # a name owned by an EARLIER module
    spec = m2.SPECS[next(iter(m2.SPECS))]
    monkeypatch.setitem(m2.SPECS, taken, spec)
    with pytest.raises(ValueError, match="duplicate query name"):
        registry.all_specs()
