"""Registry-wide physical-plan lint — the scale-safety net.

Several queries assert "plan-locked no-cartesian" individually; this
tool formalizes the invariant across the WHOLE registry: build every
query's DataFrame at the given SF and flag any physical plan containing

- ``CartesianProduct`` — an unkeyed corpus×corpus join is the one shape
  that cannot survive 100 TB under any partitioning;
- ``BroadcastNestedLoopJoin`` — legitimate ONLY when the broadcast side
  is a provably tiny closure (a PQ lookup table, a ≤k-row centroid
  frame); every such use must be whitelisted here WITH its reason, so a
  future edit that silently degrades an equi-join to a nested loop
  fails this lint instead of an OOM three rounds later;
- global funnels (round 9) — an ``Exchange SinglePartition`` feeding a
  ``Sort``/``Window`` routes the WHOLE dataset through one task (the
  classic unpartitioned-window hazard).  Scalar-aggregate merges also
  exchange to a single partition but carry one row per upstream
  partition — those are fine and not flagged; the rule looks at the
  exchange's consumer.

Building a DataFrame is lazy for pure queries, but fixture-backed
queries (KG stores, trained models, sinks) execute their build steps —
expect a few minutes for the full registry, mostly fixture warmup.

Usage: python tools/lint_plans.py [--sf /root/testdata/sf0.001] [names...]
Exit 0 = no unexplained cartesian/nested-loop joins.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# query -> reason a BroadcastNestedLoopJoin is the RIGHT plan there.
# Every entry must name the broadcast side and why it is bounded.
BNLJ_WHITELIST = {
    "ann_pq_topk": (
        "broadcasts the per-query ADC lookup table (|q|·n_sub·k_sub "
        "doubles, a few KB); the corpus side streams — audited in "
        "PLANS.md 'ann_pq_topk'"),
    "ann_brute_topk": (
        "exact baseline by contract: query set ships in the scorer "
        "closure (SIZE CONTRACT on brute_force_topk); corpus streams "
        "one mapInPandas pass"),
    "mix_domains": (
        "crosses the per-source count table (≤ |sources| rows) with "
        "the ONE-ROW global total — a scalar broadcast, never data"),
    "mix_temperature_sample": (
        "same shape as mix_domains: per-source dims × one-row total"),
    "mix_kl_divergence": (
        "same shape as mix_domains: the (source, word) count table "
        "crosses the ONE-ROW corpus total — a scalar broadcast"),
    "text_bm25_topk": (
        "same shape as mix_domains: the query-term postings cross the "
        "ONE-ROW corpus stats (N, avgdl) — a scalar broadcast; every "
        "data-bearing join is an equi-join on term/doc_id"),
    "er_blocking_stats": (
        "same shape as mix_domains: the ≤|alphabet|-row block table "
        "crosses the ONE-ROW pair-mass total — a scalar broadcast; "
        "no pair is ever generated"),
    "ts_resample_hourly": (
        "gap-fill spine construction: the exploded (min,max) hour "
        "range (one aggregate row) crossed with the distinct "
        "event-type dim — broadcast-sized BY DESIGN (the spine is the "
        "output grid, documented in COVERAGE §2.5)"),
    "retrieval_rrf_fusion": (
        "dense ranking crosses the corpus scan with the broadcast "
        "QUERY-VECTOR table (one row per language, ≤ |langs| — the "
        "brute_force_topk size contract); the fusion join itself is a "
        "keyed full-outer of two ≤10·|q|-row lists"),
}

# SPARQL §8 disjoint-domain joins: the compiler emits crossJoin ONLY
# for solution frames sharing no variables (a join of mappings with
# disjoint domains IS their cross product), and boundedness comes from
# each query's constant anchors.  Round-8 ADVICE: these used to be
# waived by name PREFIX, which would also have waived a future edit
# that degrades a keyed SPARQL join into an unbounded nested loop —
# now every waiver is per-name (enumerated from the r9 BNLJ scan of
# all 59 sparql_/graph_ entries), so a NEW nested loop in any other
# sparql_/graph_ query fails the lint and must be adjudicated here.
_SPARQL_DISJOINT = (
    "disjoint-domain solution join (SPARQL §8 cross semantics); "
    "broadcast side bounded by the query's constant anchors")
for _n in (
    "sparql_app_companions", "sparql_app_compare_items",
    "sparql_app_compare_non_items", "sparql_app_compare_time_items",
    "sparql_companions", "sparql_companions_hirschfeld",
    "sparql_companions_no_constants", "sparql_compare_many_items",
    "sparql_compare_one_item", "sparql_network_federated",
    "sparql_network_root", "sparql_network_statements",
    "sparql_person_relations", "sparql_time_items",
):
    BNLJ_WHITELIST[_n] = _SPARQL_DISJOINT
BNLJ_WHITELIST["sparql_values_undef"] = (
    "§10.2.2 UNDEF compatibility join: the nested-loop build side is "
    "the inline VALUES frame (a few literal rows by construction)")
BNLJ_WHITELIST["sparql_values_lang"] = (
    "lang-tagged VALUES term-equality join (round 13): same shape as "
    "sparql_values_undef — the nested-loop build side is the inline "
    "VALUES frame (3 literal rows), broadcast by the compiler")

# query -> reason a global (single-partition) Sort/Window is bounded.
FUNNEL_WHITELIST = {
    "pdf_layout_text": (
        "single-DOCUMENT fill-down: the global window runs over "
        "#pages × #formats rows (~1.2k) of one PDF by construction "
        "(operators/pdf_layout.assign_locations docstring); a corpus "
        "of PDFs partitions the same window by document id"),
}


def _tree_depth(line: str) -> int:
    """Column where the node starts in a tree-rendered plan line — the
    node's depth.  The renderer prefixes each level with 3-char
    connectors drawn from ':', '+', '-', and spaces; the `*(n)`
    whole-stage-codegen marker is part of the node LABEL and must not
    count (it varies in width across stages at the same depth)."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _node_body(line: str, depth: int) -> str:
    """The node label with any `*(n) ` codegen marker stripped."""
    return re.sub(r"^\*\(\d+\) ", "", line[depth:])


# pass-through wrappers between an exchange and its real consumer in
# AQE-rendered plans — walk the ancestor chain through these
_WRAPPERS = ("AQEShuffleRead", "ShuffleQueryStage", "ReusedExchange",
             "InputAdapter", "WholeStageCodegen")


def global_funnels(plan: str) -> list[str]:
    """Lines where an Exchange SinglePartition feeds a Sort/Window.

    The consumer is found STRUCTURALLY (round-9 review — a fixed
    2-line lookback both false-flagged sibling branches and missed
    AQE-interposed wrappers): a node's parent is the nearest preceding
    line with a smaller tree depth; pass-through wrappers
    (AQEShuffleRead / ShuffleQueryStage / ...) are walked through.
    Scalar-aggregate merges (HashAggregate consumers) don't match."""
    lines = plan.split("\n")
    depths = [_tree_depth(ln) for ln in lines]
    hits = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        j, d = i, depths[i]
        while j > 0:
            # nearest preceding line with smaller depth = parent
            j -= 1
            if not lines[j].strip() or depths[j] >= d:
                continue
            d = depths[j]
            body = _node_body(lines[j], depths[j])
            if body.startswith(_WRAPPERS):
                continue  # pass-through: keep walking up
            if ("Sort [" in body or "Window [" in body
                    or "WindowGroupLimit" in body):
                hits.append(lines[j].strip()[:100])
            break
    return hits


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark

    spark = get_spark("lint-plans")
    specs = all_specs()
    names = args.names or list(specs)
    bad: list[tuple[str, str]] = []
    waived = 0
    errors: list[tuple[str, str]] = []
    for name in names:
        try:
            df = specs[name].fn(spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — a build error is a finding
            errors.append((name, str(exc)[:200]))
            print(f"ERROR {name}: {str(exc)[:120]}")
            continue
        # the three rules are INDEPENDENT — a query with a waived BNLJ
        # must still fail on an unwaived funnel (and vice versa)
        clean = True
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
            print(f"FLAG {name}: CartesianProduct")
            clean = False
        if "BroadcastNestedLoopJoin" in plan:
            clean = False
            if name in BNLJ_WHITELIST:
                waived += 1
                print(f"WAIVED {name}: BNLJ — "
                      f"{BNLJ_WHITELIST[name][:60]}...")
            else:
                bad.append((name, "BroadcastNestedLoopJoin"))
                print(f"FLAG {name}: BroadcastNestedLoopJoin "
                      f"(not whitelisted)")
        funnels = global_funnels(plan)
        if funnels:
            clean = False
            if name in FUNNEL_WHITELIST:
                waived += 1
                print(f"WAIVED {name}: global funnel — "
                      f"{FUNNEL_WHITELIST[name][:60]}...")
            else:
                bad.append((name, "SinglePartition Sort/Window"))
                print(f"FLAG {name}: SinglePartition Sort/Window "
                      f"funnel — {funnels[0]}")
        if clean:
            print(f"ok {name}")
    print(f"\n{len(names)} plans: {len(bad)} flagged, {waived} waived, "
          f"{len(errors)} build errors")
    if not args.names:
        # full-registry run: commit the machine-readable artifact so
        # tests/test_plan_lint.py can assert the committed lint covered
        # the CURRENT registry (round-8 verdict: a query added after
        # the lint run skipped the safety net unnoticed)
        art = pathlib.Path(__file__).resolve().parents[1] / "PLANS_LINT.json"
        art.write_text(json.dumps({
            "sf": args.sf,
            "n_plans": len(names),
            # the full name list, not just a count: additions and
            # removals cancelling out must not let an unlinted query
            # ship (round-9 review — the count-only lock had exactly
            # that hole)
            "names": sorted(names),
            "flagged": sorted(n for n, _ in bad),
            "waived": waived,
            "errors": sorted(n for n, _ in errors),
        }, indent=1) + "\n")
        print(f"wrote {art}")
    return 1 if (bad or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
