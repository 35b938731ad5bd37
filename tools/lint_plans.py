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
  fails this lint instead of an OOM three rounds later.

Building a DataFrame is lazy for pure queries, but fixture-backed
queries (KG stores, trained models, sinks) execute their build steps —
expect a few minutes for the full registry, mostly fixture warmup.

Usage: python tools/lint_plans.py [--sf /root/testdata/sf0.001] [names...]
Exit 0 = no unexplained cartesian/nested-loop joins.
"""

from __future__ import annotations

import argparse
import pathlib
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
    "ts_resample_hourly": (
        "gap-fill spine construction: the exploded (min,max) hour "
        "range (one aggregate row) crossed with the distinct "
        "event-type dim — broadcast-sized BY DESIGN (the spine is the "
        "output grid, documented in COVERAGE §2.5)"),
}

# prefix waivers: the SPARQL/BGP compiler emits crossJoin ONLY for
# solution frames sharing no variables — the spec's §8 join semantics
# (a join of mappings with disjoint domains IS their cross product).
# Boundedness comes from the query's constant anchors; an accidental
# corpus×corpus cross cannot arise from the compiler because a triple
# scan always binds at least one variable shared with its group (the
# no-shared-var case is the deliberately-written disjoint pattern).
BNLJ_PREFIX_WAIVERS = ("sparql_", "graph_")


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
        cart = "CartesianProduct" in plan
        bnlj = "BroadcastNestedLoopJoin" in plan
        if cart:
            bad.append((name, "CartesianProduct"))
            print(f"FLAG {name}: CartesianProduct")
        elif bnlj and name in BNLJ_WHITELIST:
            waived += 1
            print(f"WAIVED {name}: BNLJ — {BNLJ_WHITELIST[name][:60]}...")
        elif bnlj and name.startswith(BNLJ_PREFIX_WAIVERS):
            waived += 1
            print(f"WAIVED {name}: BNLJ — SPARQL disjoint-domain join "
                  f"(spec §8 cross semantics)")
        elif bnlj:
            bad.append((name, "BroadcastNestedLoopJoin"))
            print(f"FLAG {name}: BroadcastNestedLoopJoin (not whitelisted)")
        else:
            print(f"ok {name}")
    print(f"\n{len(names)} plans: {len(bad)} flagged, {waived} waived, "
          f"{len(errors)} build errors")
    return 1 if (bad or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
