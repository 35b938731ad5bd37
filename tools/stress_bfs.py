"""BFS depth ladder: per-level frontier cost on the sf0.1 co-order
graph (PLANS.md round-10 section).

The claim to pin: level-synchronous expansion does work ∝ edges
incident to the CURRENT frontier, so per-level wall stays bounded as
depth grows even while the visited set accumulates — the anti-pattern
it avoids is re-joining the whole visited set every round.  Reports
wall and frontier/visited sizes per max_depth 1..5.

Usage: python tools/stress_bfs.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.graph import (
        bfs_distances,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_graph import (
        _repeated_coorder_pairs,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import materialize

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("stress_bfs")
    spark.range(1).count()
    pairs = materialize(_repeated_coorder_pairs(spark, args.sf))
    seeds = materialize(
        pairs.select(F.col("p1").alias("node"))
        .unionAll(pairs.select(F.col("p2").alias("node")))
        .filter(F.col("node") % 97 == 0).distinct())
    print(f"graph: {pairs.count()} edges, {seeds.count()} seeds ({args.sf})")
    prev_wall, prev_n = None, None
    print(f"  {'depth':>5} {'wall s':>7} {'Δwall':>7} {'reached':>8} {'new':>6}")
    for depth in range(1, 6):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = bfs_distances(pairs, seeds, depth, src="p1", dst="p2").count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        dw = "" if prev_wall is None else f"{best - prev_wall:+7.3f}"
        dn = "" if prev_n is None else f"{n - prev_n:6d}"
        print(f"  {depth:>5} {best:7.3f} {dw:>7} {n:8d} {dn:>6}")
        prev_wall, prev_n = best, n


if __name__ == "__main__":
    main()
