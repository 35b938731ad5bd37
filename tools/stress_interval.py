"""Interval-join stress: SF ladder + binned-vs-naive plan comparison.

Two claims to pin with measurements (PLANS.md round-10 section):

1. The binned equi-join's wall time tracks EVENTS (points + interval
   bins), not the per-user cross product — measured across the shipped
   SF ladder (100x data 0.001 → 0.1).
2. The naive ``ON p BETWEEN start AND end`` formulation: with an
   equi-key present Catalyst plans a hash join on the key and
   evaluates the range residually against EVERY interval of that key
   (per-point work ∝ intervals-per-key; with no key at all it is a
   BroadcastNestedLoopJoin).  At the registry's ~26 sessions/user the
   naive probe is cheap and actually faster; the binned plan's win is
   the heavy-per-key regime (coarser key = more intervals per key),
   which this harness sweeps by keying on ``user_id % m`` for
   shrinking m on both sides.  At 100 TB (years of sessions per user,
   or coarse blocking keys) the heavy regime is the normal one.

Usage: python tools/stress_interval.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    spark = get_spark("stress_interval")
    spark.range(1).count()
    spec = all_specs()["join_range_interval"]

    print("— SF ladder (binned plan, min of 3) —")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = spec.fn(spark, sf_dir)
            n = out.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"  {sf}: {best:6.3f}s  ({n} attributed sessions)")

    # naive BETWEEN twin at sf0.1: the SHARED session construction
    # (queries_relational._engagement_sessions — one copy), same
    # purchases, the range predicate left to the join condition
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_relational import (
        _engagement_sessions,
    )

    sf_dir = "/root/testdata/sf0.1"
    e = t(spark, sf_dir, "events")
    sec = F.col("ts").cast("double")
    sess = _engagement_sessions(spark, sf_dir)
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), sec.alias("p_s"))
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        interval_join,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import materialize

    sess_m = materialize(sess)

    def timed(df, n_runs=3):
        best = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, n

    print("— per-key load sweep, sf0.1 (key = user_id % m) —")
    print(f"  {'m':>6} {'ivl/key':>8} {'naive s':>8} {'binned s':>9} {'pairs':>9}")
    for m in (0, 50, 10, 2):
        if m:
            key = (F.col("user_id") % m).alias("k")
        else:
            key = F.col("user_id").alias("k")
        p2 = purch.select(key, "pid", "p_s")
        s2 = sess_m.select(key, "start_s", "end_s")
        per_key = s2.groupBy("k").count().agg(F.avg("count")).first()[0]
        naive = p2.alias("p").join(
            s2.alias("s"),
            (F.col("p.k") == F.col("s.k"))
            & (F.col("p.p_s") >= F.col("s.start_s"))
            & (F.col("p.p_s") <= F.col("s.end_s")))
        tn, n1 = timed(naive)
        binned = interval_join(p2, s2, "p_s", "start_s", "end_s",
                               keys=["k"], bin_width=1800.0)
        tb, n2 = timed(binned)
        assert n1 == n2, (n1, n2)
        print(f"  {m or 'user':>6} {per_key:8.0f} {tn:8.3f} {tb:9.3f} {n1:9d}")

    # round-11: span-length ladder — a FIXED 1800 s width pays
    # bins-per-interval ∝ span; the auto width (p95 interval length)
    # stays ~2 bins/interval at every scale.  Claim: auto wall is flat
    # while fixed grows with the ladder, identical outputs.
    print("— span-length ladder (fixed 1800 s vs auto p95 width) —")
    print(f"  {'span':>9} {'fixed s':>8} {'auto s':>8} {'pairs':>9}")
    for scale in (1, 10, 100, 1000):
        L = 1800.0 * scale
        ivals = spark.range(20_000).select(
            (F.col("id") % 100).alias("k"),
            (F.col("id") * 97.0).alias("start_s"),
            (F.col("id") * 97.0 + L).alias("end_s"))
        pts = spark.range(200_000).select(
            (F.col("id") % 100).alias("k"),
            (F.col("id") * 11.3).alias("p_s"))
        fixed = interval_join(pts, ivals, "p_s", "start_s", "end_s",
                              keys=["k"], bin_width=1800.0,
                              max_bins_per_interval=4096)
        tf, nf = timed(fixed)
        auto = interval_join(pts, ivals, "p_s", "start_s", "end_s",
                             keys=["k"], bin_width=None,
                             max_bins_per_interval=4096)
        ta, na = timed(auto)
        assert nf == na, (nf, na)
        print(f"  {int(L):>9} {tf:8.3f} {ta:8.3f} {nf:9d}")


if __name__ == "__main__":
    main()
