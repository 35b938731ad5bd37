"""Skew-stress harness — the relational analogue of the duplication
stress (tools/stress_dedup.py).

The SF ladder keeps TPC-H's uniform key distribution; the regime
salting exists for is the opposite.  This builds a skewed scratch
fixture (a configurable share of sf0.1 lineitem rows remapped onto ONE
hot orderkey) and measures the same fact⋈dim revenue aggregation
three ways:

- plain join (what a naive plan does under skew; AQE skew-join may
  split the sorted-shuffle case),
- salted_join(hot_keys="auto") — the sampling gate must DETECT the
  hot key and salt it,
- salted_join on the uniform original — the gate must find nothing
  and degrade to the plain join (no ×16 replication tax).

Row counts are asserted equal across plans, so the measurement can't
silently compare different answers.

Usage: python tools/stress_skew.py [--share 0.3] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import shutil
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--share", type=float, default=0.3)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        salted_join,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark

    spark = get_spark("skew")
    spark.range(1).count()
    scratch = tempfile.mkdtemp(prefix="skew_")
    try:
        li = spark.read.parquet(f"{args.sf}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice")
        orders = spark.read.parquet(f"{args.sf}/orders.parquet").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
        if not (0 < args.share < 1):
            raise SystemExit(f"--share must be in (0, 1), got {args.share}")
        hot = li.select(F.min("l_orderkey")).first()[0]
        # hash-range threshold, not int(round(1/share)): a modulus
        # silently distorts the requested share (0.4 -> actual 0.5)
        # and degenerates to remapping EVERY row at share >= 2/3
        thresh = int(args.share * 10_000)
        skewed = li.withColumn(
            "l_orderkey",
            F.when(F.pmod(F.xxhash64("l_orderkey", "l_extendedprice"),
                          F.lit(10_000)) < thresh,
                   F.lit(hot)).otherwise(F.col("l_orderkey")))
        skewed.write.mode("overwrite").parquet(f"{scratch}/li")
        sk = spark.read.parquet(f"{scratch}/li")

        def agg(j):
            return j.groupBy("o_orderpriority").agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                 .alias("rev"))

        plans = {
            "skewed-plain": lambda: agg(sk.join(orders, "l_orderkey")),
            "skewed-salted-auto": lambda: agg(
                salted_join(sk, orders, "l_orderkey", n_salts=16,
                            hot_keys="auto")),
            "skewed-salted-explicit": lambda: agg(
                salted_join(sk, orders, "l_orderkey", n_salts=16,
                            hot_keys=[hot])),
            "uniform-plain": lambda: agg(li.join(orders, "l_orderkey")),
            "uniform-salted-auto": lambda: agg(
                salted_join(li, orders, "l_orderkey", n_salts=16,
                            hot_keys="auto")),
        }
        results = {}
        for name, fn in plans.items():
            best = None
            for _ in range(args.passes):
                t0 = time.monotonic()
                rows = sorted(tuple(r) for r in fn().collect())
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            results[name] = rows
            print({"plan": name, "sec": round(best, 2), "groups": len(rows)},
                  flush=True)
        # full per-group (priority, n, revenue) equality — a salted join
        # that drops or duplicates rows changes the VALUES even when
        # every priority still appears
        assert results["skewed-plain"] == results["skewed-salted-auto"] \
            == results["skewed-salted-explicit"]
        assert results["uniform-plain"] == results["uniform-salted-auto"]
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
