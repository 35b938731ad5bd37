"""Duplication-stress harness (the PLANS.md 10x table, reproducible).

The SF ladder scales data at a constant duplicate rate; dedup's hard
regime is the opposite — constant data, exploding duplication.  This
builds the round-5 stress fixture (every sf0.1 document plus 9 shifted
near-copies — 10x volume total — one perturbed token per copy so
exact-dup collapse cannot erase them), writes it to a scratch dir shaped like a testdata sf dir,
and times the named dedup queries against it and against plain sf0.1.

Usage: python tools/stress_dedup.py [--sf /root/testdata/sf0.1] [names...]
Default names: dedup_jaccard_pairs (default plan) and its direct-plan
twin — the pair the round-5 stress run measured at 9.4x wall growth
(direct) vs 2.2x (prefix).
"""

from __future__ import annotations

import argparse
import shutil
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def build_fixture(spark, sf_dir: str, out_dir: str, copies: int = 10):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = copies
    copies_df = (
        docs.withColumn("__k", F.explode(F.array(*[F.lit(i) for i in range(1, n)])))
        .withColumn("doc_id", F.col("doc_id") * n + F.col("__k"))
        # one perturbed token per copy: prepend a copy-unique marker word
        .withColumn("text", F.concat(F.concat_ws("", F.lit("cp"), F.col("__k")),
                                     F.lit(" "), F.col("text")))
        .drop("__k")
    )
    base = docs.withColumn("doc_id", F.col("doc_id") * n)
    base.unionByName(copies_df).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet")
    # the CLI accepts ANY registry name; link the other sf tables in so
    # a non-documents query doesn't crash the 10x leg after its
    # baseline was already timed
    import os

    for f in os.listdir(sf_dir):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = f"{out_dir}/{f}"
            if not os.path.exists(dst):
                os.symlink(f"{sf_dir}/{f}", dst)


def span_sweep(spark, sf_dir: str, copies_list, k_list, passes: int):
    """Span-op scale ladder (VERDICT r6 task 4): sweep anchor width k
    and duplication factor for overlap_spans / excise_spans so the
    linear-in-output claim has a grid of points, not one.  min_len is
    k+4 at every k (mirroring the registered k=8/min_len=12 operating
    point).  copies=1 is the plain sf dir; each leg's OUTPUT rows print
    next to wall time — output is the honest denominator when the
    result set itself explodes.
    """
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        excise_overlap_spans,
        overlap_spans,
    )

    for copies in copies_list:
        scratch = None
        if copies == 1:
            d = sf_dir
        else:
            scratch = tempfile.mkdtemp(prefix=f"stress_span{copies}_")
            build_fixture(spark, sf_dir, scratch, copies=copies)
            d = scratch
        try:
            docs = spark.read.parquet(f"{d}/documents.parquet")
            n_docs = docs.count()
            for k in k_list:
                for op_name, op in (("overlap", overlap_spans),
                                    ("excise", excise_overlap_spans)):
                    best, rows = None, None
                    for _ in range(passes):
                        t0 = time.monotonic()
                        rows = op(docs, "doc_id", "text",
                                  k=k, min_len=k + 4).count()
                        dt = time.monotonic() - t0
                        best = dt if best is None else min(best, dt)
                    print({"op": op_name, "copies": copies, "k": k,
                           "docs": n_docs, "sec": round(best, 2),
                           "rows": rows}, flush=True)
        finally:
            if scratch:
                shutil.rmtree(scratch, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--span-sweep", action="store_true",
                    help="run the overlap/excise k x duplication grid "
                         "instead of named queries")
    ap.add_argument("--copies", default="1,10,100")
    ap.add_argument("--k", default="8,12,16")
    ap.add_argument("names", nargs="*",
                    default=["dedup_jaccard_pairs", "dedup_jaccard_direct"])
    args = ap.parse_args()

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        jaccard_pairs_direct,
        shingles,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm import (
        dedup_jaccard_pairs_q,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark

    spark = get_spark()
    if args.span_sweep:
        span_sweep(spark, args.sf,
                   [int(c) for c in args.copies.split(",")],
                   [int(k) for k in args.k.split(",")],
                   args.passes)
        return
    scratch = tempfile.mkdtemp(prefix="stress_")
    try:
        build_fixture(spark, args.sf, scratch)

        def direct_q(spark, sf_dir):
            sh = shingles(
                spark.read.parquet(f"{sf_dir}/documents.parquet"),
                "doc_id", "text", 3, extra_cols=["lang"])
            return jaccard_pairs_direct(sh, 0.8, block_col="lang")

        specs = all_specs()
        for name in args.names:
            if name == "dedup_jaccard_direct":
                fn = direct_q
            elif name == "dedup_jaccard_pairs":
                fn = dedup_jaccard_pairs_q
            else:
                fn = specs[name].fn
            row = {"name": name}
            base_label = __import__("os").path.basename(args.sf.rstrip("/"))
            for label, d in ((base_label, args.sf), ("10x", scratch)):
                best, rows = None, None
                for _ in range(args.passes):
                    t0 = time.monotonic()
                    rows = fn(spark, d).count()
                    dt = time.monotonic() - t0
                    best = dt if best is None else min(best, dt)
                row[label] = round(best, 2)
                row[f"{label}_rows"] = rows
            row["growth"] = round(row["10x"] / row[base_label], 1)
            print(row, flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
