"""SemDeDup duplication-stress harness.

The SF ladder grows the corpus at a roughly constant near-duplicate
rate; SemDeDup's hard regime is the opposite — constant corpus,
exploding duplication.  This plants ``copies-1`` perturbed near-copies
of every embedding (one coordinate nudged per copy so exact-dup
collapse cannot erase them, nudge small enough that cosine-to-base
stays ≈ 1) and times `semantic_keep` at 1x and Nx.

What the measurement SHOWS (and the table in PLANS.md records): the
in-cell pair join is quadratic in the duplicate-CLASS size — copies of
one vector always land in the same cell, so 10x duplication grows that
cell's pairs ~100x no matter how many centroids there are.  That is
inherent to SemDeDup's pairwise-within-cluster definition, not a plan
defect; the production mitigations are (a) run EXACT dedup first
(`dedup_exact_keep_first` — collapses exact classes before any
pairwise work, exactly how the MinHash-LSH path here collapses
exact-dup classes before banding), and (b) more centroids, which
bounds the *unrelated*-vector pairing but not same-class pairing.

Correctness asserts: every planted copy is dropped, and its witness is
its base or a lower-id copy of the same base (the copies are each
other's nearest neighbors by construction).

Round 9: ``--exact`` plants byte-identical copies instead of nudged
ones — the regime the default exact-duplicate pre-pass in
semantic_keep exists for.  With the pre-pass, identical classes
collapse to one representative before the pair join, so 10x EXACT
duplication costs ~the 1x wall (+ one linear groupBy/join) instead of
~100x pair work; the nudged variant stays the documented inherent
quadratic (the guard's regime).  The same correctness asserts hold in
both modes: every planted copy is dropped with its base (or a lower
copy/earlier near-dup) as witness.

Usage: python tools/stress_semdedup.py [--sf /root/testdata/sf0.01]
                                       [--copies 10] [--passes 2]
                                       [--exact]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def build_fixture(spark, sf_dir: str, copies: int, exact: bool = False):
    """Base embeddings ∪ (copies-1) near-copies: copy k of vector v
    multiplies coordinate (k mod dim) by 1.001 — cosine to base stays
    ≥ 0.999 while the vectors differ exactly.  ``exact=True`` plants
    byte-identical copies instead (the pre-pass regime)."""
    from pyspark.sql import functions as F

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    n = copies
    emb = (F.col("embedding") if exact else F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            i == F.pmod(F.col("__k"), F.size("embedding")),
            x * F.lit(1.001),
        ).otherwise(x),
    ))
    dup = (
        vecs.withColumn(
            "__k", F.explode(F.array(*[F.lit(i) for i in range(1, n)])))
        .select(
            (F.col("vec_id") * n + F.col("__k")).alias("vec_id"),
            emb.alias("embedding"),
        )
    )
    base = vecs.select((F.col("vec_id") * n).alias("vec_id"), "embedding")
    return base.unionByName(dup)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--exact", action="store_true",
                    help="plant byte-identical copies (pre-pass regime)")
    args = ap.parse_args()

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        semantic_keep,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark

    spark = get_spark("stress-semdedup")
    base = spark.read.parquet(f"{args.sf}/embeddings.parquet").select(
        "vec_id", "embedding").persist()
    nx = build_fixture(spark, args.sf, args.copies,
                       exact=args.exact).persist()
    n_base, n_nx = base.count(), nx.count()

    def run(vecs):
        best, out_rows, drops = None, 0, 0
        for _ in range(args.passes):
            t0 = time.time()
            out = semantic_keep(vecs, min_sim=0.3, n_centroids=8, iters=2,
                                sample_mod=2)
            rows = out.collect()
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
            out_rows = len(rows)
            drops = sum(1 for r in rows if not r["kept"])
        return best, out_rows, drops, rows

    w1, r1, d1, _ = run(base)
    wn, rn, dn, rows_n = run(nx)
    # HARD invariant: every planted copy is dropped (its base — lower
    # id, same cell, cosine ≥ 0.999 — always witnesses it).
    not_dropped = [
        r for r in rows_n if r["vec_id"] % args.copies != 0 and r["kept"]
    ]
    # informational: a copy witnessed OUTSIDE its class is legitimate
    # when its base was already a near-dup of an earlier vector at 1x
    # (the witness is the smallest qualifying id, which can precede
    # the whole class)
    cross = [
        r for r in rows_n
        if r["vec_id"] % args.copies != 0 and not r["kept"]
        and r["witness"] // args.copies != r["vec_id"] // args.copies
    ]
    print(f"{'variant':>8} | {'rows':>6} | {'drops':>6} | {'wall s':>7}")
    print("-" * 40)
    print(f"{'1x':>8} | {r1:>6} | {d1:>6} | {w1:>7.2f}")
    print(f"{args.copies}x".rjust(8), f"| {rn:>6} | {dn:>6} | {wn:>7.2f}")
    print(f"growth: rows {rn / r1:.1f}x, drops {dn / max(d1, 1):.1f}x, "
          f"wall {wn / w1:.1f}x")
    print(f"cross-class witnesses (legitimate 1x near-dups): {len(cross)}")
    assert not not_dropped, f"{len(not_dropped)} planted copies survived"
    assert rn == n_nx and r1 == n_base


if __name__ == "__main__":
    main()
