"""BPE vocabulary-scale stress harness.

The 100 TB claim for `operators/bpe.py` is that merge-iteration cost is
bound by the VOCABULARY, not the corpus: the corpus is scanned once
into (word, cnt), after which each iteration is one pair-count
aggregate over the word table plus a codegen string rewrite.  The SF
ladder can't show that (its vocabulary is ~31 words at every SF), so
this harness builds synthetic word tables at geometric vocabulary sizes
(random 3-12 char words, zipf-ish counts — all deterministic from the
row id, no RNG) and times `bpe_fit(words, n_merges)` at each size.

What "pass" looks like: per-iteration wall time growing ~linearly (or
sublinearly, while fixed job overhead dominates) in vocabulary rows,
and the merge trajectory staying well-formed (n_merges rules, strictly
positive counts).

Usage: python tools/stress_bpe.py [--sizes 10000,100000,1000000]
                                  [--merges 8] [--passes 3]
Prints one table row per size: rows, fit wall (best of N passes),
per-iteration wall, and the first three learned merges as a sanity
fingerprint.

A second axis (round-9 verdict item): real tokenizers run tens of
thousands of merges, where the stacked-replace plan depth — iteration
i re-evaluates i replace projections — is the cost, not the
vocabulary.  ``--merge-ladder 8,64,256`` sweeps n_merges at one fixed
vocabulary (``--vocab``) and reports s/iter per rung; "pass" is s/iter
~flat across the ladder (the periodic localCheckpoint in bpe_fit —
``--checkpoint-every``, 0 disables — bounds the chain; disable it to
reproduce the super-linear growth it exists to prevent).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def build_words(spark, n_rows: int):
    """Deterministic synthetic vocabulary: word i is 'w' + the base-26
    rendering of a multiplicative hash of i (2-9 symbols, mixed-case
    letters after the digit translation), count is zipf-ish
    (1 + 1e6 // (i+1)) so early pairs dominate the way a real
    corpus's do.  Pure codegen — no RNG, no Python loop."""
    from pyspark.sql import functions as F

    df = spark.range(n_rows).select(
        F.col("id"),
        # multiplicative hash rendered base-26 (digits 0-9A-P); abs
        # guards the Long.MIN edge; pmod bounds the length
        F.concat(
            F.lit("w"),
            F.conv(
                F.pmod(F.abs(F.col("id") * F.lit(2654435761)),
                       F.lit(26 ** 8)).cast("string"),
                10, 26,
            ),
        ).alias("word"),
        (F.lit(1) + F.floor(F.lit(1000000) / (F.col("id") + 1)))
        .cast("long").alias("cnt"),
    )
    # conv emits 0-9A-P; translate the digits to q-z so the symbol
    # alphabet is letters (mixed-case) like real text
    from pyspark.sql.functions import translate

    return df.select(
        translate(F.col("word"), "0123456789", "qrstuvwxyz").alias("word"),
        "cnt",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,100000,1000000")
    ap.add_argument("--merges", type=int, default=8)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--merge-ladder", default=None,
                    help="comma list of n_merges to sweep at --vocab")
    ap.add_argument("--vocab", type=int, default=100000)
    ap.add_argument("--checkpoint-every", type=int, default=32)
    args = ap.parse_args()

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.bpe import bpe_fit
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark

    spark = get_spark("stress-bpe")
    if args.merge_ladder:
        words = build_words(spark, args.vocab).persist()
        words.count()
        print(f"vocab={args.vocab} checkpoint_every={args.checkpoint_every}")
        print(f"{'merges':>7} | {'fit s':>8} | {'s/iter':>7} | last merge")
        print("-" * 60)
        for n in [int(s) for s in args.merge_ladder.split(",")]:
            t0 = time.time()
            final, merges = bpe_fit(
                words, n, checkpoint_every=args.checkpoint_every)
            final.count()
            wall = time.time() - t0
            assert len(merges) == n and all(m[4] > 0 for m in merges)
            print(f"{n:>7} | {wall:>8.2f} | {wall / n:>7.3f} | "
                  f"{merges[-1][3]}")
        words.unpersist()
        return
    print(f"{'rows':>9} | {'fit s':>7} | {'s/iter':>7} | first merges")
    print("-" * 72)
    for size in [int(s) for s in args.sizes.split(",")]:
        words = build_words(spark, size).persist()
        words.count()  # materialize outside the timed region
        best = None
        merges = None
        for _ in range(args.passes):
            t0 = time.time()
            final, merges = bpe_fit(words, args.merges)
            # bpe_fit's work happens in its per-iteration actions; the
            # final frame is lazy — force it so the last rewrite is paid
            final.count()
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
        assert merges is not None and len(merges) == args.merges
        assert all(m[4] > 0 for m in merges)
        fp = " ".join(m[3] for m in merges[:3])
        print(f"{size:>9} | {best:>7.2f} | {best / args.merges:>7.2f} | {fp}")
        words.unpersist()


if __name__ == "__main__":
    main()
