"""Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization";
the SentencePiece ``--model_type=unigram`` trainer) — the second half of
the tokenizer-training story next to BPE (`operators/bpe.py`), as
hard-EM over the word-frequency table:

- **Seed**: substring counts of the corpus vocabulary (every occurrence
  of every substring up to ``max_piece_len`` chars, weighted by word
  frequency) — keep all single characters (coverage guarantee) plus the
  top ``seed_multi`` multi-char substrings by (count desc, piece asc).
- **E-step** (the distributed part): Viterbi-segment every vocabulary
  word under the current piece scores.  The score table is MODEL-sized
  (≤ seed_multi + alphabet rows), shipped in the task closure like a
  broadcast build side; the WORD table — corpus vocabulary, millions of
  rows at 100 TB, never collectable — streams through one Arrow-batched
  ``mapInPandas`` pass.  The DP is genuinely inexpressible in Catalyst
  (per-position argmax recurrence), which is the repo's bar for leaving
  codegen; everything around it stays relational.
- **M-step**: piece usage counts = one map-side-combinable aggregate
  over the segmentations, weighted by word frequency.
- **Prune schedule**: after each round keep all single chars plus the
  top-k multi-char pieces by (usage desc, piece asc), k walking down
  the schedule — the vocabulary-shrinking loop of the real trainer with
  the EM rounds fixed so the DuckDB oracle can unroll the whole
  trajectory (the `bpe_train_merges` idiom: a divergence at round 1
  shifts every later row).

Hard-EM (Viterbi counts, not forward-backward expectations) is the
deterministic member of Kudo §3's estimation family — expected counts
would put cross-engine float *accumulation* inside the loop; Viterbi
keeps every comparison on exactly-reproducible sums (see below).

Determinism contract (both engines, bit-for-bit):
- scores are ``round6(ln((n+1)/(total+|S|)))`` — integer counts, one
  ``ln``, one 6-dp half-away rounding (the repo's established grid);
  add-one smoothing keeps every retained piece finite-scored, so no
  ±inf ever enters the DP;
- the DP compares sums ``dp[i−k] + score`` of IDENTICAL doubles with
  one addition each — no accumulation-order freedom;
- argmax ties prefer the LARGER k (longer piece), pinned as the same
  CASE scan in the SQL twin; prune/seed ties break on (count desc,
  piece asc), byte order in both engines.

Reference parity: the reference repo trains no tokenizer (R/tidyverse
text utilities only); this extends the LLM-pipeline tier the way the
BPE/DSIR/NB ops do.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE_LEN = 4
SEED_MULTI = 60
PRUNE_SCHEDULE = (40, 30)
# sentinel for a substring absent from the score table: any real path
# (single chars are always retained) scores ≫ -1e9, so a missing-piece
# candidate can never win — and the sentinel keeps the SQL twin's
# LEFT-JOIN COALESCE shape identical to the dict .get default here
MISSING_SCORE = -1.0e9

# the ONE scalar half-away kernel (NaN/inf-guarded) — see
# functions/numeric.py for the cross-engine determinism contract
from ..functions.numeric import round_half_away  # noqa: E402,F401


def substring_counts(words: DataFrame, max_len: int = MAX_PIECE_LEN) -> DataFrame:
    """(word, cnt) → (piece, n): every substring occurrence of length
    1..max_len, frequency-weighted — the seed-vocabulary statistic.
    Pure explode over (position, length); one shuffle, piece-keyed."""
    # empty words must be dropped FIRST: Spark's sequence(1, 0) yields
    # a DESCENDING [1, 0] (DuckDB's range(1, 1) is empty), which would
    # emit spurious empty-string pieces only on the Spark side
    # (round-13 review repro)
    pos = words.filter(F.length("word") > 0).select(
        "word", "cnt",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"))
    pk = pos.select(
        "word", "cnt", "i",
        F.explode(F.sequence(
            F.lit(1),
            F.least(F.lit(max_len), F.length("word") - F.col("i") + 1),
        )).alias("k"))
    return (
        pk.select(F.expr("substring(word, i, k)").alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )


def _viterbi_path(word: str, scores: dict[str, float],
                  max_len: int) -> list[str]:
    """Best segmentation of one word under ``scores`` — max total score,
    ties prefer the longer piece at each position (the SQL twin's CASE
    scan from k=4 down).  Python floats ARE IEEE doubles, and each
    candidate is one addition of doubles shared with the SQL twin, so
    the argmax is bit-identical cross-engine."""
    n = len(word)
    dp = [0.0] * (n + 1)
    bk = [0] * (n + 1)
    for i in range(1, n + 1):
        best, best_k = None, 0
        for k in range(1, min(max_len, i) + 1):
            c = dp[i - k] + scores.get(word[i - k:i], MISSING_SCORE)
            # >= : equal score prefers the larger k
            if best is None or c >= best:
                best, best_k = c, k
        dp[i] = best
        bk[i] = best_k
    pieces: list[str] = []
    i = n
    while i > 0:
        k = bk[i]
        pieces.append(word[i - k:i])
        i -= k
    pieces.reverse()
    return pieces


def viterbi_usage(words: DataFrame, scores: dict[str, float],
                  max_len: int = MAX_PIECE_LEN) -> DataFrame:
    """E+M step: (word, cnt) → (piece, n) usage counts under the
    current model.  One Arrow-batched pass over the (vocabulary-sized)
    word table with the (model-sized) score table in the closure; the
    M-step sum is an ordinary map-side-combinable aggregate."""
    sc = dict(scores)

    def seg(batches):
        import pandas as _pd

        for pdf in batches:
            out_p: list[str] = []
            out_c: list[int] = []
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                for p in _viterbi_path(word, sc, max_len):
                    out_p.append(p)
                    out_c.append(int(cnt))
            yield _pd.DataFrame({"piece": out_p, "c": out_c})

    return (
        words.select("word", "cnt").mapInPandas(seg, "piece string, c long")
        .groupBy("piece")
        .agg(F.sum("c").cast("long").alias("n"))
    )


def viterbi_word_tokens(words: DataFrame, scores: dict[str, float],
                        max_len: int = MAX_PIECE_LEN) -> DataFrame:
    """(word, cnt) → (word, n_tok): pieces per word under the final
    model — the word→tokenization map document encoding joins against
    (the `bpe_encode_docs` shape: encode-by-vocabulary, the corpus is
    never segmented a second time)."""
    sc = dict(scores)

    def ntok(batches):
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame({
                "word": pdf["word"],
                "n_tok": [len(_viterbi_path(w, sc, max_len))
                          for w in pdf["word"]],
            })

    return words.select("word").mapInPandas(ntok, "word string, n_tok long")


def _rescore(ns: dict[str, int]) -> dict[str, float]:
    """Add-one-smoothed log-probabilities on the 6-dp grid."""
    total = sum(ns.values())
    m = len(ns)
    return {
        p: round_half_away(math.log((n + 1.0) / (total + float(m))), 6)
        for p, n in ns.items()
    }


def ulm_fit(
    words: DataFrame,
    *,
    max_len: int = MAX_PIECE_LEN,
    seed_multi: int = SEED_MULTI,
    schedule: tuple[int, ...] = PRUNE_SCHEDULE,
) -> tuple[list[tuple[int, str, int, float]], dict[str, float]]:
    """Fit the unigram LM: returns (trajectory, final scores).

    Trajectory rows are (round, piece, count, score): round 0 = the
    selected seed with substring counts; round r = the post-prune
    retained set with that round's Viterbi usage counts and the scores
    the NEXT round ran under — the full fit is the artifact, so the
    oracle can detect a divergence at any round.

    Driver-side state is MODEL-sized only (retained pieces + counts,
    like BPE's collected merge rules); the corpus-scale work — seed
    counting, each E-step, the M-step aggregate — all runs distributed.
    The word table is MATERIALIZED once up front: the fit launches
    2 + |schedule| jobs over it (seed singles, seed top-k, one E-step
    per round), and without the materialize each re-ran the corpus
    explode+groupBy scan (round-13 review: 3-4x redundant corpus I/O
    at the module's own 100 TB framing).
    """
    from ..spec import materialize

    words = materialize(words.select("word", "cnt"))
    sub = substring_counts(words, max_len)
    singles = sorted(
        (r.piece, r.n)
        for r in sub.filter(F.length("piece") == 1).collect())
    top = (
        sub.filter(F.length("piece") >= 2)
        .orderBy(F.col("n").desc(), "piece")
        .limit(int(seed_multi))
        .collect())
    ns: dict[str, int] = {p: int(n) for p, n in singles}
    ns.update({r.piece: int(r.n) for r in top})
    single_set = {p for p, _ in singles}
    scores = _rescore(ns)
    traj: list[tuple[int, str, int, float]] = [
        (0, p, ns[p], scores[p]) for p in sorted(ns)]
    for rnd, keep in enumerate(schedule, start=1):
        usage = {r.piece: int(r.n)
                 for r in viterbi_usage(words, scores, max_len).collect()}
        multi = sorted(
            (p for p in ns if len(p) >= 2),
            key=lambda p: (-usage.get(p, 0), p))[: int(keep)]
        ns = {p: usage.get(p, 0) for p in single_set}
        ns.update({p: usage.get(p, 0) for p in multi})
        scores = _rescore(ns)
        traj.extend((rnd, p, ns[p], scores[p]) for p in sorted(ns))
    return traj, scores
