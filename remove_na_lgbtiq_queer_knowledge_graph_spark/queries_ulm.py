"""Unigram-LM tokenizer queries (round 12) — the SentencePiece-style
trainer (`operators/ulm.py`) and its document encoder, with the full
fit TRAJECTORY unrolled in the DuckDB oracle: each EM round's Viterbi
is a pair of recursive CTEs (forward DP carrying a 4-slot shift
register of dp values, then a backtrack walk emitting the chosen
pieces), so the oracle re-derives seed → E-step → prune → rescore for
every round — the `bpe_train_merges` trajectory discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.ulm import (
    MAX_PIECE_LEN,
    PRUNE_SCHEDULE,
    SEED_MULTI,
    ulm_fit,
    viterbi_word_tokens,
)
from .queries_llm2 import _WORDS_DUCK, _WORDS_SPARK
from .queries_llm3 import _fit_memo, _word_counts
from .spec import QuerySpec, t


def _ulm_fit_memo(spark: SparkSession, sf_dir: str):
    return _fit_memo(
        spark, sf_dir, ("ulm", MAX_PIECE_LEN, SEED_MULTI, PRUNE_SCHEDULE),
        lambda: ulm_fit(_word_counts(spark, sf_dir)))


def ulm_train_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram-LM piece vocabulary over the documents corpus;
    one row per (step, piece) across the whole schedule — step 0 the
    selected seed with substring counts, step r the post-prune retained
    set with its Viterbi usage counts and next-round scores.  A
    divergence at any round shifts every later row (trajectory
    oracle)."""
    traj, _ = _ulm_fit_memo(spark, sf_dir)
    return spark.createDataFrame(
        traj, "step long, piece string, n long, score double")


def ulm_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document under the trained unigram LM:
    encode-by-vocabulary (the `bpe_encode_docs` shape) — the final
    Viterbi segmentation of the WORD table is the word→token-count map,
    broadcast-joined to the corpus word stream; unseen words (never for
    this self-trained entry) fall back to character-level length."""
    _, scores = _ulm_fit_memo(spark, sf_dir)
    tokmap = viterbi_word_tokens(_word_counts(spark, sf_dir), scores)
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.expr(_WORDS_SPARK)).alias("word"))
        .join(F.broadcast(tokmap), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.coalesce(F.col("n_tok"), F.length("word").cast("long")))
             .cast("long").alias("n_tokens"),
        )
    )


def _viterbi_ctes(r: int, sc: str) -> str:
    """Forward-DP + backtrack + segmentation CTEs for one Viterbi pass
    under score table ``sc`` — the exact SQL twin of
    ``operators.ulm._viterbi_path``.

    Forward: the recursive working row carries (dp[i], dp[i-1],
    dp[i-2], dp[i-3]) as a shift register (a recursive CTE sees only
    the previous iteration, so the 4 lookback slots ride along), plus
    the backpointer k chosen at i.  Candidate k is invalid below
    position k-1 (−1e18 sentinel); a piece absent from the score table
    COALESCEs to −1e9 (the MISSING_SCORE contract — real single-char
    paths always beat it).  Ties prefer larger k via the CASE scan.
    Backtrack: walk i → i − k from len(word) emitting the piece that
    ends at each visited position."""
    m = MAX_PIECE_LEN
    assert m == 4, "the unrolled candidate CASEs below are written for 4"
    return f"""
f{r} AS (
  SELECT word, 0 AS i, CAST(0 AS DOUBLE) AS dp0,
         CAST(-1e18 AS DOUBLE) AS dp1, CAST(-1e18 AS DOUBLE) AS dp2,
         CAST(-1e18 AS DOUBLE) AS dp3, 0 AS k
  FROM words
  UNION ALL
  SELECT word, i + 1,
         CASE ksel WHEN 4 THEN c4 WHEN 3 THEN c3 WHEN 2 THEN c2
                   ELSE c1 END,
         dp0, dp1, dp2, ksel
  FROM (
    SELECT word, i, dp0, dp1, dp2, c1, c2, c3, c4,
           CASE WHEN c4 >= c3 AND c4 >= c2 AND c4 >= c1 THEN 4
                WHEN c3 >= c2 AND c3 >= c1 THEN 3
                WHEN c2 >= c1 THEN 2 ELSE 1 END AS ksel
    FROM (
      SELECT f.word, f.i, f.dp0, f.dp1, f.dp2,
             f.dp0 + COALESCE(s1.score, -1e9) AS c1,
             CASE WHEN f.i >= 1
                  THEN f.dp1 + COALESCE(s2.score, -1e9)
                  ELSE CAST(-1e18 AS DOUBLE) END AS c2,
             CASE WHEN f.i >= 2
                  THEN f.dp2 + COALESCE(s3.score, -1e9)
                  ELSE CAST(-1e18 AS DOUBLE) END AS c3,
             CASE WHEN f.i >= 3
                  THEN f.dp3 + COALESCE(s4.score, -1e9)
                  ELSE CAST(-1e18 AS DOUBLE) END AS c4
      FROM f{r} f
      LEFT JOIN {sc} s1 ON s1.piece = substr(f.word, f.i + 1, 1)
      LEFT JOIN {sc} s2 ON s2.piece = substr(f.word, f.i, 2)
      LEFT JOIN {sc} s3 ON s3.piece = substr(f.word, f.i - 1, 3)
      LEFT JOIN {sc} s4 ON s4.piece = substr(f.word, f.i - 2, 4)
      WHERE f.i < len(f.word)
    )
  )
), b{r} AS (
  SELECT word, len(word) AS i FROM words WHERE len(word) > 0
  UNION ALL
  SELECT b.word, b.i - f.k
  FROM b{r} b JOIN f{r} f ON f.word = b.word AND f.i = b.i
  WHERE b.i > 0
), seg{r} AS (
  SELECT b.word, substr(b.word, b.i - f.k + 1, f.k) AS piece
  FROM b{r} b JOIN f{r} f ON f.word = b.word AND f.i = b.i
  WHERE b.i > 0
)"""


def _round_ctes(r: int, keep: int) -> str:
    """E-step usage, prune-to-``keep`` multi-char pieces, rescore."""
    return f"""
use{r} AS (
  SELECT s.piece, CAST(sum(w.cnt) AS BIGINT) AS n
  FROM seg{r} s JOIN words w USING (word) GROUP BY 1
), ret{r} AS (
  SELECT piece, n FROM (
    SELECT r0.piece, CAST(COALESCE(u.n, 0) AS BIGINT) AS n,
           ROW_NUMBER() OVER (ORDER BY COALESCE(u.n, 0) DESC, r0.piece)
             AS rk
    FROM (SELECT piece FROM ret{r - 1} WHERE length(piece) >= 2) r0
    LEFT JOIN use{r} u USING (piece)
  ) WHERE rk <= {keep}
  UNION ALL
  SELECT r0.piece, CAST(COALESCE(u.n, 0) AS BIGINT) AS n
  FROM (SELECT piece FROM ret{r - 1} WHERE length(piece) = 1) r0
  LEFT JOIN use{r} u USING (piece)
), sc{r} AS MATERIALIZED (
  SELECT piece, n,
         round(ln((n + 1.0)
                  / ((SELECT sum(n) + count(*) FROM ret{r}))), 6) AS score
  FROM ret{r}
)"""


def _ulm_base_ctes() -> str:
    parts = [f"""
WITH RECURSIVE words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest({_WORDS_DUCK}) AS word FROM documents) GROUP BY 1
), sub AS MATERIALIZED (
  SELECT substr(word, i, k) AS piece, CAST(sum(cnt) AS BIGINT) AS n
  FROM (
    SELECT word, cnt, i,
           unnest(range(1, least({MAX_PIECE_LEN},
                                 len(word) - i + 1) + 1)) AS k
    FROM (SELECT word, cnt, unnest(range(1, len(word) + 1)) AS i
          FROM words)
  ) GROUP BY 1
), ret0 AS (
  SELECT piece, n FROM (
    SELECT piece, n, ROW_NUMBER() OVER (ORDER BY n DESC, piece) AS rk
    FROM sub WHERE length(piece) >= 2) WHERE rk <= {SEED_MULTI}
  UNION ALL
  SELECT piece, n FROM sub WHERE length(piece) = 1
), sc0 AS MATERIALIZED (
  SELECT piece, n,
         round(ln((n + 1.0)
                  / ((SELECT sum(n) + count(*) FROM ret0))), 6) AS score
  FROM ret0
)"""]
    for r, keep in enumerate(PRUNE_SCHEDULE, start=1):
        parts.append("," + _viterbi_ctes(r, f"sc{r - 1}"))
        parts.append("," + _round_ctes(r, keep))
    return "".join(parts)


_N_ROUNDS = len(PRUNE_SCHEDULE)

_ULM_TRAIN_SQL = _ulm_base_ctes() + "\n" + "\nUNION ALL\n".join(
    f"SELECT CAST({r} AS BIGINT) AS step, piece, n, score FROM sc{r}"
    for r in range(_N_ROUNDS + 1)
)

_ULM_ENCODE_SQL = (
    _ulm_base_ctes()
    + ","
    + _viterbi_ctes(_N_ROUNDS + 1, f"sc{_N_ROUNDS}")
    + f""", wordtok AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n_tok
  FROM seg{_N_ROUNDS + 1} GROUP BY 1
)
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(COALESCE(w.n_tok, len(d.word))) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, unnest({_WORDS_DUCK}) AS word FROM documents) d
LEFT JOIN wordtok w USING (word)
GROUP BY d.doc_id
"""
)


SPECS: dict[str, QuerySpec] = {
    "ulm_train_pieces": QuerySpec(
        ulm_train_pieces, _ULM_TRAIN_SQL,
        "unigram-LM (SentencePiece) trainer: seed -> Viterbi hard-EM "
        "-> prune schedule, full trajectory oracle"),
    "ulm_encode_docs": QuerySpec(
        ulm_encode_docs, _ULM_ENCODE_SQL,
        "encode-by-vocabulary under the trained unigram LM"),
}
