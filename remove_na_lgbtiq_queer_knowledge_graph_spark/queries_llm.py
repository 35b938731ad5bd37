"""LLM-training-data pipeline queries (BASELINE.json scale extensions):
dedup (exact / MinHash-LSH / SimHash / n-gram jaccard / embedding
cosine), similarity search (brute-force + bucketed ANN), text analysis,
multimodal plumbing — each with a DuckDB oracle where the semantics are
SQL-expressible (hashes are md5-based precisely so they are).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.numeric import round_half_away_col

from .operators import ann as ann_ops
from .operators import multimodal as mm_ops
from .operators.dedup import (
    exact_dup_groups,
    exact_keep_first,
    jaccard_pairs,
    minhash_band_pairs,
    minhash_signature,
    norm_tokens,
    repartition_unsplittable,
    shingles,
    simhash,
    simhash_pairs,
)
from .operators.er import connected_components
from .operators.multimodal import (
    audio_energy,
    decode_metadata,
    frame_sample,
    resize_plan,
    to_binary_payload,
)
from .operators.text import (
    PII_PATTERNS,
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    pii_mask,
    quality_features,
    token_counts,
)
from .spec import QuerySpec, materialize, t

# Shared oracle fragments -----------------------------------------------------

_TOKS = ("string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' ')")
# case-preserving twin of _TOKS (same positions — lower() commutes with
# whitespace splitting); used where text is REBUILT, not just matched
_TOKS_CASED = ("string_split(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' ')")
_SHINGLE_CTE = f"""
toks AS (SELECT doc_id, lang, {_TOKS} AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, lang, array_to_string(w[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') AS s
  FROM toks, unnest(range(1, len(w) - 1)) t(i)
)
"""

_VEC_CTE = """
v AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve FROM embeddings),
nrm AS (SELECT vec_id, sqrt(list_dot_product(ve, ve)) AS nv FROM v)
"""


# Dedup -----------------------------------------------------------------------

def dedup_exact_groups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 hash groups with >1 member."""
    return exact_dup_groups(t(spark, sf_dir, "documents"), "doc_id", "text")


_EXACT_SQL = """
SELECT md5(text) AS hash, count(*) AS n, min(doc_id) AS keep_id
FROM documents WHERE text IS NOT NULL
GROUP BY 1 HAVING count(*) > 1
"""


def dedup_exact_keep_first_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping min-id representative (identity when no dups)."""
    return exact_keep_first(t(spark, sf_dir, "documents"), "doc_id", "text")


_KEEPFIRST_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1 OR text IS NULL
"""


def dedup_minhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: word-3-gram shingles → 12 md5-minhash
    signatures → 4 bands of 3 → bucket-join."""
    sh = shingles(t(spark, sf_dir, "documents"), "doc_id", "text", 3)
    return minhash_band_pairs(minhash_signature(sh, 12), 12, 3)


_K, _R = 12, 3
_MINS = ",\n       ".join(
    f"min(md5('{s}|' || s)) AS h{s}" for s in range(_K)
)
# '|'-separated buckets, matching operators/dedup.minhash_bands (one
# bands implementation serves both hash families; the separator is
# required for the km family's variable-width decimals and harmless
# for fixed-width hex)
_BANDS = "\n  UNION ALL ".join(
    "SELECT doc_id, {b} AS band, {cat} AS bucket FROM sig".format(
        b=b, cat=" || '|' || ".join(
            f"CAST(h{_R*b + i} AS VARCHAR)" for i in range(_R)))
    for b in range(_K // _R)
)

# Kirsch-Mitzenmacher component s over a SINGLE md5 — must stay in
# lockstep with operators/dedup.minhash_signature(family="km") (same
# a + s·b mod P over the two 32-bit md5 halves, same prime, same
# b → (b mod (P-1)) + 1 reduction into [1, P-1] that excludes the
# b ≡ 0 (mod P) degenerate family member totally — the earlier b|1
# odd-forcing still admitted b|1 = P itself)
_KM_P = 4294967291


def _km(s: int, col: str = "s") -> str:
    return (f"min((CAST('0x' || substring(md5({col}), 1, 8) AS BIGINT)"
            f" + {s} * (CAST('0x' || substring(md5({col}), 9, 8) AS BIGINT)"
            f" % {_KM_P - 1} + 1))"
            f" % {_KM_P})")


_MINS_KM = ",\n       ".join(f"{_km(s)} AS h{s}" for s in range(_K))


def _lsh_pair_join(a: str = "id_1", b: str = "id_2") -> str:
    """The ONE copy of the LSH band-pair candidate join over a `bands`
    CTE — mirrors operators/dedup.minhash_band_pairs (id tie-break
    a.doc_id < b.doc_id, DISTINCT over band collisions).  A change to
    the dedup pair convention must reach every oracle through THIS
    fragment, not four hand-synced copies (round-13 review; the
    incremental/streaming variants keep their own joins — their
    new-vs-old predicates are genuinely different semantics)."""
    return (f"SELECT DISTINCT a.doc_id AS {a}, b.doc_id AS {b}\n"
            "  FROM bands a JOIN bands b\n"
            "    ON a.band = b.band AND a.bucket = b.bucket"
            " AND a.doc_id < b.doc_id")

_MINHASH_SQL = f"""
WITH {_SHINGLE_CTE},
sig AS (SELECT doc_id, {_MINS} FROM sh GROUP BY doc_id),
bands AS ({_BANDS})
{_lsh_pair_join()}
"""


def dedup_minhash_est_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-ESTIMATED jaccard per banding candidate pair: the
    fraction of agreeing signature components (an unbiased estimator
    of J, Broder 1997) — at 100 TB this is the verify step you
    actually run: signature agreement costs k integer comparisons per
    pair against re-joining both documents' full gram sets (the exact
    verify's sorted-array intersect), trading ±1/√k estimator noise
    for never touching the corpus again after signing.  Candidates
    from the same banding join as ``dedup_minhash_pairs``; signatures
    are md5-based, so the estimate is engine-identical (exact rational
    m/12 reported at 6 dp)."""
    sh = shingles(t(spark, sf_dir, "documents"), "doc_id", "text", 3)
    sig = materialize(minhash_signature(sh, 12))
    pairs = minhash_band_pairs(sig, 12, 3)
    s1 = sig.select(F.col("id").alias("id_1"),
                    *[F.col(f"h{s}").alias(f"a{s}") for s in range(12)])
    s2 = sig.select(F.col("id").alias("id_2"),
                    *[F.col(f"h{s}").alias(f"b{s}") for s in range(12)])
    agree = sum(
        F.when(F.col(f"a{s}") == F.col(f"b{s}"), 1).otherwise(0)
        for s in range(12))
    return (
        pairs.join(s1, "id_1").join(s2, "id_2")
        .select("id_1", "id_2",
                agree.cast("long").alias("n_agree"),
                round_half_away_col(agree / F.lit(12.0), 6).alias("est_jaccard"))
    )


_MINHASH_EST_SQL = f"""
WITH {_SHINGLE_CTE},
sig AS MATERIALIZED (SELECT doc_id, {_MINS} FROM sh GROUP BY doc_id),
bands AS ({_BANDS}),
cand AS (
  {_lsh_pair_join()}
)
SELECT c.id_1, c.id_2,
       CAST({" + ".join(f"(CASE WHEN s1.h{s} = s2.h{s} THEN 1 ELSE 0 END)"
                        for s in range(12))} AS BIGINT) AS n_agree,
       round(({" + ".join(f"(CASE WHEN s1.h{s} = s2.h{s} THEN 1 ELSE 0 END)"
                          for s in range(12))}) / 12.0, 6) AS est_jaccard
FROM cand c
JOIN sig s1 ON c.id_1 = s1.doc_id
JOIN sig s2 ON c.id_2 = s2.doc_id
"""


def dedup_minhash_km_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs under the KIRSCH-MITZENMACHER hash
    family — one md5 per shingle, 12 components derived as
    (a + s·b) mod P over the two 32-bit md5 halves (Kirsch &
    Mitzenmacher 2006), instead of the default family's 12 seeded
    md5s.  This is the 100 TB signature pass: hashing dominates there
    (trillions of shingle rows × k digests), and the km family halves
    the measured signature wall at sf0.1 (0.85 s → 0.42 s).  Same
    banding machinery, same (band, bucket) equi-join; buckets are
    '|'-separated decimals.  The default registry entries keep the
    seeded family for round-over-round bench comparability — this
    entry keeps the scale path oracle-checked."""
    sh = shingles(t(spark, sf_dir, "documents"), "doc_id", "text", 3)
    return minhash_band_pairs(
        minhash_signature(sh, 12, family="km"), 12, 3)


_MINHASH_KM_SQL = f"""
WITH {_SHINGLE_CTE},
sig AS (SELECT doc_id, {_MINS_KM} FROM sh GROUP BY doc_id),
bands AS ({_BANDS})
{_lsh_pair_join()}
"""


def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 16-bit signatures per document."""
    sh = shingles(t(spark, sf_dir, "documents"), "doc_id", "text", 3)
    return simhash(sh, 16).withColumnRenamed("id", "doc_id")


_VOTES = ",\n       ".join(
    f"sum(CASE WHEN substring(md5('{b}|' || s), 1, 1) IN "
    f"('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END) AS v{b}"
    for b in range(16)
)
_BITS = " || ".join(
    f"(CASE WHEN v{b} > 0 THEN '1' ELSE '0' END)" for b in range(16)
)
_SIMHASH_SQL = f"""
WITH {_SHINGLE_CTE},
votes AS (SELECT doc_id, {_VOTES} FROM sh GROUP BY doc_id)
SELECT doc_id, {_BITS} AS simhash FROM votes
"""


def dedup_simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded Hamming join (4 bands of 4 bits
    catch every pair within Hamming distance 3 by pigeonhole), exact
    Hamming refine on candidates only.  16-bit at test SF; the operator
    defaults to 64-bit for real corpora."""
    sh = shingles(t(spark, sf_dir, "documents"), "doc_id", "text", 3)
    return simhash_pairs(simhash(sh, 16), 16, 3)


_SH_BANDS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, substring(simhash, {b * 4 + 1}, 4) AS chunk FROM sigt"
    for b in range(4)
)
_SH_HAM = " + ".join(
    f"(CASE WHEN substring(s1.simhash, {i}, 1) <> substring(s2.simhash, {i}, 1)"
    f" THEN 1 ELSE 0 END)"
    for i in range(1, 17)
)
_SIMHASH_PAIRS_SQL = f"""
WITH {_SHINGLE_CTE},
votes AS (SELECT doc_id, {_VOTES} FROM sh GROUP BY doc_id),
sigt AS MATERIALIZED (SELECT doc_id, {_BITS} AS simhash FROM votes),
bands AS MATERIALIZED ({_SH_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT id_1, id_2, hamming FROM (
  SELECT cand.id_1, cand.id_2, CAST({_SH_HAM} AS BIGINT) AS hamming
  FROM cand
  JOIN sigt s1 ON cand.id_1 = s1.doc_id
  JOIN sigt s2 ON cand.id_2 = s2.doc_id
) WHERE hamming <= 3
"""


def dedup_cluster_keep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup corpus dedup: MinHash-LSH candidate pairs →
    connected components over the pair graph → keep the min-id member
    per cluster; docs in no cluster survive untouched.

    This is the full at-scale dedup shape: candidate generation never
    leaves (band, bucket) equi-joins, clustering is the iterative
    min-label propagation (converges in O(diameter) rounds, and dup
    clusters are shallow), and the final keep is one broadcastable left
    join against the cluster map — no collect anywhere.
    """
    docs = t(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", "text", 3)
    pairs = minhash_band_pairs(minhash_signature(sh, 12), 12, 3)
    cc = connected_components(pairs, "id_1", "id_2")
    clustered = cc.select(F.col("node").alias("doc_id"), "comp")
    return (
        docs.join(clustered, "doc_id", "left")
        .filter(F.col("comp").isNull() | (F.col("comp") == F.col("doc_id")))
        .select("doc_id", "lang", "source")
    )


_CLUSTER_KEEP_SQL = f"""
WITH RECURSIVE {_SHINGLE_CTE},
sig AS MATERIALIZED (SELECT doc_id, {_MINS} FROM sh GROUP BY doc_id),
bands AS MATERIALIZED ({_BANDS}),
pairs AS (
  {_lsh_pair_join("u", "v")}
),
edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
nodes AS (SELECT DISTINCT u AS n FROM edges),
reach(src, dst) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
),
comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src)
SELECT d.doc_id, d.lang, d.source
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
WHERE c.id IS NULL OR c.component = d.doc_id
"""


def dedup_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram jaccard near-dup pairs ≥ 0.8, blocked by lang.

    Runs the operator's default plan — since round 6 that is PPJoin
    prefix filtering, the hot-gram-immune candidate generator (the
    direct inverted-index join's Σ df² shuffle grew 9.4× on the 10×
    duplication-stress corpus; see ``jaccard_pairs``'s docstring and
    PLANS.md).  ``dedup_jaccard_prefix`` pins the prefix plan
    explicitly and shares this oracle."""
    sh = shingles(t(spark, sf_dir, "documents"), "doc_id", "text", 3,
                  extra_cols=["lang"])
    return jaccard_pairs(sh, 0.8, block_col="lang")


_JACCARD_DOC_SQL = f"""
WITH {_SHINGLE_CTE},
cards AS (SELECT doc_id, count(*) AS card FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
  FROM sh a JOIN sh b ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_1, id_2, round(i / (c1.card + c2.card - i), 6) AS jaccard
FROM inter JOIN cards c1 ON id_1 = c1.doc_id JOIN cards c2 ON id_2 = c2.doc_id
WHERE i / (c1.card + c2.card - i) >= 0.8
"""


def dedup_jaccard_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same exact jaccard-pairs contract through the PREFIX-FILTER
    candidate generator (PPJoin) — identical results, shuffle ∝ rare
    grams instead of Σ df(gram)², the formulation that survives a
    corpus with hot stop-phrases or heavy duplication (see the 10x
    duplication-stress table in PLANS.md)."""
    from .operators.dedup import jaccard_pairs_prefix

    sh = shingles(t(spark, sf_dir, "documents"), "doc_id", "text", 3,
                  extra_cols=["lang"])
    return jaccard_pairs_prefix(sh, 0.8, block_col="lang")


def dedup_containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric word-3-gram CONTAINMENT pairs ≥ 0.8, blocked by lang
    — catches a short document pasted inside a longer one (jaccard
    misses it: the union is dominated by the container).  One-sided
    prefix-filtered candidates on the contained side; see
    ``operators.dedup.containment_pairs``."""
    from .operators.dedup import containment_pairs

    sh = shingles(t(spark, sf_dir, "documents"), "doc_id", "text", 3,
                  extra_cols=["lang"])
    return containment_pairs(sh, 0.8, block_col="lang")


_CONTAINMENT_SQL = f"""
WITH {_SHINGLE_CTE},
cards AS (SELECT doc_id, count(*) AS card FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
  FROM sh a JOIN sh b ON a.lang = b.lang AND a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_1, id_2, round(i / c1.card, 6) AS containment
FROM inter JOIN cards c1 ON id_1 = c1.doc_id
WHERE i / c1.card >= 0.8
"""


def dedup_overlap_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ≥12-token overlap spans between document pairs (8-token
    anchors merged along diagonals) — the exact-substring dedup
    complement to the probabilistic MinHash/SimHash family: it reports
    WHERE two documents share verbatim text and for how long, the
    operation behind cross-document span excision in training-data
    pipelines (Lee et al. 2022 build a suffix array; this is the
    relational re-expression, `operators/dedup.py::overlap_spans`)."""
    from .operators.dedup import overlap_spans

    return overlap_spans(
        t(spark, sf_dir, "documents"), "doc_id", "text", k=8, min_len=12)


_OVERLAP_SPANS_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
kg AS (
  SELECT doc_id AS id, CAST(i - 1 AS BIGINT) AS pos,
         md5(array_to_string(w[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)], ' ')) AS h
  FROM toks, unnest(range(1, len(w) - 6)) u(i)
),
anchors AS (
  SELECT a.id AS id_1, b.id AS id_2, a.pos AS pos_1, b.pos AS pos_2
  FROM kg a JOIN kg b ON a.h = b.h AND a.id < b.id
),
runs AS (
  SELECT id_1, id_2, pos_1 - pos_2 AS diag, pos_1,
         row_number() OVER (PARTITION BY id_1, id_2, pos_1 - pos_2
                            ORDER BY pos_1) AS rn
  FROM anchors
)
SELECT id_1, id_2,
       CAST(min(pos_1) AS BIGINT) AS start_1,
       CAST(min(pos_1) - diag AS BIGINT) AS start_2,
       CAST(max(pos_1) - min(pos_1) + 8 AS BIGINT) AS length
FROM runs
GROUP BY id_1, id_2, diag, pos_1 - rn
HAVING max(pos_1) - min(pos_1) + 8 >= 12
"""


def dedup_excise_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-duplicate span EXCISION: every ≥12-token
    shared span is cut from the higher-id document (keep-first), and
    every document comes back with its rebuilt text and cut-token
    count — the operation training pipelines run after span detection
    (`operators/dedup.py::excise_overlap_spans`)."""
    from .operators.dedup import excise_overlap_spans

    return excise_overlap_spans(
        t(spark, sf_dir, "documents"), "doc_id", "text", k=8, min_len=12)


_EXCISE_SPANS_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS_CASED} AS w FROM documents),
kg AS (
  -- detection matches on LOWERED grams; rebuild keeps original case
  SELECT doc_id AS id, CAST(i - 1 AS BIGINT) AS pos,
         md5(array_to_string(
           list_transform(w[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)],
                          x -> lower(x)), ' ')) AS h
  FROM toks, unnest(range(1, len(w) - 6)) u(i)
),
anchors AS (
  SELECT a.id AS id_1, b.id AS id_2, a.pos AS pos_1, b.pos AS pos_2
  FROM kg a JOIN kg b ON a.h = b.h AND a.id < b.id
),
runs AS (
  SELECT id_1, id_2, pos_1 - pos_2 AS diag, pos_1,
         row_number() OVER (PARTITION BY id_1, id_2, pos_1 - pos_2
                            ORDER BY pos_1) AS rn
  FROM anchors
),
spans AS (
  SELECT id_2, min(pos_1) - diag AS start_2,
         max(pos_1) - min(pos_1) + 8 AS length
  FROM runs
  GROUP BY id_1, id_2, diag, pos_1 - rn
  HAVING max(pos_1) - min(pos_1) + 8 >= 12
),
cuts AS (
  SELECT id_2 AS id,
         list({{'s': start_2, 'e': start_2 + length - 1}}) AS iv
  FROM spans GROUP BY id_2
),
kept AS (
  SELECT t.doc_id AS id, t.w,
         list_filter(
           list_transform(t.w, (x, i) -> {{'tok': x, 'pos': CAST(i - 1 AS BIGINT)}}),
           p -> c.iv IS NULL OR
                len(list_filter(c.iv, v -> p.pos >= v.s AND p.pos <= v.e)) = 0
         ) AS kp
  FROM toks t LEFT JOIN cuts c ON t.doc_id = c.id
)
SELECT id,
       -- DuckDB's array_to_string([]) is NULL; Spark's array_join is ''
       COALESCE(array_to_string(list_transform(kp, p -> p.tok), ' '), '')
         AS text,
       CAST(len(w) - len(kp) AS BIGINT) AS n_cut_tokens
FROM kept
"""


def dedup_embedding_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ 0.3 within a label block
    (semantic dedupe)."""
    return ann_ops.cosine_dup_pairs(
        t(spark, sf_dir, "embeddings"), 0.3, block_col="label"
    )


_EMB_PAIRS_SQL = f"""
WITH {_VEC_CTE}
SELECT a.vec_id AS id_1, b.vec_id AS id_2,
       round(list_dot_product(a.ve, b.ve) / (na.nv * nb.nv), 6) AS cos_sim
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
JOIN nrm na ON a.vec_id = na.vec_id JOIN nrm nb ON b.vec_id = nb.vec_id
WHERE round(list_dot_product(a.ve, b.ve) / (na.nv * nb.nv), 6) >= 0.3
"""


# ANN -------------------------------------------------------------------------

def ann_brute_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors (vec_id % 50 == 0) —
    the exact ANN baseline."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return ann_ops.brute_force_topk(emb, queries, k=5)


_ANN_BRUTE_SQL = f"""
WITH {_VEC_CTE},
q AS (SELECT vec_id, ve FROM v WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         round(list_dot_product(q.ve, c.ve) / (nq.nv * nc.nv), 6) AS cos_sim
  FROM q JOIN v c ON c.vec_id <> q.vec_id
  JOIN nrm nq ON q.vec_id = nq.vec_id JOIN nrm nc ON c.vec_id = nc.vec_id
)
SELECT query_id, cand_id, cos_sim, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rk
  FROM scored
) WHERE rk <= 5
"""


def ann_bucketed_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit-bucketed ANN top-3 — the scale path: equi-join on an
    8-bit axis-sign bucket instead of a cross join."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return ann_ops.bucketed_topk(emb, queries, k=3, n_bits=8)


_BUCKET_EXPR = " || ".join(
    f"(CASE WHEN ve[{i+1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8)
)
_ANN_BUCKET_SQL = f"""
WITH {_VEC_CTE},
vb AS (SELECT vec_id, ve, {_BUCKET_EXPR} AS bucket FROM v),
q AS (SELECT vec_id, ve, bucket FROM vb WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         round(list_dot_product(q.ve, c.ve) / (nq.nv * nc.nv), 6) AS cos_sim
  FROM q JOIN vb c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
  JOIN nrm nq ON q.vec_id = nq.vec_id JOIN nrm nc ON c.vec_id = nc.vec_id
)
SELECT query_id, cand_id, cos_sim, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rk
  FROM scored
) WHERE rk <= 3
"""


def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-3: 16-cell deterministic coarse quantizer, 4-probe.
    The third point on the recall/cost curve (brute > IVF > sign-LSH)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return ann_ops.ivf_topk(emb, queries, k=3, n_centroids=16, n_probe=4)


_ANN_IVF_SQL = f"""
WITH {_VEC_CTE},
cents AS (SELECT vec_id AS cent_id, ve AS cve, nv AS cnv
          FROM v JOIN nrm USING (vec_id) ORDER BY vec_id LIMIT 16),
assign AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT c.vec_id, ct.cent_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
             round(list_dot_product(c.ve, ct.cve) / (n1.nv * ct.cnv), 6) DESC,
             ct.cent_id) AS rn
    FROM v c JOIN nrm n1 USING (vec_id) CROSS JOIN cents ct
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM (
    SELECT c.vec_id, ct.cent_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
             round(list_dot_product(c.ve, ct.cve) / (n1.nv * ct.cnv), 6) DESC,
             ct.cent_id) AS rn
    FROM v c JOIN nrm n1 USING (vec_id) CROSS JOIN cents ct
    WHERE c.vec_id % 50 = 0
  ) WHERE rn <= 4
),
scored AS (
  SELECT p.query_id, a.vec_id AS cand_id,
         round(list_dot_product(q.ve, c.ve) / (nq.nv * nc.nv), 6) AS cos_sim
  FROM probes p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.query_id
  JOIN v q ON q.vec_id = p.query_id JOIN v c ON c.vec_id = a.vec_id
  JOIN nrm nq ON nq.vec_id = p.query_id JOIN nrm nc ON nc.vec_id = a.vec_id
)
SELECT query_id, cand_id, cos_sim, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rk
  FROM scored
) WHERE rk <= 3
"""


# Text analysis ---------------------------------------------------------------

def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID."""
    return lang_id(t(spark, sf_dir, "documents"), "text").select(
        "doc_id", "lang", "predicted_lang"
    )


_HITS = {
    lang: f"len(list_filter({_TOKS}, x -> x IN ({', '.join(repr(w) for w in ws)})))"
    for lang, ws in STOPWORDS.items()
}
_BEST = f"greatest({', '.join(_HITS.values())})"
_LANG_CASE = " ".join(
    f"WHEN {_HITS[lang]} = {_BEST} AND {_BEST} > 0 THEN '{lang}'"
    for lang in STOPWORDS
)
_LANG_SQL = f"""
SELECT doc_id, lang,
       CASE {_LANG_CASE} ELSE 'unknown' END AS predicted_lang
FROM documents
"""


def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features + tier."""
    return quality_features(t(spark, sf_dir, "documents"), "doc_id", "text")


_ALL_STOP = ", ".join(repr(w) for ws in STOPWORDS.values() for w in ws)
_QUALITY_SQL = f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len({_TOKS}) - CASE WHEN trim(text) = '' THEN 1
                   ELSE 0 END AS BIGINT) AS n_tokens,
         CAST(length(array_to_string({_TOKS}, '')) AS BIGINT) AS tok_chars,
         CAST(len(regexp_extract_all(text,
              '[^\\p{{L}}0-9_ \\t\\n\\x0b\\f\\r]')) AS BIGINT) AS n_punct,
         CAST(len(list_filter({_TOKS}, x -> x IN ({_ALL_STOP}))) AS BIGINT) AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_punct,
       round(tok_chars / nullif(n_tokens, 0), 6) AS mean_token_len,
       round(stop_hits / nullif(n_tokens, 0), 6) AS stopword_ratio,
       round(n_punct / nullif(n_chars, 0), 6) AS punct_ratio,
       CASE WHEN n_tokens >= 50
                 AND round(stop_hits / nullif(n_tokens, 0), 6) > 0 THEN 'high'
            WHEN n_tokens >= 20 THEN 'medium' ELSE 'low' END AS quality_tier
FROM f
"""


def text_token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    d = t(spark, sf_dir, "documents")
    ws, bpe = token_counts(F.col("text"))
    return d.select(
        "doc_id", ws.cast("long").alias("ws_tokens"), bpe.cast("long").alias("bpe_tokens")
    )


_TOKEN_SQL = f"""
SELECT doc_id,
       CAST(len({_TOKS}) - CASE WHEN trim(text) = '' THEN 1
                 ELSE 0 END AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text),
            '[\\p{{L}}]+|[0-9]+|[^\\p{{L}}0-9 \\t\\n\\x0b\\f\\r]'))
            AS BIGINT) AS bpe_tokens
FROM documents
"""


def text_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition score: distinct / total word-3-grams per document —
    the standard degenerate-text filter (boilerplate, looping
    generations score low).  Pure JVM: one shingle explode + two
    counts, no UDF."""
    sh = shingles(
        t(spark, sf_dir, "documents"), "doc_id", "text", 3, distinct=False
    )
    return (
        sh.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count("*").alias("n_grams"),
            F.countDistinct("shingle").alias("n_distinct"),
        )
        .withColumn(
            "uniq_ratio",
            round_half_away_col(F.col("n_distinct") / F.col("n_grams"), 6),
        )
    )


_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w
  FROM documents
),
sh AS (
  SELECT doc_id, array_to_string(w[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') AS s
  FROM toks, unnest(range(1, len(w) - 1)) t(i)
  WHERE len(w) >= 3
)
SELECT doc_id, count(*) AS n_grams, count(DISTINCT s) AS n_distinct,
       round(count(DISTINCT s) / count(*), 6) AS uniq_ratio
FROM sh GROUP BY doc_id
"""


def corpus_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health-check rollup per (lang, source): doc counts, size
    totals, exact-dup ratio.  One map-side-combinable aggregation —
    integer sums stay exact, divisions happen once on the combined
    totals so the doubles are bit-identical across engines."""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        )
        .withColumn(
            "avg_chars",
            round_half_away_col(F.col("total_chars").cast("double") / F.col("n_docs"), 6),
        )
        .withColumn(
            "dup_ratio",
            round_half_away_col(
                (F.col("n_docs") - F.col("n_unique_texts")).cast("double")
                / F.col("n_docs"),
                6,
            ),
        )
    )


_CORPUS_STATS_SQL = """
SELECT lang, source, count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  count(DISTINCT md5(text)) AS n_unique_texts,
  round(CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*), 6) AS avg_chars,
  round(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6) AS dup_ratio
FROM documents GROUP BY lang, source
"""


def text_pii_mask_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: emails then URLs replaced by typed placeholders,
    with per-type match counts on the original text."""
    return pii_mask(t(spark, sf_dir, "documents"), "doc_id", "text")


_EMAIL_PAT = PII_PATTERNS["email"]
_URL_PAT = PII_PATTERNS["url"]
# counts are of the placeholders PRESENT in masked_text (sequential
# masking can consume an email inside a later-masked URL — counting the
# raw text reported phantom unredacted matches; review batch)
_PII_SQL = (
    "SELECT doc_id, masked_text,\n"
    "  CAST(len(regexp_extract_all(masked_text, '<EMAIL>'))"
    " AS BIGINT) AS n_email,\n"
    "  CAST(len(regexp_extract_all(masked_text, '<URL>'))"
    " AS BIGINT) AS n_url\n"
    "FROM (SELECT doc_id,\n"
    "  regexp_replace(regexp_replace(text, '" + _EMAIL_PAT
    + "', '<EMAIL>', 'g'), '" + _URL_PAT + "', '<URL>', 'g') AS masked_text\n"
    "  FROM documents)"
)


def text_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint per document."""
    return doc_fingerprint(t(spark, sf_dir, "documents"), "doc_id", "text")


_DOCFP_SQL = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fingerprint
FROM documents
"""


def corpus_curation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end LLM-corpus curation pipeline as ONE declarative
    plan: exact dedup (keep min-id) → language ID → quality features →
    keep confident-language, medium+ tier docs.  The md5-dedup window
    is the only required shuffle — no id re-join, no materialized
    intermediate.

    r13 optimization (guide §1.2 "the distributed algorithm first"):
    built from the bound-token building blocks instead of composing
    ``lang_id``+``quality_features``, so the survivor filter can run on
    CHEAP bound columns BEFORE the per-language scoring.  The filter is
    row-identical to the declared ``quality_tier != 'low' AND
    predicted_lang != 'unknown'`` (oracle-hash-checked ×3 scales, and
    pinned in tests/test_llm_ops.py::test_curation_filter_equivalence;
    end-to-end rewritten ≡ composed equality pinned in
    tests/test_llm_ops.py::test_curation_matches_composed_operators):

    - ``quality_tier != 'low'``  ⇔  ``n_tokens >= 20`` — 'high' requires
      ``n_tokens >= 50`` (⊂ >= 20), 'medium' IS ``n_tokens >= 20``, and a
      NULL n_tokens (NULL text) fails both forms;
    - ``predicted_lang != 'unknown'``  ⇔  ``stop_hits > 0`` over the
      UNION stopword list — the argmax is non-'unknown' exactly when
      greatest(per-lang hits) > 0, i.e. when any union hit exists.

    Per-language hits then run on survivors only, and every feature
    references the one bound ``__toks`` array (the HOF args evaluate
    outside codegen CSE).  Measured at sf0.1 interleaved: 1.74/1.93 →
    0.73/0.76 s min/med with byte-identical output."""
    d = exact_keep_first(t(spark, sf_dir, "documents"), "doc_id", "text")
    d = repartition_unsplittable(d, "doc_id")
    text = F.col("text")
    b = d.select("doc_id", "text", norm_tokens(text).alias("__toks"))
    toks = F.col("__toks")
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    n_tokens = (F.size(toks)
                - F.when(F.trim(text) == "", F.lit(1)).otherwise(F.lit(0)))
    stop_hits = F.size(F.filter(toks, lambda tk: tk.isin(all_stop)))
    b = b.select("doc_id", "__toks", n_tokens.alias("__nt"),
                 stop_hits.alias("__sh"))
    b = b.filter((F.col("__nt") >= 20) & (F.col("__sh") > 0))
    b = b.select(
        "doc_id", "__nt", "__sh",
        *[F.size(F.filter(toks, lambda tk: tk.isin(words))).alias(f"__{lang}")
          for lang, words in STOPWORDS.items()])
    best = F.greatest(*[F.col(f"__{lang}") for lang in STOPWORDS])
    pred = F.lit("unknown")
    for lang in reversed(list(STOPWORDS)):
        pred = F.when((F.col(f"__{lang}") == best) & (best > 0),
                      F.lit(lang)).otherwise(pred)
    b = b.select("doc_id", "__nt", "__sh", pred.alias("predicted_lang"))
    nt, sh = F.col("__nt"), F.col("__sh")
    tok_denom = F.when(nt == 0, F.lit(None)).otherwise(nt)
    stop_ratio = round_half_away_col(sh / tok_denom, 6)
    tier = (F.when((nt >= 50) & (stop_ratio > 0), "high")
            .when(nt >= 20, "medium").otherwise("low"))
    return b.select("doc_id", "predicted_lang",
                    nt.cast("long").alias("n_tokens"),
                    tier.alias("quality_tier"))


_CURATION_SQL = f"""
WITH dedup AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1 OR text IS NULL
),
l AS (
  SELECT doc_id, CASE {_LANG_CASE} ELSE 'unknown' END AS predicted_lang
  FROM dedup
),
f AS (
  SELECT doc_id,
         CAST(len({_TOKS}) - CASE WHEN trim(text) = '' THEN 1
                   ELSE 0 END AS BIGINT) AS n_tokens,
         CAST(len(list_filter({_TOKS}, x -> x IN ({_ALL_STOP}))) AS BIGINT) AS stop_hits
  FROM dedup
),
q AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens >= 50
                   AND round(stop_hits / nullif(n_tokens, 0), 6) > 0 THEN 'high'
              WHEN n_tokens >= 20 THEN 'medium' ELSE 'low' END AS quality_tier
  FROM f
)
SELECT l.doc_id, predicted_lang, n_tokens, quality_tier
FROM l JOIN q ON l.doc_id = q.doc_id
WHERE quality_tier <> 'low' AND predicted_lang <> 'unknown'
"""


# Pipeline plumbing: chunking / sampling / splits ----------------------------

def doc_chunking_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (context-window prep): 100-char
    chunks with 20-char overlap, one row per chunk with a stable chunk
    id.  Pure JVM (sequence + transform + posexplode) — no UDF, scales
    as a narrow map over the corpus."""
    d = t(spark, sf_dir, "documents")
    step, width = 80, 100
    chunks = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(
                (F.length("text") - 1).cast("int") / step, F.lit(0)
            ).cast("int"),
        ),
        lambda i: F.substring(F.col("text"), (i * step + 1).cast("int"), width),
    )
    return (
        d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .withColumn("chunk_idx", F.col("chunk_idx").cast("long"))
        .withColumn("n_chars", F.length("chunk").cast("long"))
    )


_CHUNK_SQL = """
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       substring(text, CAST(i * 80 + 1 AS INTEGER), 100) AS chunk,
       CAST(length(substring(text, CAST(i * 80 + 1 AS INTEGER), 100)) AS BIGINT) AS n_chars
FROM documents,
     unnest(range(0, greatest((length(text) - 1) // 80, 0) + 1)) u(i)
"""


def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language rates via a
    hash-mod on the key (en 1/4, de 1/2, others 1/8).  Reproducible
    across engines, cluster sizes and reruns — unlike rand()-based
    ``sampleBy`` — so downstream training sets are stable artifacts."""
    d = t(spark, sf_dir, "documents")
    bucket = F.pmod(F.col("doc_id"), F.lit(8))
    keep = (
        F.when(F.col("lang") == "en", bucket < 2)
        .when(F.col("lang") == "de", bucket < 4)
        .otherwise(bucket < 1)
    )
    return d.filter(keep).select("doc_id", "lang", "source")


_STRATA_SQL = """
SELECT doc_id, lang, source FROM documents
WHERE CASE WHEN lang = 'en' THEN doc_id % 8 < 2
           WHEN lang = 'de' THEN doc_id % 8 < 4
           ELSE doc_id % 8 < 1 END
"""


def split_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split assignment by md5-hash bucket (~80/10/10):
    content-independent, engine-independent, stable under re-partition
    and re-ingest — the split IS a pure function of the id."""
    d = t(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
                    ).cast("long")
    return d.select(
        "doc_id",
        F.when(bucket < 204, "train")
        .when(bucket < 230, "val")
        .otherwise("test")
        .alias("split"),
    )


_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN b < 204 THEN 'train' WHEN b < 230 THEN 'val' ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) AS b
  FROM documents
)
"""


# Multimodal ------------------------------------------------------------------

def mm_decode_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing: text → binary payload →
    mapInPandas stub decoder → typed metadata.  The decode body is a
    deterministic fake (no codec libs here); the Arrow/batch/schema
    machinery is the real thing."""
    payloads = to_binary_payload(t(spark, sf_dir, "documents"), "doc_id", "text")
    return decode_metadata(payloads)


_MM_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
       CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt
FROM documents
"""


def mm_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: 1 video row → N frame rows via
    mapInPandas (stub keyframe walk; frame count/timestamps derive from
    the payload, frames fingerprinted not stored)."""
    payloads = to_binary_payload(t(spark, sf_dir, "documents"), "doc_id", "text")
    return frame_sample(payloads)


_MM_FRAMES_SQL = """
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_idx,
       CAST(i * 1000 AS BIGINT) AS t_ms,
       md5(text || ':' || CAST(i AS VARCHAR)) AS frame_sig
FROM documents,
     unnest(range(0, octet_length(encode(text)) % 8 + 1)) u(i)
"""


def mm_resize_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: fit-scale metadata math + content signature of the
    would-be resized payload (codec stubbed, plumbing real)."""
    payloads = to_binary_payload(t(spark, sf_dir, "documents"), "doc_id", "text")
    return resize_plan(payloads, target_w=64, target_h=64)


_MM_RESIZE_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
       round(least(64.0 / greatest(octet_length(encode(text)) % 640, 1),
                   64.0 / greatest((octet_length(encode(text)) * 7) % 480, 1)), 6)
         AS scale,
       md5(text || '@64x64') AS resized_sig
FROM documents
"""




def mm_audio_energy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over the binary audio column (fake-PCM
    decode stub; real codec drops into the energy_fn seam)."""
    docs = t(spark, sf_dir, "documents")
    payloads = to_binary_payload(docs, "doc_id", "text")
    return audio_energy(payloads)


_MM_AUDIO_SQL = """
-- samples are the UTF-8 BYTES of the payload (the stub decodes
-- np.frombuffer over text.encode()); a character-based oracle would
-- diverge on the first non-ASCII document, so each code point expands
-- to its UTF-8 byte sequence
WITH cps AS (
  SELECT doc_id, ci, unicode(substring(text, CAST(ci AS INTEGER), 1)) AS cp
  FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS ci
        FROM documents)
),
bl AS (
  SELECT doc_id, ci,
         CASE WHEN cp < 128 THEN [cp]
              WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
              WHEN cp < 65536 THEN [224 + cp // 4096,
                                    128 + (cp // 64) % 64, 128 + cp % 64]
              ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
                    128 + (cp // 64) % 64, 128 + cp % 64]
         END AS bs
  FROM cps
),
samples AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY ci, bo) AS pos,
         v
  FROM (SELECT doc_id, ci, unnest(bs) AS v,
               unnest(range(1, len(bs) + 1)) AS bo
        FROM bl)
)
SELECT doc_id, CAST((pos - 1) // 16 AS BIGINT) AS window_idx,
       count(*) AS n_samples,
       round(sqrt(avg(power(v - 128, 2))), 6) AS rms
FROM samples GROUP BY doc_id, (pos - 1) // 16
"""

def mm_wav_real_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec end-to-end: build genuine RIFF/WAVE PCM16 bytes
    per doc (square wave, parameters derived from doc_id), then decode
    them back with the stdlib ``wave`` parser through the same
    mapInPandas seam as the stub decoders.  The oracle knows the
    metadata analytically (even-length ±A square wave ⇒ RMS exactly A),
    so this is an encode→decode round-trip proof — the multimodal
    column story with an actual codec, not a simulation
    (operators/multimodal.py encode_wav_square/decode_wav_real)."""
    ids = t(spark, sf_dir, "documents").select("doc_id")
    payloads = ids.mapInPandas(
        mm_ops.wav_payload_builder, schema="doc_id bigint, payload binary"
    )
    return payloads.mapInPandas(
        mm_ops.decode_wav_real, schema=mm_ops.WAV_META_SCHEMA
    )


_MM_WAV_SQL = """
SELECT doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(800 + (doc_id % 10) * 160 AS BIGINT) AS n_samples,
       round(CAST((800 + (doc_id % 10) * 160) * 1000 AS DOUBLE) / 8000, 6)
         AS duration_ms,
       round(CAST(1000 + (doc_id % 5) * 500 AS DOUBLE), 6) AS rms
FROM documents
"""


def mm_ppm_real_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end-to-end: genuine binary-netpbm P6 bytes per
    doc (gradient px[i,j]=(i+j+doc_id)%256, size derived from doc_id),
    decoded back by the real header/raster parser.  Oracle recomputes
    the mean pixel from the gradient formula — same exact integer
    sum / count division on both engines."""
    ids = t(spark, sf_dir, "documents").select("doc_id")
    payloads = ids.mapInPandas(
        mm_ops.ppm_payload_builder, schema="doc_id bigint, payload binary"
    )
    return payloads.mapInPandas(
        mm_ops.decode_ppm_real, schema=mm_ops.PPM_META_SCHEMA
    )


# Grid bounds: height = 12 + id%8 ≤ 19 < 20, width = 16 + id%16 ≤ 31 < 32.
# The raster repeats the gradient across 3 channels, so the decoder's
# sum/count is (3·Σ)/(3·w·h) — the oracle divides the same two integers
# so the double division is bit-identical.
_MM_PPM_SQL = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h FROM documents
)
SELECT d.doc_id,
       CAST(d.w AS BIGINT) AS width,
       CAST(d.h AS BIGINT) AS height,
       CAST(255 AS BIGINT) AS maxval,
       round(CAST(3 * SUM((i.i + j.j + d.doc_id) % 256) AS DOUBLE)
             / (3 * d.w * d.h), 6) AS mean_px
FROM dims d
JOIN range(0, 20) i(i) ON i.i < d.h
JOIN range(0, 32) j(j) ON j.j < d.w
GROUP BY d.doc_id, d.w, d.h
"""


def mm_phash_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection over REAL bytes: perceptual dHash of
    every decoded netpbm raster (8×9 block-mean grid, 64 comparison
    bits — the standard image-dedup fingerprint), then exact-hash
    cluster summary (hash, member count, min-id keeper).  The pipeline
    a multimodal curation run uses to collapse visually identical
    assets before expensive processing.

    Scale shapes: decode + hash is one Arrow ``mapInPandas`` pass
    (bytes never leave the executor), clustering is a
    map-side-combinable groupBy on the 64-char hash.  A Hamming-
    tolerant variant would band the hash exactly like
    ``dedup_simhash_pairs``'s pigeonhole join — same machinery, the
    exact-equality grouping is the honest baseline here because the
    analytic oracle can reproduce the full hash bit-for-bit (the
    hash's integer cross-multiplied comparisons introduce no float)."""
    ids = t(spark, sf_dir, "documents").select("doc_id")
    payloads = ids.mapInPandas(
        mm_ops.ppm_payload_builder, schema="doc_id bigint, payload binary"
    )
    hashes = payloads.mapInPandas(
        mm_ops.dhash_ppm, schema=mm_ops.DHASH_SCHEMA
    )
    return hashes.groupBy("dhash").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("keep_doc"),
    )


# The oracle rebuilds the hash from the gradient: cell sums are exact
# integer sums of 3·((i+j+id)%256) under the same pixel→cell integer
# division map, bits compare via the same cross-multiplication.

# dHash oracle fragments — ONE copy each of the raster pooling, the
# row-wise bit rule, the hash assembly, the 8-band pigeonhole
# candidates, and the Hamming refine (round-13 review: the three phash
# oracles carried 2-3 hand-synced copies of each; the Spark side was
# already consolidated into _dhash_class_pairs).  _MM_PHASH_KEEP_SQL
# keeps its OWN dims/cells (different raster: near-dup twins with a
# brightness bump) and reuses everything downstream of `cells`.
_DHASH_PLAIN_RASTER = """dims AS (
  SELECT doc_id, 16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h FROM documents
),
cells AS (
  SELECT d.doc_id,
         (i.i * 8) // d.h AS r, (j.j * 9) // d.w AS c,
         SUM(3 * ((i.i + j.j + d.doc_id) % 256)) AS s,
         count(*) AS n
  FROM dims d
  JOIN range(0, 20) i(i) ON i.i < d.h
  JOIN range(0, 32) j(j) ON j.j < d.w
  GROUP BY 1, 2, 3
)"""

_DHASH_BITS_CTE = """bits AS (
  SELECT doc_id, r, c,
         CASE WHEN lead(s) OVER w * n > s * lead(n) OVER w
              THEN '1' ELSE '0' END AS bit,
         lead(s) OVER w IS NOT NULL AS has_next
  FROM cells
  WINDOW w AS (PARTITION BY doc_id, r ORDER BY c)
)"""

_DHASH_HASHES_CTE = """hashes AS MATERIALIZED (
  SELECT doc_id, string_agg(bit, '' ORDER BY r, c) AS dhash
  FROM bits WHERE has_next GROUP BY doc_id
)"""

_DHASH_BAND_CTES = """classes AS MATERIALIZED (SELECT DISTINCT dhash FROM hashes),
bands AS MATERIALIZED (
  SELECT b.b, substring(dhash, b.b * 8 + 1, 8) AS bb, dhash
  FROM classes, range(0, 8) b(b)
),
cand AS (
  SELECT DISTINCT x.dhash AS h1, y.dhash AS h2
  FROM bands x JOIN bands y
    ON x.b = y.b AND x.bb = y.bb AND x.dhash < y.dhash
)"""

_DHASH_HAM = """(SELECT count(*) FROM range(1, 65) r(i)
          WHERE h1[CAST(i AS INTEGER)] <> h2[CAST(i AS INTEGER)])"""

_MM_PHASH_SQL = f"""
WITH {_DHASH_PLAIN_RASTER},
{_DHASH_BITS_CTE},
{_DHASH_HASHES_CTE}
SELECT dhash, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_doc
FROM hashes GROUP BY 1
"""



def _dhash_class_pairs(classes: DataFrame, max_dist: int) -> DataFrame:
    """(h1, h2, hamming ≤ max_dist) over a DISTINCT-dhash class frame:
    8 pigeonhole bands of 8 bits → banded candidate equi-join → exact
    Hamming refine.  The ONE copy of the class-banding pipeline shared
    by ``mm_phash_pairs_q`` and ``mm_phash_cluster_keep_q`` (review
    finding: ~20 duplicated lines whose recall guarantee could drift).
    Recall-complete for distance ≤ max_dist while max_dist < 8: two
    64-bit hashes within 7 flipped bits must agree on ≥ 1 of 8 bands
    (pigeonhole)."""
    bands = classes.select(
        "dhash",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("b"),
    ).select("b", F.expr("substring(dhash, b * 8 + 1, 8)").alias("bits"),
             "dhash")
    cand = (
        bands.select("b", "bits", F.col("dhash").alias("h1"))
        .join(bands.select("b", "bits", F.col("dhash").alias("h2")),
              ["b", "bits"])
        .filter(F.col("h1") < F.col("h2"))
        .select("h1", "h2")
        .distinct()
    )
    ham = F.expr(
        "aggregate(sequence(1, 64), 0, (acc, i) -> acc + "
        "IF(substring(h1, i, 1) <> substring(h2, i, 1), 1, 0))")
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_dist)
    )


def mm_phash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-tolerant image near-dup pairs over the dHash CLASSES:
    all (hash_1, hash_2) with Hamming distance ≤ 6 between DISTINCT
    64-bit perceptual hashes — the cluster-merge candidates exact
    equality (``mm_phash_clusters``) can't see.  Visually-near images
    (small crops/brightness shifts) land a few bits apart; this is the
    image-side analogue of ``dedup_simhash_pairs``.

    Candidate generation is the same PIGEONHOLE banding: split each
    hash into 8 bands of 8 bits and equi-join on (band index, band
    bits) — if d ≤ 7, at least one of the 8 bands is identical, so
    recall is COMPLETE for the ≤ 6 threshold by construction, never
    probabilistic.  Banding runs at hash-CLASS grain (distinct hashes,
    ≪ docs — exact duplicates collapsed first, the same class-level
    trick as er_lsh_pairs_sparse), so the self-join is tiny even when
    clusters are huge.  The Hamming refine compares the 64 '0'/'1'
    chars positionally — identical integer comparisons on both
    engines, no float anywhere."""
    ids = t(spark, sf_dir, "documents").select("doc_id")
    payloads = ids.mapInPandas(
        mm_ops.ppm_payload_builder, schema="doc_id bigint, payload binary"
    )
    hashes = payloads.mapInPandas(
        mm_ops.dhash_ppm, schema=mm_ops.DHASH_SCHEMA
    )
    classes = materialize(hashes.select("dhash").distinct())
    return _dhash_class_pairs(classes, 6).select(
        F.col("h1").alias("hash_1"), F.col("h2").alias("hash_2"),
        "hamming")


_MM_PHASH_PAIRS_SQL = f"""
WITH {_DHASH_PLAIN_RASTER},
{_DHASH_BITS_CTE},
{_DHASH_HASHES_CTE},
{_DHASH_BAND_CTES}
SELECT h1 AS hash_1, h2 AS hash_2, CAST(ham AS BIGINT) AS hamming
FROM (
  SELECT h1, h2,
         {_DHASH_HAM} AS ham
  FROM cand
)
WHERE ham <= 6
"""


_MM_KEEP_DIST = 6


def mm_phash_cluster_keep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-tolerant image near-dup dedup END-TO-END — the image
    twin of ``dedup_near_cluster_keep`` and the shape an LLM image
    pipeline actually runs: dHash over real netpbm bytes → pigeonhole-
    banded Hamming pairs at hash-CLASS grain (distance ≤ 6, recall-
    complete by the 8-band construction) → connected components over
    the class graph → every image labeled with its cluster's canonical
    keeper (min doc_id; singleton classes keep themselves).

    The payload builder PLANTS a near-duplicate family: docs pair up on
    ``base = doc_id - doc_id % 2`` and the odd twin carries a +40
    brightness bump on the left half of its top/bottom pixel rows —
    measured twin Hamming distance 1–4 bits, with 98% of pairs flipping
    bits in ≥ 2 different bands (the band-boundary-crossing case).  So
    every odd doc must surrender to a smaller keeper, which the tests
    pin.  All stages are the scale shapes already proven elsewhere:
    Arrow mapInPandas decode, class-grain banding, min-label CC."""
    ids = t(spark, sf_dir, "documents").select("doc_id")
    payloads = ids.mapInPandas(
        mm_ops.ppm_near_dup_payload_builder,
        schema="doc_id bigint, payload binary")
    hashes = materialize(payloads.mapInPandas(
        mm_ops.dhash_ppm, schema=mm_ops.DHASH_SCHEMA))
    classes = materialize(hashes.select("dhash").distinct())
    pairs = _dhash_class_pairs(classes, _MM_KEEP_DIST).select("h1", "h2")
    cc = connected_components(pairs, "h1", "h2")
    labeled = (
        hashes.join(cc.select(F.col("node").alias("dhash"), "comp"),
                    "dhash", "left")
        .withColumn("comp", F.coalesce("comp", F.col("dhash")))
    )
    keep = labeled.groupBy("comp").agg(F.min("doc_id").alias("keep_doc"))
    return labeled.join(keep, "comp").select("doc_id", "keep_doc")


# Oracle: rebuild the twin rasters analytically (same base/bump
# formula), the hash bit-for-bit, the identical banded candidates and
# Hamming refine, then min-label components as a recursive CTE — the
# same CC oracle shape as dedup_near_cluster_keep.
_MM_PHASH_KEEP_SQL = f"""
WITH RECURSIVE dims AS (
  SELECT doc_id, doc_id - doc_id % 2 AS base FROM documents
),
dims2 AS (
  SELECT doc_id, base, 16 + base % 16 AS w, 12 + base % 8 AS h FROM dims
),
cells AS (
  SELECT d.doc_id,
         (i.i * 8) // d.h AS r, (j.j * 9) // d.w AS c,
         SUM(3 * (((i.i + j.j + d.base) % 215)
             + CASE WHEN d.doc_id % 2 = 1 AND 2 * j.j < d.w
                     AND (i.i = 0 OR i.i = d.h - 1)
                    THEN 40 ELSE 0 END)) AS s,
         count(*) AS n
  FROM dims2 d
  JOIN range(0, 20) i(i) ON i.i < d.h
  JOIN range(0, 32) j(j) ON j.j < d.w
  GROUP BY 1, 2, 3
),
{_DHASH_BITS_CTE},
{_DHASH_HASHES_CTE},
{_DHASH_BAND_CTES},
pairs AS (
  SELECT h1, h2 FROM (
    SELECT h1, h2,
           {_DHASH_HAM} AS ham
    FROM cand
  ) WHERE ham <= {_MM_KEEP_DIST}
),
edges AS (SELECT h1 AS u, h2 AS v FROM pairs UNION SELECT h2, h1 FROM pairs),
cnodes AS (SELECT DISTINCT u AS n FROM edges),
reach(src, dst) AS (
  SELECT n, n FROM cnodes
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
),
comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src),
labeled AS (
  SELECT h.doc_id, COALESCE(c.component, h.dhash) AS comp
  FROM hashes h LEFT JOIN comp c ON h.dhash = c.id
),
keep AS (SELECT comp, min(doc_id) AS keep_doc FROM labeled GROUP BY comp)
SELECT l.doc_id, k.keep_doc FROM labeled l JOIN keep k ON l.comp = k.comp
"""


def mm_png_real_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG codec end-to-end (round 7): spec-conformant PNG bytes
    per doc (8-bit grayscale gradient px[i,j]=(i+j+doc_id)%256, chunk
    CRCs, zlib DEFLATE, scanline filters cycling through all five PNG
    filter types), decoded back by the pure-stdlib parser
    (`operators/multimodal.py::decode_png_real`).  Same analytic
    oracle shape as the netpbm twin — the compressed-format claim the
    jpeg/mp3 stubs could not make."""
    ids = t(spark, sf_dir, "documents").select("doc_id")
    payloads = ids.mapInPandas(
        mm_ops.png_payload_builder, schema="doc_id bigint, payload binary"
    )
    return payloads.mapInPandas(
        mm_ops.decode_png_real, schema=mm_ops.PNG_META_SCHEMA
    )


# Same grid bounds as the PPM oracle; grayscale → single channel, so
# the decoder's sum/count is Σ/(w·h) with both integers exact.
_MM_PNG_SQL = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h FROM documents
)
SELECT d.doc_id,
       CAST(d.w AS BIGINT) AS width,
       CAST(d.h AS BIGINT) AS height,
       CAST(8 AS BIGINT) AS bit_depth,
       CAST(0 AS BIGINT) AS color_type,
       round(CAST(SUM((i.i + j.j + d.doc_id) % 256) AS DOUBLE)
             / (d.w * d.h), 6) AS mean_px
FROM dims d
JOIN range(0, 20) i(i) ON i.i < d.h
JOIN range(0, 32) j(j) ON j.j < d.w
GROUP BY d.doc_id, d.w, d.h
"""


SPECS: dict[str, QuerySpec] = {
    "dedup_exact_groups": QuerySpec(dedup_exact_groups_q, _EXACT_SQL),
    "dedup_exact_keep_first": QuerySpec(dedup_exact_keep_first_q, _KEEPFIRST_SQL),
    "dedup_minhash_pairs": QuerySpec(dedup_minhash_pairs_q, _MINHASH_SQL),
    "dedup_simhash_signatures": QuerySpec(dedup_simhash_q, _SIMHASH_SQL),
    "dedup_simhash_pairs": QuerySpec(dedup_simhash_pairs_q, _SIMHASH_PAIRS_SQL),
    "dedup_near_cluster_keep": QuerySpec(dedup_cluster_keep_q, _CLUSTER_KEEP_SQL),
    "dedup_jaccard_pairs": QuerySpec(dedup_jaccard_pairs_q, _JACCARD_DOC_SQL),
    "dedup_containment_pairs": QuerySpec(
        dedup_containment_pairs_q, _CONTAINMENT_SQL,
        "asymmetric containment pairs (sub-document near-dups) via "
        "one-sided prefix filtering"),
    "dedup_overlap_spans": QuerySpec(
        dedup_overlap_spans_q, _OVERLAP_SPANS_SQL,
        "exact >=12-token overlap spans via k-gram anchors merged "
        "along diagonals (relational exact-substring dedup)"),
    "dedup_excise_spans": QuerySpec(
        dedup_excise_spans_q, _EXCISE_SPANS_SQL,
        "keep-first span excision: shared spans cut from the "
        "higher-id doc via a codegen interval filter over tokens"),
    "dedup_jaccard_prefix": QuerySpec(
        dedup_jaccard_prefix_q, _JACCARD_DOC_SQL,
        "exact jaccard pairs via PPJoin prefix filtering — same "
        "results, hot-gram-immune candidate generation"),
    "dedup_embedding_pairs": QuerySpec(dedup_embedding_pairs_q, _EMB_PAIRS_SQL),
    "ann_brute_topk": QuerySpec(ann_brute_topk_q, _ANN_BRUTE_SQL),
    "ann_bucketed_topk": QuerySpec(ann_bucketed_topk_q, _ANN_BUCKET_SQL),
    "ann_ivf_topk": QuerySpec(ann_ivf_topk_q, _ANN_IVF_SQL),
    "text_lang_id": QuerySpec(text_lang_id_q, _LANG_SQL),
    "text_quality": QuerySpec(text_quality_q, _QUALITY_SQL),
    "text_token_counts": QuerySpec(text_token_counts_q, _TOKEN_SQL),
    "text_doc_fingerprint": QuerySpec(text_fingerprint_q, _DOCFP_SQL),
    "text_repetition": QuerySpec(text_repetition_q, _REPETITION_SQL),
    "text_pii_mask": QuerySpec(text_pii_mask_q, _PII_SQL),
    "corpus_stats": QuerySpec(corpus_stats_q, _CORPUS_STATS_SQL),
    "corpus_curation": QuerySpec(corpus_curation_q, _CURATION_SQL),
    "doc_chunking": QuerySpec(doc_chunking_q, _CHUNK_SQL),
    "filter_stratified_sample": QuerySpec(stratified_sample_q, _STRATA_SQL),
    "split_assign": QuerySpec(split_assign_q, _SPLIT_SQL),
    "mm_decode_metadata": QuerySpec(mm_decode_metadata_q, _MM_SQL),
    "mm_frame_sample": QuerySpec(mm_frame_sample_q, _MM_FRAMES_SQL),
    "mm_resize_plan": QuerySpec(mm_resize_plan_q, _MM_RESIZE_SQL),
    "mm_audio_energy": QuerySpec(mm_audio_energy_q, _MM_AUDIO_SQL),
    "mm_wav_real_decode": QuerySpec(
        mm_wav_real_decode_q, _MM_WAV_SQL,
        "REAL RIFF/WAVE codec (stdlib wave + numpy) — encode→decode "
        "round trip against an analytic oracle"),
    "mm_ppm_real_decode": QuerySpec(
        mm_ppm_real_decode_q, _MM_PPM_SQL,
        "REAL binary-netpbm codec — encode→decode round trip against "
        "an analytic oracle"),
    "mm_png_real_decode": QuerySpec(
        mm_png_real_decode_q, _MM_PNG_SQL,
        "REAL PNG codec (stdlib zlib; CRCs + all five scanline "
        "filters) — encode→decode round trip, analytic oracle"),
    "dedup_minhash_km": QuerySpec(
        dedup_minhash_km_q, _MINHASH_KM_SQL,
        "MinHash banding under the one-md5 Kirsch-Mitzenmacher "
        "family — the 100 TB signature pass (k digests for one), "
        "oracle-checked"),
    "dedup_minhash_est": QuerySpec(
        dedup_minhash_est_q, _MINHASH_EST_SQL,
        "MinHash-estimated jaccard per banding candidate (Broder "
        "estimator) — the k-comparison verify that never re-touches "
        "the corpus"),
    "mm_phash_clusters": QuerySpec(
        mm_phash_clusters_q, _MM_PHASH_SQL,
        "image near-dup clusters via perceptual dHash over real "
        "decoded rasters — integer-exact bits, analytic oracle"),
    "mm_phash_cluster_keep": QuerySpec(
        mm_phash_cluster_keep_q, _MM_PHASH_KEEP_SQL,
        "Hamming-tolerant image near-dup end-to-end: dHash -> banded "
        "class pairs -> connected components -> canonical keep, with a "
        "planted band-boundary-crossing twin family"),
    "mm_phash_pairs": QuerySpec(
        mm_phash_pairs_q, _MM_PHASH_PAIRS_SQL,
        "Hamming ≤ 6 dHash class pairs via pigeonhole banding — "
        "complete recall by construction, class-grain self-join"),
}
