"""Round-2 LLM-data-pipeline queries (BASELINE.json north star) with
DuckDB oracles: benchmark decontamination, training-sequence packing,
domain-mix sampling, and the transliteration function's oracle query
(F2 — previously test-only).

Scale notes: every op is a pure Catalyst plan — n-gram decontamination
is an equi-join on md5 gram hashes (never all-pairs), packing windows
are partitioned by shard (no global window), mix rates come from a
broadcastable per-source dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.numeric import round_half_away_col
from .queries_llm import _TOKS_CASED

from .functions.strings import transliterate
from .spec import QuerySpec, t
from .spec import materialize as _cache

_WORDS_SPARK = 'filter(split(regexp_replace(text, "[^a-zA-Z ]", " "), " "), x -> x != "")'
_WORDS_DUCK = (
    "list_filter(string_split(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g'),"
    " ' '), x -> x <> '')"
)


def _word_grams(docs: DataFrame, n: int) -> DataFrame:
    """Distinct word n-grams per document, as md5 hashes.

    The hash is the join key downstream: a 16-byte key instead of an
    arbitrarily long phrase string keeps the contamination join's
    shuffle narrow at corpus scale (and md5 is engine-independent, so
    the DuckDB oracle joins on identical bytes)."""
    # bind the tokenizer chain ONCE before gramming: an expression
    # referenced inside a transform lambda is copied into every element
    # evaluation (r13; same fix as functions/strings.clean_letters)
    base = docs.select("doc_id", F.expr(_WORDS_SPARK).alias("__w"))
    w = F.col("__w")
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
    ).otherwise(F.expr("array()").cast("array<int>"))
    gram = F.explode(
        F.transform(idx, lambda j: F.array_join(F.slice(w, j + 1, n), " "))
    )
    return (
        base.select("doc_id", gram.alias("gram"))
        .select("doc_id", F.md5("gram").alias("g"))
        .distinct()
    )


def decon_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    n-grams with a held-out eval set (the n-gram-overlap rule used to
    scrub pretraining corpora; 8-13 grams in production, 3 here so the
    small fixture has real overlap — ``n`` is a parameter).

    Plan shape at 100 TB: distinct doc-grams on both sides, equi-join on
    the md5 gram hash (shuffle ∝ matching grams, never |docs|²), then a
    map-side-combinable count per (train, eval) pair."""
    docs = t(spark, sf_dir, "documents")
    grams = _word_grams(docs, n=3)
    eval_set = grams.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "g"
    )
    train = grams.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(eval_set, "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


_DECON_SQL = f"""
WITH words AS (
  SELECT doc_id, {_WORDS_DUCK} AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+2], ' ')) AS g
  FROM words, unnest(range(1, len(w) - 1)) AS t(i)
)
SELECT a.doc_id AS doc_id, b.doc_id AS eval_id,
       CAST(count(*) AS BIGINT) AS n_shared
FROM grams a JOIN grams b ON a.g = b.g
WHERE b.doc_id % 97 = 0 AND a.doc_id % 97 <> 0
GROUP BY 1, 2
"""


_BLOOM_K = 3


def decon_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination pre-pass — the broadcast form of
    :func:`decon_ngram_overlap` for the 100 TB regime.

    The eval set's gram hashes are folded into a Bloom filter (k=3
    md5-derived bucket keys over a 16-bit space, kept as 4-hex-char
    strings so both engines compute identical buckets).  The bit table
    is ≤ k·65536 rows — broadcastable at ANY eval-set size — so the
    training corpus is never shuffled on gram: each train gram probes
    the broadcast bits and survives only if all k buckets hit.  Output
    is docs with ≥1 flagged gram and the flagged-gram count — a
    deterministic SUPERSET of the exact overlap (Bloom false-positive
    rate (1-e^{-kn/m})^k); production runs the exact join on this
    pre-filtered sliver only.
    """
    docs = t(spark, sf_dir, "documents")
    grams = _word_grams(docs, n=3)
    ev = grams.filter(F.col("doc_id") % 97 == 0)
    tr = grams.filter(F.col("doc_id") % 97 != 0)
    buckets = F.array(*[
        F.struct(
            F.lit(i).alias("i"),
            F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col("g"))), 1, 4)
             .alias("bucket"),
        )
        for i in range(_BLOOM_K)
    ])
    bits = (
        ev.select(F.explode(buckets).alias("b"))
        .select("b.i", "b.bucket").distinct()
    )
    probes = tr.select(
        "doc_id", "g", F.explode(buckets).alias("b")
    ).select("doc_id", "g", "b.i", "b.bucket")
    flagged = (
        probes.join(F.broadcast(bits), ["i", "bucket"])
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("k_hits"))
        .filter(F.col("k_hits") == _BLOOM_K)
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_flagged_grams")
    )


_BLOOM_BUCKETS = " , ".join(
    f"({i}, substring(md5('{i}|' || g), 1, 4))" for i in range(_BLOOM_K)
)
_BLOOM_SQL = f"""
WITH words AS (
  SELECT doc_id, {_WORDS_DUCK} AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+2], ' ')) AS g
  FROM words, unnest(range(1, len(w) - 1)) AS t(i)
),
bits AS (
  SELECT DISTINCT b.i, b.bucket
  FROM grams, LATERAL (VALUES {_BLOOM_BUCKETS}) AS b(i, bucket)
  WHERE doc_id % 97 = 0
),
probes AS (
  SELECT doc_id, g, b.i, b.bucket
  FROM grams, LATERAL (VALUES {_BLOOM_BUCKETS}) AS b(i, bucket)
  WHERE doc_id % 97 <> 0
),
flagged AS (
  SELECT p.doc_id, p.g
  FROM probes p JOIN bits ON p.i = bits.i AND p.bucket = bits.bucket
  GROUP BY 1, 2
  HAVING count(*) = {_BLOOM_K}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged_grams
FROM flagged GROUP BY 1
"""


def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality scoring: per-document mean token
    "commonness band" — the integer-arithmetic stand-in for unigram-LM
    log-prob filtering.

    Band(token) = ``length(bin(document_frequency))`` = ⌊log2 df⌋+1:
    a pure-integer log bucket, so the score is bit-identical on every
    engine (float ``ln`` differs in the last ulp across engines and
    would break the oracle hash).  Low mean band = rare vocabulary
    (OCR noise, boilerplate codes, exotic text) — the same signal
    CCNet's LM perplexity filter thresholds on.  Plan: one explode +
    one df aggregation + one equi-join on token + a decimal-exact mean;
    shuffle ∝ token count.
    """
    docs = t(spark, sf_dir, "documents")
    # toks feeds the df aggregation AND the scoring join — materialize
    # so the token-scale explode runs once, not per branch (Spark
    # shares no identical subplans across branches; the same
    # double-scan remove_frequent_ngrams documents — review fix)
    toks = _cache(docs.select(
        "doc_id", F.explode(F.expr(_WORDS_SPARK)).alias("tok")
    ))
    dfreq = toks.select("doc_id", "tok").distinct() \
        .groupBy("tok").agg(F.count(F.lit(1)).alias("dfreq"))
    band = F.length(F.bin(F.col("dfreq")))
    return (
        toks.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            (F.sum(band.cast("decimal(18,6)")).cast("double")
             / F.count(F.lit(1))).alias("mean_band"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
        .select("doc_id", round_half_away_col("mean_band", 6).alias("mean_band"),
                "n_tokens")
    )


_RARITY_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_WORDS_DUCK}) AS tok FROM documents
),
dfreq AS (
  SELECT tok, count(*) AS dfreq
  FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1
)
SELECT doc_id,
       round(CAST(SUM(CAST(length(bin(dfreq)) AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_band,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM toks JOIN dfreq USING (tok)
GROUP BY 1
"""


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: concat-and-chunk documents into
    fixed-token-budget chunks (512 here), the standard pretraining
    batch-prep step.

    Documents are sharded by hash first and packed *within* a shard —
    the per-shard running sum is an ordinary partitioned window, so the
    plan scales by adding shards instead of funnelling the corpus
    through one global cumulative sum."""
    docs = t(spark, sf_dir, "documents")
    toks = F.size(F.expr(_WORDS_SPARK)).cast("long")
    sharded = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(8)).cast("long").alias("shard"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return sharded.withColumn(
        "chunk", F.floor(cum_before / F.lit(512)).cast("long")
    )


_PACK_SQL = f"""
WITH sharded AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len({_WORDS_DUCK}) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0)
         AS BIGINT) AS chunk
FROM sharded
"""


def mix_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix sampling: resample the corpus so per-source volumes
    follow configured mixing weights (the data-mixture step of corpus
    assembly).  Weight w_s = 1 + (source_number mod 3); target rows for
    source s ∝ w_s; keep rate = min(1, total·w_s / (Σw·cnt_s)) applied
    as a deterministic md5 bucket cut, so the sample is reproducible
    run-over-run and engine-independent.

    The rate dimension is one row per source — broadcast to the corpus
    scan; totals are map-side-combinable aggregates.  No collect, no
    driver loop."""
    docs = t(spark, sf_dir, "documents")
    weighted = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).withColumn(
        "w", (F.lit(1) + F.pmod(F.expr("substr(source, 4)").cast("long"),
                                F.lit(3))).cast("long")
    )
    totals = weighted.agg(
        F.sum("cnt").alias("total"),
        F.sum("w").alias("sum_w"),
    )
    # keep rate = min(1, total·w / (Σw · cnt_s)): the /cnt_s factor is
    # what makes kept VOLUME ∝ w (an un-normalized rate keeps volume
    # ∝ w·cnt — the raw counts would dominate the configured weights;
    # mix_temperature_sample normalizes the same way)
    rates = weighted.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(
            F.lit(10000).cast("long"),
            F.floor(F.col("total") * F.col("w") * 10000
                    / (F.col("sum_w") * F.col("cnt"))).cast("long"),
        ).alias("thresh"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
               16, 10).cast("long"),
        F.lit(10000),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("thresh"))
        .select("doc_id", "source")
    )


_MIX_SQL = """
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS cnt,
         CAST(1 + CAST(substring(source, 4) AS BIGINT) % 3 AS BIGINT) AS w
  FROM documents GROUP BY source
),
totals AS (SELECT SUM(cnt) AS total, SUM(w) AS sum_w FROM counts),
rates AS (
  SELECT source,
         LEAST(10000,
               CAST(FLOOR(total * w * 10000 / (sum_w * cnt)) AS BIGINT))
           AS thresh
  FROM counts, totals
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r USING (source)
WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS BIGINT)
      % 10000 < r.thresh
"""


def fn_transliterate_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 oracle query: Latin-ASCII transliteration
    (``stri_trans_general(x, "de-ASCII; Latin-ASCII")``,
    ``open-refine-fingerprint.R:22``) as a codegen'd replace/translate
    chain.  The fixture injects diacritics deterministically
    (o→ö, e→é) so the oracle exercises both the German digraph map
    (ö→oe) and the generic Latin fold (é→e)."""
    c = t(spark, sf_dir, "customer")
    accented = F.translate(F.col("c_name"), "aoe", "äöé")
    return c.select(
        "c_custkey",
        accented.alias("accented"),
        transliterate(accented).alias("ascii_name"),
    )


_TRANSLIT_SQL = """
SELECT c_custkey,
       translate(c_name, 'aoe', 'äöé') AS accented,
       replace(replace(replace(replace(replace(replace(replace(
         translate(translate(c_name, 'aoe', 'äöé'), 'àáâãåāçèéêëē', 'aaaaaaceeeee'),
       'ä', 'ae'), 'ö', 'oe'), 'ü', 'ue'), 'Ä', 'Ae'), 'Ö', 'Oe'),
       'Ü', 'Ue'), 'ß', 'ss') AS ascii_name
FROM customer
"""




def dedup_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus boilerplate removal: drop words covered by any 5-gram
    occurring in >= 3 distinct documents (CCNet's repeated-paragraph
    cut, at n-gram granularity).  Doc-frequency shuffle on the gram
    hash, then covered positions collapse per doc and the text
    reassembles via array_except + element_at (see
    ``remove_frequent_ngrams`` — the older positional-anti-join +
    collect_list re-sort plan was measured and replaced); shuffle
    volume ∝ token count."""
    from .operators.dedup import remove_frequent_ngrams

    docs = t(spark, sf_dir, "documents")
    return remove_frequent_ngrams(docs, "doc_id", "text",
                                  n=5, min_doc_freq=3)


_BOILERPLATE_SQL = """
WITH toks AS (
  -- whitespace-CLASS split mirroring ws_tokens (review batch: raw
  -- single-space split missed tab/newline-separated boilerplate)
  SELECT doc_id, """ + _TOKS_CASED + """ AS w
  FROM documents
), grams AS (
  SELECT doc_id, u.pos AS pos, u.gram AS gram
  FROM (
    SELECT doc_id, len(w) AS nw,
           unnest(list_transform(w, (x, i) ->
             {'pos': i, 'gram': array_to_string(w[i:i+4], ' ')})) AS u
    FROM toks
  ) WHERE u.pos <= nw - 4
), freq AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS df FROM grams GROUP BY gram
  ) WHERE df >= 3
), covered AS (
  SELECT DISTINCT g.doc_id, g.pos + o.off AS wpos
  FROM (SELECT gr.doc_id, gr.pos FROM grams gr JOIN freq USING (gram)) g,
       generate_series(0, 4) AS o(off)
), words AS (
  SELECT doc_id, u.pos AS wpos, u.word AS word
  FROM (
    SELECT doc_id, unnest(list_transform(w, (x, i) ->
             {'word': x, 'pos': i})) AS u
    FROM toks
  )
), kept AS (
  SELECT w.doc_id, w.wpos, w.word FROM words w
  ANTI JOIN covered c USING (doc_id, wpos)
), rebuilt AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY wpos) AS clean_text,
         count(*) AS n_words_after
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(len(t.w) AS BIGINT) AS n_words_before,
       CAST(coalesce(r.n_words_after, 0) AS BIGINT) AS n_words_after
FROM toks t LEFT JOIN rebuilt r USING (doc_id)
"""



def ann_kmeans_cells_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means IVF quantizer over the embeddings corpus
    (2 iterations, 8 init cells), exploded to scalar (cell, dim, coord,
    n_members) rows for the oracle.  The fit trains on the bounded
    deterministic half-sample (``vec_id % 2 = 0``, the FAISS-style
    train-on-a-sample path); the member count assigns the FULL corpus
    in one shuffle-free pass."""
    from .operators.ann import kmeans_cells

    v = t(spark, sf_dir, "embeddings")
    return kmeans_cells(v, n_centroids=8, iters=2, sample_mod=2)


def _kmeans_fit_ctes(k: int, iters: int, decimals: int = 6,
                     sample_mod: int = 1, v_sql: str | None = None) -> str:
    """The k-means fit + full-corpus assignment as a reusable CTE
    prefix (``WITH v, vf, c0 … cN, af``) — ``af`` is the per-vector
    cell assignment every k-means-derived oracle composes on
    (:data:`_KMEANS_SQL` appends member counts; queries_llm3's
    SemDeDup oracle appends the in-cell pair join, its doc-clustering
    oracle swaps ``v_sql`` for a hashed-TF vector source).

    ``v_sql``: body of the ``v`` CTE — any SELECT producing
    (vec_id BIGINT-orderable, cv DOUBLE[]); defaults to the embeddings
    table."""
    samp = f" WHERE vec_id % {sample_mod} = 0" if sample_mod > 1 else ""
    if v_sql is None:
        v_sql = ("SELECT vec_id, list_transform(embedding, "
                 "x -> CAST(x AS DOUBLE)) AS cv\n  FROM embeddings")
    out = [f"""
WITH v AS (
  {v_sql}
), vf AS (
  SELECT * FROM v{samp}
), c0 AS (
  SELECT CAST(vec_id AS BIGINT) AS cent_id, cv AS cent_v
  FROM vf ORDER BY vec_id LIMIT {k}
)"""]
    prev = "c0"
    for i in range(1, iters + 1):
        out.append(f""", a{i} AS (
  SELECT vec_id, cent_id, cv FROM (
    SELECT v.vec_id, c.cent_id, v.cv,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.cv, c.cent_v)
                      / (sqrt(list_dot_product(v.cv, v.cv))
                         * sqrt(list_dot_product(c.cent_v, c.cent_v))) DESC,
                      c.cent_id) AS rn
    FROM vf v CROSS JOIN {prev} c
  ) WHERE rn = 1
), c{i} AS (
  SELECT cent_id, list(coord ORDER BY dim) AS cent_v FROM (
    SELECT cent_id, u.pos AS dim, round(avg(u.val), {decimals}) AS coord
    FROM (
      SELECT cent_id,
             unnest(list_transform(cv, (x, j) -> {{'pos': j, 'val': x}})) AS u
      FROM a{i}
    ) GROUP BY cent_id, u.pos
  ) GROUP BY cent_id
)""")
        prev = f"c{i}"
    out.append(f""", af AS (
  SELECT vec_id, cent_id FROM (
    SELECT v.vec_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.cv, c.cent_v)
                      / (sqrt(list_dot_product(v.cv, v.cv))
                         * sqrt(list_dot_product(c.cent_v, c.cent_v))) DESC,
                      c.cent_id) AS rn
    FROM v CROSS JOIN {prev} c
  ) WHERE rn = 1
)""")
    return "".join(out)


def _kmeans_oracle_sql(k: int, iters: int, decimals: int = 6,
                       sample_mod: int = 1) -> str:
    """Unrolled Lloyd's iterations as chained CTEs (the PageRank-oracle
    idiom): assignment = argmin over the centroid cross join with the
    same (cos desc, cent_id) tie-break, re-average rounded to the same
    decimals.  The fit CTEs range over the ``sample_mod`` id-sample
    (``vf``); the final full-corpus assignment ranges over ``v``."""
    prev = f"c{iters}"
    return _kmeans_fit_ctes(k, iters, decimals, sample_mod) + f""", members AS (
  SELECT cent_id, count(*) AS n_members FROM af GROUP BY cent_id
)
SELECT c.cent_id AS cell, CAST(u.pos - 1 AS BIGINT) AS dim,
       u.val AS coord,
       CAST(coalesce(m.n_members, 0) AS BIGINT) AS n_members
FROM (
  SELECT cent_id, unnest(list_transform(cent_v,
         (x, j) -> {{'pos': j, 'val': x}})) AS u
  FROM {prev}
) c LEFT JOIN members m ON c.cent_id = m.cent_id"""


_KMEANS_SQL = _kmeans_oracle_sql(8, 2, sample_mod=2)


def ann_pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-3 (Jégou et al. 2011, ADC variant):
    2 subspaces × 8-cell L2 sub-codebooks fitted on the half-sample,
    corpus compressed to 2 codes per vector, approximate dot via the
    per-query lookup table — the memory-bound end of the recall/cost
    curve (brute > IVF > PQ), where the corpus never moves full-width
    vectors after the one encode pass."""
    from .operators.ann import pq_topk

    v = t(spark, sf_dir, "embeddings")
    queries = v.filter(F.col("vec_id") % 50 == 0)
    return pq_topk(v, queries, k=3, n_sub=2, k_sub=8, iters=2,
                   sample_mod=2)


def _pq_fit_ctes(n_sub: int, k_sub: int, iters: int, ds: int,
                 decimals: int = 6, fit_src: str = "vf",
                 enc_src: str = "v") -> str:
    """The per-subspace fit + encode CTE fragment shared by the PQ and
    IVF-PQ oracles (assumes ``enc_src`` (vec_id, cv) and ``fit_src``
    (the fit sample) are already defined — the residual IVF-PQ oracle
    points both at the residual table): unrolled L2 Lloyd's over the
    sample's sub-slices (argmin of the ``dot(x,x) − 2·dot(x,c) +
    dot(c,c)`` expansion — the same three sequential folds the numpy
    kernel combines, unrounded during fit like the k-means oracle),
    then a full-corpus encode per subspace (``e{m}``) ordering by the
    ROUNDED distance."""

    def d2(x, c):
        return (f"(list_dot_product({x}, {x}) "
                f"- 2 * list_dot_product({x}, {c}) "
                f"+ list_dot_product({c}, {c}))")

    out = []
    for m in range(n_sub):
        lo, hi = m * ds + 1, (m + 1) * ds
        out.append(f""", s{m} AS (
  SELECT vec_id, list_slice(cv, {lo}, {hi}) AS sv FROM {fit_src}
), s{m}c0 AS (
  SELECT CAST(vec_id AS BIGINT) AS cent_id, sv AS cent_v
  FROM s{m} ORDER BY vec_id LIMIT {k_sub}
)""")
        prev = f"s{m}c0"
        for i in range(1, iters + 1):
            out.append(f""", s{m}a{i} AS (
  SELECT vec_id, cent_id, sv FROM (
    SELECT x.vec_id, c.cent_id, x.sv,
           ROW_NUMBER() OVER (
             PARTITION BY x.vec_id
             ORDER BY {d2('x.sv', 'c.cent_v')}, c.cent_id) AS rn
    FROM s{m} x CROSS JOIN {prev} c
  ) WHERE rn = 1
), s{m}c{i} AS (
  SELECT cent_id, list(coord ORDER BY dim) AS cent_v FROM (
    SELECT cent_id, u.pos AS dim, round(avg(u.val), {decimals}) AS coord
    FROM (
      SELECT cent_id,
             unnest(list_transform(sv, (x, j) -> {{'pos': j, 'val': x}})) AS u
      FROM s{m}a{i}
    ) GROUP BY cent_id, u.pos
  ) GROUP BY cent_id
)""")
            prev = f"s{m}c{i}"
        out.append(f""", e{m} AS (
  SELECT vec_id, cent_v FROM (
    SELECT x.vec_id, c.cent_v,
           ROW_NUMBER() OVER (
             PARTITION BY x.vec_id
             ORDER BY round({d2('x.sv', 'c.cent_v')}, {decimals}),
                      c.cent_id) AS rn
    FROM (SELECT vec_id, list_slice(cv, {lo}, {hi}) AS sv
          FROM {enc_src}) x
    CROSS JOIN {prev} c
  ) WHERE rn = 1
)""")
    return "".join(out)


def _pq_oracle_sql(n_sub: int, k_sub: int, iters: int, dim: int,
                   k: int, decimals: int = 6, sample_mod: int = 2,
                   query_mod: int = 50) -> str:
    """Mirror of the PQ pipeline as chained CTEs: the shared fit/encode
    fragment, then ADC as a left-associated sum of per-subspace
    ``list_dot_product`` partials, rounded once at the end."""
    ds = dim // n_sub
    out = [f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), vf AS (
  SELECT * FROM v WHERE vec_id % {sample_mod} = 0
)"""]
    out.append(_pq_fit_ctes(n_sub, k_sub, iters, ds, decimals))
    qslices = ", ".join(
        f"list_slice(cv, {m * ds + 1}, {(m + 1) * ds}) AS qs{m}"
        for m in range(n_sub))
    adc = " + ".join(
        f"list_dot_product(q.qs{m}, e{m}.cent_v)" for m in range(n_sub))
    ejoins = "\n  ".join(
        f"JOIN e{m} ON e{m}.vec_id = c.vec_id" for m in range(n_sub))
    out.append(f""", q AS (
  SELECT vec_id, {qslices} FROM v WHERE vec_id % {query_mod} = 0
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         round({adc}, {decimals}) AS approx_dot
  FROM q JOIN v c ON c.vec_id <> q.vec_id
  {ejoins}
)
SELECT query_id, cand_id, approx_dot, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY approx_dot DESC, cand_id) AS BIGINT) AS rk
  FROM scored
) WHERE rk <= {k}""")
    return "".join(out)


_PQ_SQL = _pq_oracle_sql(2, 8, 2, 64, 3)


def ann_ivf_pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-3 (FAISS IVFADC shape, non-residual): 16-cell coarse
    quantizer with 4-probe candidate restriction, PQ-ADC scoring in
    the compressed domain — the nested-loop broadcast of pure PQ
    becomes a broadcast HASH join on cell id."""
    from .operators.ann import ivf_pq_topk

    v = t(spark, sf_dir, "embeddings")
    queries = v.filter(F.col("vec_id") % 50 == 0)
    return ivf_pq_topk(v, queries, k=3, n_centroids=16, n_probe=4,
                       n_sub=2, k_sub=8, iters=2, sample_mod=2)



def _ivf_coarse_ctes(n_centroids: int, n_probe: int, query_mod: int,
                     decimals: int = 6) -> str:
    """The v/nrm/cents/assign/probes coarse-quantizer CTE block shared
    by the IVF-PQ and residual-IVF-PQ oracles (review finding: two
    verbatim ~30-line copies that a coarse-assignment change would have
    had to hit twice)."""
    def rcos(x, nx, c, nc):
        return f"round(list_dot_product({x}, {c}) / ({nx} * {nc}), {decimals})"

    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), nrm AS (
  SELECT vec_id, sqrt(list_dot_product(cv, cv)) AS nv FROM v
), cents AS (
  SELECT vec_id AS cent_id, cv AS cve, nv AS cnv
  FROM v JOIN nrm USING (vec_id) ORDER BY vec_id LIMIT {n_centroids}
), assign AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT c.vec_id, ct.cent_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
             {rcos('c.cv', 'n1.nv', 'ct.cve', 'ct.cnv')} DESC,
             ct.cent_id) AS rn
    FROM v c JOIN nrm n1 USING (vec_id) CROSS JOIN cents ct
  ) WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM (
    SELECT c.vec_id, ct.cent_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
             {rcos('c.cv', 'n1.nv', 'ct.cve', 'ct.cnv')} DESC,
             ct.cent_id) AS rn
    FROM v c JOIN nrm n1 USING (vec_id) CROSS JOIN cents ct
    WHERE c.vec_id % {query_mod} = 0
  ) WHERE rn <= {n_probe}
)"""


def _ivf_pq_oracle_sql(n_centroids: int, n_probe: int, n_sub: int,
                       k_sub: int, iters: int, dim: int, k: int,
                       decimals: int = 6, sample_mod: int = 2,
                       query_mod: int = 50) -> str:
    """IVF-PQ mirror: the IVF coarse-assignment/probe CTEs (rounded
    cosine, ties to the lowest centroid id — same as the ann_ivf_topk
    oracle) composed with the shared PQ fit/encode fragment; scoring
    joins probes to cell members and sums the per-subspace partials
    left-associated."""
    ds = dim // n_sub

    out = [_ivf_coarse_ctes(n_centroids, n_probe, query_mod, decimals),
           f""", vf AS (
  SELECT * FROM v WHERE vec_id % {sample_mod} = 0
)"""]
    out.append(_pq_fit_ctes(n_sub, k_sub, iters, ds, decimals))
    qslices = ", ".join(
        f"list_slice(cv, {m * ds + 1}, {(m + 1) * ds}) AS qs{m}"
        for m in range(n_sub))
    adc = " + ".join(
        f"list_dot_product(q.qs{m}, e{m}.cent_v)" for m in range(n_sub))
    ejoins = "\n  ".join(
        f"JOIN e{m} ON e{m}.vec_id = a.vec_id" for m in range(n_sub))
    out.append(f""", q AS (
  SELECT vec_id, {qslices} FROM v WHERE vec_id % {query_mod} = 0
), scored AS (
  SELECT p.query_id, a.vec_id AS cand_id,
         round({adc}, {decimals}) AS approx_dot
  FROM probes p
  JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
  JOIN q ON q.vec_id = p.query_id
  {ejoins}
)
SELECT query_id, cand_id, approx_dot, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY approx_dot DESC, cand_id) AS BIGINT) AS rk
  FROM scored
) WHERE rk <= {k}""")
    return "".join(out)


_IVF_PQ_SQL = _ivf_pq_oracle_sql(16, 4, 2, 8, 2, 64, 3)


def ann_ivf_pq_residual_topk_q(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Residual IVF-PQ top-3 — the actual IVFADC of Jégou et al. 2011
    §IV: PQ codebooks trained on (and codes encoding) the residual
    ``x − centroid(cell(x))``, whose distribution is the within-cell
    spread rather than the whole corpus — materially more resolution
    at the same 2×8 code budget (measured recall point in
    tests/test_llm_ops.py::test_ivf_pq_residual_beats_non_residual).
    Scoring adds the per-(query, probed cell) centroid dot, carried as
    one scalar on the broadcast probe frame."""
    from .operators.ann import ivf_pq_topk

    v = t(spark, sf_dir, "embeddings")
    queries = v.filter(F.col("vec_id") % 50 == 0)
    return ivf_pq_topk(v, queries, k=3, n_centroids=16, n_probe=4,
                       n_sub=2, k_sub=8, iters=2, sample_mod=2,
                       residual=True)


def _ivf_pq_residual_oracle_sql(n_centroids: int, n_probe: int,
                                n_sub: int, k_sub: int, iters: int,
                                dim: int, k: int, decimals: int = 6,
                                sample_mod: int = 2,
                                query_mod: int = 50) -> str:
    """Residual IVFADC mirror: the coarse assign/probe CTEs, then the
    residual table ``vres = x − centroid(cell(x))`` (index-lambda
    subtraction — double arithmetic on both engines), the shared PQ
    fit/encode fragment pointed at the residuals, and scoring as
    ``round(dot(q, c_cell) + p0 + p1, 6)`` — left-associated like the
    engine's qc-seeded fold."""
    ds = dim // n_sub

    out = [_ivf_coarse_ctes(n_centroids, n_probe, query_mod, decimals),
           f""", vres AS (
  SELECT a.vec_id,
         list_transform(vv.cv, (x, j) -> x - ct.cve[j]) AS cv
  FROM assign a
  JOIN v vv ON vv.vec_id = a.vec_id
  JOIN cents ct ON ct.cent_id = a.cell
), vfr AS (
  SELECT * FROM vres WHERE vec_id % {sample_mod} = 0
)"""]
    out.append(_pq_fit_ctes(n_sub, k_sub, iters, ds, decimals,
                            fit_src="vfr", enc_src="vres"))
    qslices = ", ".join(
        f"list_slice(cv, {m * ds + 1}, {(m + 1) * ds}) AS qs{m}"
        for m in range(n_sub))
    adc = " + ".join(
        f"list_dot_product(q.qs{m}, e{m}.cent_v)" for m in range(n_sub))
    ejoins = "\n  ".join(
        f"JOIN e{m} ON e{m}.vec_id = a.vec_id" for m in range(n_sub))
    out.append(f""", q AS (
  SELECT vec_id, cv, {qslices} FROM v WHERE vec_id % {query_mod} = 0
), scored AS (
  SELECT p.query_id, a.vec_id AS cand_id,
         round(list_dot_product(q.cv, ct.cve) + {adc},
               {decimals}) AS approx_dot
  FROM probes p
  JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
  JOIN cents ct ON ct.cent_id = p.cell
  JOIN q ON q.vec_id = p.query_id
  {ejoins}
)
SELECT query_id, cand_id, approx_dot, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY approx_dot DESC, cand_id) AS BIGINT) AS rk
  FROM scored
) WHERE rk <= {k}""")
    return "".join(out)


_IVF_PQ_RES_SQL = _ivf_pq_residual_oracle_sql(16, 4, 2, 8, 2, 64, 3)



def select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus selection: per source, rank documents by lexical
    diversity (distinct-word ratio) and keep the best until the
    source's token budget is exhausted — the greedy knapsack step of
    pretraining-mix assembly.

    The running token total uses the two-pass grouped_running_sum plan
    (range partition + per-(partition, source) offsets), NOT
    ``SUM() OVER (PARTITION BY source ORDER BY ...)`` — a corpus with a
    handful of giant sources would funnel each source through one
    window task.  Budgets are a broadcastable per-source dimension."""
    from .operators.relational import grouped_running_sum

    docs = t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", "source",
        round_half_away_col(F.size(F.array_distinct(w)) / F.size(w), 6).alias("quality"),
        F.size(w).cast("long").alias("n_tokens"),
    ).withColumn("q_neg", -F.col("quality"))
    ranked = grouped_running_sum(
        base, ["source"], ["q_neg", "doc_id"], "n_tokens",
        out="cum_tokens")
    budget = (F.lit(1500)
              + F.lit(500) * F.pmod(F.expr("substr(source, 4)").cast("long"),
                                    F.lit(3)))
    return (
        ranked.filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "source", "quality", "n_tokens",
                F.col("cum_tokens").cast("bigint").alias("cum_tokens"))
    )


_BUDGET_SQL = """
WITH base AS (
  SELECT doc_id, source,
         round(len(list_distinct(string_split(text, ' ')))
               / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS quality,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), ranked AS (
  SELECT doc_id, source, quality, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality DESC, doc_id) AS cum_tokens
  FROM base
)
SELECT doc_id, source, quality, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM ranked
WHERE cum_tokens <= 1500 + 500 * (CAST(substring(source, 4) AS BIGINT) % 3)
"""


def select_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling, Efraimidis–Spirakis A-ES (Inf.
    Process. Lett. 97(5), 2006): per source keep the k=20 documents
    with the largest key ln(u)/w, where u is a deterministic hash-
    uniform in (0,1] (md5 of doc_id — reproducible run-over-run and
    engine-independent, the same discipline as mix_domains' bucket
    cut) and the weight w is the document's token count — a one-pass,
    merge-able weighted sample, the distributed-reservoir shape
    (each partition keeps its local top-k by key; the merge keeps the
    global top-k — exactly what WindowGroupLimit does map-side before
    the single per-source exchange).  Keys round to 6 dp before
    ranking (cross-engine float discipline), ties break on doc_id."""
    docs = t(spark, sf_dir, "documents")
    w = F.size(F.split(F.col("text"), " ")).cast("double")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(4294967296.0)
    base = docs.select(
        "doc_id", "source",
        w.cast("long").alias("n_tokens"),
        # ln rounds to 9 dp BEFORE the division: the JVM's Math.log
        # and DuckDB's libm log differ in the last ulp, which the
        # outer 6-dp round alone would let flip a midpoint key
        # (round-13 review — the discipline every llm3 log site uses)
        round_half_away_col(
            round_half_away_col(F.log(u), 9) / w, 6).alias("es_key"),
    ).filter(F.col("n_tokens") > 0)
    win = Window.partitionBy("source").orderBy(
        F.col("es_key").desc(), "doc_id")
    return (
        base.withColumn("rk", F.row_number().over(win).cast("long"))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "source", "n_tokens", "es_key", "rk")
    )


_WSAMPLE_SQL = """
WITH base AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         round(round(ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                          1, 8) AS BIGINT) + 1.0)
                  / 4294967296.0), 9)
               / len(string_split(text, ' ')), 6) AS es_key
  FROM documents
)
SELECT doc_id, source, n_tokens, es_key, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
    ORDER BY es_key DESC, doc_id) AS BIGINT) AS rk
  FROM base WHERE n_tokens > 0
) WHERE rk <= 20
"""


def mix_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per source: KL(p_source ‖ p_corpus) over the
    unigram word distributions — the distribution-matching diagnostic
    of corpus curation (which sources deviate most from the mixture
    they feed; DSIR's importance weights are the per-document version
    of the same ratio).  KL = Σ_w p·ln(p/q) with p = c_sw/c_s and
    q = c_w/c_total; q > 0 wherever p > 0 by construction (every
    source word is a corpus word), so the sum is total and ≥ 0.
    Each term is rounded to 9 dp BEFORE the decimal cast so both
    engines sum the same decimal-grid values (Spark's double→decimal
    cast goes through the shortest-repr BigDecimal while DuckDB casts
    the exact binary value — same divergence class functions/numeric.py
    documents for F.round).

    Shapes: one explode + (source, word) count (map-side combinable),
    word totals equi-joined on word, source totals broadcast, the
    corpus total a one-row broadcast cross (same scalar-dimension
    shape as mix_domains — lint-waived with the same reason).  Terms
    accumulate as DECIMAL(38,12) before the final round so the sum is
    partition-order-proof."""
    docs = t(spark, sf_dir, "documents")
    wc = (
        docs.select("source",
                    F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wc = _cache(wc)
    st = wc.groupBy("source").agg(F.sum("c").alias("cs"))
    wt = wc.groupBy("word").agg(F.sum("c").alias("cw"))
    tot = wc.agg(F.sum("c").alias("ct"))
    # the ln itself rounds to 9 dp before the p-multiply: a last-ulp
    # log difference scaled by p could otherwise straddle the outer
    # 9-dp term grid (round-13 review; same fix as es_key)
    term = (F.col("c") / F.col("cs")) * round_half_away_col(F.log(
        (F.col("c") / F.col("cs")) / (F.col("cw") / F.col("ct"))), 9)
    return (
        wc.join(F.broadcast(st), "source")
        .join(wt, "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            round_half_away_col(
                F.sum(round_half_away_col(term, 9).cast("decimal(38,12)"))
                .cast("double"),
                6).alias("kl"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )


_KL_SQL = """
WITH wc AS MATERIALIZED (
  SELECT source, word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents)
  GROUP BY 1, 2
), st AS (
  SELECT source, sum(c) AS cs FROM wc GROUP BY 1
), wt AS (
  SELECT word, sum(c) AS cw FROM wc GROUP BY 1
), tot AS (
  SELECT sum(c) AS ct FROM wc
)
SELECT source,
       round(CAST(SUM(CAST(round((c / cs) * round(ln((c / cs) / (cw / ct)), 9), 9)
                           AS DECIMAL(38,12))) AS DOUBLE), 6) AS kl,
       CAST(count(*) AS BIGINT) AS n_terms
FROM wc JOIN st USING (source) JOIN wt USING (word) CROSS JOIN tot
GROUP BY source
"""


def fn_isbn_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identifier hygiene for the books domain
    (`data-linking/check-isbn-in-lobid.R:15,40-43` trusts its isbn
    column; validate before spending lookups): normalize hyphenated
    forms, verify both checksums, canonicalize to ISBN-13.  Fixture
    ISBNs derive from partkeys — roughly a tenth checksum-valid by
    construction, plus an outright-junk class."""
    from .functions.strings import isbn_parts

    p = t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    d9 = F.lpad((pk % 1000000000).cast("string"), 9, "0")
    raw = (
        F.when(pk % 3 == 0,
               F.concat(F.lit("978-"), F.substring(d9, 1, 3), F.lit("-"),
                        F.substring(d9, 4, 6), F.lit("-"),
                        (pk % 10).cast("string")))
        .when(pk % 3 == 1,
              F.concat(F.substring(d9, 1, 1), F.lit("-"),
                       F.substring(d9, 2, 8), F.lit("-"),
                       F.when(pk % 11 == 10, F.lit("X"))
                        .otherwise((pk % 11).cast("string"))))
        .otherwise(F.concat(F.lit("no-isbn-"), pk.cast("string")))
    )
    base = p.select("p_partkey", raw.alias("raw_isbn"))
    clean, fmt, valid, isbn13 = isbn_parts(F.col("raw_isbn"))
    return base.select(
        "p_partkey", "raw_isbn", clean.alias("clean"), fmt.alias("format"),
        valid.alias("valid"), isbn13.alias("isbn13"))


_ISBN_SQL = """
WITH base AS (
  SELECT p_partkey,
         CASE
           WHEN p_partkey % 3 = 0 THEN
             '978-' || substring(d9, 1, 3) || '-' || substring(d9, 4, 6)
             || '-' || CAST(p_partkey % 10 AS VARCHAR)
           WHEN p_partkey % 3 = 1 THEN
             substring(d9, 1, 1) || '-' || substring(d9, 2, 8) || '-'
             || CASE WHEN p_partkey % 11 = 10 THEN 'X'
                     ELSE CAST(p_partkey % 11 AS VARCHAR) END
           ELSE 'no-isbn-' || CAST(p_partkey AS VARCHAR)
         END AS raw_isbn
  FROM (SELECT p_partkey,
               lpad(CAST(p_partkey % 1000000000 AS VARCHAR), 9, '0') AS d9
        FROM part)
), cleaned AS (
  SELECT p_partkey, raw_isbn,
         regexp_replace(upper(raw_isbn), '[^0-9X]', '', 'g') AS clean
  FROM base
), scored AS (
  SELECT *,
         regexp_matches(clean, '^[0-9]{13}$') AS shape13,
         regexp_matches(clean, '^[0-9]{9}[0-9X]$') AS shape10,
         CASE WHEN regexp_matches(clean, '^[0-9]{13}$') THEN
           list_sum(list_transform(range(1, 13), i ->
             TRY_CAST(substring(clean, CAST(i AS INTEGER), 1) AS INT)
             * CASE WHEN i % 2 = 1 THEN 1 ELSE 3 END)) END AS sum13,
         CASE WHEN regexp_matches(clean, '^[0-9]{9}[0-9X]$') THEN
           list_sum(list_transform(range(1, 10), i ->
             TRY_CAST(substring(clean, CAST(i AS INTEGER), 1) AS INT)
             * (11 - i)))
           + CASE WHEN substring(clean, 10, 1) = 'X' THEN 10
                  ELSE TRY_CAST(substring(clean, 10, 1) AS INT) END END AS sum10
  FROM cleaned
), verdicts AS (
  SELECT p_partkey, raw_isbn, clean,
         shape13 AND ((10 - sum13 % 10) % 10)
             = TRY_CAST(substring(clean, 13, 1) AS INT) AS valid13,
         shape10 AND sum10 % 11 = 0 AS valid10
  FROM scored
)
SELECT p_partkey, raw_isbn, clean,
       CASE WHEN valid13 THEN 'isbn13' WHEN valid10 THEN 'isbn10'
            ELSE 'invalid' END AS format,
       (valid13 OR valid10) AS valid,
       CASE WHEN valid13 THEN clean
            WHEN valid10 THEN
              '978' || substring(clean, 1, 9) ||
              CAST((10 - list_sum(list_transform(range(1, 13), i ->
                 TRY_CAST(substring('978' || substring(clean, 1, 9),
                                CAST(i AS INTEGER), 1) AS INT)
                 * CASE WHEN i % 2 = 1 THEN 1 ELSE 3 END)) % 10) % 10
                AS VARCHAR)
            END AS isbn13
FROM verdicts
"""



def corpus_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length quantiles (p50/p90/p99) + mean — the
    corpus length profile every mix/filter decision starts from.  Exact
    interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``), map-side-combinable aggregation per source; for
    approximate-at-scale swap ``percentile_approx`` (same plan shape,
    sketch-mergeable)."""
    docs = t(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " ")).cast("double")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round_half_away_col(F.percentile(n, 0.5), 6).alias("p50"),
            round_half_away_col(F.percentile(n, 0.9), 6).alias("p90"),
            round_half_away_col(F.percentile(n, 0.99), 6).alias("p99"),
            round_half_away_col(F.avg(n), 6).alias("mean_len"),
        )
    )


_QUANTILES_SQL = """
SELECT source,
       count(*) AS n_docs,
       round(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE), 0.5), 6) AS p50,
       round(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE), 0.9), 6) AS p90,
       round(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE), 0.99), 6) AS p99,
       round(avg(len(string_split(text, ' '))), 6) AS mean_len
FROM documents GROUP BY source
"""

# ---------------------------------------------------------------------------
# Temperature-scaled domain mixing + incremental cross-snapshot dedup
# ---------------------------------------------------------------------------

def mix_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain sampling (the multilingual-LM mixing
    rule): sampling share q_s ∝ p_s^α with α=0.5, flattening the
    language distribution so small languages are upweighted relative to
    their raw share.  α=0.5 keeps the pipeline bit-deterministic across
    engines — p^0.5 is IEEE sqrt, correctly rounded everywhere, unlike
    a general pow/ln chain.  Target rows per source = N·√n_s / Σ√n_j,
    applied as a keep-rate (capped at 1 — oversampling beyond 1×
    replicates, a separate op) through the same deterministic md5
    bucket cut as :func:`mix_domains`.

    Plan shape: per-source counts (map-side combinable) → one-row
    totals frame (√ sums pass through DECIMAL so partial-agg order
    can't change bits) → broadcast rate dim joined to the corpus scan.
    No collect, no driver loop; at 100 TB the rate table is one row
    per source."""
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total"),
        # √cnt rounds to 9 dp BEFORE the decimal cast — Spark's
        # double→decimal goes through the SHORTEST-REPR BigDecimal
        # while DuckDB casts the exact binary value, so an unrounded
        # cast can differ by 1e-10 and flip a floor()ed keep threshold
        # (the same hazard mix_kl_divergence guards; review fix)
        F.sum(round_half_away_col(F.sqrt(F.col("cnt")), 9)
              .cast("decimal(28,10)"))
         .cast("double").alias("z"),
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "lang",
        F.least(
            F.lit(10000).cast("long"),
            F.floor(F.lit(10000.0) * F.col("total") * F.sqrt(F.col("cnt"))
                    / (F.col("z") * F.col("cnt"))).cast("long"),
        ).alias("thresh"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
               16, 10).cast("long"),
        F.lit(10000),
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("thresh"))
        .select("doc_id", "lang")
    )


_MIX_TEMP_SQL = """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY 1
),
totals AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(SUM(CAST(round(sqrt(cnt), 9) AS DECIMAL(28,10))) AS DOUBLE) AS z
  FROM counts
),
rates AS (
  SELECT lang,
         least(10000, CAST(floor(10000.0 * total * sqrt(cnt)
                                 / (z * cnt)) AS BIGINT)) AS thresh
  FROM counts CROSS JOIN totals
)
SELECT doc_id, d.lang
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
      % 10000 < r.thresh
"""


def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-snapshot dedup: keep NEW documents (every 5th
    doc_id — the freshly crawled batch) that have no MinHash-band
    collision with the EXISTING corpus (the rest) — the
    dedupe-new-against-old step every recurring crawl pipeline runs.

    One signature pass over all docs, bands exploded once; new-side
    bands left-semi join corpus bands on (band, bucket) → collided new
    ids; kept = new ids anti-join collided.  Shuffle ∝ band rows +
    collisions, never new×corpus; the corpus side would be a
    pre-materialized signature table in production (signatures are
    per-row and additive, so snapshots append)."""
    from .operators.dedup import minhash_bands, minhash_signature, shingles

    docs = t(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", "text", 3)
    sig = minhash_signature(sh, 12)
    bands = _cache(minhash_bands(sig, 12, 3))
    new_b = bands.filter(F.col("id") % 5 == 0)
    corp_b = bands.filter(F.col("id") % 5 != 0)
    collided = (
        new_b.join(corp_b, ["band", "bucket"], "left_semi")
        .select("id").distinct()
    )
    return (
        docs.filter(F.col("doc_id") % 5 == 0)
        .join(collided.withColumnRenamed("id", "doc_id"),
              "doc_id", "left_anti")
        .select("doc_id", "source")
    )


# tokenizer/shingle/signature/band fragments are IMPORTED from
# queries_llm (one copy of the scheme — a parameter change there must
# reach this oracle too, same rule as the _SPAN_TOKS import below)
from .queries_llm import _BANDS as _BANDS12  # noqa: E402
from .queries_llm import _MINS as _MINS12  # noqa: E402
from .queries_llm import _SHINGLE_CTE as _INCR_SHINGLE_CTE  # noqa: E402

_INCR_DEDUP_SQL = f"""
WITH {_INCR_SHINGLE_CTE},
sig AS (SELECT doc_id, {_MINS12} FROM sh GROUP BY doc_id),
bands AS ({_BANDS12}),
collided AS (
  SELECT DISTINCT n.doc_id
  FROM bands n JOIN bands c
    ON n.band = c.band AND n.bucket = c.bucket
   AND n.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
)
SELECT d.doc_id, d.source
FROM documents d
WHERE d.doc_id % 5 = 0
  AND d.doc_id NOT IN (SELECT doc_id FROM collided)
"""


def decon_overlap_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decontamination WITH EVIDENCE (round 6): every verbatim
    ≥12-token occurrence of an eval-set document inside a training
    document, located to the token — the audit trail the n-gram flag
    (`decon_ngram_overlap`) and the Bloom pre-pass can't give.
    Eval split is doc_id % 5 (NOT the % 97 convention of the other
    decon entries: the sparse split leaves the eval slice with zero
    exact overlaps at the driver's sf0.01 — a vacuous always-empty
    check; % 5 intersects real near-dup families at every tested SF
    so the span math stays under the value hash).  Cross-corpus mode
    of `operators/dedup.py::overlap_spans`."""
    from .operators.dedup import overlap_spans

    docs = t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    ev = docs.filter(F.col("doc_id") % 5 == 0)
    return overlap_spans(train, "doc_id", "text", k=8, min_len=12,
                         other=ev)


# the span oracle must tokenize exactly like the dedup oracles — one
# shared fragment, not a copy that can drift
from .queries_llm import _TOKS as _SPAN_TOKS  # noqa: E402

_DECON_SPANS_SQL = f"""
WITH toks AS (SELECT doc_id, {_SPAN_TOKS} AS w FROM documents),
kg AS (
  SELECT doc_id AS id, CAST(i - 1 AS BIGINT) AS pos,
         md5(array_to_string(w[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)], ' ')) AS h
  FROM toks, unnest(range(1, len(w) - 6)) u(i)
),
anchors AS (
  SELECT a.id AS id_1, b.id AS id_2, a.pos AS pos_1, b.pos AS pos_2
  FROM kg a JOIN kg b ON a.h = b.h
  WHERE a.id % 5 <> 0 AND b.id % 5 = 0
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


SPECS: dict[str, QuerySpec] = {
    "decon_overlap_spans": QuerySpec(
        decon_overlap_spans, _DECON_SPANS_SQL,
        "exact decontamination with evidence: token-located verbatim "
        "eval-set spans inside training docs"),
    "mix_temperature_sample": QuerySpec(
        mix_temperature_sample, _MIX_TEMP_SQL,
        "temperature-scaled (α=0.5) domain mixing with deterministic "
        "hash cut — √ keeps it bit-identical across engines"),
    "dedup_incremental_minhash": QuerySpec(
        dedup_incremental_minhash, _INCR_DEDUP_SQL,
        "incremental cross-snapshot dedup: new batch anti-joined "
        "against corpus MinHash bands"),
    "decon_ngram_overlap": QuerySpec(
        decon_ngram_overlap, _DECON_SQL,
        "eval-set decontamination via word-n-gram overlap join"),
    "decon_bloom_prefilter": QuerySpec(
        decon_bloom_prefilter, _BLOOM_SQL,
        "Bloom-filter decontamination pre-pass (broadcast bits, no "
        "train-side shuffle)"),
    "text_rarity_score": QuerySpec(
        text_rarity_score, _RARITY_SQL,
        "per-doc mean token commonness band (integer log2 buckets) — "
        "the deterministic stand-in for LM-perplexity quality filters"),
    "pack_sequences": QuerySpec(
        pack_sequences, _PACK_SQL,
        "per-shard concat-and-chunk sequence packing"),
    "mix_domains": QuerySpec(
        mix_domains, _MIX_SQL,
        "weighted domain-mix resampling with deterministic hash cut"),
    "dedup_remove_boilerplate": QuerySpec(
        dedup_remove_boilerplate, _BOILERPLATE_SQL,
        "frequent-n-gram boilerplate removal (positional anti-join, "
        "ordered reassembly)"),
    "ann_ivf_pq_topk": QuerySpec(
        ann_ivf_pq_topk_q, _IVF_PQ_SQL,
        "IVF-PQ (IVFADC): coarse-cell candidate restriction + "
        "compressed-domain ADC scoring"),
    "ann_ivf_pq_residual_topk": QuerySpec(
        ann_ivf_pq_residual_topk_q, _IVF_PQ_RES_SQL,
        "residual IVFADC: PQ codebooks over x − centroid(cell), "
        "scoring seeds the ADC fold with dot(q, centroid)"),
    "ann_pq_topk": QuerySpec(
        ann_pq_topk_q, _PQ_SQL,
        "product-quantization ANN top-3: per-subspace L2 codebooks, "
        "ADC via code-indexed lookup tables"),
    "ann_kmeans_cells": QuerySpec(
        ann_kmeans_cells_q, _KMEANS_SQL,
        "distributed deterministic Lloyd's k-means fit (unrolled-CTE "
        "oracle), the real IVF quantizer"),
    "select_token_budget": QuerySpec(
        select_token_budget, _BUDGET_SQL,
        "greedy per-source token-budget selection via two-pass grouped "
        "running sum (no per-source window funnel)"),
    "select_weighted_sample": QuerySpec(
        select_weighted_sample, _WSAMPLE_SQL,
        "Efraimidis-Spirakis weighted reservoir sample per source "
        "(deterministic hash-uniform, ln(u)/w keys)"),
    "mix_kl_divergence": QuerySpec(
        mix_kl_divergence, _KL_SQL,
        "per-source KL(p_source || p_corpus) over unigram "
        "distributions, decimal-summed"),
    "fn_isbn_validate": QuerySpec(
        fn_isbn_validate, _ISBN_SQL,
        "ISBN normalize + dual checksum validation + ISBN-13 "
        "canonicalization, pure codegen"),
    "corpus_length_quantiles": QuerySpec(
        corpus_length_quantiles, _QUANTILES_SQL,
        "per-source exact length quantiles (percentile == quantile_cont)"),
    "fn_transliterate_names": QuerySpec(
        fn_transliterate_names, _TRANSLIT_SQL,
        "Latin-ASCII transliteration oracle (F2)"),
}
