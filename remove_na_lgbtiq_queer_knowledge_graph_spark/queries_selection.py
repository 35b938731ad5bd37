"""Round-13b selection tier: URL-level dedup and diversity coresets.

Two curation selectors a 100 TB training-data pipeline runs before any
content-level pass:

- **URL canonicalization dedup** — crawl pipelines (CCNet, RefinedWeb)
  dedupe on the canonical URL first because it removes the bulk of
  recrawl duplicates for the cost of a string kernel, before any
  shingling/minhashing touches the text.  The kernel
  (:func:`..functions.strings.canonical_url`) is a pure column
  expression — whole-stage codegen, zero UDFs — and the dedupe is one
  map-side-combinable groupBy.
- **Greedy k-center coreset** — diversity selection (keep k maximally
  spread exemplars, attribute every vector to its nearest exemplar);
  the farthest-point 2-approximation (Gonzalez 1985) behind coreset /
  facility-location data selection.  Fit on a bounded driver sample
  (the kmeans_centroids scale contract), ONE shuffle-free full-corpus
  assignment pass.

The documents table has no URL column, so the URL query SYNTHESIZES a
deterministic messy URL per doc (mixed-case scheme/host, default port,
tracking params, unordered params, fragment, trailing slash) from
doc_id arithmetic — identically in Spark and in the DuckDB oracle — and
the operator under test is the canonicalization itself: docs whose
synthesized URLs differ only in insignificant parts must collapse to
one canonical key on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.strings import canonical_url
from .spec import QuerySpec, t


def _synth_messy_url() -> F.Column:
    """The deterministic messy-URL synthesis shared by the batch dedup
    and its streaming twin (ONE copy — the oracle mirror lives in
    :data:`_URL_CANON_CTES`): mixed-case scheme/host, default port,
    tracking params, unordered params, fragment, trailing slash, all
    keyed on doc_id arithmetic."""
    d = F.col("doc_id")
    h = F.pmod(d, F.lit(3)).cast("string")
    scheme = F.when(F.pmod(d, F.lit(2)) == 0, F.lit("https")) \
              .otherwise(F.lit("HTTPS"))
    host = F.when(
        F.pmod(d, F.lit(2)) == 0,
        F.concat(F.lit("www.host"), h, F.lit(".example.com")),
    ).otherwise(F.concat(F.lit("WWW.Host"), h, F.lit(".Example.COM")))
    port = F.when(F.pmod(d, F.lit(5)) == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/p/"), F.pmod(d, F.lit(25)).cast("string"),
        F.when(F.pmod(d, F.lit(7)) == 0, F.lit("/")).otherwise(F.lit("")))
    idp = F.concat(F.lit("id="), F.pmod(d, F.lit(4)).cast("string"))
    qs = F.when(
        F.pmod(d, F.lit(2)) == 0, F.concat(idp, F.lit("&a=1")),
    ).otherwise(F.concat(F.lit("a=1&"), idp, F.lit("&utm_source=feed")))
    qs = F.when(F.pmod(d, F.lit(11)) == 0,
                F.concat(qs, F.lit("&fbclid=AbC123"))).otherwise(qs)
    frag = F.when(F.pmod(d, F.lit(6)) == 0,
                  F.concat(F.lit("#sec"), h)).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, F.lit("?"), qs,
                    frag)


def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup: synthesize the messy URL, canonicalize
    with the codegen kernel, keep-first (min doc_id) per canonical key
    with the duplicate-group size.  One narrow projection + one
    map-side-combinable groupBy — no window, no self-join; at 100 TB the
    shuffle carries only (canonical_url, partial min, partial count)."""
    return (
        t(spark, sf_dir, "documents")
        .select(canonical_url(_synth_messy_url()).alias("canonical_url"),
                "doc_id")
        .groupBy("canonical_url")
        .agg(F.min("doc_id").cast("bigint").alias("kept_doc_id"),
             F.count("*").cast("bigint").alias("n_dupes"))
    )


# The oracle mirrors BOTH halves — synthesis (same doc_id arithmetic as
# _synth_messy_url) and canonicalization (same regexes, same
# tracking-param pattern as functions/strings.TRACKING_PARAM_RE, same
# sort-and-rejoin).  ONE copy of the CTE prefix, shared by the batch
# dedup oracle and the streaming twin's oracle.
_URL_CANON_CTES = r"""
WITH raw AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://'
    || (CASE WHEN doc_id % 2 = 0
             THEN 'www.host' || (doc_id % 3) || '.example.com'
             ELSE 'WWW.Host' || (doc_id % 3) || '.Example.COM' END)
    || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
    || '/p/' || (doc_id % 25)
    || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
    || '?'
    || (CASE WHEN doc_id % 2 = 0 THEN 'id=' || (doc_id % 4) || '&a=1'
             ELSE 'a=1&id=' || (doc_id % 4) || '&utm_source=feed' END)
    || (CASE WHEN doc_id % 11 = 0 THEN '&fbclid=AbC123' ELSE '' END)
    || (CASE WHEN doc_id % 6 = 0 THEN '#sec' || (doc_id % 3) ELSE '' END)
    AS url
  FROM documents
), parts AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
    regexp_extract(regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^([^@]*@)', 1)
          AS uinfo,
    lower(regexp_replace(regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^[^@]*@', ''))
          AS hp,
    regexp_replace(regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
          '/+$', '') AS pth0,
    coalesce(array_to_string(list_sort(list_filter(
        string_split(regexp_extract(url, '^[^#]*\?([^#]*)', 1), '&'),
        p -> p != '' AND NOT regexp_matches(
               p, '(?i)^(utm_[^=]*|fbclid|gclid|ref)(=|$)'))), '&'), '')
        AS q  -- coalesce: DuckDB array_to_string([]) is NULL, Spark's ''
  FROM raw
), canon AS (
  SELECT doc_id,
    CASE WHEN sch = '' THEN NULL ELSE
    sch || '://' || uinfo
    || (CASE WHEN (sch = 'https' AND hp LIKE '%:443')
               OR (sch = 'http' AND hp LIKE '%:80')
             THEN regexp_replace(hp, ':[0-9]+$', '') ELSE hp END)
    || (CASE WHEN pth0 = '' THEN '/' ELSE pth0 END)
    || (CASE WHEN q = '' THEN '' ELSE '?' || q END) END AS canonical_url
  FROM parts
)"""

_URL_SQL = _URL_CANON_CTES + """
SELECT canonical_url,
       CAST(min(doc_id) AS BIGINT) AS kept_doc_id,
       CAST(count(*) AS BIGINT) AS n_dupes
FROM canon GROUP BY canonical_url
"""


def _url_dedupe_stream(stream: DataFrame, scratch: str) -> DataFrame:
    """Streaming first-seen-wins URL-canonical dedupe — the stream twin
    of :func:`dedup_url_canonical`, and the FIRST pass a recrawl stream
    runs (before any content shingling): each micro-batch canonicalizes
    its URLs with the same codegen kernel, drops docs whose canonical
    key exists in the ACCUMULATED canonical store (all earlier batches)
    or belongs to a lower-id doc inside the batch, emits the keepers,
    and appends its distinct canonicals to the store.

    First-seen-wins is doc_id order (arrival order), so the result is
    identical under any id-ordered micro-batch split — the
    ``_dedup_minhash_stream`` determinism contract, pinned by the
    stream≡batch equality test.

    100 TB design: state is the DISTINCT canonical-URL set — ONE row
    per unique page, the smallest state any dedupe tier carries (the
    ``stream_cms_buckets`` bounded-state discipline) — and the
    per-batch check is an equi-join of batch canonicals against it,
    never batch×corpus.  In production the store is a bucketed table
    compacted on the ``_scd2_apply_stream`` changelog schedule."""
    import os as _os

    from pyspark.sql import Window

    spark = stream.sparkSession
    store = _os.path.join(scratch, "canon_store")
    kept_dir = _os.path.join(scratch, "kept")
    state = {"has_store": False, "has_kept": False}

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sp = batch.sparkSession
        canon = batch.select(
            "doc_id",
            canonical_url(_synth_messy_url()).alias("canonical_url"))
        from .spec import materialize

        canon = materialize(canon)  # feeds the check, the emit, the store
        if state["has_store"]:
            prev = sp.read.parquet(store)
            seen = canon.join(prev, "canonical_url", "left_semi") \
                        .select("doc_id")
        else:
            seen = canon.select("doc_id").limit(0)
        w = Window.partitionBy("canonical_url")
        dup_in = (canon.withColumn("__min", F.min("doc_id").over(w))
                  .filter(F.col("doc_id") > F.col("__min"))
                  .select("doc_id"))
        dropped = seen.unionByName(dup_in).distinct()
        kept = canon.join(dropped, "doc_id", "left_anti")
        kept.write.mode("append").parquet(kept_dir)
        state["has_kept"] = True
        # append AFTER the check — a batch must not collide with itself
        # through the store
        canon.select("canonical_url").distinct() \
             .write.mode("append").parquet(store)
        state["has_store"] = True

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", _os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not state["has_kept"]:
        return spark.createDataFrame(
            [], "doc_id long, canonical_url string")
    return spark.read.parquet(kept_dir)


def stream_url_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming first-seen-wins URL-canonical dedupe over the documents
    stream — see :func:`_url_dedupe_stream`."""
    from .queries_streaming import read_documents_stream
    from .spec import scratch_dir

    return _url_dedupe_stream(
        read_documents_stream(spark, sf_dir),
        scratch_dir("url_dedupe_stream_"))


_STREAM_URL_SQL = _URL_CANON_CTES + """
SELECT doc_id, canonical_url FROM (
  SELECT doc_id, canonical_url,
         ROW_NUMBER() OVER (PARTITION BY canonical_url
                            ORDER BY doc_id) AS rn
  FROM canon
) WHERE rn = 1
"""


def select_kcenter_coreset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (k=6) over the embeddings corpus, fit on
    the deterministic half-sample (vec_id % 2 = 0, the kmeans oracle's
    sample predicate), full-corpus nearest-exemplar assignment."""
    from .operators.ann import kcenter_coreset

    v = t(spark, sf_dir, "embeddings")
    return kcenter_coreset(v, k=6, sample_mod=2)


def _kcenter_oracle_sql(k: int, decimals: int = 6, sample_mod: int = 2) -> str:
    """Unrolled greedy farthest-point selection as chained CTEs (the
    kmeans-oracle idiom): s1 = lowest sample id; s_{i+1} adds the sample
    vector maximizing min over selected of round(d2, 6), ties to the
    lowest vec_id; final full-corpus assignment = argmin rounded d2,
    ties to the lowest exemplar id.  Squared L2 assembled from the same
    three dot products the numpy fit folds
    (dot(x,x) - 2·dot(x,c) + dot(c,c))."""
    d2 = ("round(list_dot_product({v}.cv, {v}.cv)"
          " - 2 * list_dot_product({v}.cv, s.cent_v)"
          " + list_dot_product(s.cent_v, s.cent_v), " + str(decimals) + ")")
    out = [f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), vf AS (
  SELECT * FROM v WHERE vec_id % {sample_mod} = 0
), s1 AS (
  SELECT CAST(vec_id AS BIGINT) AS cent_id, cv AS cent_v
  FROM vf ORDER BY vec_id LIMIT 1
)"""]
    for i in range(2, k + 1):
        out.append(f""", s{i} AS (
  SELECT * FROM s{i - 1}
  UNION ALL
  SELECT cent_id, cent_v FROM (
    SELECT CAST(f.vec_id AS BIGINT) AS cent_id, f.cv AS cent_v,
           min({d2.format(v='f')}) AS mind
    FROM vf f CROSS JOIN s{i - 1} s
    GROUP BY f.vec_id, f.cv
    ORDER BY mind DESC, cent_id LIMIT 1
  )
)""")
    out.append(f"""
SELECT vec_id, cent_id AS center_id, d2 AS d2_r FROM (
  SELECT CAST(v.vec_id AS BIGINT) AS vec_id, s.cent_id,
         {d2.format(v='v')} AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY v.vec_id
           ORDER BY {d2.format(v='v')} ASC, s.cent_id ASC) AS rn
  FROM v CROSS JOIN s{k} s
) WHERE rn = 1""")
    return "".join(out)


_KCENTER_SQL = _kcenter_oracle_sql(6, sample_mod=2)


SPECS: dict[str, QuerySpec] = {
    "dedup_url_canonical": QuerySpec(
        dedup_url_canonical, _URL_SQL,
        "URL canonicalization dedup (codegen string kernel, "
        "map-side-combinable keep-first)"),
    "select_kcenter_coreset": QuerySpec(
        select_kcenter_coreset_q, _KCENTER_SQL,
        "greedy k-center diversity coreset + nearest-exemplar coverage"),
    "stream_url_dedupe": QuerySpec(
        stream_url_dedupe, _STREAM_URL_SQL,
        "streaming first-seen-wins URL-canonical dedupe (bounded "
        "canonical-set state, stream ≡ batch)"),
}
