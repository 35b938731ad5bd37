"""Round-11 curation tier: domain upsampling, blocklist filtering,
survivorship merge, inter-arrival telemetry.

These extend the training-data pipeline surface beyond the reference's
own operators (SURVEY §2.10/§2.11 neighborhood): the reference curates a
knowledge graph by hand (entity dedupe in
`entities/02-other-duplicates.R`, per-source merges in
`data-modeling/`); a 100 TB corpus pipeline runs the same shapes as
declarative bulk ops — repeat-by-weight, deny-list filtering, per-field
survivorship, and arrival-cadence QA.

The round-11 entries are pure narrow expressions or map-side-combinable
aggregates: no cartesians, no driver loops, no Python UDFs.  The
round-12 additions relax that where the algorithm demands it —
`retrieval_rrf_fusion` crosses the corpus scan with a BOUNDED broadcast
query-vector table (waived by name in tools/lint_plans.py) and scores
through the shared Arrow-batched cosine; everything else here stays
in-contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.numeric import round_half_away_col
from .queries_llm2 import _WORDS_DUCK, _WORDS_SPARK
from .spec import QuerySpec, t


def mix_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain epoch upsampling — the replication half of data
    mixing (``mix_domains``/``mix_temperature_sample`` downsample with
    keep-rates < 1; sources whose configured weight EXCEEDS their share
    are repeated for multiple training epochs instead, the standard
    small-high-quality-domain move).

    Epochs come from configuration, not data: weight
    ``w_s = 1 + (source_number mod 3)`` (the same deterministic config
    rule as ``mix_domains``), and each doc of source s is emitted with
    ``epoch = 1..w_s``.  The whole op is one narrow projection +
    ``explode(sequence(...))`` — zero shuffles, zero joins; output
    volume is bounded by ``max(w) ×`` input, and at 100 TB the explode
    is pipelined inside the scan stage (each task fans out its own
    rows, nothing crosses the wire)."""
    docs = t(spark, sf_dir, "documents")
    # unbounded substr, matching the oracle's substring(source, 4) —
    # a 10-char cap would diverge the engines on 11+-digit source ids
    num = F.expr("try_cast(substr(source, 4) as long)")
    # fail-LOUD on malformed source ids, with a NAMED error: under
    # non-ANSI configs a bad suffix casts to NULL, sequence(1, NULL) is
    # NULL, and explode silently DROPS the document; under ANSI the
    # bare cast throws a generic CAST_INVALID_INPUT.  try_cast + the
    # in-plan raise (the interval_join bins-guard pattern) gives the
    # same loud, named failure in EITHER mode.  The DuckDB oracle hard-
    # errors on a non-numeric suffix but silently DROPS a NULL source
    # (CAST(NULL) is NULL, generate_series(1, NULL) unnests to nothing)
    # — this side stays deliberately STRICTER than the oracle on NULLs:
    # loud beats silent on malformed data, and the divergence is
    # unreachable on any row the two engines both accept (round-13
    # review corrected the earlier claim that the oracle errors too).
    # NEGATIVE suffixes are malformed too:
    # Spark's pmod is always non-negative while the oracle's % keeps
    # the sign (epochs ≤ 0 → empty generate_series → silent drop), so
    # admitting them would let the engines diverge silently — the
    # review catch on the first version of this guard.
    checked = F.when(num.isNotNull() & (num >= 0), num).otherwise(
        F.raise_error(F.concat(
            F.lit("mix_upsample_epochs: non-numeric source id ("),
            F.coalesce(F.col("source"), F.lit("NULL")),
            F.lit(")"))).cast("long"))
    epochs = F.lit(1).cast("long") + F.pmod(checked, F.lit(3))
    return docs.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1).cast("long"), epochs)).alias("epoch"),
    )


_UPSAMPLE_SQL = """
SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch FROM (
  SELECT doc_id, source,
         UNNEST(generate_series(
             1, 1 + CAST(substring(source, 4) AS BIGINT) % 3)) AS epoch
  FROM documents)
"""


_BLOCKLIST = ("slow", "broken", "stale")


def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deny-list document filter — the cheapest quality gate every
    corpus pipeline runs first (C4 dropped pages on a public "bad
    words" list; the list here is a 3-word stand-in, the mechanics are
    the list's size-independent path).

    Per doc: token count, blocked-token count, and
    ``keep = [n_blocked · 50 ≤ n_tokens]`` (≤ 2% blocked tokens) as
    0/1.  The blocklist is a literal array inside ONE codegen'd
    ``size(filter(...))`` expression — no join, no explode, no shuffle;
    a 10⁴-word real list would move to a broadcast join against the
    exploded tokens (same output contract), but below ~100 terms the
    in-expression scan beats the explode by avoiding the row blowup."""
    docs = t(spark, sf_dir, "documents")
    arr = "array(" + ",".join(f"'{w}'" for w in _BLOCKLIST) + ")"
    n_blocked = F.expr(
        f"size(filter({_WORDS_SPARK}, x -> array_contains({arr}, lower(x))))"
    ).cast("long")
    n_tokens = F.size(F.expr(_WORDS_SPARK)).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_blocked.alias("n_blocked"),
        (n_blocked * F.lit(50) <= n_tokens).cast("long").alias("keep"),
    )


# the list literal is interpolated from _BLOCKLIST (one copy, the
# shared-fragment rule — a hard-coded twin could drift from the Spark
# expression)
_BLOCK_DUCK = "[" + ", ".join(f"'{w}'" for w in _BLOCKLIST) + "]"
_N_BLOCKED_DUCK = (f"len(list_filter({_WORDS_DUCK}, "
                   f"x -> list_contains({_BLOCK_DUCK}, lower(x))))")
_BLOCKLIST_SQL = f"""
SELECT doc_id,
       CAST(len({_WORDS_DUCK}) AS BIGINT) AS n_tokens,
       CAST({_N_BLOCKED_DUCK} AS BIGINT) AS n_blocked,
       CAST({_N_BLOCKED_DUCK} * 50 <= len({_WORDS_DUCK}) AS BIGINT) AS keep
FROM documents
"""


def er_survivorship_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge — the MDM step AFTER duplicate detection: one
    golden record per entity, each field taken from the best source row
    by its own rule (the reference's entity-resolver merges fields in
    the Shiny UI, `apps/entity-resolver/index.Rmd:155-222`; this is the
    batch form).

    Entity key here is (nation, segment); rules: *latest* wins identity
    (max custkey = most recent record), *richest* wins the display name
    (arg-max by account balance, custkey tie-break), balance takes the
    max.  One map-side-combinable groupBy — ``max_by`` carries a
    (value, key) pair through partial aggregation, so no row leaves its
    partition un-combined.  The arg-max key packs (cents, custkey) into
    one BIGINT: exact while custkey < 10¹⁰, and that bound is ENFORCED
    by an in-plan raise (same fail-loud pattern as ``interval_join``'s
    bins guard) — a custkey past it would silently bleed into the cents
    field and let a poorer record out-rank a richer one, the exact
    silent-wrongness shape this repo converts to loud failures.  For
    full 100 TB id ranges widen the key to DECIMAL(38,0) or a struct
    ordering and drop the guard."""
    c = t(spark, sf_dir, "customer")
    pack_limit = 10_000_000_000
    # half-AWAY-from-zero cents (the repo's one rounding kernel):
    # `floor(x*100+0.5)` rounds half-toward-+inf, which on a negative
    # sub-cent balance (-10055.5 cents) would disagree with
    # round_half_away by one cent — unreachable on 2-dp TPC-H data but
    # kept to one kernel so the convention can't silently fork
    cents = (F.floor(F.abs(F.col("c_acctbal")) * 100 + F.lit(0.5))
             * F.signum(F.col("c_acctbal"))).cast("long")
    rich_key = F.when(
        F.col("c_custkey") < F.lit(pack_limit),
        cents * F.lit(pack_limit) + F.col("c_custkey"),
    ).otherwise(F.raise_error(F.concat(
        F.lit("er_survivorship_merge: c_custkey >= 1e10 overflows the "
              "packed arg-max key ("),
        F.col("c_custkey").cast("string"), F.lit(")"))).cast("long"))
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.max("c_custkey").alias("survivor_custkey"),
        F.max_by("c_name", "c_custkey").alias("latest_name"),
        F.max_by("c_name", rich_key).alias("richest_name"),
        F.max("c_acctbal").cast("double").alias("best_acctbal"),
    )


_SURVIVORSHIP_SQL = """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_records,
       max(c_custkey) AS survivor_custkey,
       arg_max(c_name, c_custkey) AS latest_name,
       arg_max(c_name, CAST(floor(abs(c_acctbal) * 100 + 0.5)
                            * sign(c_acctbal) AS BIGINT)
                       * 10000000000 + c_custkey) AS richest_name,
       CAST(max(c_acctbal) AS DOUBLE) AS best_acctbal
FROM customer GROUP BY c_nationkey, c_mktsegment
"""


def ts_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival cadence (count, mean, p50, p95, max
    gap in µs) — the arrival-rate QA behind watermark sizing: the
    ``withWatermark`` delays in the stream_* twins are justified by
    exactly this distribution.

    Gap = µs since the same USER's previous event (total order
    ``(ts, event_id)``, the established tie-break), attributed to the
    later event's type.  Gaps are integer-valued doubles, so the mean's
    partial-sum order cannot change bits (exact integer sums below
    2⁵³); p50/p95 use exact interpolated percentiles (Spark
    ``percentile`` == DuckDB ``quantile_cont``, the
    corpus_length_quantiles parity) — at 100 TB swap
    ``percentile_approx`` for the sketch-mergeable same-shape plan."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = (us - F.lag(us).over(w)).cast("double")
    return (
        e.select("event_type", gap.alias("gap"))
        .filter(F.col("gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            round_half_away_col(F.avg("gap"), 6).alias("mean_gap_us"),
            round_half_away_col(F.percentile(F.col("gap"), 0.5), 6)
             .alias("p50_gap_us"),
            round_half_away_col(F.percentile(F.col("gap"), 0.95), 6)
             .alias("p95_gap_us"),
            F.max("gap").alias("max_gap_us"),
        )
    )


_INTERARRIVAL_SQL = """
WITH g AS (
  SELECT event_type,
         CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS gap
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(avg(gap), 6) AS mean_gap_us,
       round(quantile_cont(gap, 0.5), 6) AS p50_gap_us,
       round(quantile_cont(gap, 0.95), 6) AS p95_gap_us,
       max(gap) AS max_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Round 12: mergeable quantile sketch + hybrid retrieval fusion
# ---------------------------------------------------------------------------

_QSK_QS = (0.5, 0.9, 0.99)
_QSK_ACC = 10_000          # percentile_approx accuracy: rank error <= n/ACC


def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch with an oracle-checked error contract —
    the 100 TB path ``corpus_length_quantiles`` and
    ``ts_interarrival_stats`` document ("swap ``percentile_approx``"),
    made real the way ``agg_sketch_distinct`` did for HLL.

    Per source: doc-length p50/p90/p99 via ``percentile_approx``
    (Greenwald–Khanna sketch: O(1/ε·log εn) mergeable state per group,
    one pass, partial-aggregated map-side — vs the exact ``percentile``,
    which buffers every value of the group).  Raw sketch outputs are
    algorithm-internal (merge-order may move them within the bound), so
    the entry emits the *guarantee*, not the raw value: the sketch
    promises the returned element's rank is within ``ε·n`` of ``q·n``
    (ε = 1/accuracy); the plan broadcast-joins the per-source sketch
    results back to the lengths and counts ``lt = #{len < v}`` /
    ``le = #{len <= v}``, so v's feasible rank interval is
    ``[lt+1, le]`` — the boolean asserts it intersects
    ``[q·n − ε·n − 1, q·n + ε·n + 1]`` (+1 absorbs rank discreteness).
    Exact interpolated quantiles ride along as the oracle anchor
    (Spark ``percentile`` == DuckDB ``quantile_cont``); the oracle
    states them plus literal TRUE, so a sketch regression breaks the
    hash.  At 100 TB drop the exact columns and the rank audit and keep
    the one-pass sketch aggregate — the plan shape is unchanged."""
    docs = t(spark, sf_dir, "documents")
    lens = docs.select(
        "source",
        F.size(F.split(F.col("text"), " ")).cast("double").alias("len"))
    sk = lens.groupBy("source").agg(
        F.percentile_approx(
            "len", F.array(*[F.lit(q) for q in _QSK_QS]), F.lit(_QSK_ACC)
        ).alias("qs"))
    j = lens.join(F.broadcast(sk), "source")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    for i, q in enumerate(_QSK_QS):
        tag = f"p{int(round(q * 100))}"
        aggs.append(round_half_away_col(F.percentile(F.col("len"), q), 6)
                    .alias(f"{tag}_exact"))
        aggs.append(F.sum(F.when(F.col("len") <= F.col("qs").getItem(i), 1)
                          .otherwise(0)).cast("long").alias(f"__le{i}"))
        aggs.append(F.sum(F.when(F.col("len") < F.col("qs").getItem(i), 1)
                          .otherwise(0)).cast("long").alias(f"__lt{i}"))
    g = j.groupBy("source").agg(*aggs)
    n = F.col("n_docs").cast("double")
    tol = n / F.lit(float(_QSK_ACC)) + F.lit(1.0)
    sel = [F.col("source"), F.col("n_docs")]
    for i, q in enumerate(_QSK_QS):
        tag = f"p{int(round(q * 100))}"
        ok = (
            (F.col(f"__lt{i}").cast("double") + F.lit(1.0)
             <= F.lit(q) * n + tol)
            & (F.col(f"__le{i}").cast("double") >= F.lit(q) * n - tol)
        )
        sel += [F.col(f"{tag}_exact"), ok.alias(f"{tag}_rank_ok")]
    return g.select(*sel)


_LEN_DUCK = "CAST(len(string_split(text, ' ')) AS DOUBLE)"
_QSKETCH_SQL = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont({_LEN_DUCK}, 0.5), 6) AS p50_exact,
       true AS p50_rank_ok,
       round(quantile_cont({_LEN_DUCK}, 0.9), 6) AS p90_exact,
       true AS p90_rank_ok,
       round(quantile_cont({_LEN_DUCK}, 0.99), 6) AS p99_exact,
       true AS p99_rank_ok
FROM documents GROUP BY source
"""


_RRF_K = 60


def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion — the standard
    lexical+dense composition a RAG/curation pipeline runs daily: fuse
    the BM25 top-10 (``text_bm25_topk``, reused verbatim — one copy of
    the scorer) with a dense cosine top-10 over the document embeddings
    (vec_id == doc_id by the fixture's id contract) as

        rrf(d) = Σ_lists 1/(K + rank_list(d)),  K = 60

    (Cormack, Clarke & Büttcher 2009's parameter-free rank fusion —
    scores from incomparable scales are never mixed, only ranks).
    Queries are the BM25 query set (per lang, that language's min-id
    tokenizable document), so both rankers answer the SAME probes.

    Determinism: both input rankings carry their own pinned tie-breaks
    (6-dp score, doc_id); docs present in only ONE list at equal rank
    tie exactly on rrf (e.g. lex-only #5 vs dense-only #5) and the
    fused row_number breaks on doc_id — the rank-boundary tie pinned
    explicitly.  Scale: the dense side broadcasts |langs| query vectors
    against a one-pass corpus scan (swap in ``ann_ivf_topk`` for the
    probed-cell shape at 100 TB — fusion is agnostic to the ranker);
    the fusion itself joins two ≤10·|q|-row lists — negligible."""
    from .operators.ann import cosine
    from .queries_llm3 import _bm25_toks, bm25_query_docs, text_bm25_topk

    # the SAME probe construction text_bm25_topk runs (shared helpers —
    # a probe-rule change there reaches the dense side too; review fix:
    # this was a copy)
    qdoc = bm25_query_docs(_bm25_toks(spark, sf_dir))
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("ve"))
    qv = qdoc.join(
        emb.select(F.col("vec_id").alias("doc_id"), F.col("ve").alias("qe")),
        "doc_id").select("qid", "qe")
    scored = emb.crossJoin(F.broadcast(qv)).select(
        "qid", F.col("vec_id").alias("doc_id"),
        cosine(F.col("qe"), F.col("ve")).alias("cos_sim"))
    wd = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "doc_id")
    den = (scored.withColumn("dense_rk",
                             F.row_number().over(wd).cast("long"))
           .filter(F.col("dense_rk") <= 10)
           .select("qid", "doc_id", "dense_rk"))
    lex = text_bm25_topk(spark, sf_dir).select(
        "qid", "doc_id", F.col("rk").alias("lex_rk"))
    fused = lex.join(den, ["qid", "doc_id"], "full_outer")
    rrf = round_half_away_col(
        F.coalesce(F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("lex_rk")),
                   F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("dense_rk")),
                     F.lit(0.0)), 9)
    wf = Window.partitionBy("qid").orderBy(F.col("rrf_score").desc(),
                                           "doc_id")
    return (fused.withColumn("rrf_score", rrf)
            .withColumn("rk", F.row_number().over(wf).cast("long"))
            .filter(F.col("rk") <= 10)
            .select("qid", "doc_id", "lex_rk", "dense_rk", "rrf_score", "rk"))


def _rrf_sql() -> str:
    # the lexical list IS text_bm25_topk's oracle, embedded verbatim as
    # a derived table, and the dense side's probe set is the SAME
    # shared CTE fragment that oracle uses internally (one copy of the
    # scorer AND the probe rule on the oracle side too)
    from .queries_llm3 import _BM25_PROBE_CTES, _BM25_SQL

    return f"""
WITH bm AS MATERIALIZED (SELECT * FROM ({_BM25_SQL}) AS b),
{_BM25_PROBE_CTES},
v AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings),
nrm AS (SELECT vec_id, sqrt(list_dot_product(ve, ve)) AS nv FROM v),
qv AS (SELECT q.qid, v.ve, n.nv
       FROM qdoc q JOIN v ON v.vec_id = q.doc_id
       JOIN nrm n ON n.vec_id = q.doc_id),
den AS (
  SELECT qid, doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS dense_rk
  FROM (SELECT q.qid, c.vec_id AS doc_id,
               round(list_dot_product(q.ve, c.ve) / (q.nv * n.nv), 6)
                 AS cos_sim
        FROM qv q CROSS JOIN v c JOIN nrm n ON n.vec_id = c.vec_id)
),
fused AS (
  SELECT COALESCE(l.qid, d.qid) AS qid,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         l.rk AS lex_rk, d.dense_rk,
         round(COALESCE(1.0 / (60.0 + l.rk), 0)
               + COALESCE(1.0 / (60.0 + d.dense_rk), 0), 9) AS rrf_score
  FROM (SELECT qid, doc_id, rk FROM bm) l
  FULL OUTER JOIN (SELECT * FROM den WHERE dense_rk <= 10) d
    ON l.qid = d.qid AND l.doc_id = d.doc_id
)
SELECT qid, doc_id, lex_rk, dense_rk, rrf_score, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rk
  FROM fused
) WHERE rk <= 10
"""


SPECS: dict[str, QuerySpec] = {
    "mix_upsample_epochs": QuerySpec(
        mix_upsample_epochs, _UPSAMPLE_SQL,
        "config-weighted per-domain epoch replication (explode, "
        "zero-shuffle)"),
    "text_blocklist_filter": QuerySpec(
        text_blocklist_filter, _BLOCKLIST_SQL,
        "deny-list quality gate as one codegen'd filter expression"),
    "er_survivorship_merge": QuerySpec(
        er_survivorship_merge, _SURVIVORSHIP_SQL,
        "per-field golden-record survivorship (max_by == arg_max)"),
    "ts_interarrival_stats": QuerySpec(
        ts_interarrival_stats, _INTERARRIVAL_SQL,
        "inter-arrival cadence QA behind watermark sizing"),
    "agg_quantile_sketch": QuerySpec(
        agg_quantile_sketch, _QSKETCH_SQL,
        "mergeable GK quantile sketch with in-plan rank-error audit"),
    "retrieval_rrf_fusion": QuerySpec(
        retrieval_rrf_fusion, _rrf_sql(),
        "reciprocal-rank fusion of BM25 and dense cosine top-10"),
}
