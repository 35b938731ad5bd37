"""Streaming queries (SURVEY.md §2.13, BASELINE.json streaming
extensions) — real Structured Streaming runs driven to completion via
the memory sink, with batch-semantics DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .spec import QuerySpec, t
from .streaming.windows import (
    read_events_stream,
    run_append_to_files,
    run_to_memory,
    session_aggregate,
    sliding_counts,
    stateful_user_totals,
    streaming_cms_buckets,
    streaming_dedupe_keys,
    streaming_dedupe_watermarked,
    tumbling_counts,
)


def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window counts per event_type — REAL readStream →
    watermark → window agg → memory sink (complete mode)."""
    stream = read_events_stream(spark, sf_dir)
    return run_to_memory(
        tumbling_counts(stream, "1 day"), "mem_tumbling_daily", "complete"
    )


# shared projection/aggregation body (review fix: the append twin
# carried a verbatim copy — a cast fix here must reach both oracles)
_TUMBLING_BODY = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS wday, event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM events"""

_TUMBLING_SQL = _TUMBLING_BODY + "\nGROUP BY 1, 2\n"


def stream_tumbling_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows in APPEND mode to a parquet FILE sink
    with watermark-driven finalization (production sink shape — the
    memory-sink queries above run complete mode).  The sink receives
    exactly the windows the 1-hour watermark closed:
    ``window.end ≤ max(ts) − 1 hour`` — the batch oracle applies the
    same cut, so open windows are provably withheld and state provably
    evicts."""
    stream = read_events_stream(spark, sf_dir)
    return run_append_to_files(
        tumbling_counts(stream, "1 day"), "tumbling_append"
    )


_TUMBLING_APPEND_SQL = _TUMBLING_BODY + """
WHERE date_trunc('day', ts) + INTERVAL 1 DAY
      <= (SELECT date_trunc('milliseconds', max(ts)) FROM events) - INTERVAL 1 HOUR
GROUP BY 1, 2
"""


def stream_session_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) in APPEND mode to a parquet file
    sink — the hard bounded-state case: a session stays open (and in
    state) as long as events keep arriving within the gap, and is
    finalized only when the watermark passes ``last event + gap``.  The
    oracle applies the same closure cut to batch-computed sessions:
    ``last_ts + gap ≤ max(ts) − delay``."""
    # the SHARED session_aggregate construction (review fix: this body
    # was an inline copy that a gap change could silently miss)
    stream = session_aggregate(
        read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour"),
        "30 minutes",
    )
    return run_append_to_files(stream, "session_append")


# _SESSION_APPEND_SQL is composed from _SESSION_SQL below (one copy of
# the sessionization CTEs + the watermark-closure HAVING; was a
# verbatim duplicate of the CTE body — review fix)


def stream_sliding_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h window counts — every event lands in two windows."""
    stream = read_events_stream(spark, sf_dir)
    return run_to_memory(
        sliding_counts(stream, "2 hours", "1 hour"), "mem_sliding_hours", "complete"
    )


_SLIDING_SQL = """
WITH starts AS (
  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS wstart_epoch FROM events
  UNION ALL
  SELECT CAST(floor(epoch(date_trunc('hour', ts) - INTERVAL 1 HOUR)) AS BIGINT) FROM events
)
SELECT wstart_epoch, count(*) AS n FROM starts GROUP BY 1
"""


def stream_cms_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min-sketch maintenance: per-(row, bucket) running
    totals with O(d·256) state at ANY key cardinality — the bounded-state
    form of per-key counting on unbounded streams (batch query twin:
    ``agg_count_min_topk``)."""
    stream = read_events_stream(spark, sf_dir)
    return run_to_memory(
        streaming_cms_buckets(stream), "mem_cms_buckets", "complete"
    )


# the SHARED CMS hash fragment (queries_linking._CMS_BUCKETS — review
# fix: this module carried its own copy with a literal d=4)
from .queries_linking import _CMS_BUCKETS as _CMS_STREAM_BUCKETS  # noqa: E402

_CMS_STREAM_SQL = f"""
SELECT b.r, b.bucket, count(*) AS total
FROM events, LATERAL (VALUES {_CMS_STREAM_BUCKETS}) AS b(r, bucket)
GROUP BY 1, 2
"""


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-min gap) — ``session_window`` on the
    batch frame (identical semantics to the streaming operator; the
    streaming run needs watermark-closed windows, asserted in tests)."""
    events = t(spark, sf_dir, "events")
    return session_aggregate(events, "30 minutes")


_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                -- STRICT '>' : Spark's session_window MERGES two
                -- events exactly gap-apart (verified empirically:
                -- 00:00 + 00:30 with a 30-min gap is ONE session,
                -- split only at gap + 1us) — '>=' split the oracle a
                -- boundary early (review batch; the batch sessionize
                -- convention _SESSIONIZE_SQL already used '>')
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM marked
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*) AS n_events
FROM sessions GROUP BY user_id, sess
"""

# append-mode oracle: the same sessions, cut to those the 1-hour
# watermark CLOSED — watermark = ms-truncated max event time − delay
# (Spark's EventTimeWatermarkExec floors to milliseconds, so the cut
# must too or a session end inside the sub-ms gap would be included
# here while Spark still withholds it)
_SESSION_APPEND_SQL = _SESSION_SQL + """
HAVING max(ts) + INTERVAL 30 MINUTE
       <= (SELECT date_trunc('milliseconds', max(ts)) FROM events) - INTERVAL 1 HOUR
"""


def stream_dedupe_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedupe — dropDuplicates over the stream, one
    row per (user_id, event_type) key (W2's streaming twin)."""
    stream = read_events_stream(spark, sf_dir)
    return run_to_memory(
        streaming_dedupe_keys(stream), "mem_dedupe_keys", "append"
    )


_DEDUPE_SQL = "SELECT DISTINCT user_id, event_type FROM events"


def stream_dedupe_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state dedupe: dropDuplicatesWithinWatermark — per-key
    state evicted once the watermark passes (the form that survives an
    unbounded 100 TB stream)."""
    stream = read_events_stream(spark, sf_dir)
    return run_to_memory(
        streaming_dedupe_watermarked(stream), "mem_dedupe_wm", "append"
    )


def stream_incremental_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's incremental idiom (J4 + created_at filter,
    `02-other-duplicates.R:11-12`): process only events newer than the
    checkpoint whose (user_id, event_type) was never seen before it."""
    events = t(spark, sf_dir, "events")
    cutoff = F.to_timestamp(F.lit("2024-01-08 00:00:00"))
    old_keys = events.filter(F.col("ts") < cutoff).select(
        "user_id", "event_type"
    ).distinct()
    return (
        events.filter(F.col("ts") >= cutoff)
        .join(old_keys, ["user_id", "event_type"], "left_anti")
        .select("event_id", "user_id", "event_type")
    )


_INCR_SQL = """
SELECT event_id, user_id, event_type FROM events e
WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
  AND NOT EXISTS (
    SELECT 1 FROM events o
    WHERE o.ts < TIMESTAMP '2024-01-08 00:00:00'
      AND o.user_id = e.user_id AND o.event_type = e.event_type
  )
"""


def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals carried in explicit state.  Rounded to 2dp: inputs
    are 2-decimal values, so the true total is exact at 2dp regardless
    of summation order.

    SPLIT-INVARIANT epilogue (review fix): the operator emits one
    cumulative row per user per micro-batch, so a multi-batch source
    (multi-file events dir, maxFilesPerTrigger) would land stale
    partial totals next to the final ones in the append sink and the
    one-row-per-user oracle would fail.  ``n_events`` is strictly
    increasing across a user's emissions, so keeping each user's
    max-``n_events`` row is exactly 'the final state' under ANY batch
    split — the `_scd2_apply_stream` determinism contract."""
    stream = read_events_stream(spark, sf_dir)
    sink = run_to_memory(
        stateful_user_totals(stream), "mem_stateful_totals", "append"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (sink.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


_STATEFUL_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
"""




def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join — purchases attributed
    to same-user clicks within 4 hours, REAL readStream on both
    sides, append-mode memory sink."""
    from .streaming.windows import interval_join_clicks_purchases

    clicks = read_events_stream(spark, sf_dir) \
        .filter(F.col("event_type") == "click")
    purchases = read_events_stream(spark, sf_dir) \
        .filter(F.col("event_type") == "purchase")
    return run_to_memory(
        interval_join_clicks_purchases(clicks, purchases, "4 hours"),
        "mem_stream_stream_join", "append")


_SSJOIN_SQL = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       c.ts AS click_ts, p.ts AS purchase_ts, p.value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 4 HOUR
"""

def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static join: the event stream enriched against a STATIC
    dimension (users → mktsegment via ``customer``), then windowed
    daily counts per segment.  The static side is a plain batch
    DataFrame joined into the streaming plan — Spark broadcasts it per
    micro-batch and re-resolves it if the files change, which is how
    dimension enrichment works in production (no state, unlike
    stream–stream joins).  Complete-mode memory sink."""
    stream = read_events_stream(spark, sf_dir)
    dim = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    joined = stream.join(dim, "user_id")  # inner: unknown users drop
    agg = (
        joined.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "segment")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.col("w.start").cast("date").alias("wday"), "segment", "n")
    )
    return run_to_memory(agg, "mem_stream_static", "complete")


_STREAM_STATIC_SQL = """
SELECT CAST(date_trunc('day', e.ts) AS DATE) AS wday,
       c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming volume-anomaly monitor — the live twin of
    ``ts_anomaly_zscore``: hourly counts per event type maintained as
    ONE complete-mode stateful aggregation over the event stream
    (state = |types|·|hours| counters, bounded by the time span), with
    the distribution statistics and the |z| > 2 cut as a batch
    epilogue on the sink table — the stream_nb_classify shape: the
    stream maintains the sufficient statistics, the decision layer
    reads them.  Integer moments (Σx, Σx² as longs), identical
    arithmetic to the batch twin, which is also the oracle — stream ≡
    batch is the correctness contract."""
    stream = read_events_stream(spark, sf_dir)
    hourly = (
        stream.groupBy("event_type",
                       F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from .spec import materialize

    # snapshot the sink before the stats self-join: the memory-sink
    # VIEW carries one fixed set of attribute ids, and joining it to
    # an aggregate of itself trips Catalyst's conflicting-reference
    # resolution (INTERNAL_ERROR); the checkpoint also pins the
    # epilogue to one consistent snapshot of the (live) sink table
    sunk = materialize(run_to_memory(hourly, "mem_anomaly_hourly", "complete"))
    # the stream result IS the batch epilogue over the sunk hourly
    # frame — one shared implementation, like the shared oracle SQL
    from .queries_relational import _zscore_epilogue

    return _zscore_epilogue(sunk)


# the stream must equal the batch pass exactly — ONE copy of the
# anomaly SQL (same rule as queries_llm2's _MINS12 import: a shared
# fragment, not a twin that can drift)
from .queries_relational import _ANOMALY_SQL as _STREAM_ANOMALY_SQL  # noqa: E402


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static RANGE join: a live purchase stream attributed to
    the STATIC engagement-session interval table via the same binned
    equi-join as the batch ``join_range_interval`` — the point of the
    binning strategy is exactly that it turns an un-streamable range
    predicate into a stateless stream–static equi-join on
    (user_id, bin) with the exact containment check as a post-filter
    (a raw BETWEEN against a static table would nested-loop every
    micro-batch).  Stateless inner join → append mode, no watermark
    state; emits one row per (purchase, containing session).  The
    oracle is the batch containment join, and the batch/stream
    equivalence is the same contract as ``stream_nb_classify``."""
    from .operators.relational import interval_join
    from .queries_relational import _engagement_sessions

    # static intervals: the SHARED construction — the stream ≡ batch
    # contract requires byte-identical intervals to join_range_interval.
    # Materialized: auto-width interval_join reads the intervals side
    # THREE times (exact-max agg, p95 sample, the join itself) and the
    # stream-static join re-evaluates the static side per micro-batch —
    # unmaterialized, the multi-window session pipeline re-ran each
    # time (review fix)
    from .spec import materialize as _mat

    sess = _mat(_engagement_sessions(spark, sf_dir))
    stream = read_events_stream(spark, sf_dir)
    purch = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.col("ts").cast("double").alias("p_s"))
    # auto width samples the STATIC intervals side (sess) at plan time
    # — legal before the streaming join is wired, identical result
    joined = interval_join(
        purch, sess, "p_s", "start_s", "end_s", keys=["user_id"],
        bin_width=None)
    out = joined.select("user_id", "event_id", "session_idx")
    return run_to_memory(out, "mem_stream_interval", "append")


# sessionization CTEs shared verbatim with the batch twin's oracle
# (queries_relational._ENG_SESSIONS_CTES — one copy, like the Spark
# side's _engagement_sessions)
from .queries_relational import _ENG_SESSIONS_CTES  # noqa: E402

_STREAM_INTERVAL_SQL = f"""
WITH {_ENG_SESSIONS_CTES}
SELECT p.user_id, p.event_id, s.session_idx
FROM events p JOIN sess s
  ON p.user_id = s.user_id AND epoch(p.ts) BETWEEN s.start_s AND s.end_s
WHERE p.event_type = 'purchase'
"""


def _scd2_versions(changes: DataFrame) -> DataFrame:
    """SCD2 version chains from a change log — pure function of the
    (user_id, us, event_id, value) change set, shared by the batch
    semantics and every micro-batch rebuild (one copy, so the stream
    and the oracle cannot drift).

    Consecutive equal values per user (total order ``(us, event_id)``)
    are no-op changes and mint NO version (the ``sink_scd2_merge``
    suppression rule); each retained change opens a version at its
    event time and the successor's event time closes it."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    retained = (
        changes
        .withColumn("__pv", F.lag("value").over(w))
        .filter(~F.col("__pv").eqNullSafe(F.col("value")))
        .drop("__pv")
    )
    nxt = F.lead("us").over(w)
    return retained.select(
        "user_id",
        "value",
        F.col("us").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
    )


def _read_changelog(sp: SparkSession, log_dir: str,
                    buckets: list[int]) -> DataFrame:
    """Changelog scan PRUNED to the given user-hash buckets: ``__bkt``
    is the directory-partition column, so the isin filter becomes
    PartitionFilters — whole bucket directories are skipped before any
    file opens (plan-asserted in ``tests/test_streaming_scd2.py``).  At
    100 TB this is the difference between a batch scanning its touched
    buckets and re-reading the entire change history every trigger."""
    return (sp.read.parquet(log_dir)
            .filter(F.col("__bkt").isin([int(b) for b in buckets])))


def _scd2_apply_stream(stream: DataFrame, scratch: str,
                       n_buckets: int = 8,
                       compact_every: int = 0) -> DataFrame:
    """Drive a CDC change stream into a versioned SCD2 dimension via
    ``foreachBatch`` — the stream twin of ``sink_scd2_merge``
    (`queries_relational.py`): each micro-batch appends its changes to
    a user-BUCKETED changelog (``partitionBy(pmod(hash(user_id), N))``)
    and rebuilds the version chains of exactly the users the batch
    touched, scanning ONLY the bucket directories those users hash to;
    untouched users' rows pass through by anti-join.

    Event-sourced on purpose: a rebuild from the full per-user history
    makes the final dimension a pure function of the change SET, so the
    result is identical under ANY micro-batch split — including
    out-of-order arrivals across batches (a late change inserts its
    version mid-chain, which a current-row-only merge cannot do; that
    determinism is what the stream≡batch equality test pins).  At
    100 TB the changelog bucket count scales with the key space, a
    batch reads only its affected buckets (partition pruning, not just
    a design claim — see :func:`_read_changelog`), and the rebuild
    joins the batch's (small) key set against them — no full-dimension
    rewrite.  ``compact_every`` > 0 compacts the touched buckets every
    that-many batches — streaming appends leave one small file per
    batch per bucket, and scan cost degrades to file listing without
    periodic compaction."""
    import os as _os

    spark = stream.sparkSession
    log_dir = _os.path.join(scratch, "changelog")
    state: dict[str, object] = {"dim": None, "n": 0}

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sp = batch.sparkSession
        changes = batch.select(
            "user_id", F.unix_micros("ts").alias("us"), "event_id", "value",
            F.pmod(F.hash("user_id"), F.lit(n_buckets)).alias("__bkt"))
        changes.write.mode("append").partitionBy("__bkt").parquet(log_dir)
        # ≤ n_buckets ints — bounded driver state at any key cardinality
        bkts = sorted(r["__bkt"] for r in
                      changes.select("__bkt").distinct().collect())
        if compact_every and (int(state["n"]) + 1) % compact_every == 0:
            from .sources.io import compact_parquet
            for b in bkts:
                compact_parquet(sp, _os.path.join(log_dir, f"__bkt={b}"),
                                target_file_bytes=128 * 1024 * 1024)
        log = _read_changelog(sp, log_dir, bkts)
        affected = changes.select("user_id").distinct()
        rebuilt = _scd2_versions(
            log.join(affected, "user_id").drop("__bkt"))
        if state["dim"] is not None:
            prev = sp.read.parquet(state["dim"])
            new_dim = (prev.join(affected, "user_id", "left_anti")
                       .unionByName(rebuilt))
        else:
            new_dim = rebuilt
        # versioned dim dirs: the prior dim is READ while the new one
        # writes, so overwrite-in-place would race its own input
        out = _os.path.join(scratch, f"dim_v{state['n']}")
        new_dim.write.mode("overwrite").parquet(out)
        state["dim"] = out
        state["n"] = int(state["n"]) + 1

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", _os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if state["dim"] is None:
        return spark.createDataFrame(
            [], "user_id long, value double, valid_from_us long, "
                "valid_to_us long, is_current long")
    return spark.read.parquet(state["dim"])


def stream_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC → SCD2: the events stream as a change feed over a
    per-user dimension attribute (``value``), merged per micro-batch
    into full version history — see :func:`_scd2_apply_stream` for the
    event-sourced merge and :func:`_scd2_versions` for the shared
    chain semantics."""
    from .spec import scratch_dir

    return _scd2_apply_stream(
        read_events_stream(spark, sf_dir), scratch_dir("scd2_stream_"),
        compact_every=2)


def _dedup_minhash_stream(stream: DataFrame, scratch: str,
                          num_hashes: int = 12,
                          band_size: int = 3) -> DataFrame:
    """Streaming first-seen-wins MinHash near-dedupe — the stream twin
    of ``dedup_incremental_minhash`` (`queries_llm2.py`) and the one
    operator a training-data crawl runs daily: each micro-batch of
    documents computes signatures, checks its bands against the
    ACCUMULATED band store (docs from all earlier batches) plus
    lower-id docs inside the batch, emits the non-colliding docs, and
    appends its distinct (band, bucket) pairs to the store.

    First-seen-wins is defined by ``doc_id`` order (the crawl's
    arrival order; the oracle's ``c.doc_id < n.doc_id``), so the
    result is identical under ANY id-ordered micro-batch split — the
    `_scd2_apply_stream` determinism contract, pinned by the
    stream≡batch equality test.

    100 TB design: state is the DISTINCT (band, bucket) set — bounded
    by the banded signature space, never by corpus rows (the
    ``stream_cms_buckets`` bounded-state discipline), and the per-batch
    collision check is an equi-join of batch bands against it (the
    ``stream_incremental_antijoin`` shape) — never batch×corpus.  In
    production the store is a bucketed table compacted on the
    `_scd2_apply_stream` changelog schedule."""
    import os as _os

    from .operators.dedup import minhash_bands, minhash_signature, shingles

    spark = stream.sparkSession
    store = _os.path.join(scratch, "band_store")
    kept_dir = _os.path.join(scratch, "kept")
    state = {"has_store": False, "has_kept": False}

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sp = batch.sparkSession
        docs = batch.select("doc_id", "source", "text")
        bands = minhash_bands(
            minhash_signature(shingles(docs, "doc_id", "text", 3),
                              num_hashes),
            num_hashes, band_size)
        # the band frame feeds three consumers below — materialize once
        # instead of recomputing the signature aggregation per use
        from .spec import materialize
        bands = materialize(bands)
        # collisions against earlier batches: semi-join the store
        if state["has_store"]:
            prev = sp.read.parquet(store)
            coll_prev = (bands.join(prev, ["band", "bucket"], "left_semi")
                         .select("id"))
        else:
            coll_prev = bands.select("id").limit(0)
        # within-batch: any LOWER-id doc sharing a bucket suppresses
        w = Window.partitionBy("band", "bucket")
        coll_in = (bands.withColumn("__min", F.min("id").over(w))
                   .filter(F.col("id") > F.col("__min")).select("id"))
        collided = coll_prev.unionByName(coll_in).distinct() \
                            .withColumnRenamed("id", "doc_id")
        kept = (docs.join(collided, "doc_id", "left_anti")
                .select("doc_id", "source"))
        kept.write.mode("append").parquet(kept_dir)
        state["has_kept"] = True
        # append AFTER the collision check — a batch must not collide
        # with itself through the store
        bands.select("band", "bucket").distinct() \
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
        return spark.createDataFrame([], "doc_id long, source string")
    return spark.read.parquet(kept_dir)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a file stream (schema via the shared
    source-keyed memo, the ``read_events_stream`` pattern — no ts
    column to normalize; the unmemoized batch read paid a ~0.5 s
    schema-inference job per invocation, review batch)."""
    import os as _os

    from .spec import source_memo
    from .streaming.windows import _SCHEMA_MEMO

    path = _os.path.join(sf_dir, "documents.parquet")
    schema = source_memo(_SCHEMA_MEMO, spark, path,
                         lambda: spark.read.parquet(path).schema)
    return (spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir))


def stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental MinHash near-dedupe: first-seen-wins over
    the documents stream — see :func:`_dedup_minhash_stream`."""
    from .spec import scratch_dir

    return _dedup_minhash_stream(
        read_documents_stream(spark, sf_dir),
        scratch_dir("dedup_minhash_stream_"))


# signature/banding SQL fragments shared with the batch dedup oracles
# (queries_llm._SHINGLE_CTE/_MINS/_BANDS — ONE copy of the scheme; a
# parameter change there must reach this oracle too)
from .queries_llm import _BANDS as _SDM_BANDS  # noqa: E402
from .queries_llm import _MINS as _SDM_MINS  # noqa: E402
from .queries_llm import _SHINGLE_CTE as _SDM_SHINGLE_CTE  # noqa: E402

_STREAM_DEDUP_MINHASH_SQL = f"""
WITH {_SDM_SHINGLE_CTE},
sig AS (SELECT doc_id, {_SDM_MINS} FROM sh GROUP BY doc_id),
bands AS ({_SDM_BANDS}),
collided AS (
  SELECT DISTINCT n.doc_id
  FROM bands n JOIN bands c
    ON n.band = c.band AND n.bucket = c.bucket
   AND c.doc_id < n.doc_id
)
SELECT d.doc_id, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM collided)
"""


_SCD2_STREAM_SQL = """
WITH changes AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events
), retained AS (
  SELECT user_id, us, event_id, value FROM (
    SELECT user_id, us, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY us, event_id)
             AS pv
    FROM changes)
  WHERE pv IS DISTINCT FROM value
)
SELECT user_id, value,
       us AS valid_from_us,
       lead(us) OVER w AS valid_to_us,
       CAST(CASE WHEN lead(us) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS is_current
FROM retained
WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
"""


SPECS: dict[str, QuerySpec] = {
    "stream_static_enrich": QuerySpec(
        stream_static_enrich, _STREAM_STATIC_SQL,
        "stream-static dimension enrichment joined per micro-batch, "
        "windowed counts per segment"),
    "stream_interval_join": QuerySpec(
        stream_interval_join, _STREAM_INTERVAL_SQL,
        "stream-static RANGE join: binned equi-join turns the "
        "containment predicate into a stateless append-mode join"),
    "stream_anomaly_zscore": QuerySpec(
        stream_anomaly_zscore, _STREAM_ANOMALY_SQL,
        "streaming anomaly monitor: complete-mode hourly counters + "
        "integer-moment z-score epilogue — stream ≡ batch contract"),
    "stream_tumbling_daily": QuerySpec(stream_tumbling_daily, _TUMBLING_SQL),
    "stream_tumbling_append": QuerySpec(
        stream_tumbling_append, _TUMBLING_APPEND_SQL,
        "append-mode parquet file sink — only watermark-closed windows "
        "land; oracle applies the same end ≤ max(ts) − delay cut"),
    "stream_session_append": QuerySpec(
        stream_session_append, _SESSION_APPEND_SQL,
        "session windows in append mode to a file sink — sessions "
        "finalize at watermark > last event + gap"),
    "stream_stateful_totals": QuerySpec(stream_stateful_totals, _STATEFUL_SQL),
    "stream_sliding_hours": QuerySpec(stream_sliding_hours, _SLIDING_SQL),
    "stream_session_windows": QuerySpec(stream_session_windows, _SESSION_SQL),
    "stream_cms_buckets": QuerySpec(
        stream_cms_buckets, _CMS_STREAM_SQL,
        "streaming count-min-sketch maintenance — O(d·256) state at any "
        "key cardinality"),
    "stream_dedupe_keys": QuerySpec(stream_dedupe_keys, _DEDUPE_SQL),
    "stream_dedupe_watermarked": QuerySpec(stream_dedupe_watermarked, _DEDUPE_SQL),
    "stream_incremental_antijoin": QuerySpec(stream_incremental_antijoin, _INCR_SQL),
    "stream_stream_join": QuerySpec(stream_stream_join, _SSJOIN_SQL),
    "stream_scd2_apply": QuerySpec(
        stream_scd2_apply, _SCD2_STREAM_SQL,
        "streaming CDC -> SCD2: per-micro-batch event-sourced merge "
        "into full version history, split-invariant"),
    "stream_dedup_minhash": QuerySpec(
        stream_dedup_minhash, _STREAM_DEDUP_MINHASH_SQL,
        "streaming first-seen-wins MinHash near-dedupe: per-batch "
        "banded join against the accumulated (band, bucket) store — "
        "bounded state, split-invariant under id-ordered batches"),
}
