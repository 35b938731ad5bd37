"""Structured Streaming twins of the batch ops (SURVEY.md §2.13).

The reference is batch-only; its incremental idioms — append logs with
``created_at`` filters (`entities/02-other-duplicates.R:12`) and
anti-join-before-fetch (J4) — map onto watermarked streams.  Per
BASELINE.json the engine adds true streaming equivalents over the
driver's ``events`` table: tumbling/sliding/session windows and stateful
dedupe.

Queries here run *real* Structured Streaming — ``readStream`` over the
events parquet, ``availableNow`` trigger, memory sink — driven to
completion synchronously so the driver harness can collect the result
like any batch DataFrame.  On a cluster the same plans run unmodified
against Kafka/files with a real trigger; the memory sink is only the
harness adapter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (app, path, mtime) → inferred parquet schema: schema inference is a
# driver-side file-footer job.  Keyed/evicted by spec.source_memo —
# ONE copy of the memo discipline (round-13 review).
_SCHEMA_MEMO: dict[tuple, object] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a stream — same ``ts`` normalization as the
    batch loader (see spec.t): int64-nanos → timestamp via integer
    division, and TIMESTAMP_NTZ → TIMESTAMP (``withWatermark`` rejects
    NTZ; the session timezone is pinned to UTC in session.py, so the
    cast is value-identical)."""
    from ..spec import source_memo

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = source_memo(_SCHEMA_MEMO, spark, path,
                         lambda: spark.read.parquet(path).schema)
    # the file-stream source wants a directory; glob-filter to the one file
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # SHARED ts normalization (spec.normalize_event_ts) — this was a
    # third hand-rolled copy of the two-branch conversion; a new
    # physical form fixed in spec.t but missed here would feed
    # withWatermark an unnormalized column
    from ..spec import normalize_event_ts

    return normalize_event_ts(stream)


# Stateful-operator partition count, fixed into the checkpoint at the
# query's FIRST run (Spark pins the state layout thereafter).  The
# batch-side default of one shuffle partition per core is wrong for
# state stores at small volume: every micro-batch pays one store
# open/commit per partition, so 32 near-empty stores are pure overhead
# (measured 2.3 s → 1.25 s at sf0.1 going 32 → 8).  On a real cluster
# size this to O(total cores) before the first checkpoint is written.
STATE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_STATE_PARTITIONS", "8"))


class _state_partitions:
    """Scoped override of spark.sql.shuffle.partitions for the duration
    of a stream start — the value is captured into the streaming plan at
    .start(), so batch queries on the session are unaffected after
    restore."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.saved = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTITIONS))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.saved)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Drive a streaming DataFrame to completion into a memory sink and
    return the result table."""
    spark = stream_df.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_partitions(spark):
        query = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table(name)


def run_append_to_files(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive an append-mode stream into a parquet FILE sink (fresh temp
    dir per run, checkpoint alongside) and return the files read back.

    This is the production sink shape: append mode emits each window
    exactly once, when the watermark passes its end — so the sink holds
    only FINALIZED windows, the state store provably evicts (bounded
    state), and downstream batch jobs can read the directory
    incrementally.  The availableNow run ends with a no-data micro-batch
    that advances the watermark to (global max event time − delay) and
    flushes every window closed by it, which makes the result
    deterministic: windows with ``end ≤ max(ts) − delay``, regardless
    of how the source was split into micro-batches.  (The memory-sink
    helpers above run complete mode — driver-resident results; this
    closes the bounded-state story end-to-end.)
    """
    from ..spec import scratch_dir

    spark = stream_df.sparkSession
    d = scratch_dir(f"{name}_")
    with _state_partitions(spark):
        q = (
            stream_df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", os.path.join(d, "data"))
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    data = os.path.join(d, "data")
    try:
        return spark.read.parquet(data)
    except Exception:  # noqa: BLE001 — empty-sink read, narrowed below
        # a run whose events span less than width+delay finalizes ZERO
        # windows: the file sink commits only _spark_metadata and the
        # directory read can't infer a schema — an empty result, not
        # an error (the stream frame knows the schema)
        if any(f.endswith(".parquet") for _, _, fs in os.walk(data)
               for f in fs):
            raise
        return spark.createDataFrame([], stream_df.schema)


def tumbling_counts(events: DataFrame, width: str = "1 day") -> DataFrame:
    """Tumbling-window counts/sums per event_type with watermark.

    ``width`` must be a whole number of days: the output key is the
    window's DATE (``wday``) — sub-day windows would collapse several
    distinct windows onto one date and double-count downstream.  Use
    :func:`sliding_counts` (epoch-keyed) for sub-day widths.
    """
    import re as _re

    m = _re.fullmatch(r"\s*(\d+)\s*days?\s*", width)
    if not m:
        raise ValueError(
            f"tumbling_counts keys output by date; width={width!r} must "
            "be a whole number of days (sub-day windows would share a "
            "wday key)")
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("wday"),
            "event_type", "n", "total",
        )
    )


def sliding_counts(events: DataFrame, width: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding-window counts; window start exposed as epoch seconds."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("wstart_epoch"),
            "n",
        )
    )


def session_aggregate(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: session start (epoch) + event count.
    ``session_window`` works identically on batch and streaming frames."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    escape hatch for operators Structured Streaming lacks (SURVEY §2.13;
    the incremental-ER state pattern).  Keeps per-user running
    (count, total) state across micro-batches and emits the updated
    totals for every user seen in the batch.

    On a bounded availableNow run this reduces to one emission per
    user — asserted equal to the batch groupBy in the oracle.
    """
    import pandas as pd

    def update(key, pdfs, state):
        # nv tracks NON-NULL values seen: pandas' skipna sum over an
        # all-NULL column is 0.0, but SQL sum(value) is NULL — a user
        # whose every value is NULL must emit NULL, not 0.0 (review
        # batch; NULL-semantics parity is a repo contract)
        n, nv, total = state.get if state.exists else (0, 0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            nv += int(pdf["value"].notna().sum())
            total += float(pdf["value"].sum())
        state.update((n, nv, total))
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n],
            "total_value": [round(total, 2) if nv else None],
        })

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, nv bigint, total double",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_cms_buckets(events: DataFrame, d: int | None = None) -> DataFrame:
    """Count-min-sketch maintenance on an unbounded stream: per-bucket
    running totals over d=4 md5-derived 256-bucket hash rows.

    The streaming state is the sketch itself — O(d·256) rows no matter
    how many distinct users the stream ever sees, vs the unbounded state
    of an exact per-key count.  Any key's frequency estimate is
    min over rows of its bucket total (query-time lookup against this
    table, see the batch twin ``agg_count_min_topk``).  md5 bucketing
    keeps the sketch engine-portable and the oracle exact: a bounded
    availableNow run equals the batch bucket totals.
    """
    # ONE copy of the hash scheme (review fix — this was the fourth
    # inline copy of the md5 bucket derivation).  d defaults to the
    # SHARED _CMS_D, not a literal: a row-count change in
    # queries_linking must reach the streaming sketch too (round-13
    # review — the literal default was the same drift hazard in a
    # different slot)
    from ..queries_linking import _CMS_D, cms_bucket_structs

    buckets = cms_bucket_structs(F.col("user_id"),
                                 _CMS_D if d is None else d)
    return (
        events.select(F.explode(buckets).alias("b"))
        .select("b.r", "b.bucket")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("total"))
    )


def streaming_dedupe_keys(events: DataFrame) -> DataFrame:
    """Stateful streaming dedupe on (user_id, event_type) — the streaming
    twin of the keep-first batch dedupe (W2).  Emits each key once.
    State is unbounded — fine for key spaces that fit in state store;
    for unbounded streams prefer :func:`streaming_dedupe_watermarked`."""
    return events.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )


def streaming_dedupe_watermarked(events: DataFrame, delay: str = "1 day") -> DataFrame:
    """Bounded-state streaming dedupe (SURVEY §7 phase 5):
    ``dropDuplicatesWithinWatermark`` evicts per-key state once the
    watermark passes, so state size follows the dedup horizon instead of
    the full key history — the 100 TB-stream-correct form of W2.  On the
    bounded harness run (single availableNow batch) it reduces to
    distinct keys, which is what the oracle asserts."""
    return (
        events.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


def stateful_type_extrema(events: DataFrame) -> DataFrame:
    """Custom stateful operator on the v2 arbitrary-state API
    (``transformWithState`` / StatefulProcessor, Spark 4): per-event-type
    running (count, max) kept in a ValueState, emitted per batch.

    The v2 API is the forward path for custom operators — explicit state
    variables (value/list/map), timers, and TTL instead of the single
    tuple of ``applyInPandasWithState``.  Requires the RocksDB state
    store (set on the session before start) and a working
    ``google.protobuf`` (the TWS driver worker speaks protobuf to the
    JVM; absent in this container, so the test skips — see
    tests/test_streaming.py).  Count and max are order-independent, so
    the bounded run is exact.

    Split-invariance contract (the `stream_stateful_totals` rule): one
    CUMULATIVE row per key per micro-batch lands in an append sink, so
    a multi-batch source leaves stale partials next to the finals —
    consumers must reduce to each key's max-``n`` row (n is strictly
    increasing per key), as the test does.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Extrema(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", "n BIGINT, mx DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, mx = self._state.get()
            else:
                n, mx = 0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"event_type": [key[0]], "n": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("event_type").transformWithStateInPandas(
        Extrema(),
        outputStructType="event_type string, n bigint, max_value double",
        outputMode="Append",
        timeMode="None",
    )


def interval_join_clicks_purchases(
    clicks: DataFrame, purchases: DataFrame, within: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: each purchase
    attributes to same-user clicks at most ``within`` before it.

    Both sides carry watermarks, so the join state for a user ages out
    once the watermark passes ``click_ts + within`` — bounded state at
    any stream length (the unbounded-state stream-stream join Spark
    rejects in append mode).  The batch twin is the same range
    predicate; per-key fan-out is bounded by the interval."""
    c = clicks.select(
        F.col("user_id"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", "1 hour")
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"), F.col("value"),
    ).withWatermark("purchase_ts", "1 hour")
    return c.join(
        p,
        F.expr(
            f"""user_id = p_user_id
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + INTERVAL {within}"""
        ),
        "inner",
    ).select("user_id", "click_id", "purchase_id", "click_ts",
             "purchase_ts", "value")
