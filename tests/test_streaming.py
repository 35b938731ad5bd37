"""Structured Streaming twins: the streaming runs must agree with their
batch equivalents on the same bounded input (SURVEY §2.13)."""

import pytest
from pyspark.sql import functions as F

from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t
from remove_na_lgbtiq_queer_knowledge_graph_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    streaming_dedupe_keys,
    tumbling_counts,
)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream_out = run_to_memory(
        tumbling_counts(read_events_stream(spark, sf_dir), "1 day"),
        "test_tumbling", "complete",
    )
    batch = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", "ts")).alias("wday"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    got = {(r.wday, r.event_type): r.n for r in stream_out.collect()}
    want = {(r.wday, r.event_type): r.n for r in batch.collect()}
    assert got == want


def test_streaming_dedupe_equals_distinct(spark, sf_dir):
    stream_out = run_to_memory(
        streaming_dedupe_keys(read_events_stream(spark, sf_dir)),
        "test_dedupe", "append",
    )
    want = t(spark, sf_dir, "events").select("user_id", "event_type").distinct().count()
    assert stream_out.count() == want


def test_watermark_drops_late_rows(spark, tmp_path):
    """True multi-batch watermark semantics: a row older than
    (max event time − delay) arrives in batch 2 and is DROPPED from its
    already-finalized window; append mode emits each window exactly once
    with the on-time count only."""
    import datetime as dt

    indir = tmp_path / "in"
    indir.mkdir()

    def write_batch(rows, n):
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, *hm), v) for hm, v in rows],
            "ts timestamp, value double",
        ).coalesce(1).write.mode("overwrite").parquet(str(indir / f"b{n}"))

    write_batch([((10, 5), 1.0), ((10, 20), 1.0), ((11, 0), 1.0)], 1)

    schema = "ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(indir / "*"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("w.start").alias("wstart"), "n")
    )
    name = "mem_watermark_test"
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName(name).start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one LATE row (10:07, behind the 10:50 watermark) and
        # one fresh row that pushes processing forward
        write_batch([((10, 7), 99.0), ((12, 0), 1.0)], 2)
        q.processAllAvailable()
        got = {r.wstart: r.n for r in spark.table(name).collect()}
    finally:
        q.stop()

    base = int(dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc).timestamp())
    # after batch 1 the watermark (11:00 − 10m = 10:50) finalizes the
    # 10:00 and 10:15 windows at n=1; the late 10:07 row in batch 2 is
    # DROPPED — the 10:00 window stays n=1 with no duplicate emission.
    # Batch 2 advances the watermark to 11:50, finalizing 11:00; the
    # 12:00 window is still open when the query stops.
    assert got == {base: 1, base + 900: 1, base + 3600: 1}


def _protobuf_usable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_usable(),
    reason="PINNED ENVIRONMENT: transformWithState's state-server "
    "worker imports google.protobuf, which this container does not "
    "ship (verified round 11: no wheel or vendored runtime anywhere "
    "on disk — only typeshed stubs — and package installation is "
    "prohibited here).  The operator itself is exercised through its "
    "applyInPandasWithState twin; this test auto-activates the moment "
    "the environment gains protobuf.",
)
def test_transform_with_state_extrema(spark, sf_dir):
    """v2 stateful API (StatefulProcessor): per-type running count/max
    matches the batch aggregate on a bounded run."""
    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t
    from remove_na_lgbtiq_queer_knowledge_graph_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        stateful_type_extrema,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    got = {
        r.event_type: (r.n, r.max_value)
        for r in run_to_memory(
            stateful_type_extrema(read_events_stream(spark, sf_dir)),
            "mem_tws_extrema", "append",
        ).collect()
    }
    want = {
        r.event_type: (r.n, r.mx)
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == want
