"""Structured Streaming twins: the streaming runs must agree with their
batch equivalents on the same bounded input (SURVEY §2.13)."""

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
