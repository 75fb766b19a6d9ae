from __future__ import annotations

from pyspark.sql import functions as F

from plateau_spark.sources.tables import load_table
from plateau_spark.streaming.events import (
    run_stream_to_memory,
    stream_dedup_events,
    windowed_event_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_windowed_counts_match_batch(spark):
    batch = load_table(spark, "/root/testdata/sf0.001", "events")
    streamed = run_stream_to_memory(
        spark, EVENTS, lambda s: windowed_event_counts(s, window="1 hour")
    )
    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    got = {(r.window_start, r.event_type): (r.n_events, float(r.sum_value)) for r in streamed.collect()}
    want = {(r.window_start, r.event_type): (r.n_events, float(r.sum_value)) for r in expected.collect()}
    assert got == want and len(got) > 0


def test_stream_dedup(spark):
    streamed = run_stream_to_memory(spark, EVENTS, stream_dedup_events)
    batch_distinct = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .dropDuplicates(["event_id"])
        .count()
    )
    assert streamed.count() == batch_distinct
