from __future__ import annotations

from pyspark.sql import functions as F

from plateau_spark.sources.tables import load_table
from plateau_spark.streaming.events import (
    run_stream_to_memory,
    sessionize_events,
    sessionize_stream,
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


def test_sessionize_batch(spark):
    import datetime

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, t(0), 1.0), (1, t(10), 2.0),        # session A (gap 30m)
            (1, t(50), 3.0),                        # session B
            (2, t(5), 4.0),                         # session C
        ],
        "user_id long, ts timestamp, value double",
    )
    out = sessionize_events(df, gap="30 minutes")
    rows = sorted(
        ((r.user_id, r.session_start.minute, r.session_end.minute, r.n_events, r.sum_value)
         for r in out.collect())
    )
    assert rows == [(1, 0, 10, 2, 3.0), (1, 50, 50, 1, 3.0), (2, 5, 5, 1, 4.0)]


def test_sessionize_stream_matches_batch_closed_sessions(spark):
    """availableNow stream emits exactly the sessions the watermark can
    close; each emitted session must equal its batch twin."""
    batch = load_table(spark, "/root/testdata/sf0.001", "events").where(
        F.col("user_id") < 50
    )
    expected = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, float(r.sum_value))
        for r in sessionize_events(batch, gap="30 minutes").collect()
    }
    streamed = run_stream_to_memory(
        spark,
        EVENTS,
        lambda s: sessionize_stream(
            s.where(F.col("user_id") < 50), gap_seconds=1800
        ),
    )
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, float(r.sum_value))
        for r in streamed.collect()
    }
    assert len(got) > 0
    for key, val in got.items():
        assert key in expected and expected[key] == val


def test_stream_static_enrich_equals_batch(spark):
    from pyspark.sql import functions as F

    from plateau_spark.sources.tables import load_table
    from plateau_spark.streaming.events import run_stream_to_memory, stream_static_enrich

    sf_dir = "/root/testdata/sf0.001"
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def transform(stream):
        keyed = stream.withColumn("n_nationkey", F.col("user_id") % 25)
        return stream_static_enrich(keyed, nation, on="n_nationkey").groupBy(
            "n_name"
        ).agg(F.count("*").alias("n_events"))

    got = run_stream_to_memory(spark, f"{sf_dir}/events.parquet", transform)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "n_nationkey", F.col("user_id") % 25
    )
    want = ev.join(nation, "n_nationkey").groupBy("n_name").agg(
        F.count("*").alias("n_events")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
