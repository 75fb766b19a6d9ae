"""Structured Streaming operators over the events stream.

The reference has NO streaming surface (SURVEY.md §2.7); this is
north-star extension work built directly on Structured Streaming:
``readStream`` → watermarked windowed aggregation / stream dedup →
sink. The batch-equivalent helpers below run the same plan with
``trigger(availableNow=True)`` into an in-memory sink, which is how the
driver's oracle can check streaming results against plain SQL: with
availableNow over a static source, watermarking drops nothing and the
final aggregate equals the batch aggregate.

At scale the same code runs continuously against Kafka/files with the
watermark bounding state (late events beyond the horizon are dropped,
state store evicts closed windows).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window per-event-type aggregate with late-data watermark.

    Works on both a static and a streaming DataFrame (identical plan —
    that's the point of Structured Streaming).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup_events(
    events: DataFrame, *, watermark: str = "2 hours", ts_col: str = "ts"
) -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids within the
    watermark horizon (state-store backed on a real stream)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(["event_id"])


def run_stream_to_memory(
    spark: SparkSession,
    source_parquet: str,
    transform,
    *,
    ts_col: str = "ts",
) -> DataFrame:
    """Execute a streaming transform over a parquet dir with
    availableNow (process-everything-then-stop) into a memory sink and
    return the result as a batch DataFrame.

    This is the micro-batch test harness: same logical plan as the
    continuous stream, deterministic completion.
    """
    schema = spark.read.parquet(source_parquet).schema
    reader = spark.readStream.schema(schema)
    if source_parquet.endswith(".parquet") and "/" in source_parquet:
        # FileStreamSource requires a directory: stream the parent dir
        # filtered down to this file
        import posixpath

        parent, fname = posixpath.split(source_parquet)
        reader = reader.option("pathGlobFilter", fname)
        stream = reader.parquet(parent)
    else:
        stream = reader.parquet(source_parquet)
    if ts_col in stream.columns and dict(stream.dtypes).get(ts_col) in ("bigint", "long"):
        # nanosAsLong-read source: ns → µs with integer division (a float
        # divide would lose precision above 2^53 — see sources/tables.py)
        stream = stream.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    out = transform(stream)
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if out.isStreaming and _has_aggregation(out) else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan
