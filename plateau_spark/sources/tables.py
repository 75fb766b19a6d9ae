"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

Handles physical-type quirks so the rest of the engine sees clean
Spark types:
  - events.ts is parquet TIMESTAMP(NANOS) → read as long (session conf
    ``spark.sql.legacy.parquet.nanosAsLong``) and converted to a
    microsecond timestamp column (Spark's native resolution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # the events table carries TIMESTAMP(NANOS); make sure the session
        # can read it even when not created via session.get_spark
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_dtype = dict(df.dtypes).get("ts")
        if ts_dtype in ("bigint", "long"):
            # ns → µs with INTEGER division: ns-epoch values exceed the
            # 53-bit double mantissa, so a float divide would shift
            # timestamps
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_dtype == "timestamp_ntz":
            # parquet timestamp[us] isAdjustedToUTC=false reads as
            # TIMESTAMP_NTZ; normalize to TIMESTAMP so event-time ops
            # (withWatermark, epoch bucketing) work uniformly. The session
            # timezone is pinned to UTC, so the cast is value-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
