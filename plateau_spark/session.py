"""SparkSession factory with scale-appropriate defaults.

These settings are chosen for cluster scale (AQE re-planning, skew-join
handling, partition coalescing) and work identically on local[N]:
adaptive execution sizes shuffles at runtime so the same code holds from
sf0.001 tests to a 1000-executor 100 TB run.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "plateau-spark", **extra_conf: str) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate turns every explode(expensive_array)
        # into a pre-filter of size(arr)>0 AND isnotnull(arr); predicate
        # pushdown then re-expands the array expression into the filter,
        # so tokenizers/shingle builders evaluate 3x per row instead of
        # once. The operators here always explode derived arrays (the
        # inferred filter can never reach a parquet scan), so the rule
        # is pure overhead at any scale — measured 2-3x on the tokenize
        # stage of the BM25/text family at sf0.1.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # parquet TIMESTAMP(NANOS) (e.g. the events table) is otherwise
        # rejected by the vectorized reader; read as long + convert
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
