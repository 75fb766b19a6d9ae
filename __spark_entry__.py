"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship dataset store→pruned-read roundtrip
on sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator family (SURVEY.md §2 + north-star extensions) with DuckDB
oracle twins; see plateau_spark/entry_queries.py for the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from plateau_spark.entry_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hive-partitioned dataset store → DNF-pruned read on
    sf0.001 (store → atomic commit → driver-side partition pruning →
    Catalyst-pushed residual scan)."""
    return QUERIES["dataset_pruned_read"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star
    dedup/similarity/text/multimodal/streaming operators)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins — one per queries() entry, with
    rows-only exceptions ONLY where no SQL engine can replay the
    computation: embedding_pca (eigendecomposition),
    text_compression_signal (zlib DEFLATE), and
    embedding_pq_topk / embedding_pq_persisted /
    embedding_ivfpq_query (k-means codebooks);
    all numerically asserted against python twins in tests. (The engine-specific
    xxhash64 minhash/simhash spellings are library API + bench lines;
    their registry representatives are the md5 twins running the
    identical pipeline.)"""
    return dict(ORACLES)
