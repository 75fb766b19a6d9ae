"""File-format dispatch for dataset payload files.

Mirrors the reference's DataFrameSerializer registry
(/root/reference/plateau/serialization/_generic.py:53-129): the file
*suffix* names the format, each dataset may mix formats per partition,
and readers dispatch per file. Formats:

  ``.parquet``          — the default; Spark's vectorized reader with
                          Catalyst filter/projection pushdown.
  ``.csv`` / ``.csv.gz``— the reference's CsvSerializer contract
                          (/root/reference/plateau/serialization/_csv.py:33-118):
                          ``;`` separator, UTF-8, header row, gzip when
                          compressed. Types come from the dataset's
                          commit-file schema (stronger than the
                          reference's pandas re-inference).
  ``.json``/``.json.gz``— EXTENSION beyond the reference: JSON-lines,
                          the raw-crawl interchange format for LLM
                          corpus ingest. Types restored from the
                          commit-file schema on read (JSON itself is
                          stringly); gzip when compressed.
  ``.orc``              — EXTENSION beyond the reference: ORC, the
                          other Spark-native columnar format
                          (vectorized reader, predicate pushdown);
                          snappy when compressed.

Reading is still one distributed plan: surviving partition files are
grouped by format, each group becomes one scan, groups union —
Catalyst handles each source's pushdown independently.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

from plateau_spark.core import naming

CSV_OPTIONS = {"sep": ";", "header": "true", "encoding": "UTF-8"}


def format_of(key: str) -> str:
    """Format name for a payload file key (suffix dispatch)."""
    if key.endswith(naming.PARQUET_SUFFIX):
        return "parquet"
    if key.endswith(naming.CSV_SUFFIXES):
        return "csv"
    if key.endswith(naming.JSON_SUFFIXES):
        return "json"
    if key.endswith(naming.ORC_SUFFIX):
        return "orc"
    raise ValueError(f"The specified file format for '{key}' is not supported")


def is_payload_file(key: str) -> bool:
    return key.endswith(
        (naming.PARQUET_SUFFIX, naming.ORC_SUFFIX)
        + naming.CSV_SUFFIXES
        + naming.JSON_SUFFIXES
    )


def write_staged(
    df: DataFrame,
    url: str,
    partition_on: Sequence[str],
    *,
    file_format: str = "parquet",
    compress: bool = True,
) -> None:
    """One Spark write job into the staging prefix, format-dispatched."""
    writer = df.write.mode("append")
    if partition_on:
        writer = writer.partitionBy(*partition_on)
    if file_format == "parquet":
        writer.parquet(url)
    elif file_format == "csv":
        w = writer.options(**CSV_OPTIONS)
        if compress:
            w = w.option("compression", "gzip")
        w.csv(url)
    elif file_format == "json":
        w = writer
        if compress:
            w = w.option("compression", "gzip")
        w.json(url)
    elif file_format == "orc":
        writer.option("compression", "snappy" if compress else "none").orc(url)
    else:
        raise ValueError(f"Unsupported file_format: {file_format!r}")


def _reader(spark: SparkSession, schema, base: str) -> DataFrameReader:
    # schema=None: reference-written dataset whose commit file carries no
    # inline schema — parquet self-describes, and basePath lets Spark
    # derive the hive partition columns from the explicit path list
    rdr = spark.read.option("basePath", base)
    return rdr if schema is None else rdr.schema(schema)


def read_files(
    spark: SparkSession,
    schema,
    base: str,
    file_keys_to_urls: dict[str, str],
) -> DataFrame:
    """Format-dispatched scan over explicit file paths → one DataFrame."""
    groups: dict[str, list[str]] = {}
    for key, url in file_keys_to_urls.items():
        groups.setdefault(format_of(key), []).append(url)
    parts: list[DataFrame] = []
    for fmt, urls in sorted(groups.items()):
        rdr = _reader(spark, schema, base)
        if fmt == "parquet":
            parts.append(rdr.parquet(*urls))
        elif fmt == "csv":
            parts.append(rdr.options(**CSV_OPTIONS).csv(urls))
        elif fmt == "orc":
            # DataFrameReader.orc takes one path-or-list (not varargs)
            parts.append(rdr.orc(urls))
        else:
            parts.append(rdr.json(urls))
    return reduce(lambda a, b: a.unionByName(b), parts)
