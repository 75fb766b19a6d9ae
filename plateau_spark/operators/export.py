"""Training-data export: size-bounded JSONL shards with a verified
manifest.

Not present in the reference (SURVEY.md §2.7 north-star tier) — the
final stage of an LLM data pipeline: ship the curated corpus as
newline-delimited JSON shards a training loader can stream, plus a
manifest proving what landed on disk.

Design rules for scale:
  - shard assignment is a DETERMINISTIC md5 hash of a key column (the
    same engine-replayable family as ``operators.sampling``) — rerun-
    and engine-stable, so an incremental re-export reproduces the
    same layout;
  - the write is one distributed job (``partitionBy(shard)``); the
    manifest is built by RE-READING what was written — it verifies the
    files, not the plan;
  - the per-shard content signature is a commutative reduction
    (sum + bit_xor over a 60-bit md5 chunk per row) — partial-agg
    friendly, O(1) state per shard, never a collect_list of row
    digests (corpus-sized in one task at 100 TB).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_COL = "shard"


def _shard_col(key_col: str, n_shards: int, salt: str) -> F.Column:
    """Deterministic shard id in [0, n_shards): first 8 md5 hex chars of
    ``salt|key`` mod n_shards (DuckDB twin:
    CAST('0x'||substr(md5(...),1,8) AS BIGINT) % n)."""
    h = F.md5(
        F.encode(
            F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")), "UTF-8"
        )
    )
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_shards))


def _row_sig(cols: Sequence[str]) -> F.Column:
    """60-bit row digest: md5 over the '\\x01'-joined column values
    (NULL → the literal '\\x00' sentinel so NULL and '' differ)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols
    ]
    h = F.md5(F.encode(F.concat_ws("\x01", *parts), "UTF-8"))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    n_shards: int = 64,
    salt: str = "export",
    compression: str | None = "gzip",
    mode: str = "error",
) -> None:
    """Write ``df`` as ``n_shards`` hash-sharded JSONL directories under
    ``path`` (``shard=N/part-*.json[.gz]``). Pure distributed write —
    rows land in the shard chosen by ``_shard_col`` so a re-export with
    the same salt reproduces the layout. Shard dirs are Hive-style, so
    a loader (or ``spark.read.json(path)``) can partition-prune on
    ``shard``.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    staged = df.withColumn(SHARD_COL, _shard_col(key_col, n_shards, salt))
    # repartition by shard first: each output task then holds whole
    # shards, so partitionBy emits ~1 file per shard instead of
    # (tasks × shards) small files — the small-file problem is the
    # classic export failure mode at scale.
    writer = (
        staged.repartition(n_shards, SHARD_COL)
        .write.partitionBy(SHARD_COL)
        .mode(mode)
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def shard_manifest(
    spark: SparkSession,
    path: str,
    schema: str,
    sig_cols: Sequence[str],
) -> DataFrame:
    """Manifest built from RE-READING an exported shard tree: per shard
    the row count, file count, and an order-insensitive content
    signature (sum + bit_xor of the per-row 60-bit md5 digest over
    ``sig_cols``). Verifies bytes on disk, not the writing plan; the
    signature is replayable from the source table by any engine with
    md5, which is how the oracle checks the round trip.
    """
    back = spark.read.schema(f"{schema}").json(path)
    sig = _row_sig(sig_cols)
    # bit_xor never overflows; the modular sum (bounded by rows × 10007)
    # catches the duplicate-row pairs XOR cancels. A plain SUM of 60-bit
    # digests would overflow int64 at a few hundred rows (ANSI-mode
    # Spark throws; DuckDB widens to int128 — cross-engine mismatch).
    return (
        back.withColumn("__sig__", sig)
        .withColumn("__file__", F.input_file_name())
        .groupBy(F.col(SHARD_COL).cast("int").alias(SHARD_COL))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.pmod(F.col("__sig__"), F.lit(10007))).alias("sig_sum"),
            F.expr("bit_xor(__sig__)").alias("sig_xor"),
            F.countDistinct("__file__").alias("n_files"),
        )
    )


def export_with_manifest(
    df: DataFrame,
    spark: SparkSession,
    path: str,
    *,
    key_col: str,
    sig_cols: Sequence[str],
    n_shards: int = 64,
    salt: str = "export",
    compression: str | None = "gzip",
    mode: str = "error",
) -> DataFrame:
    """Export + verified manifest in one call: write the shards, then
    re-read them and return the per-shard manifest. The data schema for
    the re-read is derived from ``df`` (the shard column is appended by
    the reader as a partition column)."""
    export_jsonl_shards(
        df, path,
        key_col=key_col, n_shards=n_shards, salt=salt,
        compression=compression, mode=mode,
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return shard_manifest(spark, path, schema, sig_cols)
