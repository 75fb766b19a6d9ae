"""Dataflow helpers mirroring the reference's pandas utilities —
re-expressed as distributed DataFrame ops (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plateau_spark.core.metadata import DatasetMetadata
from plateau_spark.core.store import Store


def sort_dataframe(df: DataFrame, columns: Sequence[str], ascending: bool = True) -> DataFrame:
    """Global multi-column sort (range-partitioned exchange).
    Reference: sort_dataframe (plateau/utils/pandas.py:145-176)."""
    cols = [F.col(c).asc() if ascending else F.col(c).desc() for c in columns]
    return df.orderBy(*cols)


def is_dataframe_sorted(df: DataFrame, columns: Sequence[str]) -> bool:
    """Whether the DataFrame is globally sorted by ``columns`` (ascending,
    within-partition AND across the partition ordering).

    Reference: is_dataframe_sorted (plateau/utils/pandas.py:90-142) —
    there a vectorized pandas check; here one aggregation comparing each
    row's sort key against the previous row's via a window over the
    natural partition order. Like the reference, null sort-key values
    are not handled specially. Runs one Spark job (it must look at the
    data); an empty DataFrame is sorted.
    """
    from pyspark.sql import Window

    key = F.struct(*[F.col(c) for c in columns])
    per_part = df.select(
        F.spark_partition_id().alias("pid"),
        F.monotonically_increasing_id().alias("rid"),
        key.alias("k"),
    )
    w2 = Window.partitionBy("pid").orderBy("rid")
    flags = per_part.select(
        "pid",
        "k",
        F.when(F.lag("k").over(w2) > F.col("k"), 1).otherwise(0).alias("bad"),
    )
    agg = flags.groupBy("pid").agg(
        F.sum("bad").alias("bad"), F.min("k").alias("lo"), F.max("k").alias("hi")
    ).collect()
    if any(r.bad > 0 for r in agg):
        return False
    ordered = sorted(agg, key=lambda r: r.pid)
    for prev, nxt in zip(ordered, ordered[1:]):
        if prev.hi > nxt.lo:
            return False
    return True


def repartition_ratio(df: DataFrame, ratio: float) -> DataFrame:
    """Coalesce to ``ceil(npartitions / ratio)`` partitions — merge small
    partitions before expensive downstream work without a shuffle.

    Reference: the ``repartition_ratio`` knob of dask dataframe ops
    (plateau/io/dask/dataframe.py:248-254).
    """
    import math

    n = df.rdd.getNumPartitions()
    return df.coalesce(max(1, math.ceil(n / float(ratio))))


def apply_to_partitions(df: DataFrame, fn, schema) -> DataFrame:
    """Run an arbitrary pandas function over each partition's data —
    the general UDF surface (reference: MetaPartition.apply,
    plateau/io_components/metapartition.py:1325-1357).

    ``fn``: pandas.DataFrame → pandas.DataFrame; ``schema``: the result
    schema (DDL string or StructType). Arrow-batched via mapInPandas —
    fn sees each batch, exactly like the reference's per-partition
    apply sees each MetaPartition's frame.
    """

    def _runner(batches):
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_runner, schema)


def aggregate_to_lists(
    df: DataFrame, by: Sequence[str], value_col: str, *, sort_values: bool = True
) -> DataFrame:
    """groupBy → collect values into arrays.

    Reference: aggregate_to_lists (plateau/utils/pandas.py:251-326) — a
    hand-rolled pandas fast path there; one hash aggregation here.
    ``sort_values`` makes the array order deterministic (collect_list
    order is not guaranteed across tasks).
    """
    agg = F.collect_list(value_col)
    if sort_values:
        agg = F.sort_array(agg)
    return df.groupBy(*by).agg(agg.alias(value_col))


def merge_dataframes_robust(left: DataFrame, right: DataFrame, how: str = "inner") -> DataFrame:
    """Join on shared columns; cross join when none are shared.
    Reference: merge_dataframes_robust (plateau/utils/pandas.py:329-365)."""
    shared = [c for c in left.columns if c in set(right.columns)]
    if shared:
        return left.join(right, on=shared, how=how)
    return left.crossJoin(right)


def hash_dataset(
    spark: SparkSession,
    store: Store | str,
    dataset_uuid: str,
    *,
    group_key: Sequence[str] | None = None,
    subset: Sequence[str] | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Order-independent content hash per partition file (or per group).

    Reference: hash_dataset (plateau/io/dask/dataframe.py:619-697) —
    per-row uint64 hashes summed per group. Here: a per-row hash over
    the column subset, summed per input file / group key — one scan,
    one partial-aggregated shuffle.

    ``hash_fn``: ``"xxhash64"`` (default; fastest, JVM-specific) or
    ``"md5"`` — the portable mode: 60 bits of md5 over the
    '|'-joined string forms, reproducible bit-for-bit in any engine
    with md5 (DuckDB twin: CAST('0x'||substr(md5(concat_ws('|',...)),
    1,15) AS UBIGINT)), for cross-system dataset comparison.
    """
    from plateau_spark.sources.dataset import read_dataset_as_dataframe

    store = store if isinstance(store, Store) else Store(store)
    df = read_dataset_as_dataframe(spark, store, dataset_uuid)
    cols = list(subset) if subset else df.columns
    if hash_fn == "md5":
        joined = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        row_hash = F.conv(F.substring(F.md5(F.encode(joined, "UTF-8")), 1, 15), 16, 10).cast(
            "decimal(38,0)"
        )
    elif hash_fn == "xxhash64":
        row_hash = F.xxhash64(*[F.col(c) for c in cols])
    else:
        raise ValueError(f"Unknown hash_fn: {hash_fn!r}")
    hashed = df.select(
        *(group_key or []),
        F.input_file_name().alias("__file__"),
        row_hash.alias("__h__"),
    )
    keys = list(group_key) if group_key else ["__file__"]
    # sum in unbounded decimal: a long sum of xxhash64 values overflows
    # (ANSI mode aborts the job); the hash only needs order-independence
    return hashed.groupBy(*keys).agg(
        F.sum(F.col("__h__").cast("decimal(38,0)")).alias("content_hash")
    )


def collect_dataset_metadata(
    spark: SparkSession,
    store: Store | str,
    dataset_uuid: str,
    *,
    frac: float = 1.0,
) -> DataFrame:
    """Parquet footer/row-group statistics table for a dataset.

    Reference: collect_dataset_metadata
    (plateau/io/dask/dataframe.py:535-616,
    plateau/io_components/metapartition.py:1277-1323). Footer reads run
    as an Arrow-batched ``mapInPandas`` over a paths DataFrame — each
    task opens only its files' footers, the result stays distributed
    (no driver materialization), and URLs go through a pyarrow-scheme
    translation so the same code runs against object stores
    (``s3a://`` → ``s3://`` etc.), not just local paths.
    Parquet partitions only (footers are a parquet concept) — CSV
    partitions are skipped, mirroring the reference's parquet-only
    contract.

    SEMANTIC DIVERGENCE, deliberate: ``frac`` samples partitions with a
    deterministic stride over the label-sorted list, where the
    reference samples randomly (plateau/io/dask/dataframe.py:556-566).
    Same expected coverage, but reproducible across runs — a stats
    query that returns different rows every call is a debugging
    hazard; pass a different label ordering if variety is wanted.
    """
    store = store if isinstance(store, Store) else Store(store)
    meta = DatasetMetadata.load(store, dataset_uuid)
    parts = sorted(meta.partitions.values(), key=lambda p: p.label)
    if frac < 1.0:
        step = max(1, int(1 / frac))
        parts = parts[::step]
    rows = [
        (p.label, store.url(p.file))
        for p in parts
        if p.file.endswith(".parquet")
    ]
    schema = (
        "partition_label string, num_rows long, num_row_groups long, "
        "total_byte_size long, serialized_size long"
    )
    if not rows:
        return spark.createDataFrame([], schema)
    paths_df = spark.createDataFrame(rows, "partition_label string, url string")
    paths_df = paths_df.repartition(min(len(rows), 256))

    def footer_stats(batches):
        import pandas as pd
        import pyarrow.parquet as _pq

        for pdf in batches:
            out = []
            for label, url in zip(pdf["partition_label"], pdf["url"]):
                md = _pq.ParquetFile(_pyarrow_location(url)).metadata
                out.append(
                    (
                        label,
                        md.num_rows,
                        md.num_row_groups,
                        sum(
                            md.row_group(i).total_byte_size
                            for i in range(md.num_row_groups)
                        ),
                        md.serialized_size,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "partition_label",
                    "num_rows",
                    "num_row_groups",
                    "total_byte_size",
                    "serialized_size",
                ],
            )

    return paths_df.mapInPandas(footer_stats, schema)


def _pyarrow_location(url: str) -> str:
    """Translate a Hadoop-style URI to one pyarrow's filesystems accept:
    ``file://`` → bare path, ``s3a://``/``s3n://`` → ``s3://``;
    others pass through (pyarrow handles s3/gcs/hdfs natively)."""
    if url.startswith("file://"):
        return url[len("file://"):]
    for scheme in ("s3a://", "s3n://"):
        if url.startswith(scheme):
            return "s3://" + url[len(scheme):]
    return url


def profile_numeric_columns(
    df: DataFrame, columns: Sequence[str], *, approx_distinct: bool = False
) -> DataFrame:
    """Single-pass data-quality profile: one row per column with
    (min_value, max_value, null_count, distinct_count), all from ONE
    aggregation job (no per-column scans) unpivoted via ``stack``.

    ``approx_distinct=True`` swaps exact countDistinct for HyperLogLog
    ``approx_count_distinct`` — at 100 TB the exact variant is a full
    shuffle per column while HLL is a fixed-size sketch merged map-side;
    exact is the default because it is oracle-checkable.

    Numeric columns only: min/max surface as DOUBLE so every row has
    one type (string min/max rendering differs across engines).
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    ndv = F.approx_count_distinct if approx_distinct else F.countDistinct
    aggs = []
    for c in columns:
        aggs += [
            F.min(F.col(c)).cast("double").alias(f"__{c}_min__"),
            F.max(F.col(c)).cast("double").alias(f"__{c}_max__"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__{c}_nulls__"),
            ndv(F.col(c)).alias(f"__{c}_ndv__"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `__{c}_min__`, `__{c}_max__`, `__{c}_nulls__`, CAST(`__{c}_ndv__` AS BIGINT)"
        for c in columns
    )
    return one.selectExpr(
        f"stack({len(columns)}, {stack}) as "
        "(column, min_value, max_value, null_count, distinct_count)"
    )


def skew_profile(
    df: DataFrame,
    columns: Sequence[str],
    *,
    k: int = 10,
) -> DataFrame:
    """Heavy-hitter profile: the top-``k`` most frequent values per
    column with absolute count and share — the diagnostic to run
    BEFORE keying a 100 TB join or aggregation on a column (a single
    value holding >1% of rows means a straggler task at shuffle time;
    the fix is salting, broadcast, or AQE skew handling — but only if
    you know).

    Output: (col_name, value STRING, cnt BIGINT, share DOUBLE,
    rnk INT) — share is of the column's NON-NULL rows; ties break by
    value ascending, so the result is deterministic.

    Scale shape: all columns profile in ONE shuffle — values unpivot
    to (col_name, value) long format via ``stack`` (a projection, not
    a join), counts come from one map-side-combined aggregation, and
    the top-k selection is TWO-PHASE: a bucket-local row_number cut
    (32-way, so no single task ever sorts a full column's distinct
    values — the all-distinct id-column worst case) followed by a
    global cut over ≤ 32·k survivors per column. A plain
    ``Window.partitionBy(col_name)`` would put every distinct value of
    a column into one task.
    """
    from pyspark.sql import Window

    if not columns:
        raise ValueError("columns must be non-empty")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    stack = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in columns
    )
    longf = df.selectExpr(
        f"stack({len(columns)}, {stack}) as (col_name, value)"
    ).where(F.col("value").isNotNull())
    counts = longf.groupBy("col_name", "value").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.groupBy("col_name").agg(F.sum("cnt").alias("__n"))
    order = [F.col("cnt").desc(), F.col("value").asc()]
    w_local = Window.partitionBy(
        "col_name", F.pmod(F.xxhash64("value"), F.lit(32))
    ).orderBy(*order)
    survivors = (
        counts.withColumn("__rk", F.row_number().over(w_local))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
    w_global = Window.partitionBy("col_name").orderBy(*order)
    return (
        survivors.withColumn("rnk", F.row_number().over(w_global))
        .where(F.col("rnk") <= k)
        .join(F.broadcast(totals), "col_name")
        .select(
            "col_name",
            "value",
            "cnt",
            (F.col("cnt").cast("double") / F.col("__n")).alias("share"),
            "rnk",
        )
    )
