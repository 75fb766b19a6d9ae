"""Dataset CRUD: store / read / update / commit / delete / GC.

The Spark-first re-expression of the reference's io layer
(/root/reference/plateau/io/eager.py, plateau/io_components/write.py,
plateau/io_components/update.py). The execution substrate is the Spark
DataFrame — writes are ``df.write.partitionBy(...).parquet`` jobs, reads
are ``spark.read.parquet(*pruned_paths)`` — while dataset state lives in
one JSON commit file (core/metadata.py) whose single atomic put IS the
commit (docs/spec/format_specification.rst:34-54).

Write protocol (store_dataset_from_partitions,
plateau/io_components/write.py:148-233):
  1. executors write parquet files under ``<uuid>/table/`` (hive dirs)
  2. driver enumerates the new files, builds partitions + indexes
  3. driver puts the metadata JSON — readers never see step 1-2 state.

Update semantics (plateau/io_components/update.py:1-54): adding new
partitions and deleting existing partitions (via ``delete_scope``);
never in-place mutation of a partition — partition-level copy-on-write.
"""

from __future__ import annotations

import posixpath
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plateau_spark.core import naming
from plateau_spark.core.metadata import DatasetMetadata, Partition
from plateau_spark.core.predicates import (
    Predicates,
    apply_predicates,
    check_predicates,
)
from plateau_spark.core.schema import (
    SchemaValidationError,
    normalize_dataframe,
    normalized_column_order,
    validate_compatible,
)
from plateau_spark.core.store import Store
from plateau_spark.core.urlencode import decode_partition_label
from plateau_spark.plans.index import SecondaryIndex
from plateau_spark.plans.pruning import plan_scan


def _table_prefix(dataset_uuid: str) -> str:
    return f"{dataset_uuid}/{naming.TABLE_NAME}/"


def _ensure_store(store: Store | str) -> Store:
    return store if isinstance(store, Store) else Store(store)


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------


def _check_no_null_partition_keys(df: DataFrame, partition_on: Sequence[str]) -> None:
    """The reference hard-errors on null partition values
    (plateau/io_components/metapartition.py:1195-1200); Spark would
    silently write __HIVE_DEFAULT_PARTITION__ (SURVEY §7 hard-part 6)."""
    cond = None
    for k in partition_on:
        c = F.col(k).isNull()
        cond = c if cond is None else (cond | c)
    if cond is not None and not df.where(cond).isEmpty():
        raise ValueError(
            f"Original dataframe size does not match a specified partitioning: "
            f"null values in partition columns {list(partition_on)}"
        )


def _write_files(
    df: DataFrame,
    store: Store,
    dataset_uuid: str,
    partition_on: Sequence[str],
    *,
    sort_partitions_by: Sequence[str] | None = None,
    num_buckets: int | None = None,
    bucket_by: Sequence[str] | None = None,
    repartition: bool = True,
) -> list[Partition]:
    """One Spark write job; returns the new Partition entries.

    Shuffle strategy (shuffle_store_dask_partitions,
    plateau/io/dask/_shuffle.py:41-153, re-expressed):
      - with buckets: repartition on (partition_on ⊕ hash-bucket) —
        guarantees ≤ num_buckets files per partition key while keeping
        each (key, bucket) in exactly one task (no tiny-file explosion).
      - else: repartition on partition_on → exactly one file per key
        (the reference's one-value-per-file primary-index guarantee).
    The pack/compress-payload-before-shuffle trick of the reference is
    unnecessary on Spark (Tungsten binary rows + lz4 shuffle compression).
    """
    table_key = _table_prefix(dataset_uuid).rstrip("/")
    before = set(store.iter_keys(_table_prefix(dataset_uuid)))

    out = df
    partition_on = list(partition_on)
    if num_buckets and bucket_by:
        out = out.withColumn(
            "__bucket__", F.pmod(F.xxhash64(*[F.col(c) for c in bucket_by]), F.lit(num_buckets))
        )
        out = out.repartition(*(partition_on + ["__bucket__"])) if partition_on else out.repartition(
            num_buckets, "__bucket__"
        )
        out = out.drop("__bucket__")
    elif partition_on and repartition:
        out = out.repartition(*partition_on)
    if sort_partitions_by:
        # disjoint row-group stats for better pushdown
        # (sort_values_categorical, plateau/io_components/utils.py:399-410)
        out = out.sortWithinPartitions(*sort_partitions_by)

    writer = out.write.mode("append")
    if partition_on:
        writer = writer.partitionBy(*partition_on)
    writer.parquet(store.url(table_key))

    after = store.iter_keys(_table_prefix(dataset_uuid))
    key_types = {f.name: f.dataType for f in df.schema.fields if f.name in partition_on}
    partitions = []
    for key in after:
        if key in before or not key.endswith(naming.PARQUET_SUFFIX):
            continue
        rel = key[len(_table_prefix(dataset_uuid)):]
        label = rel
        key_values = (
            decode_partition_label(posixpath.dirname(rel), partition_on, key_types)
            if partition_on
            else {}
        )
        partitions.append(Partition(label=label, file=key, key_values=key_values))
    return partitions


def _build_indices_for_files(
    spark: SparkSession,
    store: Store,
    metadata: DatasetMetadata,
    partitions: Sequence[Partition],
    columns: Sequence[str],
) -> dict[str, SecondaryIndex]:
    """Distributed index build over the given partitions' files.

    One Spark job per indexed column set: scan only the index columns
    (column pruning hits the parquet scan), map file → label with a
    broadcast lookup, aggregate distinct (value, label) pairs.
    Reference: MetaPartition.build_indices
    (plateau/io_components/metapartition.py:1005-1045).
    """
    if not partitions or not columns:
        return {c: SecondaryIndex(c) for c in columns}
    file_to_label = {store.url(p.file): p.label for p in partitions}
    # also match without scheme (input_file_name returns the fully-qualified URI)
    urls = list(file_to_label.keys())
    df = spark.read.option("basePath", store.url(_table_prefix(metadata.uuid).rstrip("/"))).parquet(*urls)
    mapping = spark.createDataFrame(
        [(u, l) for u, l in file_to_label.items()], "___file string, __label__ string"
    )
    out: dict[str, SecondaryIndex] = {}
    key_cols = set(metadata.partition_keys)
    for col in columns:
        if col in key_cols:
            # primary index — derivable from key_values, no data pass needed
            idx = SecondaryIndex.from_pairs(
                col, [(p.key_values[col], p.label) for p in partitions]
            )
            out[col] = idx
            continue
        pairs = (
            df.select(F.col(col), F.input_file_name().alias("___file"))
            .where(F.col(col).isNotNull())
            .dropDuplicates([col, "___file"])
            .join(F.broadcast(mapping), "___file")
            .select(col, "__label__")
            .collect()
        )
        out[col] = SecondaryIndex.from_pairs(col, [(r[0], r[1]) for r in pairs])
    return out


def store_dataframe_as_dataset(
    spark: SparkSession,
    store: Store | str,
    dataset_uuid: str,
    df: DataFrame,
    *,
    partition_on: Sequence[str] | None = None,
    secondary_indices: Sequence[str] | None = None,
    sort_partitions_by: Sequence[str] | None = None,
    num_buckets: int | None = None,
    bucket_by: Sequence[str] | None = None,
    overwrite: bool = False,
    metadata: dict[str, Any] | None = None,
) -> DatasetMetadata:
    """Create a new dataset from a DataFrame (one write job + one commit).

    Reference: store_dataframes_as_dataset
    (/root/reference/plateau/io/eager.py:449-491) + write_partition
    (plateau/io_components/write.py:38-79).
    """
    naming.validate_dataset_uuid(dataset_uuid)
    store = _ensure_store(store)
    if DatasetMetadata.exists(store, dataset_uuid):
        if not overwrite:
            raise RuntimeError(
                f"Dataset `{dataset_uuid}` already exists and overwrite is not permitted"
            )
        delete_dataset(store, dataset_uuid)

    partition_on = list(partition_on or [])
    df = normalize_dataframe(df, partition_on)
    if partition_on:
        _check_no_null_partition_keys(df, partition_on)

    partitions = _write_files(
        df,
        store,
        dataset_uuid,
        partition_on,
        sort_partitions_by=sort_partitions_by,
        num_buckets=num_buckets,
        bucket_by=bucket_by,
    )

    ds = DatasetMetadata(
        uuid=dataset_uuid,
        partitions={p.label: p for p in partitions},
        partition_keys=partition_on,
        schema=df.schema,
        metadata=metadata or {},
    )
    for col in secondary_indices or []:
        idx = _build_indices_for_files(spark, store, ds, partitions, [col])[col]
        ds.indices[col] = idx.persist(store, dataset_uuid, spark)
    ds.commit(store)
    return ds


def create_empty_dataset_header(
    spark: SparkSession,
    store: Store | str,
    dataset_uuid: str,
    schema,
    *,
    partition_on: Sequence[str] | None = None,
    overwrite: bool = False,
) -> DatasetMetadata:
    """Schema-only dataset (reference: plateau/io/eager.py:494-552)."""
    store = _ensure_store(store)
    if not overwrite and DatasetMetadata.exists(store, dataset_uuid):
        raise RuntimeError(f"Dataset `{dataset_uuid}` already exists")
    from plateau_spark.core.schema import normalize_schema

    ds = DatasetMetadata(
        uuid=dataset_uuid,
        partition_keys=list(partition_on or []),
        schema=normalize_schema(schema),
        explicit_partitions=False,
    )
    ds.commit(store)
    return ds


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def read_dataset_as_dataframe(
    spark: SparkSession,
    store: Store | str,
    dataset_uuid: str,
    *,
    columns: Sequence[str] | None = None,
    predicates: Predicates | None = None,
    dispatch_by: Sequence[str] | None = None,
    filter_query: str | None = None,
) -> DataFrame:
    """Pruned scan → one distributed DataFrame.

    Planning (driver, O(1) store calls): metadata GET → partition-key +
    secondary-index pruning → explicit path list. Execution (executors):
    native parquet scan with Catalyst filter/projection pushdown on the
    residual predicate.

    Reference lifecycle: read_table / read_dataset_as_ddf traced in
    SURVEY.md §3.1-3.2 (plateau/io/eager.py:211-292,
    plateau/io_components/read.py:17-126,
    plateau/io_components/metapartition.py:588-722).

    ``dispatch_by`` repartitions the result so each group of the given
    columns is co-located in one task — the Spark analog of the
    reference's logical regrouping (plateau/io_components/read.py:66-95).
    """
    if predicates is not None and filter_query is not None:
        raise ValueError("Cannot use both `predicates` and `filter_query`")
    store = _ensure_store(store)
    meta = DatasetMetadata.load(store, dataset_uuid)
    check_predicates(predicates)

    if columns is not None:
        known = {f.name for f in meta.schema.fields}
        missing = [c for c in columns if c not in known]
        if missing:
            raise ValueError(f"Columns not found in dataset: {missing}")

    surviving = plan_scan(meta, store, predicates)
    base = store.url(_table_prefix(dataset_uuid).rstrip("/"))

    if not surviving:
        df = spark.createDataFrame([], schema=meta.schema)
    else:
        paths = [store.url(p.file) for p in surviving]
        df = (
            spark.read.schema(meta.schema)
            .option("basePath", base)
            .parquet(*paths)
        )
        # canonical column order (partition keys first, payload alphabetical)
        df = df.select(*normalized_column_order(df.columns, meta.partition_keys))

    df = apply_predicates(df, predicates)
    if filter_query:
        df = df.where(filter_query)
    if columns is not None:
        df = df.select(*[c for c in normalized_column_order(columns, meta.partition_keys) if c in columns])
    if dispatch_by:
        df = df.repartition(*dispatch_by)
    return df


# Alias matching the reference's primary entry point name.
read_table = read_dataset_as_dataframe


def read_dataset_as_dataframe_iterator(
    spark: SparkSession,
    store: Store | str,
    dataset_uuid: str,
    **kwargs: Any,
):
    """Bounded-memory row iterator (reference: plateau/io/iter.py:101-163
    → Spark ``toLocalIterator``, one partition in flight at a time)."""
    return read_dataset_as_dataframe(spark, store, dataset_uuid, **kwargs).toLocalIterator()


# ---------------------------------------------------------------------------
# update / commit
# ---------------------------------------------------------------------------


def _resolve_delete_scope(
    meta: DatasetMetadata, store: Store, delete_scope: Sequence[dict[str, Any]] | None
) -> set[str]:
    """delete_scope = list of {col: value} dicts → partition labels to drop.

    Key columns match against stored key_values; indexed columns resolve
    through the secondary index. Reference:
    plateau/io_components/update.py:12-42, plateau/core/dataset.py:324-354.
    """
    if not delete_scope:
        return set()
    to_remove: set[str] = set()
    for scope in delete_scope:
        if not scope:
            continue
        candidate: set[str] | None = None
        for col, value in scope.items():
            if col in meta.partition_keys:
                labels = {
                    l for l, p in meta.partitions.items() if p.key_values.get(col) == value
                }
            elif col in meta.indices:
                idx = SecondaryIndex.load(store, meta.indices[col], col)
                labels = idx.query(value) & set(meta.partitions)
            else:
                raise ValueError(
                    f"delete_scope column {col!r} is neither a partition key nor indexed"
                )
            candidate = labels if candidate is None else (candidate & labels)
        if candidate:
            to_remove.update(candidate)
    return to_remove


def update_dataset_from_dataframe(
    spark: SparkSession,
    store: Store | str,
    dataset_uuid: str,
    df: DataFrame | None = None,
    *,
    delete_scope: Sequence[dict[str, Any]] | None = None,
    sort_partitions_by: Sequence[str] | None = None,
    num_buckets: int | None = None,
    bucket_by: Sequence[str] | None = None,
    metadata: dict[str, Any] | None = None,
) -> DatasetMetadata:
    """Add partitions and/or delete partitions in ONE atomic commit.

    Reference: update_dataset_from_dataframes
    (/root/reference/plateau/io/eager.py:629-704) +
    update_dataset_from_partitions (plateau/io_components/update.py:20-54).
    """
    store = _ensure_store(store)
    meta = DatasetMetadata.load(store, dataset_uuid)

    new_partitions: list[Partition] = []
    if df is not None:
        df = normalize_dataframe(df, meta.partition_keys)
        validate_compatible(meta.schema, df.schema)
        if meta.partition_keys:
            _check_no_null_partition_keys(df, meta.partition_keys)
        new_partitions = _write_files(
            df,
            store,
            dataset_uuid,
            meta.partition_keys,
            sort_partitions_by=sort_partitions_by,
            num_buckets=num_buckets,
            bucket_by=bucket_by,
        )

    removed = _resolve_delete_scope(meta, store, delete_scope)

    # commit: drop removed, add new, refresh indexes, single put
    for label in removed:
        del meta.partitions[label]
    dupes = [p.label for p in new_partitions if p.label in meta.partitions]
    if dupes:
        raise RuntimeError(f"Duplicate partition labels in commit: {dupes}")
    for p in new_partitions:
        meta.partitions[p.label] = p

    if meta.indices:
        new_idx = _build_indices_for_files(
            spark, store, meta, new_partitions, list(meta.indices)
        )
        for col, key in list(meta.indices.items()):
            idx = SecondaryIndex.load(store, key, col)
            if removed:
                idx = idx.remove_partitions(removed)
            idx = idx.update(new_idx[col])
            meta.indices[col] = idx.persist(store, dataset_uuid, spark)
    if metadata:
        meta.metadata.update(metadata)
    meta.explicit_partitions = True
    meta.commit(store)
    return meta


def write_single_partition(
    spark: SparkSession,
    store: Store | str,
    dataset_uuid: str,
    df: DataFrame,
    *,
    partition_on: Sequence[str] | None = None,
    sort_partitions_by: Sequence[str] | None = None,
) -> list[Partition]:
    """Write files WITHOUT touching metadata — pair with ``commit_dataset``
    for concurrent-writer workflows (reference:
    plateau/io/eager.py:555-626). Uncommitted files are invisible to
    readers (explicit-path scans) and reclaimable by GC."""
    store = _ensure_store(store)
    partition_on = list(partition_on or [])
    df = normalize_dataframe(df, partition_on)
    if partition_on:
        _check_no_null_partition_keys(df, partition_on)
    return _write_files(
        df, store, dataset_uuid, partition_on, sort_partitions_by=sort_partitions_by
    )


def commit_dataset(
    spark: SparkSession,
    store: Store | str,
    dataset_uuid: str,
    *,
    new_partitions: Sequence[Partition] | None = None,
    delete_scope: Sequence[dict[str, Any]] | None = None,
    metadata: dict[str, Any] | None = None,
    schema=None,
    partition_on: Sequence[str] | None = None,
) -> DatasetMetadata:
    """Attach pre-written partitions / delete / add metadata atomically.

    Reference: commit_dataset (/root/reference/plateau/io/eager.py:295-420).
    Creates the dataset if it does not exist yet (requires ``schema``).
    """
    store = _ensure_store(store)
    if DatasetMetadata.exists(store, dataset_uuid):
        meta = DatasetMetadata.load(store, dataset_uuid)
    else:
        if schema is None:
            raise ValueError("Committing a new dataset requires `schema`")
        from plateau_spark.core.schema import normalize_schema

        meta = DatasetMetadata(
            uuid=dataset_uuid,
            partition_keys=list(partition_on or []),
            schema=normalize_schema(schema),
        )

    removed = _resolve_delete_scope(meta, store, delete_scope)
    for label in removed:
        del meta.partitions[label]
    for p in new_partitions or []:
        if p.label in meta.partitions:
            raise RuntimeError(f"Duplicate partition label in commit: {p.label}")
        meta.partitions[p.label] = p

    if meta.indices:
        new_idx = _build_indices_for_files(
            spark, store, meta, list(new_partitions or []), list(meta.indices)
        )
        for col, key in list(meta.indices.items()):
            idx = SecondaryIndex.load(store, key, col)
            if removed:
                idx = idx.remove_partitions(removed)
            idx = idx.update(new_idx[col])
            meta.indices[col] = idx.persist(store, dataset_uuid, spark)

    if metadata:
        meta.metadata.update(metadata)
    meta.commit(store)
    return meta


# ---------------------------------------------------------------------------
# indexes / lifecycle
# ---------------------------------------------------------------------------


def build_dataset_indices(
    spark: SparkSession,
    store: Store | str,
    dataset_uuid: str,
    columns: Sequence[str],
) -> DatasetMetadata:
    """Post-hoc secondary index build; partitions untouched.

    Reference: build_dataset_indices (/root/reference/plateau/io/eager.py:707-741).
    """
    store = _ensure_store(store)
    meta = DatasetMetadata.load(store, dataset_uuid)
    parts = list(meta.partitions.values())
    built = _build_indices_for_files(spark, store, meta, parts, list(columns))
    for col, idx in built.items():
        meta.indices[col] = idx.persist(store, dataset_uuid, spark)
    meta.commit(store)
    return meta


def garbage_collect_dataset(store: Store | str, dataset_uuid: str) -> list[str]:
    """Delete store keys not referenced by the current commit (old index
    files, files from failed/uncommitted writes).

    Reference: garbage_collect_dataset (/root/reference/plateau/io/eager.py:744-769,
    plateau/io_components/gc.py:8-52).
    """
    store = _ensure_store(store)
    meta = DatasetMetadata.load(store, dataset_uuid)
    referenced = meta.referenced_keys()
    # index "files" are directories when written by Spark — keep their contents
    removed = []
    for key in list(store.iter_keys(f"{dataset_uuid}/")):
        if key in referenced:
            continue
        if any(key.startswith(ref.rstrip("/") + "/") for ref in referenced):
            continue  # member of a referenced directory-parquet
        if key.endswith("_SUCCESS") or "/_" in key or key.endswith(".crc"):
            removed.append(key)
            store.delete(key)
            continue
        removed.append(key)
        store.delete(key)
    return removed


def delete_dataset(store: Store | str, dataset_uuid: str) -> None:
    """Delete a dataset: indices → payload files → metadata file, ordered
    for crash consistency (reference: plateau/io/eager.py:63-93)."""
    store = _ensure_store(store)
    if not DatasetMetadata.exists(store, dataset_uuid):
        return
    store.delete(f"{dataset_uuid}/indices")
    store.delete(f"{dataset_uuid}/{naming.TABLE_NAME}")
    store.delete(dataset_uuid)
    store.delete(naming.metadata_key(dataset_uuid))
