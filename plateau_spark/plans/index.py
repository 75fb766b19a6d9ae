"""Secondary inverted indexes: value → sorted list of partition labels.

Reference semantics: ExplicitSecondaryIndex
(/root/reference/plateau/core/index.py:567-728) — built by a pass over
the data, persisted as a parquet file ``(column, partition: list<str>)``
under ``<uuid>/indices/<col>/<ts>.by-dataset-index.parquet``; queried at
plan time to prune partitions (docs/spec/indexing.rst:9-18), maintained
incrementally on commit (plateau/core/index.py:280-403).

Spark-first lifecycle — the index never materializes on the driver
except for the values a query actually touches:

  build   — one distributed aggregation
            ``df.groupBy(col).agg(sort_array(collect_set(label)))``
  merge   — commit-time union of index DataFrames (explode → re-agg),
            executed by Spark (merge_index_dataframes)
  remove  — label/value removal as array_except / anti-filter on the
            index DataFrame (remove_partitions_from_index_df)
  load    — driver-side pyarrow read of ONE small parquet, restricted
            via row-group filters to the literals of the current query
            (SecondaryIndex.load with ``literals=``), matching the
            reference's O(1)-GETs-per-plan design goal.
"""

from __future__ import annotations

import datetime
from typing import Any, Iterable, Sequence

import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plateau_spark.core import naming
from plateau_spark.core.conf import env_int as _env_int
from plateau_spark.core.predicates import evaluate_literal
from plateau_spark.core.store import Store

LABEL_COL = "__label__"


def _utc_ts() -> str:
    return datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%dT%H%M%S.%f")


def _literal_to_arrow_filter(column: str, op: str, val: Any):
    """One DNF literal → a pyarrow.compute filter over the index table,
    or None when not expressible (caller falls back to a full read).

    The filter may be BROADER than the literal — safe, because
    eval_operator re-evaluates exactly over whatever was loaded; it must
    never be NARROWER.
    """
    f = pc.field(column)
    if op in ("==", "="):
        return None if val is None else (f == val)
    if op == "!=":
        return None if val is None else (f != val)
    if op == "<=":
        return f <= val
    if op == ">=":
        return f >= val
    if op == "<":
        return f < val
    if op == ">":
        return f > val
    if op == "in":
        vals = [v for v in val if v is not None]
        return f.isin(vals)
    # 'not in' / 'is distinct from' → nearly the whole domain anyway
    return None


def literals_to_arrow_filter(column: str, literals: Sequence[tuple[str, Any]]):
    """OR of per-literal filters; None if any literal is untranslatable."""
    exprs = []
    for op, val in literals:
        e = _literal_to_arrow_filter(column, op, val)
        if e is None:
            return None
        exprs.append(e)
    if not exprs:
        return None
    out = exprs[0]
    for e in exprs[1:]:
        out = out | e
    return out


class SecondaryIndex:
    """Driver-side *view* of an index: ``column`` + dict value → labels.

    Only ever materialized for the values matching the query's literals
    (``load(..., literals=)``) — the persistent, full form is parquet and
    is maintained by Spark jobs (functions below), never by this class.
    """

    def __init__(self, column: str, index_dct: dict[Any, set[str]] | None = None):
        self.column = column
        self.index_dct: dict[Any, set[str]] = index_dct or {}

    # -- construction -------------------------------------------------------
    @staticmethod
    def build_dataframe(
        df: DataFrame, column: str, label_col: str = LABEL_COL
    ) -> DataFrame:
        """Distributed index build: (column value, sorted label array).

        Reference: MetaPartition.build_indices
        (plateau/io_components/metapartition.py:1005-1045) — but as ONE
        Spark aggregation instead of a per-partition pass + driver merge.
        """
        return (
            df.select(F.col(column), F.col(label_col))
            .where(F.col(column).isNotNull())
            .groupBy(column)
            .agg(F.sort_array(F.collect_set(label_col)).alias("partitions"))
        )

    @classmethod
    def from_pairs(cls, column: str, pairs: Iterable[tuple[Any, str]]) -> "SecondaryIndex":
        dct: dict[Any, set[str]] = {}
        for value, label in pairs:
            dct.setdefault(value, set()).add(label)
        return cls(column, dct)

    def to_dataframe(self, spark: SparkSession, value_type: str = "string") -> DataFrame:
        """Driver dict → index DataFrame (used for tiny primary-key
        indexes derived from partition key_values; payload indexes go
        through build_dataframe and never touch the driver)."""
        rows = [(v, sorted(labels)) for v, labels in sorted(self.index_dct.items())]
        if rows:
            return spark.createDataFrame(rows).toDF(self.column, "partitions")
        return spark.createDataFrame(
            [], schema=f"`{self.column}` {value_type}, partitions array<string>"
        )

    # -- persistence ----------------------------------------------------------
    def persist(
        self,
        store: Store,
        dataset_uuid: str,
        spark: SparkSession,
        value_type: str = "string",
    ) -> str:
        """Write this (small, driver-side) index as one parquet.
        ``value_type`` pins the value column's type when the index is
        EMPTY — the string default would otherwise poison later
        ``unionByName`` merges (set-op widening coerces a typed rebuilt
        index to string, and point lookups then match nothing)."""
        return persist_index_dataframe(
            self.to_dataframe(spark, value_type=value_type),
            store,
            dataset_uuid,
            self.column,
        )

    @classmethod
    def load(
        cls,
        store: Store,
        key: str,
        column: str,
        literals: Sequence[tuple[str, Any]] | None = None,
    ) -> "SecondaryIndex":
        """Driver-side load restricted to the query's literals.

        ``literals`` = [(op, value), ...] touching ``column``; translated
        to pyarrow row-group filters so a point lookup on a
        high-cardinality index reads O(matching row groups), not the
        whole index. ``literals=None`` (maintenance) loads everything.
        Reads go through the Store abstraction, so the same code works
        on object stores (reference: plateau/core/index.py:567-650).
        """
        filters = (
            literals_to_arrow_filter(column, literals) if literals is not None else None
        )
        table = store.read_parquet(key, filters=filters)
        values = table.column(column).to_pylist()
        # reference-written index files name the posting-list column
        # "partition" (singular — plateau/core/index.py:34,927); ours
        # use "partitions". Accept both, or every reference-interop
        # dataset with an external secondary index crashes at plan time.
        plist_col = "partitions" if "partitions" in table.column_names else "partition"
        parts = table.column(plist_col).to_pylist()
        return cls(column, {v: set(p) for v, p in zip(values, parts)})

    # -- queries ---------------------------------------------------------------
    def observed_values(self) -> list[Any]:
        """Reference: plateau/core/index.py:137-147."""
        return sorted(self.index_dct.keys())

    def eval_operator(self, op: str, value: Any) -> set[str]:
        """Labels of partitions that may contain rows matching
        ``column <op> value``. Reference: plateau/core/index.py:213-250."""
        out: set[str] = set()
        for v, labels in self.index_dct.items():
            if evaluate_literal(v, op, value):
                out.update(labels)
        return out

    def query(self, value: Any) -> set[str]:
        """Exact-value lookup. Reference: plateau/core/index.py:252-271.

        Delegates to ``eval_operator`` so the date/datetime alignment
        applied everywhere else (``evaluate_literal``) holds here too —
        a raw dict lookup made ``query(datetime(...))`` on a DATE-typed
        index silently miss (the delete_scope path would then delete 0
        partitions while a read of the same predicate matched). The
        loaded dict is literal-restricted, so the scan is tiny."""
        return self.eval_operator("==", value)

    # -- maintenance (driver-side view; Spark-side twins below) ---------------
    def remove_partitions(self, labels: Iterable[str]) -> "SecondaryIndex":
        """Drop labels from every posting list; drop empty values.
        Reference: plateau/core/index.py:280-360."""
        drop = set(labels)
        new = {
            v: remaining
            for v, lbls in self.index_dct.items()
            if (remaining := lbls - drop)
        }
        return SecondaryIndex(self.column, new)

    def remove_values(self, values: Iterable[Any]) -> "SecondaryIndex":
        """Drop entire value entries.
        Reference: plateau/core/index.py:280-318 (remove_values)."""
        drop = set(values)
        return SecondaryIndex(
            self.column,
            {v: set(lbls) for v, lbls in self.index_dct.items() if v not in drop},
        )

    def update(self, other: "SecondaryIndex") -> "SecondaryIndex":
        """Union-merge posting lists (commit-time index merge).
        Reference: merge_indices, plateau/core/index.py:760-791."""
        merged = {v: set(lbls) for v, lbls in self.index_dct.items()}
        for v, lbls in other.index_dct.items():
            merged.setdefault(v, set()).update(lbls)
        return SecondaryIndex(self.column, merged)


# ---------------------------------------------------------------------------
# Spark-side index lifecycle (the scale path: nothing driver-materialized)
# ---------------------------------------------------------------------------


def persist_index_dataframe(
    index_df: DataFrame, store: Store, dataset_uuid: str, column: str
) -> str:
    """Persist a (column, partitions) index DataFrame; returns the store
    key. One small file by design — plan-time loads must be one GET
    (docs/spec/indexing.rst:9-18). repartition(1), NOT coalesce(1):
    coalesce removes the post-shuffle parallelism so the whole index
    aggregation would run in a single reduce task; the extra exchange
    funnels only the finished index rows."""
    key = naming.index_key(dataset_uuid, column, _utc_ts())
    index_df.repartition(1).write.mode("overwrite").parquet(store.url(key))
    return key


# --- driver-tier build/merge (small commits) -------------------------------
#
# A streaming micro-batch or small append pays one Spark job per indexed
# column (scan of the new files + collect_set exchange + sidecar write)
# and the commit-time merge another — pure scheduling floor at KB scale
# (measured: _merge_committed_indices was ~70% of a warm update commit).
# The driver tier mirrors the bloom sidecars' discipline
# (plans/blooms.py): size-gated pyarrow reads of the new files' index
# column, a Python dict merge, and a direct parquet write of the same
# deterministic rows the Spark aggregation produces (value, SORTED label
# array — sort_array(collect_set) has no order freedom to replicate).
# Anything over budget falls back to the Spark jobs, so corpus-scale
# builds at 100 TB are unchanged. Value types are gated to
# integer/string: Python dict equality provably matches Spark groupBy
# for those; floats (NaN normalization) and nested types stay
# distributed.

_DRIVER_INDEX_BYTES_DEFAULT = 8 << 20
_DRIVER_INDEX_ROWS_DEFAULT = 50_000
_DRIVER_INDEX_MAX_FILES = 16


def _driver_index_budget() -> int:
    return _env_int(
        "PLATEAU_SPARK_INDEX_DRIVER_BYTES", _DRIVER_INDEX_BYTES_DEFAULT
    )


def _driver_index_row_budget() -> int:
    return _env_int(
        "PLATEAU_SPARK_INDEX_DRIVER_ROWS", _DRIVER_INDEX_ROWS_DEFAULT
    )


def column_in_footer(store: Store, key: str, column: str) -> bool:
    """True iff the parquet footer schema at ``key`` contains
    ``column``. Errors reading the footer count as 'present' so the
    caller falls back to the Spark path rather than silently treating
    the file as contributing nothing."""
    try:
        return column in set(store.parquet_schema(key).names)
    except Exception:  # noqa: BLE001 — unreadable footer → Spark path
        return True


def index_value_type_ok(arrow_type) -> bool:
    """Value types the driver tier may merge: Python equality must
    provably match Spark groupBy equality."""
    import pyarrow as pa

    return (
        pa.types.is_integer(arrow_type)
        or pa.types.is_string(arrow_type)
        or pa.types.is_large_string(arrow_type)
    )


def build_index_pairs_driver(
    store: Store, partitions: Sequence, column: str
) -> "dict[Any, set[str]] | None":
    """value → {labels} over the given partitions' parquet files via
    pyarrow, or None when over the driver budget / any non-parquet
    payload / unreadable (caller falls back to the Spark build). A file
    missing the column (pre-evolution) contributes no pairs, exactly
    like the Spark path's explicit-schema NULL read."""
    parts = list(partitions)
    pq_parts = [p for p in parts if p.file.endswith(".parquet")]
    if len(pq_parts) != len(parts) or len(pq_parts) > _DRIVER_INDEX_MAX_FILES:
        return None
    try:
        total = sum(store.size(p.file) for p in pq_parts)
    except OSError:
        return None
    if total > _driver_index_budget():
        return None
    row_budget = _driver_index_row_budget()
    if getattr(store, "_is_local", False):
        import pyarrow.parquet as pqt

        try:
            if (
                sum(
                    pqt.ParquetFile(store.path(p.file)).metadata.num_rows
                    for p in pq_parts
                )
                > row_budget
            ):
                return None
        except OSError:
            return None
    n_read = 0
    dct: dict[Any, set[str]] = {}
    for p in pq_parts:
        try:
            table = store.read_parquet(p.file, columns=[column])
            values = table.column(column).to_pylist()
        except (KeyError, OSError):
            values = []
        except Exception:  # noqa: BLE001 — pyarrow read errors
            # decide "evolved column absent from this file" from the
            # parquet footer schema, not the exception wording (which
            # pyarrow does not keep stable across releases); any other
            # failure falls back to the Spark build
            if not column_in_footer(store, p.file, column):
                values = []
            else:
                return None
        n_read += len(values)
        if n_read > row_budget:
            return None
        for v in values:
            if v is None:
                continue
            dct.setdefault(v, set()).add(p.label)
    return dct


def persist_index_dict(
    dct: "dict[Any, set[str]]",
    store: Store,
    dataset_uuid: str,
    column: str,
    value_type,
) -> str:
    """Driver-tier twin of ``persist_index_dataframe``: the same
    (value, sorted label array) rows, sorted by value (row-group
    pruning), one small parquet file; returns the store key."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pqt

    items = sorted(dct.items(), key=lambda kv: kv[0])
    table = pa.table(
        {
            column: pa.array([k for k, _ in items], value_type),
            "partitions": pa.array(
                [sorted(v) for _, v in items], pa.list_(pa.string())
            ),
        }
    )
    key = naming.index_key(dataset_uuid, column, _utc_ts())
    buf = io.BytesIO()
    pqt.write_table(table, buf)
    store.put_bytes(key, buf.getvalue())
    return key


def merge_index_dataframes(column: str, dfs: Sequence[DataFrame]) -> DataFrame:
    """Commit-time merge of N index DataFrames — explode to pairs,
    union, re-aggregate. One Spark shuffle over the distinct values;
    reference: merge_indices (plateau/core/index.py:760-791)."""
    pairs = [
        df.select(F.col(column), F.explode("partitions").alias(LABEL_COL)) for df in dfs
    ]
    out = pairs[0]
    for p in pairs[1:]:
        out = out.unionByName(p)
    return out.groupBy(column).agg(
        F.sort_array(F.collect_set(LABEL_COL)).alias("partitions")
    )


def remove_partitions_from_index_df(
    index_df: DataFrame, column: str, labels: Iterable[str]
) -> DataFrame:
    """Spark-side twin of SecondaryIndex.remove_partitions."""
    arr = F.array(*[F.lit(l) for l in sorted(set(labels))])
    return index_df.select(
        F.col(column), F.array_except("partitions", arr).alias("partitions")
    ).where(F.size("partitions") > 0)


def remove_values_from_index_df(
    index_df: DataFrame, column: str, values: Iterable[Any]
) -> DataFrame:
    """Spark-side twin of SecondaryIndex.remove_values.

    NULL-safe: a bare ``~isin([...None...])`` evaluates to NULL for
    every non-matching row (SQL three-valued logic) and the filter
    would wipe the ENTIRE index instead of one entry — None in
    ``values`` drops the NULL-value entry explicitly, and non-matching
    rows are kept via coalesce."""
    vals = list(values)
    non_null = [v for v in vals if v is not None]
    drop = F.col(column).isin(non_null) if non_null else F.lit(False)
    if any(v is None for v in vals):
        drop = drop | F.col(column).isNull()
    return index_df.where(~F.coalesce(drop, F.lit(False)))


# ---------------------------------------------------------------------------
# Index views (reference: plateau/core/index.py:428-531 as_flat_series,
# plateau/core/dataset.py:356-423 get_indices_as_dataframe)
# ---------------------------------------------------------------------------


def index_as_flat_dataframe(
    spark: SparkSession,
    store: Store,
    meta,
    column: str,
    *,
    compact: bool = False,
    partitions_as_index: bool = False,
) -> DataFrame:
    """The index as a DataFrame — ``as_flat_series`` re-expressed.

    Default: one row per (value, partition). ``compact=True``: one row
    per value with the sorted label list. ``partitions_as_index=True``:
    inverted — one row per (partition, value).
    """
    df = load_index_dataframe(spark, store, meta, column)
    if compact:
        return df
    flat = df.select(F.col(column), F.explode("partitions").alias("partition"))
    if partitions_as_index:
        return flat.select("partition", column)
    return flat


def load_index_dataframe(
    spark: SparkSession, store: Store, meta, column: str
) -> DataFrame:
    """(column, partitions) DataFrame for one index — secondary from its
    parquet (reference-written files name the posting list "partition",
    singular — normalized here), embedded (reference commit-file form)
    from the metadata dict, partition-key derived from commit-file
    key_values (tiny: one row per partition; reference
    load_partition_indices, plateau/core/dataset.py:888-921)."""
    if column in meta.indices:
        df = spark.read.parquet(store.url(meta.indices[column]))
        if "partitions" not in df.columns and "partition" in df.columns:
            df = df.withColumnRenamed("partition", "partitions")
        return df
    value_type = next(
        (f.dataType.simpleString() for f in (meta.schema or []) if f.name == column),
        "string",
    )
    if column in getattr(meta, "embedded_indices", {}):
        idx = SecondaryIndex(
            column,
            {v: set(lbls) for v, lbls in meta.embedded_indices[column].items()},
        )
        return idx.to_dataframe(spark, value_type=value_type)
    if column in meta.partition_keys:
        idx = SecondaryIndex.from_pairs(
            column, [(p.key_values[column], p.label) for p in meta.partitions.values()]
        )
        # empty datasets still get the SCHEMA's value type — a string
        # default would poison later unionByName merges to string
        return idx.to_dataframe(spark, value_type=value_type)
    raise ValueError(f"Column {column!r} is neither indexed nor a partition key")


def get_indices_as_dataframe(
    spark: SparkSession,
    store: Store,
    meta,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """One row per (partition, value-combination): partition label plus
    one column per index, outer-joined on the partition label —
    reference get_indices_as_dataframe (plateau/core/dataset.py:356-423).
    """
    if columns is None:
        columns = sorted(
            set(meta.indices)
            | set(getattr(meta, "embedded_indices", {}))
            | set(meta.partition_keys)
        )
    if not columns:
        raise ValueError("Dataset has no indices")
    out: DataFrame | None = None
    for col in columns:
        flat = index_as_flat_dataframe(
            spark, store, meta, col, partitions_as_index=True
        )
        out = flat if out is None else out.join(flat, "partition", "outer")
    return out.select("partition", *columns)
