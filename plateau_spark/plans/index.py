"""Secondary inverted indexes: value → sorted list of partition labels.

Reference semantics: ExplicitSecondaryIndex
(/root/reference/plateau/core/index.py:567-728) — built by a pass over
the data, persisted as a parquet file ``(column, partition: list<str>)``
under ``<uuid>/indices/<col>/<ts>.by-dataset-index.parquet``; queried at
plan time to prune partitions (docs/spec/indexing.rst:9-18), maintained
incrementally on commit (plateau/core/index.py:280-403).

Spark-first build: the index IS a DataFrame aggregation —
``df.groupBy(col).agg(sort_array(collect_set(label)))`` — executed
distributed, written as parquet (one shuffle over the distinct values,
map-side combined). Loading for pruning is a driver-side read of one
small parquet (with column/value filters pushed to row groups via
pyarrow), matching the reference's O(1)-GETs-per-plan design goal.
"""

from __future__ import annotations

import datetime
from typing import Any, Iterable, Sequence

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plateau_spark.core import naming
from plateau_spark.core.predicates import evaluate_literal
from plateau_spark.core.store import Store

_INDEX_DTYPES_OK = "index column must be a scalar type (bool/int/float/str/bytes/date/timestamp)"


class SecondaryIndex:
    """In-driver representation: ``column`` + dict value → set of labels.

    Only ever materialized for the values matching the query's literals
    (or fully, for maintenance ops) — the persistent form is parquet.
    """

    def __init__(self, column: str, index_dct: dict[Any, set[str]] | None = None):
        self.column = column
        self.index_dct: dict[Any, set[str]] = index_dct or {}

    # -- construction -------------------------------------------------------
    @staticmethod
    def build_dataframe(
        df: DataFrame, column: str, label_col: str = "__label__"
    ) -> DataFrame:
        """Distributed index build: (column value, sorted label array).

        Reference: MetaPartition.build_indices
        (plateau/io_components/metapartition.py:1005-1045) — but as ONE
        Spark aggregation instead of a per-partition pass + driver merge.
        """
        if isinstance(df.schema[column].dataType.typeName(), type(None)):  # pragma: no cover
            raise TypeError(_INDEX_DTYPES_OK)
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

    # -- persistence ----------------------------------------------------------
    def persist(self, store: Store, dataset_uuid: str, spark: SparkSession) -> str:
        """Write the in-driver index as one parquet; returns the store key."""
        ts = datetime.datetime.utcnow().strftime("%Y-%m-%dT%H%M%S.%f")
        key = naming.index_key(dataset_uuid, self.column, ts)
        rows = [(v, sorted(labels)) for v, labels in sorted(self.index_dct.items())]
        if rows:
            sdf = spark.createDataFrame(rows).toDF(self.column, "partitions")
        else:
            sdf = spark.createDataFrame(
                [], schema=f"`{self.column}` string, partitions array<string>"
            )
        sdf.coalesce(1).write.mode("overwrite").parquet(store.url(key))
        return key

    @staticmethod
    def persist_dataframe(
        index_df: DataFrame, store: Store, dataset_uuid: str, column: str
    ) -> str:
        """Persist a distributed index build without driver materialization."""
        ts = datetime.datetime.utcnow().strftime("%Y-%m-%dT%H%M%S.%f")
        key = naming.index_key(dataset_uuid, column, ts)
        index_df.coalesce(1).write.mode("overwrite").parquet(store.url(key))
        return key

    @classmethod
    def load(cls, store: Store, key: str, column: str) -> "SecondaryIndex":
        """Driver-side load of the full index (maintenance path)."""
        table = pq.read_table(store.path(key) if store._is_local else store.url(key))
        values = table.column(column).to_pylist()
        parts = table.column("partitions").to_pylist()
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
        """Exact-value lookup. Reference: plateau/core/index.py:252-271."""
        return set(self.index_dct.get(value, set()))

    # -- maintenance -------------------------------------------------------------
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

    def update(self, other: "SecondaryIndex") -> "SecondaryIndex":
        """Union-merge posting lists (commit-time index merge).
        Reference: merge_indices, plateau/core/index.py:760-791."""
        merged = {v: set(lbls) for v, lbls in self.index_dct.items()}
        for v, lbls in other.index_dct.items():
            merged.setdefault(v, set()).update(lbls)
        return SecondaryIndex(self.column, merged)
