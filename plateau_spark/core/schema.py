"""Schema normalization & validation contract.

The reference normalizes every stored schema (normalize_type,
plateau/core/common_metadata.py:309-376 in /root/reference): all signed
ints → int64, unsigned → uint64, floats → float64, list<T> recursively,
dictionary → value type; and enforces that all partitions of a dataset
share an identical normalized schema (no schema evolution,
plateau/core/common_metadata.py:465-561).

Spark mapping: StructType with LongType / DoubleType / StringType;
uint64 maps to LongType with a range check (Spark has no unsigned
types — SURVEY.md §7 hard-part 3). Column order contract
(plateau/core/common_metadata.py:176-243): partition keys first, then
payload columns alphabetically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize_type(dt: T.DataType) -> T.DataType:
    """int* → long, float* → double, recurse into arrays/maps/structs."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return T.LongType()
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return T.DoubleType()
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_normalize_type(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _normalize_type(dt.keyType), _normalize_type(dt.valueType), dt.valueContainsNull
        )
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _normalize_type(f.dataType), f.nullable)
                for f in dt.fields
            ]
        )
    return dt


def normalize_schema(schema: T.StructType) -> T.StructType:
    """Normalized StructType per the reference's normalize_type contract."""
    return T.StructType(
        [T.StructField(f.name, _normalize_type(f.dataType), f.nullable) for f in schema.fields]
    )


def normalized_column_order(
    columns: Sequence[str], partition_keys: Sequence[str] | None = None
) -> list[str]:
    """Partition keys first (in declared order), payload alphabetically.

    Reference: plateau/core/common_metadata.py:176-243.
    """
    pk = list(partition_keys or [])
    payload = sorted(c for c in columns if c not in pk)
    return pk + payload


def normalize_dataframe(
    df: DataFrame, partition_keys: Sequence[str] | None = None
) -> DataFrame:
    """Cast to the normalized schema and reorder columns.

    Cheap for Catalyst (casts fold into the write projection; no shuffle).

    Non-DataFrame input is a typed ValueError raised BEFORE any write job
    (reference: parse_input_to_metapartition rejects invalid partition
    shapes, io/testing/update.py:487 test_raises_on_invalid_input —
    nothing may land in the store from a malformed call).
    """
    if not isinstance(df, DataFrame):
        raise ValueError(
            f"Invalid input type {type(df).__name__!r}: expected a Spark "
            f"DataFrame (pandas frames: use spark.createDataFrame first)"
        )
    target = normalize_schema(df.schema)
    cols = []
    for field in target.fields:
        src = df.schema[field.name].dataType
        if src != field.dataType:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(field.name))
    out = df.select(*cols)
    order = normalized_column_order(out.columns, partition_keys)
    return out.select(*order)


class SchemaValidationError(ValueError):
    """Raised when a write's schema is incompatible with the dataset schema."""


def schema_diff(expected: T.StructType, actual: T.StructType) -> str:
    """Human-readable schema diff in the spirit of the reference's rich
    error messages (plateau/core/common_metadata.py:599-696)."""
    exp = {f.name: f.dataType.simpleString() for f in expected.fields}
    act = {f.name: f.dataType.simpleString() for f in actual.fields}
    lines = []
    for name in sorted(set(exp) | set(act)):
        e, a = exp.get(name), act.get(name)
        if e != a:
            lines.append(f"  {name}: dataset={e or '<missing>'} new={a or '<missing>'}")
    return "\n".join(lines)


def validate_compatible(
    expected: T.StructType, actual: T.StructType, *, allow_missing_nullable: bool = False
) -> None:
    """Strict identity check of normalized schemas (no schema evolution).

    Reference semantics: every write validates all partition schemas are
    identical modulo all-null columns
    (plateau/core/common_metadata.py:465-561). We compare normalized
    name→type maps; column order is already canonicalized separately.
    """
    exp_n = normalize_schema(expected)
    act_n = normalize_schema(actual)
    exp = {f.name: f.dataType for f in exp_n.fields}
    act = {f.name: f.dataType for f in act_n.fields}
    if exp != act:
        raise SchemaValidationError(
            "Schemas are not identical (dataset schema vs new data):\n"
            + schema_diff(exp_n, act_n)
        )


def merge_schemas_for_evolution(
    existing: T.StructType, new: T.StructType
) -> T.StructType:
    """Additive schema evolution: ``new`` must contain every existing
    column with an identical normalized type and may APPEND new columns
    (forced nullable — pre-evolution files lack them and read as NULL
    under the merged explicit schema). Anything else — dropped columns,
    type changes — raises, with the same rich diff as the strict check.

    The reference is strictly schema-stable
    (plateau/core/common_metadata.py:465-561); this is an opt-in
    Spark-native extension gated behind
    ``update_dataset_from_dataframe(schema_evolution=True)``.
    """
    exp_n = normalize_schema(existing)
    act_n = normalize_schema(new)
    exp = {f.name: f.dataType for f in exp_n.fields}
    act = {f.name: f.dataType for f in act_n.fields}
    missing = [c for c in exp if c not in act]
    conflicting = [c for c in exp if c in act and exp[c] != act[c]]
    if missing or conflicting:
        raise SchemaValidationError(
            "Schema evolution is additive-only (new data must contain "
            f"every existing column with its type; missing={missing}, "
            f"type-conflicts={conflicting}):\n" + schema_diff(exp_n, act_n)
        )
    added = [f.name for f in act_n.fields if f.name not in exp]
    return T.StructType(
        list(existing.fields)
        + [
            T.StructField(f.name, f.dataType, nullable=True)
            for f in new.fields
            if f.name in added
        ]
    )


def schema_to_json(schema: T.StructType) -> dict:
    return schema.jsonValue()


def schema_from_json(payload: dict) -> T.StructType:
    return T.StructType.fromJson(payload)
