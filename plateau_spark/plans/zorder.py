"""Z-order (Morton-curve) clustering for multi-column zone-map pruning.

Zone maps (``plateau_spark/plans/zonemaps.py``) only prune when files
are clustered on the filtered column. A linear ``repartitionByRange``
on column A makes A prune perfectly — and leaves every file spanning
the FULL range of column B, so predicates on B prune nothing. Z-order
interleaves the bits of several columns into one clustering key, so a
range-partitioned write on the z-value gives every tracked column
partially-disjoint per-file ranges: a k-column box predicate prunes on
ALL k columns at once (the Delta Lake / Databricks OPTIMIZE ZORDER BY
idea, applied to this library's commit-file zone maps).

Scale shape: one bounds aggregation (2 doubles per column, driver-
bounded), then a single codegen projection (shift/mask chains — no
Python, no UDF) feeding ``repartitionByRange`` — exactly one extra
range shuffle at write time, the same cost as any sorted write. Reads
are unchanged: pruning happens driver-side against the commit file.

Column count × bits must fit a signed 64-bit long: the default 16 bits
supports up to 3 columns; 2 columns can use up to 31 bits.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BooleanType,
)


def _as_double(col: str, dtype: T.DataType) -> Column:
    """Orderable numeric view of a column (dates/timestamps via their
    epoch representation — only relative order matters for the curve)."""
    c = F.col(col)
    if isinstance(dtype, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def compute_zorder_bounds(
    df: DataFrame, cols: Sequence[str]
) -> dict[str, tuple[float, float]]:
    """One aggregation job returning {col: (min, max)} as doubles —
    2 values per column of driver state, independent of data size."""
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"zorder columns not in schema: {missing}")
    bad = [c for c in cols if not isinstance(dtypes[c], _NUMERIC_TYPES)]
    if bad:
        raise ValueError(
            f"zorder columns must be numeric/date/timestamp/boolean: {bad}"
        )
    aggs = []
    for c in cols:
        v = _as_double(c, dtypes[c])
        aggs.append(F.min(v).alias(f"__mn_{c}"))
        aggs.append(F.max(v).alias(f"__mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    out: dict[str, tuple[float, float]] = {}
    for c in cols:
        mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
        if mn is None:  # all-null column: degenerate, constant curve dim
            mn = mx = 0.0
        out[c] = (float(mn), float(mx))
    return out


def zorder_value_col(
    cols: Sequence[str],
    bounds: dict[str, tuple[float, float]],
    dtypes: dict[str, T.DataType],
    *,
    bits: int = 16,
) -> Column:
    """Morton z-value as a pure codegen expression: each column is
    min-max scaled to an unsigned ``bits``-bit integer, then the bits
    of all columns are interleaved (column i contributes bit b of its
    scaled value at output position ``b*len(cols) + i``). NULLs sort
    to the low corner of the curve (scaled 0)."""
    n = len(cols)
    if n < 1:
        raise ValueError("zorder needs at least one column")
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} > 63 bits; lower bits"
        )
    levels = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = bounds[c]
        span = mx - mn
        v = _as_double(c, dtypes[c])
        if span <= 0:
            s = F.lit(0).cast("long")
        else:
            raw = F.floor((v - F.lit(mn)) / F.lit(span) * F.lit(float(levels)))
            # clamp: out-of-bounds values (data drift vs stale bounds)
            # land on the curve ends instead of corrupting the interleave
            s = F.least(
                F.greatest(raw, F.lit(0)), F.lit(levels)
            ).cast("long")
        scaled.append(F.coalesce(s, F.lit(0).cast("long")))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    *,
    num_partitions: int,
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Range-partition ``df`` into ``num_partitions`` chunks of the
    z-curve over ``cols`` (sorted within each chunk), ready for a
    ``store_dataframe_as_dataset(..., repartition=False,
    zone_map_columns=cols)`` write: every tracked column then has
    partially-disjoint per-file [min, max] ranges, so multi-column box
    predicates prune files driver-side on every dimension.

    ``bounds`` (from :func:`compute_zorder_bounds`) can be passed to
    skip the bounds job — e.g. reuse of known domain bounds, or exact
    stability across incremental writes.
    """
    cols = list(cols)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    if bounds is None:
        bounds = compute_zorder_bounds(df, cols)
    z = zorder_value_col(cols, bounds, dtypes, bits=bits)
    return (
        df.withColumn("__z__", z)
        .repartitionByRange(num_partitions, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
    )
