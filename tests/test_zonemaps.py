"""Partition-level zone maps: footer-harvested (min, max, null_count)
in the commit file driving driver-side file pruning on non-key columns."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from plateau_spark.core.metadata import DatasetMetadata
from plateau_spark.core.store import Store
from plateau_spark.plans.zonemaps import literal_may_match_stats
from plateau_spark.sources.dataset import (
    compact_dataset,
    read_dataset_as_dataframe,
    store_dataframe_as_dataset,
    update_dataset_from_dataframe,
)


@pytest.fixture()
def range_store(spark, tmp_path):
    """Four files range-clustered on x (0-24, 25-49, 50-74, 75-99)."""
    store = Store(str(tmp_path / "store"))
    df = (
        spark.range(100)
        .select(F.col("id").alias("x"), (F.col("id") % 7).alias("y"))
        .repartitionByRange(4, "x")
    )
    store_dataframe_as_dataset(
        spark, store, "ranged", df, partition_on=[], repartition=False,
        zone_map_columns=["x"],
    )
    return store


def test_zone_maps_recorded_and_revived(spark, range_store):
    meta = DatasetMetadata.load(range_store, "ranged")
    assert len(meta.partitions) == 4
    for p in meta.partitions.values():
        mn, mx, nulls = p.stats["x"]
        assert isinstance(mn, int) and isinstance(mx, int) and mn <= mx
        assert nulls == 0
    # the four files cover disjoint ranges
    ranges = sorted((p.stats["x"][0], p.stats["x"][1]) for p in meta.partitions.values())
    assert ranges[0][0] == 0 and ranges[-1][1] == 99
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo


def test_zone_map_pruning_and_correctness(spark, range_store):
    out = read_dataset_as_dataframe(
        spark, range_store, "ranged", predicates=[[("x", ">=", 80)]]
    )
    assert len(out.inputFiles()) == 1  # three files proven empty driver-side
    assert sorted(r["x"] for r in out.collect()) == list(range(80, 100))
    # disjunction unions the per-conjunction survivors
    out2 = read_dataset_as_dataframe(
        spark, range_store, "ranged",
        predicates=[[("x", "<", 10)], [("x", "==", 60)]],
    )
    assert len(out2.inputFiles()) == 2
    assert sorted(r["x"] for r in out2.collect()) == [*range(10), 60]
    # a predicate on an untracked column never prunes (and never lies)
    out3 = read_dataset_as_dataframe(
        spark, range_store, "ranged", predicates=[[("y", "==", 3)]]
    )
    assert len(out3.inputFiles()) == 4
    assert all(r["y"] == 3 for r in out3.collect())


def test_zone_maps_carried_by_update_and_compact(spark, range_store):
    extra = (
        spark.range(100, 150)
        .select(F.col("id").alias("x"), (F.col("id") % 7).alias("y"))
        .repartitionByRange(2, "x")
    )
    update_dataset_from_dataframe(spark, range_store, "ranged", extra)
    meta = DatasetMetadata.load(range_store, "ranged")
    # new partitions carry stats without re-passing zone_map_columns
    assert all("x" in p.stats for p in meta.partitions.values())
    out = read_dataset_as_dataframe(
        spark, range_store, "ranged", predicates=[[("x", ">=", 130)]]
    )
    assert len(out.inputFiles()) == 1  # 4 original + 1 of 2 appended pruned
    assert out.count() == 20
    # compaction rewrites files but keeps the zone-map columns tracked
    meta2 = compact_dataset(spark, range_store, "ranged")
    assert all("x" in p.stats for p in meta2.partitions.values())
    assert read_dataset_as_dataframe(spark, range_store, "ranged").count() == 150


def test_zone_maps_with_nulls_and_dates(spark, tmp_path):
    store = Store(str(tmp_path / "store"))
    rows = [
        (1, datetime.date(2020, 1, 1)),
        (2, None),
        (3, datetime.date(2020, 6, 1)),
    ]
    df = spark.createDataFrame(rows, "k long, d date").coalesce(1)
    store_dataframe_as_dataset(
        spark, store, "dated", df, zone_map_columns=["d"], repartition=False
    )
    meta = DatasetMetadata.load(store, "dated")
    (p,) = meta.partitions.values()
    mn, mx, nulls = p.stats["d"]
    assert mn == datetime.date(2020, 1, 1) and mx == datetime.date(2020, 6, 1)
    assert nulls == 1
    # IS NULL must keep the file (nulls recorded), out-of-range date prunes
    kept = read_dataset_as_dataframe(
        spark, store, "dated", predicates=[[("d", "==", None)]]
    )
    assert kept.count() == 1
    pruned = read_dataset_as_dataframe(
        spark, store, "dated", predicates=[[("d", ">", datetime.date(2021, 1, 1))]]
    )
    assert pruned.count() == 0 and len(pruned.inputFiles()) == 0


def test_zone_maps_nan_never_prune_matching_rows(spark, tmp_path):
    """Spark's parquet writer folds NaN into double column stats
    (max=NaN); collection must degrade those bounds to unknown so no
    predicate prunes the file holding real matching rows."""
    store = Store(str(tmp_path / "store"))
    rows = [(1, 1.0), (2, float("nan")), (3, 2.0)]
    df = spark.createDataFrame(rows, "k long, x double").coalesce(1)
    store_dataframe_as_dataset(
        spark, store, "nanned", df, zone_map_columns=["x"], repartition=False
    )
    meta = DatasetMetadata.load(store, "nanned")
    (p,) = meta.partitions.values()
    mn, mx, _nulls = p.stats["x"]
    # bounds must be either NaN-free or degraded to unknown
    import math as _m

    assert mn is None or not _m.isnan(mn)
    assert mx is None or not _m.isnan(mx)
    # the poisoned-stats file must survive every one of these predicates
    for preds, expect in [
        ([[("x", "==", 2.0)]], [3]),
        ([[("x", ">", 1.5)]], [2, 3]),  # NaN > 1.5 is TRUE in Spark
        ([[("x", ">=", 2.0)]], [2, 3]),
        ([[("x", "<", 1.5)]], [1]),
    ]:
        got = read_dataset_as_dataframe(spark, store, "nanned", predicates=preds)
        assert sorted(r["k"] for r in got.collect()) == expect, preds
    # a NaN-free float file still cannot be pruned by > / >= / != (the
    # writer may have skipped NaN rows when computing bounds)
    from plateau_spark.plans.zonemaps import literal_may_match_stats as lmm

    assert lmm(">", 99.0, [1.0, 2.0, 0])
    assert lmm(">=", 99.0, [1.0, 2.0, 0])
    assert lmm("!=", 1.0, [1.0, 1.0, 0])
    assert not lmm("<", -5.0, [1.0, 2.0, 0])  # still sound to prune
    assert not lmm("==", 99.0, [1.0, 2.0, 0])  # finite == stays sound
    assert lmm("==", float("nan"), [1.0, 2.0, 0])  # NaN literal keeps


def test_zone_map_column_validation(spark, tmp_path):
    store = Store(str(tmp_path / "store"))
    df = spark.createDataFrame([(1, "s")], "k long, s string")
    with pytest.raises(ValueError, match="truncated"):
        store_dataframe_as_dataset(
            spark, store, "bad", df, zone_map_columns=["s"]
        )
    with pytest.raises(ValueError, match="not in schema"):
        store_dataframe_as_dataset(
            spark, store, "bad2", df, zone_map_columns=["nope"]
        )


def test_literal_stats_semantics():
    st = [10, 20, 0]
    assert literal_may_match_stats("==", 15, st)
    assert not literal_may_match_stats("==", 25, st)
    assert not literal_may_match_stats("<", 10, st)
    assert literal_may_match_stats("<=", 10, st)
    assert not literal_may_match_stats(">", 20, st)
    assert literal_may_match_stats(">=", 20, st)
    assert not literal_may_match_stats("in", [1, 2, 30], st)
    assert literal_may_match_stats("in", [1, 12], st)
    assert not literal_may_match_stats("in", [], st)
    assert not literal_may_match_stats("in", [None, 1], st)  # no nulls in file
    assert literal_may_match_stats("in", [None, 1], [10, 20, 3])
    # IS NULL / IS NOT NULL
    assert not literal_may_match_stats("==", None, st)
    assert literal_may_match_stats("==", None, [10, 20, 5])
    assert literal_may_match_stats("!=", None, st)
    # IS NOT NULL is never stats-falsifiable: [None, None, n] is
    # ambiguous between an all-null file and degraded writer stats
    assert literal_may_match_stats("!=", None, [None, None, 7])
    # != only falsifiable for a constant file
    assert not literal_may_match_stats("!=", 5, [5, 5, 0])
    assert literal_may_match_stats("!=", 5, [5, 6, 0])
    # unknown bounds / incomparable types stay conservative
    assert literal_may_match_stats(">", 5, [None, None, None])
    assert literal_may_match_stats("==", "str", st)


def test_zone_maps_survive_msgpack_commit(spark, tmp_path):
    """Stats round-trip through the reference's zstd-msgpack commit
    format exactly like JSON (dates revived from the schema)."""
    store = Store(str(tmp_path / "store"))
    df = (
        spark.range(20)
        .select(F.col("id").alias("x"), F.lit(1).alias("y"))
        .repartitionByRange(2, "x")
    )
    store_dataframe_as_dataset(
        spark, store, "mp", df, repartition=False, zone_map_columns=["x"]
    )
    meta = DatasetMetadata.load(store, "mp")
    meta.commit(store, storage_format="msgpack")
    revived = DatasetMetadata.load(store, "mp")
    assert {p.label: p.stats for p in revived.partitions.values()} == {
        p.label: p.stats for p in meta.partitions.values()
    }
    out = read_dataset_as_dataframe(spark, store, "mp", predicates=[[("x", ">=", 15)]])
    assert len(out.inputFiles()) == 1 and out.count() == 5


# --- property fuzz: a pruned file can never contain a matching row ----------

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from plateau_spark.core.predicates import evaluate_literal

_OPS_SCALAR = ["==", "=", "!=", "<=", ">=", "<", ">"]


@st.composite
def _stat_and_values(draw):
    """A synthetic file: its contained values, and the zone map they
    imply (bounds over non-nulls, null count; optionally degraded to
    unknown bounds / unknown null count)."""
    vals = draw(st.lists(st.one_of(st.integers(-20, 20), st.none()), min_size=1, max_size=8))
    nonnull = [v for v in vals if v is not None]
    mn = min(nonnull) if nonnull else None
    mx = max(nonnull) if nonnull else None
    nulls = sum(v is None for v in vals)
    if draw(st.booleans()):
        mn = mx = None  # degrade to unknown bounds
    if draw(st.booleans()):
        nulls = None  # footer didn't record null_count
    return vals, [mn, mx, nulls]


@settings(max_examples=400, deadline=None)
@given(
    sv=_stat_and_values(),
    op=st.sampled_from([*_OPS_SCALAR, "in", "not in"]),
    lit=st.one_of(st.integers(-25, 25), st.none()),
    lits=st.lists(st.one_of(st.integers(-25, 25), st.none()), max_size=4),
)
def test_pruned_literal_matches_no_row(sv, op, lit, lits):
    vals, stat = sv
    val = lits if op in ("in", "not in") else lit
    if val is None and op in ("<=", ">=", "<", ">"):
        return  # invalid literal per check_predicates
    if not literal_may_match_stats(op, val, stat):
        # the planner pruned this file: NO contained row may satisfy
        # the literal under row-level SQL semantics
        for v in vals:
            assert not evaluate_literal(v, op, val), (
                f"pruned file contains matching row: value={v!r}, "
                f"op={op!r}, literal={val!r}, stat={stat!r}"
            )


def _spark_eval_float(actual, op, val):
    """Row-level semantics a pruned float row would have seen in Spark:
    NaN sorts ABOVE every double, NaN equals NaN (unlike Python where
    every NaN comparison is False). Nulls collapse to False."""
    if actual is None:
        return False
    if op == "in":
        return any(v is not None and _spark_eval_float(actual, "==", v) for v in val)
    if op == "not in":
        return not any(v is not None and _spark_eval_float(actual, "==", v) for v in val)
    if val is None:
        return op == "!="  # IS NOT NULL on a non-null row
    a_nan, v_nan = math.isnan(actual), math.isnan(val)
    if a_nan or v_nan:
        eq = a_nan and v_nan
        gt = a_nan and not v_nan  # NaN is the largest double
        lt = v_nan and not a_nan
        return {
            "==": eq, "=": eq, "!=": not eq,
            ">": gt, ">=": gt or eq, "<": lt, "<=": lt or eq,
        }[op]
    return evaluate_literal(actual, op, val)


@st.composite
def _float_stat_and_values(draw):
    """A float/double file: values may contain NaN; the writer may or
    may not have excluded NaN rows from the recorded bounds (both occur
    in the wild — the parquet spec leaves NaN stats undefined). The
    collection layer discards NaN bounds, so the NaN-included branch
    degrades to unknown bounds, exactly as collect_partition_stats does."""
    base = st.one_of(
        st.floats(-20, 20, allow_nan=False, allow_infinity=False),
        st.just(float("nan")),
        st.none(),
    )
    vals = draw(st.lists(base, min_size=1, max_size=8))
    nonnull = [v for v in vals if v is not None]
    finite = [v for v in nonnull if not math.isnan(v)]
    if draw(st.booleans()) and any(math.isnan(v) for v in nonnull):
        # writer folded NaN into stats → collection drops the bounds
        mn = mx = None
    else:
        # writer skipped NaN rows: finite bounds, NaN rows hidden
        mn = min(finite) if finite else None
        mx = max(finite) if finite else None
    nulls = sum(v is None for v in vals)
    if draw(st.booleans()):
        nulls = None
    return vals, [mn, mx, nulls]


@settings(max_examples=400, deadline=None)
@given(
    sv=_float_stat_and_values(),
    op=st.sampled_from([*_OPS_SCALAR, "in", "not in"]),
    lit=st.one_of(
        st.floats(-25, 25, allow_nan=False, allow_infinity=False),
        st.just(float("nan")),
        st.none(),
    ),
    lits=st.lists(
        st.one_of(
            st.floats(-25, 25, allow_nan=False, allow_infinity=False),
            st.just(float("nan")),
            st.none(),
        ),
        max_size=4,
    ),
)
def test_pruned_float_literal_matches_no_row(sv, op, lit, lits):
    """Float/double pruning soundness under SPARK NaN semantics — a
    pruned file skips Spark's residual filter entirely, so no hidden
    NaN row may have matched (regression for the NaN zone-map hole)."""
    vals, stat = sv
    val = lits if op in ("in", "not in") else lit
    if val is None and op in ("<=", ">=", "<", ">"):
        return
    if not literal_may_match_stats(op, val, stat):
        for v in vals:
            assert not _spark_eval_float(v, op, val), (
                f"pruned float file contains matching row: value={v!r}, "
                f"op={op!r}, literal={val!r}, stat={stat!r}"
            )


# --- z-order clustering -----------------------------------------------------


def _zorder_store(spark, tmp_path, name, cluster_cols):
    """100k rows over two INDEPENDENT uniform dims, 16 files."""
    from plateau_spark.plans.zorder import cluster_by_zorder

    store = Store(str(tmp_path / name))
    df = spark.range(100_000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).alias("y"),
    )
    if cluster_cols:
        df = cluster_by_zorder(df, cluster_cols, num_partitions=16)
    else:  # linear clustering baseline on x only
        df = df.repartitionByRange(16, "x").sortWithinPartitions("x")
    store_dataframe_as_dataset(
        spark, store, "t", df, partition_on=[], repartition=False,
        zone_map_columns=["x", "y"],
    )
    return store


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    store = _zorder_store(spark, tmp_path, "z", ["x", "y"])
    box = [[("x", "<", 250), ("y", "<", 250)]]
    out = read_dataset_as_dataframe(spark, store, "t", predicates=box)
    # a 1/16-area box on a 16-file z-curve should touch a strict subset
    assert len(out.inputFiles()) <= 8
    # correctness: identical rows to an unpruned filter
    expect = (
        spark.range(100_000)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(1000)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).alias("y"),
        )
        .where((F.col("x") < 250) & (F.col("y") < 250))
        .count()
    )
    assert out.count() == expect
    # single-dimension predicates ALSO prune (each dim is partially
    # disjoint across z-chunks)
    for col in ("x", "y"):
        sub = read_dataset_as_dataframe(
            spark, store, "t", predicates=[[(col, "<", 120)]]
        )
        assert len(sub.inputFiles()) < 16


def test_linear_sort_cannot_prune_other_dimension(spark, tmp_path):
    """The motivating contrast: linear range-clustering on x leaves every
    file spanning the full y range — y predicates prune nothing."""
    store = _zorder_store(spark, tmp_path, "lin", None)
    on_x = read_dataset_as_dataframe(
        spark, store, "lin".replace("lin", "t"), predicates=[[("x", "<", 120)]]
    )
    assert len(on_x.inputFiles()) <= 3
    on_y = read_dataset_as_dataframe(
        spark, store, "t", predicates=[[("y", "<", 120)]]
    )
    assert len(on_y.inputFiles()) == 16


def test_zorder_value_bit_interleave_exact():
    """zorder_value_col must compute the textbook Morton interleave."""
    from pyspark.sql import types as T

    from plateau_spark.plans.zorder import zorder_value_col

    # verified via a local session in the spark fixture-free path below
    # (pure-expression check happens in test_zorder_value_matches_python)
    bounds = {"a": (0.0, 15.0), "b": (0.0, 15.0)}
    dtypes = {"a": T.LongType(), "b": T.LongType()}
    col = zorder_value_col(["a", "b"], bounds, dtypes, bits=4)
    assert col is not None


def test_zorder_value_matches_python(spark):
    from pyspark.sql import types as T

    from plateau_spark.plans.zorder import zorder_value_col

    def morton(a, b, bits=4):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    bounds = {"a": (0.0, 15.0), "b": (0.0, 15.0)}
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    out = df.select(
        "a", "b",
        zorder_value_col(["a", "b"], bounds, dtypes, bits=4).alias("z"),
    ).collect()
    for r in out:
        assert r["z"] == morton(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_null_and_constant_columns(spark):
    from plateau_spark.plans.zorder import cluster_by_zorder

    df = spark.createDataFrame(
        [(None, 5), (3, 5), (9, 5)], "x int, y int"
    )
    out = cluster_by_zorder(df, ["x", "y"], num_partitions=2)
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {(None, 5), (3, 5), (9, 5)}


def test_zorder_rejects_too_many_bits(spark):
    import pytest as _pytest

    from pyspark.sql import types as T

    from plateau_spark.plans.zorder import zorder_value_col

    dtypes = {c: T.LongType() for c in "abcd"}
    bounds = {c: (0.0, 1.0) for c in "abcd"}
    with _pytest.raises(ValueError, match="> 63 bits"):
        zorder_value_col(list("abcd"), bounds, dtypes, bits=16)
