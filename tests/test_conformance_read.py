"""One parametrized read-conformance suite, three execution modes.

Mirrors the reference's shared-suite pattern
(/root/reference/plateau/io/testing/read.py): the same assertions run
against every read mode — ``eager`` (one DataFrame),
``iterator`` (toLocalIterator), and ``groups`` (dispatch_by grouped
reads with logical conjunctions) — so a semantics change in any mode
fails the same test.
"""

from __future__ import annotations

import datetime

import pytest

from plateau_spark.sources.dataset import (
    read_dataset_as_dataframe,
    read_dataset_as_dataframe_groups,
    read_dataset_as_dataframe_iterator,
    store_dataframe_as_dataset,
)

ROWS = [
    # (P, L, TARGET, DATE)
    (1, 1, 1, datetime.date(2010, 1, 1)),
    (1, 2, 2, datetime.date(2010, 1, 2)),
    (2, 2, 3, datetime.date(2009, 12, 31)),
    (3, 3, 4, datetime.date(2011, 6, 15)),
]


@pytest.fixture(scope="module")
def conf_store(spark, tmp_path_factory):
    from plateau_spark.core.store import Store

    store = Store(str(tmp_path_factory.mktemp("conformance") / "store"))
    df = spark.createDataFrame(ROWS, "P long, L long, TARGET long, DATE date")
    store_dataframe_as_dataset(
        spark, store, "conf", df, partition_on=["P"], secondary_indices=["L"]
    )
    return store


def _materialize(mode, spark, store, **kwargs):
    """Row tuples in normalized column order (P, DATE, L, TARGET)."""
    if mode == "eager":
        df = read_dataset_as_dataframe(spark, store, "conf", **kwargs)
        rows = df.collect()
    elif mode == "iterator":
        rows = list(read_dataset_as_dataframe_iterator(spark, store, "conf", **kwargs))
    elif mode == "groups":
        rows = []
        for _key, df in read_dataset_as_dataframe_groups(
            spark, store, "conf", ["P"], **kwargs
        ):
            rows.extend(df.collect())
    elif mode == "datasource":
        # the Python DataSource (format("plateau")): grid predicates
        # re-spelled as ONE Catalyst filter via dnf_to_column, so the
        # pushFilters→plan_scan translation sees the grid's full
        # predicate vocabulary (ranges, dates, disjunctions — the
        # write grid's sampled datasource reads only spell ==).
        # Columns re-ordered to the native reader's order so the
        # positional tuple comparison is apples-to-apples.
        from plateau_spark.core.predicates import dnf_to_column
        from plateau_spark.sources.datasource import register_plateau_datasource

        register_plateau_datasource(spark)
        df = (
            spark.read.format("plateau")
            .option("store", store.root)
            .option("dataset", "conf")
            # fresh .load() per case → the opt-in per-query pushFilters
            # pruning tier is safe and gets the grid's predicate breadth
            .option("filter_pushdown", "true")
            .load()
        )
        preds = kwargs.get("predicates")
        if preds:
            df = df.where(dnf_to_column(preds))
        rows = df.select(
            *_native_cols(spark, store, kwargs.get("columns"))
        ).collect()
    else:  # pragma: no cover
        raise AssertionError(mode)
    return sorted(tuple(r) for r in rows)


_NATIVE_COLS_CACHE: dict = {}


def _native_cols(spark, store, columns):
    """Native reader's column order for the datasource comparison —
    depends only on the columns kwarg, so one plan per projection
    instead of one per grid case."""
    key = tuple(columns) if columns is not None else None
    if key not in _NATIVE_COLS_CACHE:
        kw = {} if columns is None else {"columns": list(columns)}
        _NATIVE_COLS_CACHE[key] = read_dataset_as_dataframe(
            spark, store, "conf", **kw
        ).columns
    return _NATIVE_COLS_CACHE[key]


MODES = ["eager", "iterator", "groups"]
# value-producing cases additionally run through the Python DataSource;
# error-contract cases stay native (the typed errors belong to the
# predicates=/columns= API, not Spark's format() surface)
MODES_DS = [*MODES, "datasource"]


@pytest.mark.parametrize("mode", MODES_DS)
def test_full_read(mode, spark, conf_store):
    assert _materialize(mode, spark, conf_store) == sorted(
        (p, d, l, t) for p, l, t, d in ROWS
    )


@pytest.mark.parametrize("mode", MODES_DS)
def test_predicate_on_partition_key(mode, spark, conf_store):
    got = _materialize(
        mode, spark, conf_store, predicates=[[("P", ">", 1)]]
    )
    assert got == sorted((p, d, l, t) for p, l, t, d in ROWS if p > 1)


@pytest.mark.parametrize("mode", MODES_DS)
def test_predicate_on_indexed_column(mode, spark, conf_store):
    got = _materialize(mode, spark, conf_store, predicates=[[("L", "==", 2)]])
    assert got == sorted((p, d, l, t) for p, l, t, d in ROWS if l == 2)


@pytest.mark.parametrize("mode", MODES_DS)
def test_predicate_disjunction(mode, spark, conf_store):
    preds = [[("L", "==", 1)], [("TARGET", ">=", 4)]]
    got = _materialize(mode, spark, conf_store, predicates=preds)
    assert got == sorted(
        (p, d, l, t) for p, l, t, d in ROWS if l == 1 or t >= 4
    )


@pytest.mark.parametrize("mode", MODES_DS)
def test_column_projection(mode, spark, conf_store):
    got = _materialize(mode, spark, conf_store, columns=["P", "TARGET"])
    assert got == sorted((p, t) for p, _l, t, _d in ROWS)


@pytest.mark.parametrize("mode", MODES_DS)
def test_empty_result(mode, spark, conf_store):
    got = _materialize(mode, spark, conf_store, predicates=[[("P", "==", 99)]])
    assert got == []


@pytest.mark.parametrize("mode", MODES)
def test_missing_column_rejected(mode, spark, conf_store):
    with pytest.raises(ValueError, match="Columns not found"):
        _materialize(mode, spark, conf_store, columns=["NOPE"])


@pytest.mark.parametrize("mode", ["eager", "iterator"])
def test_empty_column_projection(mode, spark, conf_store):
    """columns=[] keeps the row COUNT but no columns (reference:
    explicit empty projection is a legal narrowing, not an error)."""
    got = _materialize(mode, spark, conf_store, columns=[])
    assert got == [() for _ in ROWS]


@pytest.mark.parametrize("mode", ["eager", "iterator"])
def test_empty_partition_element_roundtrip(mode, spark, tmp_path):
    """A stored empty DataFrame element contributes no rows and does not
    break the read path (reference conformance: empty partitions are
    dropped at write, plateau/io_components/metapartition.py)."""
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import store_dataframes_as_dataset

    store = Store(str(tmp_path / "store"))
    schema = "P long, L long, TARGET long, DATE date"
    full = spark.createDataFrame(ROWS, schema)
    empty = spark.createDataFrame([], schema)
    store_dataframes_as_dataset(spark, store, "conf", [empty, full], partition_on=["P"])
    if mode == "eager":
        rows = read_dataset_as_dataframe(spark, store, "conf").collect()
    else:
        rows = list(read_dataset_as_dataframe_iterator(spark, store, "conf"))
    assert sorted(tuple(r) for r in rows) == sorted((p, d, l, t) for p, l, t, d in ROWS)


@pytest.mark.parametrize("mode", ["eager", "iterator"])
def test_all_null_column_roundtrip(mode, spark, tmp_path):
    """An all-NULL typed column survives the write/read cycle with its
    type and nulls intact (reference conformance case)."""
    from plateau_spark.core.store import Store

    store = Store(str(tmp_path / "store"))
    df = spark.createDataFrame(
        [(1, None, None), (2, None, None)], "k long, s string, d date"
    )
    store_dataframe_as_dataset(spark, store, "nulls", df, partition_on=["k"])
    out = read_dataset_as_dataframe(spark, store, "nulls")
    assert dict(out.dtypes) == {"k": "bigint", "s": "string", "d": "date"}
    if mode == "eager":
        rows = out.collect()
    else:
        rows = list(read_dataset_as_dataframe_iterator(spark, store, "nulls"))
    assert sorted(tuple(r) for r in rows) == [(1, None, None), (2, None, None)]


@pytest.mark.parametrize("mode", ["eager", "iterator"])
def test_date_typed_partition_key(mode, spark, tmp_path):
    """DATE partition keys: label-encoded on write, revived as
    datetime.date in metadata, prunable by date predicates."""
    from plateau_spark.core.store import Store

    store = Store(str(tmp_path / "store"))
    df = spark.createDataFrame(ROWS, "P long, L long, TARGET long, DATE date")
    store_dataframe_as_dataset(spark, store, "bydate", df, partition_on=["DATE"])
    pred = [[("DATE", ">=", datetime.date(2010, 1, 1))]]
    out = read_dataset_as_dataframe(spark, store, "bydate", predicates=pred)
    # pruning happened driver-side: fewer files scanned than partitions
    assert len(out.inputFiles()) == 3
    if mode == "eager":
        rows = out.collect()
    else:
        rows = list(
            read_dataset_as_dataframe_iterator(spark, store, "bydate", predicates=pred)
        )
    expect = sorted(
        (d, l, p, t) for p, l, t, d in ROWS if d >= datetime.date(2010, 1, 1)
    )
    assert sorted(tuple(r) for r in rows) == expect


def test_multi_table_dataset_rejected(spark, tmp_path):
    """Pre-4.0 multi-table commit files are rejected with a specific
    error (reference: plateau/core/dataset.py:134-140)."""
    from plateau_spark.core import naming
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.core.store import Store

    store = Store(str(tmp_path / "store"))
    store.put_json(
        naming.metadata_key("multi"),
        {
            "dataset_uuid": "multi",
            "metadata_version": 4,
            "partition_keys": [],
            "partitions": {
                "part0": {
                    "files": {
                        "core": "multi/core/part0.parquet",
                        "extra": "multi/extra/part0.parquet",
                    }
                }
            },
        },
    )
    with pytest.raises(ValueError, match="Multi-table partition"):
        DatasetMetadata.load(store, "multi")
    with pytest.raises(ValueError, match="Multi-table partition"):
        read_dataset_as_dataframe(spark, store, "multi")


def test_categories_kwarg_raises(spark, conf_store):
    """categories= on the Spark DATAFRAME surface is a typed error
    (no categorical dtype) pointing at the pandas surface that honors
    it — never silently absent."""
    with pytest.raises(NotImplementedError, match="read_table_as_pandas"):
        read_dataset_as_dataframe(spark, conf_store, "conf", categories=["L"])


def test_categories_on_pandas_surface(spark, conf_store):
    """Round-9: the reference's categories= contract
    (serialization/_parquet.py:129-143) is honored where it actually
    lives — the pandas-returning reader. Named columns come back
    categorical with ONE category set across all partitions; values
    are unchanged; combines with predicates/projection."""
    import pandas as pd

    from plateau_spark.sources.dataset import read_table_as_pandas

    pdf = read_table_as_pandas(spark, conf_store, "conf", categories=["L"])
    assert isinstance(pdf["L"].dtype, pd.CategoricalDtype)
    assert sorted(pdf["L"].cat.categories) == [1, 2, 3]
    assert sorted(pdf["L"]) == sorted(l for _p, l, _t, _d in ROWS)

    narrowed = read_table_as_pandas(
        spark, conf_store, "conf",
        columns=["P", "L"], predicates=[[("P", ">", 1)]], categories=["L"],
    )
    assert isinstance(narrowed["L"].dtype, pd.CategoricalDtype)
    assert sorted(narrowed["L"]) == sorted(l for p, l, _t, _d in ROWS if p > 1)

    with pytest.raises(ValueError, match="not in result"):
        read_table_as_pandas(
            spark, conf_store, "conf", columns=["P"], categories=["L"]
        )


def test_dates_as_object_reference_default_accepted(spark, conf_store):
    """dates_as_object=True is the reference's DEFAULT
    (plateau/io_components/metapartition.py:596): date columns as object
    arrays of datetime.date on the pandas surface — which is exactly
    what Spark DateType materializes to, so the kwarg is an accepted
    no-op and ported reader code runs verbatim (round-7 fix; this was a
    typed divergence error before)."""
    import datetime as dt

    base = read_dataset_as_dataframe(spark, conf_store, "conf")
    same = read_dataset_as_dataframe(spark, conf_store, "conf", dates_as_object=True)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, same.collect()))
    pdf = same.toPandas()
    assert pdf["DATE"].dtype == object
    assert all(type(v) is dt.date for v in pdf["DATE"])


def test_dates_as_object_false_legacy_warns_datetime64(spark, conf_store):
    """dates_as_object=False replays the reference's deprecated legacy
    behavior (metapartition.py:629-634): a DeprecationWarning and date
    columns as datetime64 timestamps."""
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        df = read_dataset_as_dataframe(
            spark, conf_store, "conf", dates_as_object=False
        )
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert dict(df.dtypes)["DATE"] == "timestamp"
    pdf = df.toPandas()
    assert str(pdf["DATE"].dtype).startswith("datetime64")


def test_read_table_as_pandas_surface(spark, conf_store):
    """The reference's eager pandas read surface: read_table_as_pandas
    returns one pandas frame with the reference dtype contract, full
    kwarg passthrough (columns/predicates)."""
    import datetime as dt

    from plateau_spark.sources.dataset import read_table_as_pandas

    pdf = read_table_as_pandas(spark, conf_store, "conf")
    assert len(pdf) == len(ROWS)
    assert pdf["DATE"].dtype == object and all(
        type(v) is dt.date for v in pdf["DATE"]
    )
    sel = read_table_as_pandas(
        spark, conf_store, "conf",
        columns=["P", "TARGET"], predicates=[[("P", ">=", 2)]],
    )
    assert sorted(sel.columns) == ["P", "TARGET"]
    assert sorted(sel["TARGET"]) == [3, 4]


def test_predicate_pushdown_to_io_kwarg(spark, conf_store):
    """predicate_pushdown_to_io: the reference's per-read debugging
    escape hatch (plateau/serialization/_parquet.py:208-210), honored
    per-read since round 7. True (the reference default) pushes the
    residual predicate into the parquet scan; False applies it
    POST-scan (PushedFilters empty) with bit-identical rows — and
    driver-side partition pruning still applies in both spellings."""
    import re

    pred = [[("TARGET", ">=", 2), ("L", "==", 2)]]
    pushed = read_dataset_as_dataframe(spark, conf_store, "conf", predicates=pred)
    unpushed = read_dataset_as_dataframe(
        spark, conf_store, "conf", predicates=pred, predicate_pushdown_to_io=False
    )
    assert sorted(map(tuple, pushed.collect())) == sorted(
        map(tuple, unpushed.collect())
    )

    def pushed_filters(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return "".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))

    assert "TARGET" in pushed_filters(pushed)
    assert pushed_filters(unpushed).strip() == ""
    # partition pruning is io-pushdown-independent: a key predicate
    # still cuts the file list under predicate_pushdown_to_io=False
    key_pred = [[("P", "==", 2)]]
    files = read_dataset_as_dataframe(
        spark, conf_store, "conf", predicates=key_pred,
        predicate_pushdown_to_io=False,
    ).inputFiles()
    assert len(files) == 1


@pytest.mark.parametrize("mode", ["eager", "iterator"])
def test_unicode_and_special_char_partition_values(mode, spark, tmp_path):
    """Partition-key values with spaces, slashes, unicode, '=' — the
    label urlencode/decode roundtrip must preserve them exactly
    (reference: plateau/core/urlencode.py quoting contract)."""
    from plateau_spark.core.store import Store

    store = Store(str(tmp_path / "store"))
    vals = ["plain", "with space", "sla/sh", "Ωmega", "a=b&c", "dot..dot"]
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "g string, x long"
    )
    store_dataframe_as_dataset(spark, store, "uni", df, partition_on=["g"])
    out = read_dataset_as_dataframe(spark, store, "uni")
    if mode == "iterator":
        rows = list(read_dataset_as_dataframe_iterator(spark, store, "uni"))
    else:
        rows = out.collect()
    assert sorted((r["g"], r["x"]) for r in rows) == sorted(
        (v, i) for i, v in enumerate(vals)
    )
    # pruned read on a value that needs encoding
    got = read_dataset_as_dataframe(
        spark, store, "uni", predicates=[[("g", "==", "sla/sh")]]
    )
    assert [(r["g"], r["x"]) for r in got.collect()] == [("sla/sh", 2)]
    assert len(got.inputFiles()) == 1


@pytest.mark.parametrize("mode", MODES)
def test_mixed_key_and_content_predicate(mode, spark, conf_store):
    """One conjunction mixing a partition-key literal (pruned driver-side)
    and a content literal (pushed to the scan) in every read mode."""
    preds = [[("P", "<=", 2), ("TARGET", ">", 1)]]
    got = _materialize(mode, spark, conf_store, predicates=preds)
    assert got == sorted(
        (p, d, l, t) for p, l, t, d in ROWS if p <= 2 and t > 1
    )


def test_secondary_index_on_null_heavy_column(spark, tmp_path):
    """Indexing a column that is mostly NULL: non-null values remain
    queryable; the null rows simply never match equality predicates
    (SQL semantics, SURVEY §4)."""
    from plateau_spark.core.store import Store

    store = Store(str(tmp_path / "store"))
    df = spark.createDataFrame(
        [(i, "tag" if i % 10 == 0 else None) for i in range(50)],
        "k long, tag string",
    )
    store_dataframe_as_dataset(
        spark, store, "nully", df, partition_on=[], secondary_indices=["tag"]
    )
    got = read_dataset_as_dataframe(
        spark, store, "nully", predicates=[[("tag", "==", "tag")]]
    )
    assert sorted(r["k"] for r in got.collect()) == [0, 10, 20, 30, 40]


def test_many_partition_planning_stays_driver_cheap(spark, tmp_path):
    """200 partition-key values: the planner must prune to exactly one
    file via commit-file key values (no store listing, no data scan)."""
    from plateau_spark.core.store import Store

    store = Store(str(tmp_path / "store"))
    df = spark.createDataFrame([(i % 200, i) for i in range(2000)], "g long, x long")
    store_dataframe_as_dataset(spark, store, "many", df, partition_on=["g"])
    out = read_dataset_as_dataframe(
        spark, store, "many", predicates=[[("g", "==", 137)]]
    )
    assert len(out.inputFiles()) == 1
    assert out.count() == 10


def test_binary_column_roundtrip(spark, tmp_path):
    """Reference parity: binary payloads survive the dataset round-trip
    with predicates on sibling columns
    (/root/reference/plateau/io/testing/read.py:631 test_binary_column_metadata)."""
    from plateau_spark.core.store import Store

    store = Store(str(tmp_path / "store"))
    payloads = [b"\x00\x01\xffhigh", "ünïcode".encode(), b""]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "k long, payload binary"
    )
    store_dataframe_as_dataset(spark, store, "bin", df)
    out = read_dataset_as_dataframe(
        spark, store, "bin", predicates=[[("k", "<", 2)]]
    )
    got = {r["k"]: bytes(r["payload"]) for r in out.collect()}
    assert got == {0: payloads[0], 1: payloads[1]}
    assert dict(out.dtypes)["payload"] == "binary"


def test_non_default_table_name_read(spark, tmp_path):
    """Reference parity: a commit file whose single table is named
    something other than "table" still reads (the reference accepts any
    single name — plateau/core/dataset.py:134-140;
    io/testing/read.py:675 test_non_default_table_name_roundtrip)."""
    import json

    from plateau_spark.core.store import Store

    store = Store(str(tmp_path / "store"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    store_dataframe_as_dataset(spark, store, "ds", df)
    # rewrite the commit file to use a non-default table name
    key = "ds.by-dataset-metadata.json"
    payload = store.get_json(key)
    for label, pj in payload["partitions"].items():
        pj["files"] = {"core": pj["files"]["table"]}
    store.put_json(key, payload)
    out = read_dataset_as_dataframe(spark, store, "ds")
    assert sorted((r["k"], r["s"]) for r in out.collect()) == [(1, "a"), (2, "b")]


def test_primary_index_only_projection_reads_no_payload(spark, tmp_path):
    """columns=[partition key] serves from hive dirs + footer row counts:
    the scan's ReadSchema is EMPTY (reference:
    io/testing/read.py test_read_dataset_as_dataframes_columns_primary_index_only)."""
    from plateau_spark.core.store import Store

    store = Store(str(tmp_path / "store"))
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i * 1.0) for i in range(30)], "k long, g string, x double"
    )
    store_dataframe_as_dataset(spark, store, "ds", df, partition_on=["g"])
    out = read_dataset_as_dataframe(spark, store, "ds", columns=["g"])
    assert out.columns == ["g"]
    assert out.count() == 30
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<>" in plan


def test_file_structure_flat_dataset(spark, tmp_path):
    """Unpartitioned datasets lay files directly under <uuid>/table/
    with the commit-id prefix; one commit file, no staging leftovers
    (reference: io/testing/write.py test_file_structure_dataset_v4)."""
    from plateau_spark.core.store import Store
    from plateau_spark.core.naming import metadata_key

    store = Store(str(tmp_path / "store"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    store_dataframe_as_dataset(spark, store, "flat", df)
    keys = sorted(store.iter_keys("flat"))
    payload = [k for k in keys if k.endswith(".parquet")]
    assert payload and all(k.startswith("flat/table/") for k in payload)
    assert all("/" not in k[len("flat/table/"):] for k in payload)  # no subdirs
    assert store.exists(metadata_key("flat"))
    assert not [k for k in keys if "/.staging/" in k]


# --- reference read-suite grid parity (round 7) -----------------------------
# Mirrors /root/reference/plateau/io/testing/read.py's parametrized
# grids: single-predicate operator variants (:216), key+content mixes
# incl. disjunctions (:246), and the datetime-predicate × partition_on
# × comparator grid under dates_as_object (:580).


def _expected(pred):
    """Evaluate a DNF predicate over ROWS driver-side (P, L, TARGET, DATE)."""
    def row_ok(row, conj):
        ops = {
            "==": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b,
            "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b,
            "in": lambda a, b: a in b,
        }
        cols = {"P": 0, "L": 1, "TARGET": 2, "DATE": 3}
        return all(ops[op](row[cols[c]], v) for c, op, v in conj)

    return sorted(
        (r[0], r[3], r[1], r[2])  # normalized order: P, DATE, L, TARGET
        for r in ROWS
        if any(row_ok(r, conj) for conj in pred)
    )


@pytest.mark.parametrize(
    "predicates",
    [
        [[("P", "==", 2)]],
        [[("P", "in", [2])]],
        [[("P", "!=", 1)]],
        [[("P", ">", 1)]],
        [[("P", ">=", 2)]],
        [[("P", "<", 2)]],
        [[("P", "<=", 1)]],
        [[("P", "in", [])]],
    ],
    ids=["eq", "in", "ne", "gt", "ge", "lt", "le", "in-empty"],
)
@pytest.mark.parametrize("mode", MODES)
def test_predicate_operator_grid_on_partition_key(mode, spark, conf_store, predicates):
    """Reference read.py:216 grid: every comparison operator against the
    partition key, across all three read modes."""
    assert _materialize(mode, spark, conf_store, predicates=predicates) == _expected(
        predicates
    )


@pytest.mark.parametrize(
    "predicates",
    [
        [[("P", "==", 2), ("TARGET", "==", 3)]],
        [[("P", "in", [2]), ("TARGET", "==", 3)]],
        [[("P", "!=", 1), ("L", "==", 2)]],
        [[("P", "!=", 1), ("L", "in", [2])]],
        [[("P", ">", 2)], [("TARGET", ">=", 2)]],
        [[("P", ">=", 2)], [("TARGET", ">=", 2)]],
        [[("P", "==", 1), ("DATE", ">", datetime.date(2010, 1, 1))]],
    ],
    ids=["key-content", "in-content", "ne-idx", "ne-in-idx", "disj-gt",
         "disj-ge", "key-date"],
)
@pytest.mark.parametrize("mode", MODES)
def test_predicate_key_content_mix_grid(mode, spark, conf_store, predicates):
    """Reference read.py:246 grid: conjunctions splitting across
    partition-key and content columns, plus disjunctions spanning both —
    identical rows in every read mode."""
    assert _materialize(mode, spark, conf_store, predicates=predicates) == _expected(
        predicates
    )


@pytest.mark.parametrize("partition_on", [["a", "b"], ["c"], ["a", "b", "c"]])
@pytest.mark.parametrize("comp", ["==", ">="])
@pytest.mark.parametrize("dates_kw", [True, None])
def test_datetime_predicate_with_dates_grid(
    spark, tmp_path, partition_on, comp, dates_kw
):
    """Reference read.py:580 grid: a date column both AS a partition key
    and as payload, filtered with ==/>= date literals, under the
    reference's dates_as_object spellings. The full original frame must
    come back (both rows share the predicate date)."""
    import datetime as dt

    from plateau_spark.core.store import Store

    store = Store(str(tmp_path / "store"))
    df = spark.createDataFrame(
        [(1, 1, dt.date(2000, 1, 1), 1), (1, 1, dt.date(2000, 1, 1), 2)],
        "a long, b long, c date, d long",
    )
    uuid = (
        "dategrid-" + "-".join(partition_on)
        + ("-ge" if comp == ">=" else "-eq") + f"-{dates_kw}"
    )
    store_dataframe_as_dataset(spark, store, uuid, df, partition_on=partition_on)
    kwargs = {} if dates_kw is None else {"dates_as_object": dates_kw}
    out = read_dataset_as_dataframe(
        spark, store, uuid,
        predicates=[[("c", comp, dt.date(2000, 1, 1))]], **kwargs,
    )
    got = sorted((r["a"], r["b"], r["c"], r["d"]) for r in out.collect())
    assert got == [(1, 1, dt.date(2000, 1, 1), 1), (1, 1, dt.date(2000, 1, 1), 2)]
    # and the date column stays a real date on the pandas surface
    assert all(type(v) is dt.date for v in out.toPandas()["c"])


# ---------------------------------------------------------------------------
# Generative read grid — the round-9 widening of this suite toward the
# reference's full parametrization (/root/reference/plateau/io/testing/
# read.py:216-629: predicate placement × dispatch_by × dates ×
# projection × output shape). Every case is checked against a
# Python-side oracle evaluated directly over ROWS, so the grid scales
# by adding a DNF or a layout, not by hand-writing expectations.
# ---------------------------------------------------------------------------

_D = datetime.date

# layout → (partition_on, secondary_indices); dispatch col for "groups"
# mode must be a partition key or indexed in every layout
GRID_LAYOUTS = {
    "flat_idx": ([], ["P", "L"]),
    "part_P": (["P"], ["L"]),
    "part_PL": (["P", "L"], []),
    "part_DATE": (["DATE"], ["P"]),
}

# the reference's two predicate tables (read.py:216-246) + dates grid
# (read.py:580-583) + empty/IN/NOT-IN edges, expressed over ROWS' cols
GRID_PREDICATES = [
    None,
    [[("P", "==", 2)]],
    [[("P", "in", [2])]],
    [[("P", "!=", 1)]],
    [[("P", ">", 1)]],
    [[("P", ">=", 2)]],
    [[("P", "in", [])]],
    [[("P", "in", [1, 3])]],
    [[("P", "not in", [1, 3])]],
    [[("P", "==", 2), ("TARGET", "==", 3)]],
    [[("P", "in", [2]), ("TARGET", "==", 3)]],
    [[("P", "!=", 1), ("L", "==", 2)]],
    [[("P", "!=", 1), ("L", "in", [2])]],
    [[("P", ">", 2)], [("TARGET", ">=", 2)]],
    [[("L", "==", 2)]],
    [[("L", "in", [1, 3])]],
    [[("TARGET", "<", 3)]],
    [[("DATE", "==", _D(2010, 1, 1))]],
    [[("DATE", ">=", _D(2010, 1, 1))]],
    [[("DATE", "<", _D(2010, 1, 1)), ("P", "<=", 2)]],
]

GRID_COLUMNS = [None, ["P", "TARGET"], ["TARGET"]]

_COLS = ["P", "L", "TARGET", "DATE"]
_ROWDICTS = [dict(zip(_COLS, (p, l, t, d))) for p, l, t, d in ROWS]


def _oracle_literal(row, col, op, val):
    x = row[col]
    if op in ("==", "="):
        return x == val
    if op == "!=":
        return x != val
    if op == "in":
        return x in list(val)
    if op == "not in":
        return x not in list(val)
    return {"<": x < val, "<=": x <= val, ">": x > val, ">=": x >= val}[op]


def _oracle_rows(predicates, columns):
    keep = [
        r for r in _ROWDICTS
        if predicates is None
        or any(
            all(_oracle_literal(r, *lit) for lit in conj) for conj in predicates
        )
    ]
    cols = columns if columns is not None else _COLS
    return sorted(tuple(r[c] for c in sorted(cols)) for r in keep)


@pytest.fixture(scope="module", params=sorted(GRID_LAYOUTS))
def grid_store(request, spark, tmp_path_factory):
    from plateau_spark.core.store import Store

    partition_on, indices = GRID_LAYOUTS[request.param]
    store = Store(str(tmp_path_factory.mktemp(f"grid_{request.param}") / "s"))
    df = spark.createDataFrame(ROWS, "P long, L long, TARGET long, DATE date")
    store_dataframe_as_dataset(
        spark, store, "grid", df,
        partition_on=partition_on or None,
        secondary_indices=indices or None,
    )
    return request.param, store


def _grid_read(mode, spark, store, predicates, columns):
    kwargs = {"predicates": predicates, "columns": columns}
    if mode == "eager":
        rows = read_dataset_as_dataframe(spark, store, "grid", **kwargs).collect()
    elif mode == "iterator":
        rows = list(
            read_dataset_as_dataframe_iterator(spark, store, "grid", **kwargs)
        )
    else:  # groups dispatched by P (key or indexed in every layout)
        rows = []
        for _k, df in read_dataset_as_dataframe_groups(
            spark, store, "grid", ["P"], **kwargs
        ):
            rows.extend(df.collect())
    # normalize to column-name-sorted tuples (Row preserves select order)
    out = []
    for r in rows:
        d = r.asDict()
        out.append(tuple(d[c] for c in sorted(d)))
    return sorted(out)


@pytest.mark.parametrize("columns", GRID_COLUMNS, ids=lambda c: "all" if c is None else "-".join(c))
@pytest.mark.parametrize("predicates", GRID_PREDICATES, ids=range(len(GRID_PREDICATES)))
def test_grid_eager(grid_store, spark, predicates, columns):
    _layout, store = grid_store
    got = _grid_read("eager", spark, store, predicates, columns)
    assert got == _oracle_rows(predicates, columns)


# iterator/groups: the same semantics on a predicate subset (the
# reference likewise restricts most predicate cases to the dataframe
# output type — read.py:229-230 pytest.skip for other shapes)
_MODE_PREDS = [GRID_PREDICATES[i] for i in (0, 1, 4, 11, 13, 19)]


@pytest.mark.parametrize("mode", ["iterator", "groups"])
@pytest.mark.parametrize("predicates", _MODE_PREDS, ids=range(len(_MODE_PREDS)))
def test_grid_modes(grid_store, spark, mode, predicates):
    _layout, store = grid_store
    got = _grid_read(mode, spark, store, predicates, None)
    assert got == _oracle_rows(predicates, None)


@pytest.mark.parametrize("datetype", [datetime.date, datetime.datetime])
def test_grid_datetime_vs_date_literal(grid_store, spark, datetype):
    """Reference read.py:580-629: a predicate literal may be a
    datetime.datetime against a date column (midnight equivalence) —
    both engines cast; driver-side key pruning must not choke on the
    mixed comparison either (part_DATE layout)."""
    _layout, store = grid_store
    val = datetype(2010, 1, 2) if datetype is datetime.date else datetype(2010, 1, 2, 0, 0)
    got = _grid_read("eager", spark, store, [[("DATE", ">=", val)]], None)
    assert got == _oracle_rows([[("DATE", ">=", _D(2010, 1, 2))]], None)
