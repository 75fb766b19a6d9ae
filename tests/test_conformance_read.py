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
    else:  # pragma: no cover
        raise AssertionError(mode)
    return sorted(tuple(r) for r in rows)


MODES = ["eager", "iterator", "groups"]


@pytest.mark.parametrize("mode", MODES)
def test_full_read(mode, spark, conf_store):
    assert _materialize(mode, spark, conf_store) == sorted(
        (p, d, l, t) for p, l, t, d in ROWS
    )


@pytest.mark.parametrize("mode", MODES)
def test_predicate_on_partition_key(mode, spark, conf_store):
    got = _materialize(
        mode, spark, conf_store, predicates=[[("P", ">", 1)]]
    )
    assert got == sorted((p, d, l, t) for p, l, t, d in ROWS if p > 1)


@pytest.mark.parametrize("mode", MODES)
def test_predicate_on_indexed_column(mode, spark, conf_store):
    got = _materialize(mode, spark, conf_store, predicates=[[("L", "==", 2)]])
    assert got == sorted((p, d, l, t) for p, l, t, d in ROWS if l == 2)


@pytest.mark.parametrize("mode", MODES)
def test_predicate_disjunction(mode, spark, conf_store):
    preds = [[("L", "==", 1)], [("TARGET", ">=", 4)]]
    got = _materialize(mode, spark, conf_store, predicates=preds)
    assert got == sorted(
        (p, d, l, t) for p, l, t, d in ROWS if l == 1 or t >= 4
    )


@pytest.mark.parametrize("mode", MODES)
def test_column_projection(mode, spark, conf_store):
    got = _materialize(mode, spark, conf_store, columns=["P", "TARGET"])
    assert got == sorted((p, t) for p, _l, t, _d in ROWS)


@pytest.mark.parametrize("mode", MODES)
def test_empty_result(mode, spark, conf_store):
    got = _materialize(mode, spark, conf_store, predicates=[[("P", "==", 99)]])
    assert got == []


@pytest.mark.parametrize("mode", MODES)
def test_missing_column_rejected(mode, spark, conf_store):
    with pytest.raises(ValueError, match="Columns not found"):
        _materialize(mode, spark, conf_store, columns=["NOPE"])
