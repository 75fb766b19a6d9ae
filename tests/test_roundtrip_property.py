"""Property-based store→read round-trip, mirroring the reference's
hypothesis dtype strategies (plateau/core/testing.py:70-160: dates,
surrogate-free unicode, NaN constraints) lifted to the Spark engine:
ANY generated frame must survive store_dataframe_as_dataset →
read_dataset_as_dataframe bit-exactly, with and without a random
single-literal predicate (checked against a Python-side evaluation).

Spark jobs are slow relative to hypothesis's default cadence, so the
example counts are deliberately small and deadlines disabled — the
value is the generator coverage (null mixes, empty partitions, unicode
edge cases, NaN), not raw example volume.
"""

from __future__ import annotations

import datetime
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from plateau_spark.sources.dataset import (
    read_dataset_as_dataframe,
    store_dataframe_as_dataset,
)

# surrogate-free printable unicode (parquet/JVM reject lone surrogates),
# excluding NUL which the JVM string bridge cannot carry
_UNICODE = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00"
    ),
    max_size=12,
)

_DATES = st.dates(
    min_value=datetime.date(1905, 1, 1), max_value=datetime.date(2200, 1, 1)
)
_TS = st.datetimes(
    min_value=datetime.datetime(1905, 1, 1),
    max_value=datetime.datetime(2200, 1, 1),
).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000))

_FLOATS = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.just(float("nan")),
)

_ROW = st.tuples(
    st.integers(min_value=-(2**62), max_value=2**62),  # k
    st.integers(min_value=0, max_value=2),  # p (partition key)
    st.one_of(st.none(), _UNICODE),  # s
    st.one_of(st.none(), _FLOATS),  # f
    st.one_of(st.none(), _DATES),  # d
    st.one_of(st.none(), _TS),  # t
    st.one_of(st.none(), st.binary(max_size=8)),  # b
)

_SCHEMA = (
    "k long, p long, s string, f double, d date, t timestamp_ntz, b binary"
)


def _canon(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _canon_rows(rows):
    return sorted(
        (tuple(_canon(x) for x in r) for r in rows),
        key=lambda t: (t[0], repr(t[1:])),
    )


_counter = [0]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
@given(rows=st.lists(_ROW, min_size=1, max_size=12, unique_by=lambda r: r[0]))
def test_store_read_roundtrip_property(spark, tmp_path_factory, rows):
    from plateau_spark.core.store import Store

    _counter[0] += 1
    store = Store(str(tmp_path_factory.mktemp("prop") / "s"))
    uuid = f"prop{_counter[0]}"
    names = [f.split()[0] for f in _SCHEMA.split(", ")]
    df = spark.createDataFrame(rows, _SCHEMA)
    store_dataframe_as_dataset(spark, store, uuid, df, partition_on=["p"])
    out = read_dataset_as_dataframe(spark, store, uuid)
    # column ORDER after a partitioned read is not part of the contract
    # (partition keys are reattached) — compare by name
    got = _canon_rows(
        tuple(r[n] for n in names) for r in out.collect()
    )
    assert got == _canon_rows(rows)

    # single-literal predicate on the partition key vs Python eval
    # (NaN-safe: predicate column is the bigint partition key)
    pv = rows[0][1]
    pred = [[("p", "==", pv)]]
    got_p = _canon_rows(
        tuple(r[n] for n in names)
        for r in read_dataset_as_dataframe(
            spark, store, uuid, predicates=pred
        ).collect()
    )
    assert got_p == _canon_rows(r for r in rows if r[1] == pv)
