"""Writer-drift guard: assert the engine-facing dtypes of every driver
testdata table.

The testdata is re-generated between rounds by an external writer, and
its physical encodings have drifted before (events.ts went from parquet
TIMESTAMP(NANOS) — read as long under nanosAsLong — to timestamp[us]
with isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ). That
drift silently broke ``withWatermark`` deep inside the streaming
harness two rounds in a row. This test makes the next re-encoding fail
loudly in ONE obvious place, naming the drifted column.

Mirrors the reference's cross-version arrow-compat goldens
(/root/reference/tests/serialization/test_arrow_compat.py:11-50): pin
what the writer produces, not just what the engine emits.
"""

from __future__ import annotations

import os

import pytest

from plateau_spark.sources.tables import TABLES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_DRIFT_SF_DIR", "/root/testdata/sf0.001")

# Engine-facing contract AFTER load_table normalization. Values are the
# exact Spark simpleString dtypes the rest of the engine assumes.
# A set value means "any of these is fine" (documented writer freedom).
EXPECTED: dict[str, dict[str, object]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        # date arithmetic / BETWEEN in q3/q5 works on either flavor
        "o_orderdate": {"timestamp", "timestamp_ntz", "date"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": {"timestamp", "timestamp_ntz", "date"},
    },
    "events": {
        "event_id": "bigint",
        # load_table must deliver a watermark-capable event time: plain
        # TIMESTAMP, never NTZ and never raw nanos-long. This is THE
        # drift that broke rounds 3-4.
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", TABLES)
def test_testdata_dtypes(spark, table):
    df = load_table(spark, SF_DIR, table)
    actual = dict(df.dtypes)
    expected = EXPECTED[table]
    missing = set(expected) - set(actual)
    assert not missing, f"{table}: columns missing from testdata: {sorted(missing)}"
    drifted = []
    for col, want in expected.items():
        got = actual[col]
        ok = got in want if isinstance(want, set) else got == want
        if not ok:
            drifted.append(f"{table}.{col}: expected {want!r}, got {got!r}")
    assert not drifted, (
        "testdata writer drift detected (fix load_table normalization or "
        "the consuming operator):\n  " + "\n  ".join(drifted)
    )


def test_events_ts_is_watermark_capable(spark):
    """The exact failure mode of rounds 3-4, asserted directly: the
    normalized events stream must be accepted by withWatermark."""
    ev = load_table(spark, SF_DIR, "events")
    # raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on drift
    ev.withWatermark("ts", "1 hour").groupBy("event_type").count()
