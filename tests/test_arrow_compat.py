"""Cross-writer parquet compat: Spark must read parquet produced by
every pyarrow writer generation identically.

The reference pins this with one all-types file per pyarrow release
4.0.1 → 23.0.0 (/root/reference/tests/serialization/test_arrow_compat.py:11-50,
reference-data/arrow-compat/). Those fixture bytes are genuinely old
writer output — exactly the class of drift (physical timestamp
encoding, signed-ness logical types, list element naming) that broke
the streaming surface in rounds 3-4 when the testdata writer changed.

These tests are skip-gated on the fixture directory so the repo stays
standalone; when present, every versioned file must (a) read through
the Spark parquet path, (b) produce the SAME Spark schema, and (c)
produce the SAME values — cross-version equality plus spot-pinned
canonical values.
"""

from __future__ import annotations

import glob
import os

import pytest

_FIXTURE_DIR = os.environ.get(
    "SPARK_GRAFT_ARROW_COMPAT_DIR", "/root/reference/reference-data/arrow-compat"
)
_FILES = sorted(glob.glob(os.path.join(_FIXTURE_DIR, "*.parquet")))

pytestmark = pytest.mark.skipif(
    not _FILES, reason="arrow-compat fixture directory not available"
)

# Spark dtypes for the all-types fixture. Notable writer-physical →
# Spark-logical mappings this pins: uint64 → decimal(20,0) (no unsigned
# 64-bit in Spark), uint32 → bigint, timestamp[us] w/o tz → timestamp_ntz
# (the round-3/4 drift), null-typed column → int (Spark's void fallback
# on schema merge).
EXPECTED_DTYPES = {
    "array_float32": "array<float>",
    "array_float64": "array<double>",
    "array_int16": "array<smallint>",
    "array_int32": "array<int>",
    "array_int64": "array<bigint>",
    "array_int8": "array<tinyint>",
    "array_uint16": "array<int>",
    "array_uint32": "array<bigint>",
    "array_uint64": "array<decimal(20,0)>",
    "array_uint8": "array<smallint>",
    "array_unicode": "array<string>",
    "bool": "boolean",
    "byte": "binary",
    "date": "date",
    "datetime64": "timestamp_ntz",
    "float32": "float",
    "float64": "double",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "int8": "tinyint",
    "null": "int",
    "uint16": "int",
    "uint32": "bigint",
    "uint64": "decimal(20,0)",
    "uint8": "smallint",
    "unicode": "string",
}


def _read_one(spark, path):
    df = spark.read.parquet(path)
    row = df.collect()
    assert len(row) == 1, f"{path}: expected the 1-row all-types fixture"
    return dict(df.dtypes), row[0].asDict()


@pytest.fixture(scope="module")
def compat_rows(spark):
    return {os.path.basename(p): _read_one(spark, p) for p in _FILES}


def test_every_writer_version_reads_with_same_schema(compat_rows):
    bad = {
        name: {k: v for k, v in dtypes.items() if EXPECTED_DTYPES.get(k) != v}
        for name, (dtypes, _) in compat_rows.items()
        if dtypes != EXPECTED_DTYPES
    }
    assert not bad, f"schema drift across writer versions: {bad}"


def test_every_writer_version_reads_same_values(compat_rows):
    names = sorted(compat_rows)
    _, anchor = compat_rows[names[0]]
    anchor.pop("null", None)
    for name in names[1:]:
        _, vals = compat_rows[name]
        vals.pop("null", None)
        diff = {k for k in anchor if vals.get(k) != anchor[k]}
        assert not diff, f"{name} values diverge from {names[0]} in {sorted(diff)}"


def test_canonical_values(compat_rows):
    import datetime
    from decimal import Decimal

    _, row = next(iter(compat_rows.values()))
    assert row["int64"] == 1 and row["uint64"] == Decimal(1)
    assert row["float64"] == 1.0 and row["bool"] is True
    assert row["unicode"] == "Ö" and row["array_unicode"] == ["Ö"]
    assert row["date"] == datetime.date(2018, 1, 1)
    assert row["datetime64"] == datetime.datetime(2018, 1, 1)
    assert isinstance(row["byte"], (bytes, bytearray)) and len(row["byte"]) == 16
    assert row["array_int64"] == [1] and row["array_float32"] == [1.0]
