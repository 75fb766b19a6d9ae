"""Property-based cross-engine fuzz of the DNF predicate compilers.

Random DNF expressions over a fixed multi-dtype frame, evaluated by BOTH
compilers — ``dnf_to_column`` (Spark Catalyst) and ``dnf_to_sql``
(DuckDB) — must select identical row sets. This is the repo's analog of
the reference's hypothesis dtype strategies
(/root/reference/plateau/core/testing.py:70-160 used by
tests/utils/test_pandas.py): the reference fuzzes its pandas filter
kernels; we fuzz the two independent compile paths against each other
across engines, which also pins the documented SQL null semantics
(SURVEY.md §4).

The frame is built ONCE (hypothesis only generates predicates), so 200+
examples cost one tiny collect each, not a dataframe build each.
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from plateau_spark.core.predicates import apply_predicates, dnf_to_sql

# --- fixed value pools per column (present values, absent values, NULL) ---

_INTS = [-3, 0, 1, 7, 42, 2**40]
_FLOATS = [-1.5, 0.0, 0.25, 3.125, 1e18]  # exactly-representable: == is meaningful
_STRS = ["", "a", "b", "o'hara", "Ω unicode", "zzz"]
_BOOLS = [True, False]
_DATES = [datetime.date(2019, 12, 31), datetime.date(2020, 6, 1), datetime.date(2024, 2, 29)]
_TSS = [
    datetime.datetime(2020, 1, 1, 0, 0, 0),
    datetime.datetime(2020, 1, 1, 12, 30, 15, 250000),
    datetime.datetime(2023, 11, 5, 23, 59, 59),
]

_POOLS: dict[str, list] = {
    "i": _INTS,
    "f": _FLOATS,
    "s": _STRS,
    "b": _BOOLS,
    "d": _DATES,
    "t": _TSS,
}
_COLS = list(_POOLS)


def _rows():
    # cartesian-ish coverage with NULLs woven through every column
    rows = []
    rid = 0
    for k in range(18):
        row = {"row_id": rid}
        for ci, (col, pool) in enumerate(_POOLS.items()):
            # every column hits NULL on a different stride
            row[col] = None if (k + ci) % 5 == 4 else pool[(k * (ci + 2) + ci) % len(pool)]
        rows.append(row)
        rid += 1
    rows.append({"row_id": rid, **{c: None for c in _COLS}})  # all-NULL row
    return rows


_ROWS = _rows()

_SPARK_SCHEMA = (
    "row_id long, i long, f double, s string, b boolean, d date, t timestamp"
)

_ARROW_SCHEMA = pa.schema(
    [
        ("row_id", pa.int64()),
        ("i", pa.int64()),
        ("f", pa.float64()),
        ("s", pa.string()),
        ("b", pa.bool_()),
        ("d", pa.date32()),
        ("t", pa.timestamp("us")),
    ]
)


@pytest.fixture(scope="module")
def fuzz_df(spark):
    sdf = spark.createDataFrame(
        [tuple(r[c] for c in ("row_id", *_COLS)) for r in _ROWS], _SPARK_SCHEMA
    ).coalesce(1)
    sdf.cache().count()
    yield sdf
    sdf.unpersist()


@pytest.fixture(scope="module")
def fuzz_duck():
    con = duckdb.connect()
    tbl = pa.Table.from_pylist(_ROWS, schema=_ARROW_SCHEMA)
    con.register("fuzz", tbl)
    yield con
    con.close()


# --- predicate strategies ---

_RANGE_OPS = ["<=", ">=", "<", ">"]
_EQ_OPS = ["==", "=", "!=", "is distinct from"]


@st.composite
def _literal(draw):
    col = draw(st.sampled_from(_COLS))
    pool = _POOLS[col]
    kind = draw(st.sampled_from(["eq", "range", "list"]))
    if kind == "eq":
        op = draw(st.sampled_from(_EQ_OPS))
        val = draw(st.sampled_from([*pool, None]))
        if op == "is distinct from" and val is None:
            # documented: distinct-from NULL == IS NOT NULL; exercised via !=
            op = "!="
        return (col, op, val)
    if kind == "range":
        op = draw(st.sampled_from(_RANGE_OPS))
        val = draw(st.sampled_from(pool))  # nulls invalid for range ops
        return (col, op, val)
    vals = draw(st.lists(st.sampled_from([*pool, None]), min_size=0, max_size=4))
    op = draw(st.sampled_from(["in", "not in"]))
    return (col, op, vals)


_DNF = st.lists(st.lists(_literal(), min_size=1, max_size=3), min_size=1, max_size=3)


def _python_eval(preds) -> set[int]:
    """Row-at-a-time SQL-3VL evaluation — the third, engine-free opinion."""

    def lit_holds(row, col, op, val):
        a = row[col]
        if op in ("in", "not in"):
            # mirrors the compiled contract: isin(non-null vals) OR
            # (IS NULL, when the list contains None). For a NULL value
            # with no None in the list the isin is UNKNOWN.
            has_null = any(v is None for v in val)
            vals = [v for v in val if v is not None]
            if a is None:
                # empty value list compiles to literal FALSE — vacuously
                # false for every row (never UNKNOWN), NULL included
                member = True if has_null else (None if vals else False)
            else:
                member = a in vals
            return member if op == "in" else (None if member is None else not member)
        if op == "is distinct from":
            if a is None and val is None:
                return False
            if a is None or val is None:
                return True
            return a != val
        if val is None:
            return (a is None) if op in ("==", "=") else (a is not None)
        if a is None:
            return None
        if op in ("==", "="):
            return a == val
        if op == "!=":
            return a != val
        return {"<=": a <= val, ">=": a >= val, "<": a < val, ">": a > val}[op]

    out = set()
    for row in _ROWS:
        disj = False
        for conj in preds:
            vals = [lit_holds(row, *lit) for lit in conj]
            if all(v is True for v in vals):
                disj = True
                break
        if disj:
            out.add(row["row_id"])
    return out


@settings(
    max_examples=250,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
@given(preds=_DNF)
def test_dnf_spark_duckdb_parity(fuzz_df, fuzz_duck, preds):
    spark_ids = {
        r["row_id"] for r in apply_predicates(fuzz_df, preds).select("row_id").collect()
    }
    sql = dnf_to_sql(preds)
    duck_ids = {
        r[0] for r in fuzz_duck.sql(f"SELECT row_id FROM fuzz WHERE {sql}").fetchall()
    }
    assert spark_ids == duck_ids, f"predicates={preds!r}\nsql={sql}"
    assert spark_ids == _python_eval(preds), f"python twin diverged: {preds!r}"
