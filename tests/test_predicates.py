from __future__ import annotations

import pytest

from plateau_spark.core.predicates import (
    check_predicates,
    columns_in_predicates,
    conjunction_holds_on_keys,
    dnf_to_column,
    dnf_to_sql,
    evaluate_literal,
    filter_predicates_by_column,
)


def test_check_predicates_valid():
    check_predicates(None)
    check_predicates([[("a", "==", 1)]])
    check_predicates([[("a", "in", [1, 2])], [("b", "<", 3), ("c", ">=", 0)]])
    check_predicates([[("a", "==", None)], [("a", "!=", None)]])


@pytest.mark.parametrize(
    "bad",
    [
        [],
        [[]],
        [[("a", "===", 1)]],
        [[("a", "<", None)]],
        [["not a tuple"]],
        [[(1, "==", 1)]],
    ],
)
def test_check_predicates_invalid(bad):
    with pytest.raises((ValueError, TypeError)):
        check_predicates(bad)


def test_in_requires_list():
    with pytest.raises(TypeError):
        check_predicates([[("a", "in", 5)]])


def test_columns_and_filtering():
    preds = [[("a", "==", 1), ("b", "<", 2)], [("c", "in", [1])]]
    assert columns_in_predicates(preds) == {"a", "b", "c"}
    assert filter_predicates_by_column(preds, ["a"]) == [[("a", "==", 1)]]
    assert filter_predicates_by_column(preds, ["z"]) is None


def test_dnf_to_sql():
    sql = dnf_to_sql([[("a", "==", 1), ("b", "!=", None)], [("c", "in", ["x", "y"])]])
    assert sql == "(a = 1 AND b IS NOT NULL) OR (c IN ('x', 'y'))"


def test_dnf_filtering_on_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "a long, s string"
    )
    rows = df.where(dnf_to_column([[("a", ">", 1), ("s", "!=", None)]])).collect()
    assert [r.a for r in rows] == [3]
    # SQL null semantics: != does NOT keep nulls
    rows = df.where(dnf_to_column([[("s", "!=", "x")]])).collect()
    assert [r.a for r in rows] == [3]
    # in with null matches nulls
    rows = df.where(dnf_to_column([[("s", "in", ["x", None])]])).collect()
    assert sorted(r.a for r in rows) == [1, 2]
    # empty in-list -> no rows
    assert df.where(dnf_to_column([[("a", "in", [])]])).count() == 0
    # OR of conjunctions
    rows = df.where(dnf_to_column([[("a", "==", 1)], [("a", "==", 3)]])).collect()
    assert sorted(r.a for r in rows) == [1, 3]


def test_spark_and_sql_agree(spark):
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"s{i % 5}") for i in range(30)],
        "a long, s string",
    )
    df.createOrReplaceTempView("t")
    preds = [
        [("a", ">=", 10), ("s", "not in", ["s1", "s2"])],
        [("s", "==", None)],
    ]
    via_column = {r.a for r in df.where(dnf_to_column(preds)).collect()}
    via_sql = {r.a for r in spark.sql(f"SELECT a FROM t WHERE {dnf_to_sql(preds)}").collect()}
    assert via_column == via_sql


def test_evaluate_literal_scalar():
    assert evaluate_literal(5, "==", 5)
    assert not evaluate_literal(None, "==", 5)
    assert evaluate_literal(None, "==", None)
    assert evaluate_literal(5, "!=", None)
    assert not evaluate_literal(None, "<", 5)
    assert evaluate_literal(5, "in", [4, 5])
    assert evaluate_literal(5, "is distinct from", 4)
    assert not evaluate_literal(5, "is distinct from", 5)
    assert evaluate_literal(None, "is distinct from", 5)


def test_conjunction_holds_on_keys():
    keys = {"p": 1, "q": "x"}
    assert conjunction_holds_on_keys([("p", "==", 1), ("payload", ">", 99)], keys)
    assert not conjunction_holds_on_keys([("p", "==", 2)], keys)
    assert conjunction_holds_on_keys([("other", "==", 5)], keys)


# ---------------------------------------------------------------------------
# property-based: evaluate_literal (driver-side planning semantics) must
# agree with dnf_to_column (Spark execution semantics) on scalar literals
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _vals = st.one_of(
        st.integers(min_value=-100, max_value=100),
        st.sampled_from(["a", "b", "zz", ""]),
        st.none(),
    )
    _ops = st.sampled_from(["==", "!=", "<", "<=", ">", ">=", "is distinct from"])

    @settings(max_examples=300, deadline=None)
    @given(actual=_vals, op=_ops, val=_vals)
    def test_evaluate_literal_total_and_sane(actual, op, val):
        """evaluate_literal never raises on same-type/None operands and
        obeys the documented null semantics."""
        if (
            actual is not None
            and val is not None
            and type(actual) is not type(val)
        ):
            return  # mixed-type comparisons are rejected upstream
        if val is None and op in ("<", "<=", ">", ">="):
            return  # rejected by check_predicates
        r = evaluate_literal(actual, op, val)
        assert isinstance(r, bool)
        if op == "==" and val is None:
            assert r == (actual is None)
        if op == "!=" and val is None:
            assert r == (actual is not None)
        if op == "is distinct from":
            assert r == (actual != val if (actual is None) == (val is None) else True) or (
                actual is None and val is None and r is False
            )

    @settings(max_examples=25, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(st.integers(-5, 5), st.sampled_from(["x", "y", None])),
            min_size=1,
            max_size=8,
        ),
        op=st.sampled_from(["==", "!=", "<", ">=", "is distinct from"]),
        ival=st.integers(-5, 5),
    )
    def test_spark_filter_matches_literal_eval(spark, rows, op, ival):
        """dnf_to_column (what Spark executes) and evaluate_literal (what
        the planner uses for key pruning) select the same rows."""
        df = spark.createDataFrame(rows, "a long, s string")
        preds = [[("a", op, ival)]]
        key = lambda t: (t[0], t[1] is None, t[1] or "")
        got = sorted(((r.a, r.s) for r in df.where(dnf_to_column(preds)).collect()), key=key)
        want = sorted(((a, s) for a, s in rows if evaluate_literal(a, op, ival)), key=key)
        assert got == want
