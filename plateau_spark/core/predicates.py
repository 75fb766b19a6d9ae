"""DNF predicate model: ``[[(col, op, val), ...], ...]`` = OR of ANDs.

Semantics mirror the reference's predicate contract
(plateau/serialization/_generic.py:32-37,166-219,433-569 in
/root/reference), with one deliberate divergence documented in SURVEY.md
§4: null handling follows SQL semantics (``!= v`` does NOT keep NULL
rows), which is the reference's own 5.0 deprecation direction
(plateau/serialization/_generic.py:495-500).

Supported ops: ``== != <= >= < > in not in is distinct from``.
Null literals: ``(col, "==", None)`` → IS NULL; ``(col, "!=", None)`` and
``(col, "is distinct from", None)`` → IS NOT NULL; ``(col, "in", [v, None])``
→ value-match OR IS NULL.

Everything compiles to a single ``pyspark.sql.Column`` expression so that
Catalyst performs predicate splitting, partition pruning, parquet
row-group pruning and residual filtering natively — the reference's
hand-written kernels (filter_array_like, row-group stats pruning) are
all built-in on Spark.
"""

from __future__ import annotations

import datetime
from functools import reduce
from operator import and_, or_
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PredicateLiteral = tuple  # (column, op, value)
Conjunction = Sequence[PredicateLiteral]
Predicates = Sequence[Conjunction]

_VALID_OPS = {"==", "=", "!=", "<=", ">=", "<", ">", "in", "not in", "is distinct from"}
_LIST_OPS = {"in", "not in"}
_NULL_OPS = {"==", "=", "!=", "is distinct from", "in", "not in"}


def check_predicates(predicates: Predicates | None) -> None:
    """Validate well-formedness of a DNF predicate expression.

    Rules from the reference (plateau/serialization/_generic.py:166-219):
    non-empty outer and inner lists, 3-tuples, known operators, null
    literals only with (in)equality ops, ``in``/``not in`` need list-likes.
    """
    if predicates is None:
        return
    if len(predicates) == 0:
        raise ValueError("Empty predicates")
    for conjunction in predicates:
        if not isinstance(conjunction, (list, tuple)):
            raise ValueError(
                f"Predicates must be a list of lists of 3-tuples, got {type(conjunction)}"
            )
        if len(conjunction) == 0:
            raise ValueError("Invalid predicates: Conjunction is empty")
        for literal in conjunction:
            if not isinstance(literal, (list, tuple)) or len(literal) != 3:
                raise ValueError(f"Invalid predicate literal: {literal!r}")
            col, op, val = literal
            if not isinstance(col, str):
                raise ValueError(f"Predicate column must be a string, got {col!r}")
            if op not in _VALID_OPS:
                raise ValueError(f"Unknown operator {op!r} in predicate {literal!r}")
            if op in _LIST_OPS:
                if not isinstance(val, (list, tuple, set, frozenset)):
                    raise TypeError(
                        f"Value for operator {op!r} must be list-like, got {type(val)}"
                    )
            elif val is None and op not in _NULL_OPS:
                raise ValueError(
                    f"Null value with operator {op!r} not supported: {literal!r}"
                )


def columns_in_predicates(predicates: Predicates | None) -> set[str]:
    """Set of columns referenced anywhere in the predicate expression.

    Reference: plateau/serialization/_generic.py:260-276.
    """
    if predicates is None:
        return set()
    return {lit[0] for conj in predicates for lit in conj}


def filter_predicates_by_column(
    predicates: Predicates | None, columns: Sequence[str]
) -> Predicates | None:
    """Keep only literals on the given columns; drop conjunctions left empty.

    Used to evaluate the partition-key / index-relevant slice of a
    predicate before touching data files.
    Reference: plateau/serialization/_generic.py:222-257.
    """
    if predicates is None:
        return None
    cols = set(columns)
    out = []
    for conj in predicates:
        kept = [lit for lit in conj if lit[0] in cols]
        if kept:
            out.append(kept)
    return out or None


def _literal_to_column(col: str, op: str, val: Any) -> Column:
    c = F.col(col)
    if op in ("==", "="):
        return c.isNull() if val is None else (c == F.lit(val))
    if op == "!=":
        return c.isNotNull() if val is None else (c != F.lit(val))
    if op == "is distinct from":
        # NULL-safe inequality
        return ~c.eqNullSafe(F.lit(val))
    if op == "<=":
        return c <= F.lit(val)
    if op == ">=":
        return c >= F.lit(val)
    if op == "<":
        return c < F.lit(val)
    if op == ">":
        return c > F.lit(val)
    if op in ("in", "not in"):
        values = list(val)
        has_null = any(v is None for v in values)
        values = [v for v in values if v is not None]
        if values:
            expr = c.isin(values)
        else:
            expr = F.lit(False)
        if has_null:
            expr = expr | c.isNull()
        return expr if op == "in" else ~expr
    raise ValueError(f"Unknown operator {op!r}")


def dnf_to_column(predicates: Predicates | None) -> Column:
    """Compile DNF predicates to a single Spark Column (OR of ANDs)."""
    check_predicates(predicates)
    if predicates is None:
        return F.lit(True)
    return reduce(
        or_,
        (
            reduce(and_, (_literal_to_column(*lit) for lit in conj))
            for conj in predicates
        ),
    )


def _sql_value(val: Any) -> str:
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "TRUE" if val else "FALSE"
    if isinstance(val, str):
        escaped = val.replace("'", "''")
        return f"'{escaped}'"
    if isinstance(val, datetime.datetime):
        return f"TIMESTAMP '{val.isoformat(sep=' ')}'"
    if isinstance(val, datetime.date):
        return f"DATE '{val.isoformat()}'"
    if isinstance(val, bytes):
        return "'" + val.decode("utf-8", errors="replace") + "'"
    return repr(val)


def _literal_to_sql(col: str, op: str, val: Any) -> str:
    if op in ("==", "="):
        return f"{col} IS NULL" if val is None else f"{col} = {_sql_value(val)}"
    if op == "!=":
        return f"{col} IS NOT NULL" if val is None else f"{col} <> {_sql_value(val)}"
    if op == "is distinct from":
        return f"{col} IS DISTINCT FROM {_sql_value(val)}"
    if op in ("<=", ">=", "<", ">"):
        return f"{col} {op} {_sql_value(val)}"
    if op in ("in", "not in"):
        values = list(val)
        has_null = any(v is None for v in values)
        values = [v for v in values if v is not None]
        if values:
            lst = ", ".join(_sql_value(v) for v in values)
            expr = f"{col} IN ({lst})"
        else:
            expr = "FALSE"
        if has_null:
            expr = f"({expr} OR {col} IS NULL)"
        return expr if op == "in" else f"(NOT {expr})"
    raise ValueError(f"Unknown operator {op!r}")


def dnf_to_sql(predicates: Predicates | None) -> str:
    """Compile DNF predicates to an ANSI SQL boolean expression.

    Runnable by both Spark SQL and DuckDB — used for oracle parity and
    for the ``filter_query`` string API
    (plateau/serialization/_generic.py:155-163).
    """
    check_predicates(predicates)
    if predicates is None:
        return "TRUE"
    disjuncts = []
    for conj in predicates:
        conjuncts = " AND ".join(_literal_to_sql(*lit) for lit in conj)
        disjuncts.append(f"({conjuncts})")
    return " OR ".join(disjuncts)


def apply_predicates(
    df: DataFrame, predicates: Predicates | None, *, pushdown_to_io: bool = True
) -> DataFrame:
    """``df.where(dnf)`` — Catalyst pushes this down to the parquet scan.

    ``pushdown_to_io=False`` replays the reference's per-read debugging
    escape hatch (plateau/serialization/_parquet.py:208-210: read full
    row groups, filter after the fact): the DNF column is OR-composed
    with a provably-false NONDETERMINISTIC disjunct
    (``monotonically_increasing_id() < 0`` — ids are non-negative by
    construction), which Catalyst cannot split or push into the scan,
    so the filter runs post-scan while rows/NULL semantics are
    bit-identical (``pred OR false ≡ pred``, including NULL → drop).
    Driver-side partition/zone-map/index pruning is unaffected — same
    as the reference, where the flag only bypasses row-group pushdown.
    """
    if predicates is None:
        return df
    cond = dnf_to_column(predicates)
    if not pushdown_to_io:
        cond = cond | (F.monotonically_increasing_id() < F.lit(0))
    return df.where(cond)


# ---------------------------------------------------------------------------
# Driver-side evaluation against partition-key values (partition pruning for
# explicit-path reads; the analog of the reference's conjunction
# falsification, plateau/io_components/metapartition.py:538-586).
# ---------------------------------------------------------------------------


def _coerce(val: Any, proto: Any) -> Any:
    """Coerce a predicate value to the type of the partition-key value."""
    if val is None or proto is None:
        return val
    if isinstance(proto, bool):
        if isinstance(val, bool):
            return val
        raise TypeError(f"Cannot compare bool partition key with {val!r}")
    if isinstance(proto, int) and not isinstance(proto, bool):
        if isinstance(val, (int, float)) and not isinstance(val, bool):
            return val
        raise TypeError(f"Cannot compare int partition key with {val!r}")
    if isinstance(proto, str):
        if isinstance(val, str):
            return val
        raise TypeError(f"Cannot compare string partition key with {val!r}")
    return val


def _align_temporal(actual: Any, val: Any) -> tuple[Any, Any]:
    """date vs datetime comparisons: Spark (and the reference's pyarrow
    kernels) cast the date side to a midnight timestamp, so a
    ``datetime.datetime`` literal against a DATE partition key is legal
    (reference read suite, io/testing/read.py:580-629). Python raises
    on the mixed comparison instead — lift the date side to midnight."""
    if (
        isinstance(actual, datetime.date)
        and not isinstance(actual, datetime.datetime)
        and isinstance(val, datetime.datetime)
    ):
        return datetime.datetime.combine(actual, datetime.time()), val
    if (
        isinstance(val, datetime.date)
        and not isinstance(val, datetime.datetime)
        and isinstance(actual, datetime.datetime)
    ):
        return actual, datetime.datetime.combine(val, datetime.time())
    return actual, val


def evaluate_literal(actual: Any, op: str, val: Any) -> bool:
    """Evaluate one literal against a concrete partition-key value (SQL
    three-valued logic collapsed: unknown → False)."""
    if actual is not None and val is not None and not isinstance(val, (list, tuple, set, frozenset)):
        actual, val = _align_temporal(actual, val)
    if op in ("==", "="):
        return (actual is None) if val is None else (actual is not None and actual == _coerce(val, actual))
    if op == "!=":
        return (actual is not None) if val is None else (actual is not None and actual != _coerce(val, actual))
    if op == "is distinct from":
        return actual != val if (actual is not None and val is not None) else (actual is None) != (val is None)
    if actual is None:
        return False
    if op == "<=":
        return actual <= _coerce(val, actual)
    if op == ">=":
        return actual >= _coerce(val, actual)
    if op == "<":
        return actual < _coerce(val, actual)
    if op == ">":
        return actual > _coerce(val, actual)
    if op == "in":
        values = [v for v in val if v is not None]
        return any(
            (lambda a, v: a == v)(*_align_temporal(actual, _coerce(v, actual)))
            for v in values
        )
    if op == "not in":
        values = [v for v in val if v is not None]
        return not any(
            (lambda a, v: a == v)(*_align_temporal(actual, _coerce(v, actual)))
            for v in values
        )
    raise ValueError(f"Unknown operator {op!r}")


def conjunction_holds_on_keys(
    conjunction: Conjunction, key_values: dict[str, Any]
) -> bool:
    """True unless a literal over a partition key falsifies the conjunction.

    Literals on non-key columns are ignored (they become residual data
    filters handled by Spark).
    """
    for col, op, val in conjunction:
        if col in key_values and not evaluate_literal(key_values[col], op, val):
            return False
    return True
