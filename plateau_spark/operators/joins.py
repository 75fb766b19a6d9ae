"""Temporal join operators Spark's DataFrame API lacks natively:
as-of joins and interval (range) joins — SURVEY.md §7 Phase 3.

The reference engine has no join operators at all (SURVEY.md §2.7), but
a training-data/event pipeline needs temporal alignment constantly
("latest profile as of this event", "events inside this window"), so
these are north-star extensions, built to be scale-safe:

- ``asof_join``: the union+window formulation — tag both sides, union,
  and take ``last(..., ignorenulls=True)`` over a window partitioned by
  the equality keys and ordered by (time, side). ONE shuffle on the
  equality keys, no Python, no range condition the optimizer would turn
  into a BroadcastNestedLoopJoin. This is the plan you want at 100 TB:
  a sort-merge-shaped exchange whose cost is the same as a plain
  ``groupBy`` on the keys. (pandas ``merge_asof`` semantics; DuckDB
  ``ASOF JOIN`` is the oracle twin.)
- ``range_join_bucketed``: points-in-intervals as an EQUI-join on a
  coarse bucket of the time axis (intervals exploded into the buckets
  they cover, points mapped to their single bucket) plus the residual
  range predicate. Catalyst plans a hash/sort-merge join on
  (keys..., bucket) instead of a nested-loop over the raw inequality.
  Each (point, interval) pair meets in exactly one bucket — the point's
  — so no dedup pass is needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side__"
_PAYLOAD = "__asof_payload__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    allow_exact_matches: bool = True,
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the single
    ``right`` row with the greatest ``on`` <= left's ``on`` (direction
    ``backward``; ``forward`` = smallest ``on`` >= left's) within the same
    ``by`` group. Unmatched left rows keep nulls (LEFT-join semantics,
    like DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof``).

    ``right_cols``: payload columns to carry over (default: everything
    except ``by`` + ``on``); a column whose name collides with a left
    column is renamed with ``suffix``. The matched right ``on`` value is
    always emitted as ``{on}{suffix}``.

    ``tolerance``: optional SQL interval/number expression (e.g.
    ``"INTERVAL 7 DAYS"``); matches farther than that from the left time
    are nulled out (pandas ``merge_asof(tolerance=...)``).

    Scale notes: one hash exchange on ``by`` + an in-partition sort —
    identical shuffle shape to ``groupBy(*by)``. ``by`` must be
    non-empty: without equality keys the window would collapse to a
    single partition (for that, bucket time first — see
    ``range_join_bucketed``). Null ``by``/``on`` values never match
    (SQL join semantics): null-keyed right rows are dropped, null-keyed
    left rows pass through unmatched.
    """
    if not by:
        raise ValueError("asof_join requires at least one `by` equality key")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    taken = set(left.columns)
    out_names = {c: (c + suffix if c in taken else c) for c in right_cols}
    on_match = on + suffix
    emitted = [on_match, *out_names.values()]
    if len(set(emitted)) != len(emitted) or taken & set(emitted):
        raise ValueError(
            f"asof_join output name collision (suffix={suffix!r}): {emitted}"
        )

    # Side ordering encodes the match-inclusivity: backward+exact → a
    # right row at the same instant must sort BEFORE the left row so the
    # trailing-window `last()` can see it; forward inverts the frame and
    # therefore the tie order.
    right_first = allow_exact_matches == (direction == "backward")
    r_side, l_side = (0, 1) if right_first else (1, 0)

    l = left.withColumn(_SIDE, F.lit(l_side))
    r = right
    for key in (*by, on):
        r = r.where(F.col(key).isNotNull())
    # All payload columns ride in ONE struct: the window picks the whole
    # matched row atomically. Picking each column independently with
    # last(..., ignorenulls=True) would skip over a legitimately-NULL
    # payload value and splice in the value from an OLDER right row —
    # a torn result (pandas merge_asof / DuckDB ASOF JOIN return the
    # matched row's NULL). The struct itself is never null for a right
    # row, so ignorenulls only skips left rows, never null fields.
    r = r.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.struct(
            F.col(on).alias(on_match),
            *[F.col(c).alias(out_names[c]) for c in right_cols],
        ).alias(_PAYLOAD),
    ).withColumn(_SIDE, F.lit(r_side))

    unioned = l.unionByName(r, allowMissingColumns=True)
    w = Window.partitionBy(*by).orderBy(F.col(on).asc_nulls_first(), F.col(_SIDE).asc())
    if direction == "backward":
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731

    # A left row with null `on` never matches (SQL comparison semantics);
    # without the guard the nulls-first sort would hand forward-direction
    # rows the entire right side as their frame.
    matched_cols = [on_match, *out_names.values()]
    picked = pick(_PAYLOAD).over(w)
    out = unioned.select(
        *left.columns,
        F.col(_SIDE),
        *[
            F.when(F.col(on).isNotNull(), picked.getField(c)).alias(c)
            for c in matched_cols
        ],
    ).where(F.col(_SIDE) == l_side).drop(_SIDE)

    if tolerance is not None:
        if direction == "backward":
            ok = F.col(on_match) >= F.col(on) - F.expr(tolerance)
        else:
            ok = F.col(on_match) <= F.col(on) + F.expr(tolerance)
        keep = F.col(on_match).isNotNull() & ok
        out = out.select(
            *left.columns,
            *[F.when(keep, F.col(c)).alias(c) for c in matched_cols],
        )
    return out


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket_width: int = 86400,
) -> DataFrame:
    """Inner join of point rows to every interval row with
    ``start <= point < end`` (and equal ``by`` keys), planned as an
    EQUI-join.

    Both time columns may be timestamps (bucketed via their epoch-second
    cast) or numerics. Each interval is exploded into the
    ``bucket_width``-sized buckets it covers (``sequence()`` — pure
    codegen); each point maps to exactly one bucket, so every qualifying
    (point, interval) pair meets exactly once and needs no dedup.

    Pick ``bucket_width`` near the typical interval length: intervals
    explode into ``len/width + 1`` rows, points into one. An inequality
    join written directly would become a BroadcastNestedLoopJoin —
    O(points × intervals) — which this formulation avoids while keeping
    identical semantics.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def _epoch_long(df: DataFrame, col: str):
        # TIMESTAMP_NTZ forbids a direct BIGINT cast; route every
        # timestamp flavor through cast("timestamp") (value-preserving
        # under the fixed-UTC session) then unix_timestamp. Numerics
        # keep the plain long cast.
        dtype = dict(df.dtypes)[col]
        if dtype.startswith("timestamp"):
            return F.unix_timestamp(F.col(col).cast("timestamp"))
        return F.col(col).cast("long")

    p_long = _epoch_long(points, point_col)
    s_long = _epoch_long(intervals, start_col)
    e_long = _epoch_long(intervals, end_col)
    bucket = "__range_bucket__"

    p = points.withColumn(bucket, F.floor(p_long / bucket_width))
    # end is exclusive: an interval touching a bucket boundary exactly at
    # `end` contributes nothing there, but sequence() is inclusive and the
    # residual predicate discards the non-match — correctness over a
    # marginally smaller explode.
    iv = intervals.withColumn(
        bucket,
        F.explode(
            F.sequence(F.floor(s_long / bucket_width), F.floor(e_long / bucket_width))
        ),
    )
    cond = [F.col(f"p.{bucket}") == F.col(f"i.{bucket}")] + [
        F.col(f"p.{k}") == F.col(f"i.{k}") for k in by
    ]
    joined = (
        p.alias("p")
        .join(iv.alias("i"), cond, "inner")
        .where(
            (F.col(f"p.{point_col}") >= F.col(f"i.{start_col}"))
            & (F.col(f"p.{point_col}") < F.col(f"i.{end_col}"))
        )
    )
    keep_p = [F.col(f"p.{c}") for c in points.columns]
    keep_i = [
        F.col(f"i.{c}").alias(c if c not in points.columns else c + "_interval")
        for c in intervals.columns
        if c not in (*by, bucket)
    ]
    return joined.select(*keep_p, *keep_i)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting: the skew-mitigation plan shape for
    a large fact table whose join key is Zipf-distributed (one user/
    domain/document dominates) joined to a table too big to broadcast.

    A plain shuffle join sends every row of a hot key to ONE reducer —
    at 100 TB that single task runs for hours while 999 executors idle.
    Salting splits each key across ``num_salts`` reducers: the left
    (skewed) side gets a deterministic per-row salt
    ``pmod(xxhash64(whole row), num_salts)``; the right side is
    replicated ``num_salts`` ways (``explode(sequence(...))`` — pure
    codegen, no Python). The join key becomes (keys..., salt), so the
    hot key's rows spread over ``num_salts`` tasks and the result is
    row-for-row identical to the plain join.

    AQE's skew-join handles MODERATE skew by splitting oversized
    shuffle files after the fact; explicit salting is the contract for
    EXTREME skew (a single key larger than executor memory) and for
    deterministic plans in benchmarked pipelines. ``how`` supports
    ``inner`` and ``left`` (the replicated-right formulation keeps
    left-row multiplicity correct for both: an unmatched left row
    survives exactly once because its single salt value misses all
    ``num_salts`` right replicas).

    Cost model: right side is replicated ``num_salts``× — size it so
    ``|right| * num_salts`` stays comfortably under the shuffle volume
    the hot key alone would have concentrated on one task.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if num_salts < 1:
        raise ValueError("num_salts must be >= 1")
    salt = "__salt__"
    lt = left.withColumn(
        salt, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    )
    rt = right.withColumn(
        salt, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn(salt, F.col(salt).cast("bigint"))
    out = lt.join(rt, [*on, salt], how)
    return out.drop(salt)
