"""Temporal join operators: as-of join and bucketed range join.

Each Spark result is cross-checked against a hand-computed expectation
(small frames) and, for the as-of join, against pandas ``merge_asof``
(the public semantic reference) on a randomized frame.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from plateau_spark.operators.joins import asof_join, range_join_bucketed


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:00"), 100.0),
            (2, "A", _ts("2024-01-01 10:00:05"), 101.0),
            (3, "B", _ts("2024-01-01 10:00:03"), 50.0),
            (4, "C", _ts("2024-01-01 10:00:01"), 7.0),  # no quotes for C
            (5, "A", None, 1.0),  # null time never matches
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:59"), 99.5),
            ("A", _ts("2024-01-01 10:00:05"), 100.5),  # exact tie w/ trade 2
            ("A", _ts("2024-01-01 10:00:07"), 100.7),
            ("B", _ts("2024-01-01 10:00:04"), 49.9),  # after trade 3
            ("B", None, 0.0),  # null time never matches
        ],
        "sym string, ts timestamp, bid double",
    )
    return quotes, trades


def test_asof_backward_exact(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="ts", by=["sym"]).orderBy("trade_id")
    rows = {r.trade_id: (r.ts_right, r.bid) for r in out.collect()}
    assert len(rows) == 5  # every left row survives
    assert rows[1] == (_ts("2024-01-01 09:59:59"), 99.5)
    assert rows[2] == (_ts("2024-01-01 10:00:05"), 100.5)  # exact match taken
    assert rows[3] == (None, None)  # only later quotes for B
    assert rows[4] == (None, None)  # no quotes for C
    assert rows[5] == (None, None)  # null left time


def test_asof_null_payload_not_torn(spark):
    """A legitimately-NULL payload in the matched right row must come
    through as NULL — not be spliced with the value from an older right
    row (pandas merge_asof / DuckDB ASOF JOIN semantics)."""
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:00:10"))], "id long, sym string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:01"), 5.0, "old"),
            ("A", _ts("2024-01-01 10:00:05"), None, "new"),  # matched, NULL bid
        ],
        "sym string, ts timestamp, bid double, src string",
    )
    row = asof_join(left, right, on="ts", by=["sym"]).collect()[0]
    assert row.ts_right == _ts("2024-01-01 10:00:05")
    assert row.bid is None  # the matched row's NULL, not old row's 5.0
    assert row.src == "new"  # all payload fields from the SAME right row


def test_asof_backward_no_exact(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="ts", by=["sym"], allow_exact_matches=False)
    rows = {r.trade_id: r.bid for r in out.collect()}
    assert rows[2] == 99.5  # strict: the 10:00:05 quote is excluded


def test_asof_forward(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="ts", by=["sym"], direction="forward")
    rows = {r.trade_id: r.bid for r in out.collect()}
    assert rows[1] == 100.5  # next quote at/after 10:00:00
    assert rows[2] == 100.5  # exact
    assert rows[3] == 49.9
    assert rows[4] is None
    assert rows[5] is None  # null left time must not grab the frame


def test_asof_tolerance(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on="ts", by=["sym"], tolerance="INTERVAL 2 SECONDS"
    )
    rows = {r.trade_id: r.bid for r in out.collect()}
    assert rows[1] == 99.5  # 1s away: kept
    assert rows[3] is None
    strict = asof_join(
        trades, quotes, on="ts", by=["sym"], tolerance="INTERVAL 0 SECONDS"
    )
    rows = {r.trade_id: r.bid for r in strict.collect()}
    assert rows[1] is None  # 1s away: nulled
    assert rows[2] == 100.5  # exact match survives zero tolerance


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against the public semantic reference."""
    import numpy as np

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "t": rng.integers(0, 1000, 200).astype("int64"),
            "lid": np.arange(200),
        }
    ).sort_values("t", kind="stable")
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "t": rng.integers(0, 1000, 300).astype("int64"),
            "val": rng.normal(size=300).round(6),
        }
    ).sort_values("t", kind="stable")
    # make (k, t) unique on the right so the asof pick is well-defined
    right = right.drop_duplicates(["k", "t"], keep="first")

    expected = pd.merge_asof(left, right, on="t", by="k", direction="backward")
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by=["k"],
        )
        .toPandas()
        .sort_values("lid")
    )
    exp = expected.sort_values("lid")
    assert list(got["lid"]) == list(exp["lid"])
    pd.testing.assert_series_equal(
        got["val"].reset_index(drop=True),
        exp["val"].reset_index(drop=True),
        check_names=False,
    )


def test_asof_requires_by(spark, quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError, match="by"):
        asof_join(trades, quotes, on="ts", by=[])


def test_asof_plan_is_single_window_exchange(spark, quotes_trades):
    """The whole join must be one hash exchange + window — no
    BroadcastNestedLoopJoin / CartesianProduct anywhere."""
    quotes, trades = quotes_trades
    plan = asof_join(trades, quotes, on="ts", by=["sym"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_range_join_bucketed(spark):
    points = spark.createDataFrame(
        [(1, "u1", 5), (2, "u1", 99), (3, "u1", 100), (4, "u2", 5), (5, "u1", 250)],
        "pid long, u string, t long",
    )
    intervals = spark.createDataFrame(
        [("u1", 0, 100, "w1"), ("u1", 90, 300, "w2"), ("u2", 200, 300, "w3")],
        "u string, s long, e long, label string",
    )
    out = range_join_bucketed(
        points, intervals, point_col="t", start_col="s", end_col="e",
        by=["u"], bucket_width=50,
    )
    got = sorted((r.pid, r.label) for r in out.collect())
    # end-exclusive: t=100 is NOT in w1 [0,100); pairs meet exactly once
    assert got == [(1, "w1"), (2, "w1"), (2, "w2"), (3, "w2"), (5, "w2")]


def test_range_join_plan_is_equi_join(spark):
    points = spark.range(100).select(
        F.col("id").alias("pid"), (F.col("id") * 7 % 500).alias("t")
    )
    intervals = spark.range(20).select(
        (F.col("id") * 25).alias("s"), (F.col("id") * 25 + 40).alias("e"),
        F.col("id").alias("iid"),
    )
    out = range_join_bucketed(
        points, intervals, point_col="t", start_col="s", end_col="e",
        bucket_width=50,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # cross-check against the naive predicate join
    naive = points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.t") >= F.col("i.s")) & (F.col("p.t") < F.col("i.e")),
    )
    assert sorted((r.pid, r.iid) for r in out.collect()) == sorted(
        (r.pid, r.iid) for r in naive.collect()
    )
