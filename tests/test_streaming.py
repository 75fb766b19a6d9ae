from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from plateau_spark.sources.tables import load_table
from plateau_spark.streaming.events import (
    run_stream_to_memory,
    sessionize_events,
    sessionize_stream,
    stream_dedup_events,
    windowed_event_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_windowed_counts_match_batch(spark):
    batch = load_table(spark, "/root/testdata/sf0.001", "events")
    streamed = run_stream_to_memory(
        spark, EVENTS, lambda s: windowed_event_counts(s, window="1 hour")
    )
    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    got = {(r.window_start, r.event_type): (r.n_events, float(r.sum_value)) for r in streamed.collect()}
    want = {(r.window_start, r.event_type): (r.n_events, float(r.sum_value)) for r in expected.collect()}
    assert got == want and len(got) > 0


def test_stream_dedup(spark):
    streamed = run_stream_to_memory(spark, EVENTS, stream_dedup_events)
    batch_distinct = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .dropDuplicates(["event_id"])
        .count()
    )
    assert streamed.count() == batch_distinct


def test_sessionize_batch(spark):
    import datetime

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, t(0), 1.0), (1, t(10), 2.0),        # session A (gap 30m)
            (1, t(50), 3.0),                        # session B
            (2, t(5), 4.0),                         # session C
        ],
        "user_id long, ts timestamp, value double",
    )
    out = sessionize_events(df, gap="30 minutes")
    rows = sorted(
        ((r.user_id, r.session_start.minute, r.session_end.minute, r.n_events, r.sum_value)
         for r in out.collect())
    )
    assert rows == [(1, 0, 10, 2, 3.0), (1, 50, 50, 1, 3.0), (2, 5, 5, 1, 4.0)]


def test_sessionize_stream_matches_batch_closed_sessions(spark):
    """availableNow stream emits exactly the sessions the watermark can
    close; each emitted session must equal its batch twin."""
    batch = load_table(spark, "/root/testdata/sf0.001", "events").where(
        F.col("user_id") < 50
    )
    expected = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, float(r.sum_value))
        for r in sessionize_events(batch, gap="30 minutes").collect()
    }
    streamed = run_stream_to_memory(
        spark,
        EVENTS,
        lambda s: sessionize_stream(
            s.where(F.col("user_id") < 50), gap_seconds=1800
        ),
    )
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, float(r.sum_value))
        for r in streamed.collect()
    }
    assert len(got) > 0
    for key, val in got.items():
        assert key in expected and expected[key] == val


def test_stream_static_enrich_equals_batch(spark):
    from pyspark.sql import functions as F

    from plateau_spark.sources.tables import load_table
    from plateau_spark.streaming.events import run_stream_to_memory, stream_static_enrich

    sf_dir = "/root/testdata/sf0.001"
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def transform(stream):
        keyed = stream.withColumn("n_nationkey", F.col("user_id") % 25)
        return stream_static_enrich(keyed, nation, on="n_nationkey").groupBy(
            "n_name"
        ).agg(F.count("*").alias("n_events"))

    got = run_stream_to_memory(spark, f"{sf_dir}/events.parquet", transform)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "n_nationkey", F.col("user_id") % 25
    )
    want = ev.join(nation, "n_nationkey").groupBy("n_name").agg(
        F.count("*").alias("n_events")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# ---------------------------------------------------------------------------
# late-data / multi-micro-batch semantics: the watermark must DROP late
# events and EVICT state (the single-batch availableNow runs above can't
# show this — watermark starts at -inf there). maxFilesPerTrigger=1
# forces one micro-batch per file, so file A's max event time becomes
# the watermark file B is judged against.
# ---------------------------------------------------------------------------

import datetime
import os
import uuid as _uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_event_file(path: str, rows, mtime: float) -> None:
    """rows = [(event_id, user_id, event_type, ts, value)]"""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        path,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    os.utime(path, (mtime, mtime))


def _run_file_per_batch(spark, dirpath: str, transform, out_mode: str = "append"):
    schema = spark.read.parquet(dirpath).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(dirpath)
    )
    out = transform(stream)
    name = f"mem_{_uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(out_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def _t(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_windowed_counts_drop_late_events(spark, tmp_path):
    """A straggler aimed at a window the watermark already closed and
    emitted MUST be dropped (append mode's exactly-once window
    contract): file A advances the watermark to 09:00, file B lets the
    00:00 window emit and its state evict, file C's 00:40 row arrives
    after that — if it were not dropped, the 00:00 window would be
    re-created and emitted a second time with the late value."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_event_file(
        f"{d}/a.parquet",
        [(1, 1, "x", _t(0, 10), 1.0), (2, 1, "x", _t(0, 20), 1.0), (3, 1, "x", _t(10), 1.0)],
        mtime=1_700_000_000,
    )
    _write_event_file(
        f"{d}/b.parquet", [(4, 1, "x", _t(10, 30), 1.0)], mtime=1_700_000_100
    )
    _write_event_file(
        f"{d}/c.parquet",
        [(5, 1, "x", _t(0, 40), 7.0), (6, 1, "x", _t(11), 1.0)],
        mtime=1_700_000_200,
    )
    out = _run_file_per_batch(
        spark, d, lambda s: windowed_event_counts(s, window="1 hour", watermark="1 hour")
    )
    rows = [r for r in out.collect() if r.window_start == _t(0)]
    # exactly ONE emission of the 00:00 window, without the late 7.0
    assert len(rows) == 1
    assert rows[0].n_events == 2 and float(rows[0].sum_value) == 2.0


def test_stream_dedup_drops_late_and_evicts_state(spark, tmp_path):
    """dropDuplicates state is watermark-bounded: a late duplicate row is
    dropped outright, and a NEW row for an id whose state was evicted is
    re-emitted (bounded state, the 100 TB property)."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_event_file(
        f"{d}/a.parquet",
        [(1, 1, "x", _t(0), 1.0), (2, 1, "x", _t(0, 30), 1.0), (99, 9, "x", _t(12), 1.0)],
        mtime=1_700_000_000,
    )  # watermark after A = 10:00 (2h watermark)
    _write_event_file(
        f"{d}/b.parquet", [(1, 1, "x", _t(0, 5), 9.0)], mtime=1_700_000_100
    )  # late duplicate; batch end evicts the pre-watermark id-1/id-2 state
    _write_event_file(
        f"{d}/c.parquet", [(1, 1, "x", _t(11), 2.0)], mtime=1_700_000_200
    )  # same id AFTER its state was evicted
    out = _run_file_per_batch(
        spark, d, lambda s: stream_dedup_events(s, watermark="2 hours")
    )
    rows = out.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.event_id, []).append(r.ts)
    # late duplicate at 00:05 dropped (older than the 10:00 watermark)
    assert _t(0, 5) not in by_id.get(1, [])
    # id=1's original state (ts 00:00) was evicted, so the 11:00 row
    # with the same id is re-emitted: exactly the bounded-state contract
    assert sorted(by_id[1]) == [_t(0), _t(11)]
    assert by_id[2] == [_t(0, 30)] and by_id[99] == [_t(12)]


def test_sessionize_stream_timeout_eviction(spark, tmp_path):
    """A user silent past the watermark is closed via the group-timeout
    path (state.hasTimedOut) in a LATER batch with no data for that
    user — the explicit state-eviction branch of sessionize_stream."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_event_file(
        f"{d}/a.parquet",
        [(1, 1, "x", _t(0), 1.0), (2, 1, "x", _t(0, 10), 2.0), (99, 9, "x", _t(12), 0.5)],
        mtime=1_700_000_000,
    )
    _write_event_file(
        f"{d}/b.parquet",
        [(100, 9, "x", _t(13), 0.5)],  # no user-1 data: only the timeout fires
        mtime=1_700_000_100,
    )
    out = _run_file_per_batch(
        spark, d, lambda s: sessionize_stream(s, gap_seconds=1800)
    )
    sessions = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    assert sessions[(1, _t(0), _t(0, 10))] == (2, 3.0)


def test_sessionize_stream_late_event_widens_not_shrinks(spark, tmp_path):
    """A late-but-within-gap event arriving in a LATER micro-batch must
    widen the open session's boundaries (start via min), never move
    session_end backwards or split the session (regression: the
    no-max/min update corrupted boundaries on out-of-order arrival)."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_event_file(
        f"{d}/a.parquet",
        [(1, 1, "x", _t(10), 1.0), (2, 1, "x", _t(10, 5), 1.0)],
        mtime=1_700_000_000,
    )
    _write_event_file(
        f"{d}/b.parquet",
        [(3, 1, "x", _t(9, 58), 1.0)],  # late: 2 min BEFORE the open start
        mtime=1_700_000_100,
    )
    _write_event_file(
        f"{d}/c.parquet",
        [(4, 9, "x", _t(13), 0.5)],  # watermark push
        mtime=1_700_000_200,
    )
    _write_event_file(
        f"{d}/d.parquet",
        [(5, 9, "x", _t(16), 0.5)],  # user-1 timeout fires this batch
        mtime=1_700_000_300,
    )
    out = _run_file_per_batch(
        spark, d, lambda s: sessionize_stream(s, gap_seconds=1800)
    )
    sessions = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    # one session: widened backwards to 09:58, end UNMOVED at 10:05
    assert sessions[(1, _t(9, 58), _t(10, 5))] == (3, 3.0)
    user1 = [(s, e) for (u, s, e) in sessions if u == 1]
    assert user1 == [(_t(9, 58), _t(10, 5))]  # exactly one, not split


def test_sessionize_stream_null_value_counts_but_adds_zero(spark, tmp_path):
    """NULL value rows count toward n_events but add 0 to sum_value —
    matching the batch twin's F.sum null-skipping (regression: NaN
    poisoned the running sum)."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_event_file(
        f"{d}/a.parquet",
        [(1, 1, "x", _t(0), 2.0), (2, 1, "x", _t(0, 5), None),
         (3, 9, "x", _t(12), 0.5)],
        mtime=1_700_000_000,
    )
    _write_event_file(
        f"{d}/b.parquet",
        [(4, 9, "x", _t(15), 0.5)],  # watermark push → user-1 timeout
        mtime=1_700_000_100,
    )
    out = _run_file_per_batch(
        spark, d, lambda s: sessionize_stream(s, gap_seconds=1800)
    )
    sessions = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    assert sessions[(1, _t(0), _t(0, 5))] == (2, 2.0)


def test_sessionize_stream_late_event_behind_watermark_does_not_crash(spark, tmp_path):
    """A late event merging into an open session whose natural timeout
    (end + gap) is already BEHIND the current watermark must not kill
    the query: GroupState rejects setTimeoutTimestamp earlier than the
    watermark, so the kernel clamps to watermark+1 and the session
    closes at the next watermark advance (regression: batch c below
    raised and terminated the stream)."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_event_file(
        f"{d}/a.parquet",
        [(1, 1, "x", _t(10), 1.0), (2, 9, "x", _t(10), 0.5)],
        mtime=1_700_000_000,
    )
    _write_event_file(  # watermark → 19:30, far past user-1's 10:30 timeout
        f"{d}/b.parquet", [(3, 9, "x", _t(20), 0.5)], mtime=1_700_000_100
    )
    _write_event_file(  # late user-1 event merges while wm=19:30
        f"{d}/c.parquet",
        [(4, 1, "x", _t(10, 5), 1.0), (5, 9, "x", _t(20, 1), 0.5)],
        mtime=1_700_000_200,
    )
    _write_event_file(  # watermark push → clamped user-1 timeout fires
        f"{d}/d.parquet", [(6, 9, "x", _t(23), 0.5)], mtime=1_700_000_300
    )
    out = _run_file_per_batch(
        spark, d, lambda s: sessionize_stream(s, gap_seconds=1800)
    )
    sessions = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    assert sessions[(1, _t(10), _t(10, 5))] == (2, 2.0)


def test_sessionize_stream_all_null_session_emits_null_sum(spark, tmp_path):
    """A session whose EVERY value is NULL emits NULL sum_value — exact
    F.sum null semantics, matching the batch twin (regression: the
    running-sum kernel emitted 0.0, breaking strict batch/stream
    equality on all-NULL groups). A sibling session with one non-NULL
    value still sums null-skipping in the same run."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_event_file(
        f"{d}/a.parquet",
        [(1, 1, "x", _t(0), None), (2, 1, "x", _t(0, 5), None),
         (3, 2, "x", _t(0), None), (4, 2, "x", _t(0, 5), 4.0),
         (5, 9, "x", _t(12), 0.5)],
        mtime=1_700_000_000,
    )
    _write_event_file(
        f"{d}/b.parquet",
        [(6, 9, "x", _t(15), 0.5)],  # watermark push → users 1/2 time out
        mtime=1_700_000_100,
    )
    out = _run_file_per_batch(
        spark, d, lambda s: sessionize_stream(s, gap_seconds=1800)
    )
    sessions = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    assert sessions[(1, _t(0), _t(0, 5))] == (2, None)
    assert sessions[(2, _t(0), _t(0, 5))] == (2, 4.0)
    # batch twin agrees: F.sum over an all-NULL group is NULL
    from plateau_spark.streaming.events import sessionize_events

    batch = sessionize_events(spark.read.parquet(d), gap="30 minutes")
    b = {(r.user_id,): r.sum_value for r in batch.collect() if r.user_id == 1}
    assert b[(1,)] is None


def test_open_parquet_stream_directory_named_parquet(spark, tmp_path):
    """A DIRECTORY whose name ends in .parquet (standard
    df.write.parquet layout) must stream its part files, not fall into
    the single-file pathGlobFilter branch (which silently yields an
    empty stream)."""
    from plateau_spark.streaming.events import run_stream_to_memory

    import datetime as dt

    d = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        [(i, i % 5, "x", dt.datetime(2024, 1, 1), 1.0) for i in range(20)],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    ).write.parquet(d)
    out = run_stream_to_memory(
        spark, d, lambda s: s.groupBy("user_id").count()
    )
    assert out.count() == 5


def test_stream_to_dataset_ingest_and_replay(spark, tmp_path):
    """availableNow stream → dataset: one atomic commit per micro-batch,
    read-back equals the source, and a replayed batch id is a no-op."""
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import read_dataset_as_dataframe
    from plateau_spark.streaming.events import commit_stream_batch, stream_to_dataset

    src = spark.createDataFrame(
        [(i, f"t{i % 3}", float(i)) for i in range(100)],
        "event_id long, event_type string, value double",
    )
    src_dir = str(tmp_path / "src")
    src.write.parquet(src_dir)
    store = Store(str(tmp_path / "store"))

    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    q = stream_to_dataset(
        stream, store, "ingested",
        checkpoint_dir=str(tmp_path / "ckpt"),
        partition_on=["event_type"], available_now=True,
    )
    q.awaitTermination()

    out = read_dataset_as_dataframe(spark, store, "ingested")
    assert sorted(r["event_id"] for r in out.collect()) == list(range(100))

    meta = DatasetMetadata.load(store, "ingested")
    committed = set(meta.metadata["stream_batches"])
    n_files = len(meta.partitions)
    # replaying an already-committed batch id must change nothing
    replay_id = int(next(iter(committed)))
    assert commit_stream_batch(
        spark, store, "ingested", src.limit(5), replay_id, partition_on=["event_type"]
    ) is False
    meta2 = DatasetMetadata.load(store, "ingested")
    assert len(meta2.partitions) == n_files
    # a NEW batch id commits atomically and is recorded
    assert commit_stream_batch(
        spark, store, "ingested",
        spark.createDataFrame([(1000, "t9", 1.0)], src.schema),
        max(int(b) for b in committed) + 1,
        partition_on=["event_type"],
    ) is True
    out2 = read_dataset_as_dataframe(spark, store, "ingested")
    assert out2.count() == 101


@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
def test_stream_to_dataset_multi_batch_then_compact(spark, tmp_path):
    """maxFilesPerTrigger=1 over a 3-file source drives THREE separate
    micro-batch commits (each atomic, each recorded); compact_dataset
    then merges the accumulated small files — the documented pairing."""
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import compact_dataset, read_dataset_as_dataframe
    from plateau_spark.streaming.events import stream_to_dataset

    src_dir = str(tmp_path / "src")
    for lo in (0, 40, 80):
        spark.createDataFrame(
            [(i, f"t{i % 2}") for i in range(lo, lo + 40)],
            "event_id long, event_type string",
        ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema("event_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_to_dataset(
        stream, Store(str(tmp_path / "store")), "multi",
        checkpoint_dir=str(tmp_path / "ckpt"),
        partition_on=["event_type"], available_now=True,
    )
    q.awaitTermination()

    store = Store(str(tmp_path / "store"))
    meta = DatasetMetadata.load(store, "multi")
    assert len(meta.metadata["stream_batches"]) == 3  # one commit per file
    assert len(meta.partitions) == 6  # 3 batches x 2 event types
    out = read_dataset_as_dataframe(spark, store, "multi")
    assert sorted(r["event_id"] for r in out.collect()) == list(range(120))

    compacted = compact_dataset(spark, store, "multi")
    assert len(compacted.partitions) == 2  # one file per event_type
    assert read_dataset_as_dataframe(spark, store, "multi").count() == 120
    # batch watermark survives compaction (metadata carried over)
    assert len(compacted.metadata["stream_batches"]) == 3


def test_interval_join_batch_semantics(spark):
    """Batch path: pairs only within [left_ts + lower, left_ts + upper]."""
    from plateau_spark.streaming.events import stream_stream_interval_join

    signups = spark.createDataFrame(
        [(1, _t(10)), (2, _t(12))], "user_id long, signup_ts timestamp"
    )
    purchases = spark.createDataFrame(
        [
            (1, _t(10, 30), 5.0),   # in window
            (1, _t(12), 7.0),       # > upper (2h after)
            (1, _t(9, 59), 9.0),    # before signup
            (2, _t(13), 11.0),      # in window
            (3, _t(10, 10), 13.0),  # no matching signup
        ],
        "user_id long, purchase_ts timestamp, value double",
    )
    out = stream_stream_interval_join(
        signups, purchases, on=["user_id"],
        left_ts="signup_ts", right_ts="purchase_ts",
        lower="0 seconds", upper="1 hour",
    )
    got = sorted((r["user_id"], r["value"]) for r in out.collect())
    assert got == [(1, 5.0), (2, 11.0)]
    assert "user_id" in out.columns and out.columns.count("user_id") == 1


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """availableNow self-join of the stream equals the batch interval
    join when nothing is late (single micro-batch)."""
    from plateau_spark.streaming.events import stream_stream_interval_join

    d = tmp_path / "ev"
    d.mkdir()
    rows = [
        (1, 1, "signup", _t(10), 0.0),
        (2, 1, "purchase", _t(10, 45), 5.0),
        (3, 1, "purchase", _t(14), 6.0),
        (4, 2, "signup", _t(11), 0.0),
        (5, 2, "purchase", _t(11, 20), 7.0),
    ]
    _write_event_file(str(d / "f1.parquet"), rows, 1_700_000_000)

    def transform(stream):
        s = stream.where(F.col("event_type") == "signup").select(
            "user_id", F.col("ts").alias("signup_ts")
        )
        p = stream.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("purchase_ts"), "value"
        )
        return stream_stream_interval_join(
            s, p, on=["user_id"], left_ts="signup_ts",
            right_ts="purchase_ts", upper="1 hour",
        )

    out = _run_file_per_batch(spark, str(d), transform)
    got = sorted((r["user_id"], r["value"]) for r in out.collect())
    assert got == [(1, 5.0), (2, 7.0)]


def test_interval_join_evicts_state_past_watermark(spark, tmp_path):
    """Bounded state: once the watermark passes left_ts + upper, the
    left row's join state is evicted — a matching right row arriving in
    a later micro-batch no longer pairs (and is itself late). The same
    data joined as plain batch DataFrames DOES pair, which is exactly
    the state bound this operator buys on an infinite stream."""
    from plateau_spark.streaming.events import stream_stream_interval_join

    d = tmp_path / "ev2"
    d.mkdir()
    # batch 0: the signup + far-future events on BOTH sides — the query
    # watermark is the MIN over all watermarked inputs, so each side
    # needs an advancing event (20:00 - 2h delay = 18:00, past the
    # 10:00 + 1h upper bound)
    _write_event_file(
        str(d / "f1.parquet"),
        [
            (1, 1, "signup", _t(10), 0.0),
            (2, 8, "signup", _t(20), 0.0),
            (3, 9, "purchase", _t(20), 1.0),
        ],
        1_700_000_000,
    )
    # batch 1: watermark computed from batch 0 (18:00) takes effect and
    # the signup@10:00 state is evicted at this batch's end
    _write_event_file(
        str(d / "f2.parquet"),
        [(4, 7, "signup", _t(20, 30), 0.0)],
        1_700_000_100,
    )
    # batch 2: the matching purchase arrives after eviction
    _write_event_file(
        str(d / "f3.parquet"),
        [(5, 1, "purchase", _t(10, 30), 5.0)],
        1_700_000_200,
    )

    def transform(stream):
        s = stream.where(F.col("event_type") == "signup").select(
            "user_id", F.col("ts").alias("signup_ts")
        )
        p = stream.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("purchase_ts"), "value"
        )
        return stream_stream_interval_join(
            s, p, on=["user_id"], left_ts="signup_ts",
            right_ts="purchase_ts", upper="1 hour", watermark="2 hours",
        )

    out = _run_file_per_batch(spark, str(d), transform)
    assert out.count() == 0
    # batch twin over the same files pairs (1, 5.0): stream omission is
    # watermark physics, not a join bug
    ev = spark.read.parquet(str(d))
    s = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    batch = stream_stream_interval_join(
        s, p, on=["user_id"], left_ts="signup_ts",
        right_ts="purchase_ts", upper="1 hour",
    )
    assert [(r["user_id"], r["value"]) for r in batch.collect()] == [(1, 5.0)]


def test_stream_route_to_datasets_split_and_replay(spark, tmp_path):
    """Predicate routing into two datasets: disjoint split covers the
    stream; replayed batch ids are per-dataset no-ops (the partial-
    failure recovery path: a replay that already committed to one route
    finishes the other without duplicating the first)."""
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import read_dataset_as_dataframe
    from plateau_spark.streaming.events import (
        commit_stream_batch,
        stream_route_to_datasets,
    )

    src = spark.createDataFrame(
        [(i, float(i - 50)) for i in range(100)], "event_id long, value double"
    )
    src_dir = str(tmp_path / "src")
    src.write.parquet(src_dir)
    store = Store(str(tmp_path / "store"))

    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    q = stream_route_to_datasets(
        stream, store,
        {"accept": F.col("value") >= 0, "reject": "value < 0"},
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination()

    acc = read_dataset_as_dataframe(spark, store, "accept")
    rej = read_dataset_as_dataframe(spark, store, "reject")
    assert sorted(r["event_id"] for r in acc.collect()) == list(range(50, 100))
    assert sorted(r["event_id"] for r in rej.collect()) == list(range(50))

    # replay: same batch id is a no-op on a dataset that already has it
    meta = DatasetMetadata.load(store, "accept")
    replay_id = int(next(iter(meta.metadata["stream_batches"])))
    assert commit_stream_batch(
        spark, store, "accept", src.where("value >= 0"), replay_id
    ) is False
    assert read_dataset_as_dataframe(spark, store, "accept").count() == 50

    # partial-failure recovery: the same batch id still commits to a
    # route that MISSED it (simulating a crash between route commits)
    assert commit_stream_batch(
        spark, store, "quarantine", src.where("value < -40"), replay_id
    ) is True
    qr = read_dataset_as_dataframe(spark, store, "quarantine")
    assert qr.count() == 10


def test_windowed_distinct_counts_match_batch(spark):
    from plateau_spark.streaming.events import windowed_distinct_counts

    streamed = run_stream_to_memory(
        spark, EVENTS, lambda s: windowed_distinct_counts(s)
    )
    batch = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select(F.window("ts", "1 hour")["start"].alias("ws"), "user_id")
        .dropDuplicates()
        .groupBy("ws")
        .count()
    )
    got = {r["window_start"]: r["n_distinct"] for r in streamed.collect()}
    want = {r["ws"]: r["count"] for r in batch.collect()}
    assert got == want


def test_windowed_distinct_dedups_across_batches(spark, tmp_path):
    """The same user re-appearing in a LATER micro-batch inside the same
    window must not double-count — the window-key dedup state carries
    across batches."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_event_file(
        f"{d}/a.parquet",
        [(1, 7, "x", _t(0, 10), 1.0), (2, 8, "x", _t(0, 20), 1.0)],
        mtime=1_700_000_000,
    )
    _write_event_file(
        f"{d}/b.parquet",
        [(3, 7, "x", _t(0, 40), 1.0), (4, 9, "x", _t(0, 50), 1.0),
         (5, 7, "x", _t(3), 1.0)],
        mtime=1_700_000_100,
    )
    from plateau_spark.streaming.events import windowed_distinct_counts

    out = _run_file_per_batch(
        spark, d,
        lambda s: windowed_distinct_counts(s, window="1 hour", watermark="1 hour"),
    )
    rows = {r.window_start: r.n_distinct for r in out.collect()}
    # users 7, 8, 9 in the 00:00 window — user 7 appears in both batches
    assert rows.get(_t(0)) == 3


def test_sliding_window_counts_overlap(spark):
    """slide= puts each event in window/slide overlapping windows; the
    per-window totals must equal the tumbling twin summed over the
    member hours, and total event mass doubles."""
    from pyspark.sql import functions as F

    from plateau_spark.streaming.events import windowed_event_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tumble = windowed_event_counts(ev, window="1 hour").collect()
    slide = windowed_event_counts(ev, window="2 hours", slide="1 hour").collect()
    t = {(r.window_start, r.event_type): r.n_events for r in tumble}
    import datetime as dt

    for r in slide:
        expect = t.get((r.window_start, r.event_type), 0) + t.get(
            (r.window_start + dt.timedelta(hours=1), r.event_type), 0
        )
        assert r.n_events == expect, r
    assert sum(r.n_events for r in slide) == 2 * sum(r.n_events for r in tumble)


@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
def test_scheduled_fingerprint_compaction_survives_empty_batch(spark, tmp_path):
    """An EMPTY micro-batch landing exactly on the compaction schedule
    must not postpone compaction (the pruned seen-index probe of every
    later batch pays for the uncompacted pile), and a schedule hit
    before the fingerprint dataset exists must be a no-op, not an
    error."""
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import update_dataset_from_dataframe
    from plateau_spark.streaming.events import (
        _join_maintenance,
        _schedule_fp_compaction,
    )

    store = Store(str(tmp_path / "store"))
    # nonexistent dataset on the schedule: no-op (and the join must not
    # re-raise anything)
    _schedule_fp_compaction(spark, store, "fp", 64, 64)
    _join_maintenance(store, "fp")
    assert not DatasetMetadata.exists(store, "fp")

    # several small commits -> several files
    for i in range(3):
        update_dataset_from_dataframe(
            spark, store, "fp",
            spark.createDataFrame(
                [(i, f"sig{i}")], "band int, bandsig string"
            ).coalesce(1),
        )
    n_before = len(DatasetMetadata.load(store, "fp").partitions)
    assert n_before == 3
    # off-schedule: no-op
    _schedule_fp_compaction(spark, store, "fp", 63, 64)
    _join_maintenance(store, "fp")
    assert len(DatasetMetadata.load(store, "fp").partitions) == n_before
    # on-schedule (as called from the empty-batch early return):
    # compacts on the background thread; the join waits it out exactly
    # as the next batch's commit path would
    _schedule_fp_compaction(spark, store, "fp", 64, 64)
    _join_maintenance(store, "fp")
    assert len(DatasetMetadata.load(store, "fp").partitions) == 1
    # rows preserved
    from plateau_spark.sources.dataset import read_table

    assert read_table(spark, store, "fp").count() == 3
