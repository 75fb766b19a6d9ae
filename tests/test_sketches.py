"""HLL sketch statistics (operators/sketches.py) and percentile-rank
score calibration (operators/sampling.py:calibrate_percent_rank)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from plateau_spark.operators.sampling import calibrate_percent_rank
from plateau_spark.operators.sketches import (
    build_distinct_sketches,
    estimate_distinct,
    read_distinct_estimates,
    sketch_distinct,
    update_distinct_sketches,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_estimate_within_tolerance(spark, docs):
    est = estimate_distinct(docs, ["lang"], "doc_id")
    exact = docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("exact"))
    rows = est.join(exact, "lang").collect()
    assert rows
    for r in rows:
        assert abs(r.ndv_estimate - r.exact) / r.exact < 0.05, r


def test_sketch_excludes_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2), ("b", None)], "g string, v int"
    )
    est = {r.g: r.ndv_estimate for r in
           estimate_distinct(df, ["g"], "v").collect()}
    # an all-null group still yields a row, with an empty sketch
    assert est == {"a": 2, "b": 0}
    sk = {r.g: (r.sketch, r.n_rows) for r in
          sketch_distinct(df, ["g"], "v").collect()}
    assert sk["b"][0] is not None  # empty sketch, not NULL
    # n_rows counts non-null values only (COUNT(col) semantics)
    assert sk["a"][1] == 2 and sk["b"][1] == 0


def test_incremental_union_equals_full_sketch(spark, docs, tmp_path):
    """HLL union over disjoint batches has IDENTICAL registers to one
    sketch of the full corpus — the merged estimate must equal the
    direct estimate exactly, not just within tolerance."""
    store = str(tmp_path / "sk")
    even = docs.where(F.col("doc_id") % 2 == 0)
    odd = docs.where(F.col("doc_id") % 2 == 1)
    build_distinct_sketches(spark, store, "sk", even, ["lang"], "doc_id")
    update_distinct_sketches(spark, store, "sk", odd)
    merged = {
        r.lang: (r.ndv_estimate, r.n_rows)
        for r in read_distinct_estimates(spark, store, "sk").collect()
    }
    direct = {
        r.lang: r.ndv_estimate
        for r in estimate_distinct(docs, ["lang"], "doc_id").collect()
    }
    counts = {r.lang: r.cnt for r in
              docs.groupBy("lang").agg(F.count("doc_id").alias("cnt")).collect()}
    assert set(merged) == set(direct)
    for lang, (est, n_rows) in merged.items():
        assert est == direct[lang]
        assert n_rows == counts[lang]


def test_update_is_o_batch_append_not_rewrite(spark, docs, tmp_path):
    """Each update appends one row per touched group — existing rows
    are never rewritten (concurrent readers see either N or N+1 sketch
    rows per group, both of which union to a valid estimate)."""
    from plateau_spark.sources.dataset import read_dataset_as_dataframe

    store = str(tmp_path / "sk")
    build_distinct_sketches(
        spark, store, "sk", docs.where("doc_id % 2 = 0"), ["lang"], "doc_id"
    )
    n1 = read_dataset_as_dataframe(spark, store, "sk").count()
    update_distinct_sketches(spark, store, "sk", docs.where("doc_id % 2 = 1"))
    n2 = read_dataset_as_dataframe(spark, store, "sk").count()
    langs = docs.select("lang").distinct().count()
    assert n1 == langs and n2 == 2 * langs


def test_sketch_requires_group_cols(docs):
    with pytest.raises(ValueError):
        sketch_distinct(docs, [], "doc_id")


# ---------------------------------------------------------------------------
# calibrate_percent_rank


def test_calibrate_matches_window_percent_rank(spark, docs):
    """The agg-shape computation must equal F.percent_rank() exactly,
    including ties (every duplicate score shares one rank)."""
    out = calibrate_percent_rank(docs, "n_chars", ["lang"])
    w = Window.partitionBy("lang").orderBy("n_chars")
    ref = docs.withColumn("expected", F.percent_rank().over(w))
    joined = out.join(ref.select("doc_id", "expected"), "doc_id")
    bad = joined.where(F.col("pct_rank") != F.col("expected")).count()
    assert bad == 0
    assert out.count() == docs.count()


def test_calibrate_single_row_group_and_nulls(spark):
    df = spark.createDataFrame(
        [("solo", 7.0, 1), ("g", 1.0, 2), ("g", None, 3), ("g", 2.0, 4)],
        "grp string, score double, id int",
    )
    out = {r.id: r.pct_rank for r in
           calibrate_percent_rank(df, "score", ["grp"]).collect()}
    assert out[1] == 0.0          # single-row group
    assert out[3] is None         # null score never participates
    assert out[2] == 0.0 and out[4] == 1.0  # n=2 after null exclusion


def test_calibrate_no_groups(spark):
    df = spark.createDataFrame(
        [(i, float(i % 3)) for i in range(9)], "id int, score double"
    )
    out = calibrate_percent_rank(df, "score")
    # 3 distinct scores × 3 rows each: ranks 0/8, 3/8, 6/8
    vals = sorted({r.pct_rank for r in out.collect()})
    assert vals == [0.0, 3 / 8, 6 / 8]


# ---------------------------------------------------------------------------
# histogram quantile tier


def test_histogram_quantile_error_bound(spark, docs):
    """Every estimate must sit within `width` ABOVE the order statistic
    it targets (the ceil(q*n)-th value), per group and quantile."""
    import math

    from plateau_spark.operators.sketches import estimate_quantiles

    out = estimate_quantiles(docs, ["lang"], "n_chars", width=50.0)
    est = {(r.lang, r.q): r.value_estimate for r in out.collect()}
    pdf = docs.select("lang", "n_chars").toPandas()
    for lang, g in pdf.groupby("lang"):
        vals = sorted(g.n_chars)
        for q in (0.5, 0.9, 0.99):
            true = vals[math.ceil(q * len(vals)) - 1]
            assert true <= est[(lang, q)] <= true + 50, (lang, q)


def test_histogram_incremental_equals_direct(spark, docs, tmp_path):
    """Histogram counts are additive — the merged persisted read must
    EQUAL the single-pass full-corpus estimate, bit for bit."""
    from plateau_spark.operators.sketches import (
        build_histogram_stats,
        estimate_quantiles,
        read_quantile_estimates,
        update_histogram_stats,
    )

    store = str(tmp_path / "h")
    build_histogram_stats(
        spark, store, "h", docs.where("doc_id % 2 = 0"),
        ["lang"], "n_chars", width=50.0,
    )
    update_histogram_stats(spark, store, "h", docs.where("doc_id % 2 = 1"))
    merged = sorted(
        tuple(r) for r in read_quantile_estimates(spark, store, "h").collect()
    )
    direct = sorted(
        tuple(r)
        for r in estimate_quantiles(
            docs, ["lang"], "n_chars", width=50.0
        ).collect()
    )
    assert merged == direct and merged


def test_histogram_nulls_and_guards(spark):
    from plateau_spark.operators.sketches import (
        estimate_quantiles,
        histogram_sketch,
    )

    df = spark.createDataFrame(
        [("a", 10.0), ("a", None), ("a", 20.0), ("a", -5.0)],
        "g string, v double",
    )
    hist = {r.bucket: r.cnt for r in
            histogram_sketch(df, ["g"], "v", width=10.0).collect()}
    # -5.0 → floor(-0.5) = -1; NULL excluded
    assert hist == {-1: 1, 1: 1, 2: 1}
    with pytest.raises(ValueError):
        histogram_sketch(df, ["g"], "v", width=0)
    with pytest.raises(ValueError):
        estimate_quantiles(df, ["g"], "v", width=10.0, qs=[0.0, 0.5])


def test_histogram_q1_is_min_bucket_edge(spark):
    """q=1.0 targets the max value's bucket upper edge."""
    from plateau_spark.operators.sketches import estimate_quantiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 5, 99)], "g string, v double"
    )
    out = {r.q: r.value_estimate for r in
           estimate_quantiles(df, ["g"], "v", width=10.0, qs=[1.0]).collect()}
    assert out[1.0] == 100.0


def test_stream_monitor_histogram_matches_batch(spark, tmp_path):
    """Two-micro-batch drain must produce a merged histogram identical
    to the single-pass batch histogram, and a replayed batch id must be
    a no-op (exactly-once counts)."""
    import os
    import shutil

    from plateau_spark.operators.sketches import (
        estimate_quantiles,
        histogram_sketch,
        read_quantile_estimates,
    )
    from plateau_spark.streaming.events import (
        commit_stream_batch,
        open_parquet_stream,
        stream_monitor_histogram,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for half, pred in (("even", "event_id % 2 = 0"), ("odd", "event_id % 2 = 1")):
        out = str(tmp_path / half)
        ev.where(pred).coalesce(1).write.parquet(out)
        part = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
        shutil.copy(f"{out}/{part}", f"{src}/{half}.parquet")

    store = str(tmp_path / "store")
    q = stream_monitor_histogram(
        open_parquet_stream(spark, src, reader_options={"maxFilesPerTrigger": "1"}),
        store, "hist", ["event_type"], "value",
        width=25.0, checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination()
    merged = sorted(
        tuple(r)
        for r in read_quantile_estimates(spark, store, "hist").collect()
    )
    direct = sorted(
        tuple(r)
        for r in estimate_quantiles(ev, ["event_type"], "value", width=25.0).collect()
    )
    assert merged == direct and merged

    # replaying an already-committed batch id must not double-count
    replay = histogram_sketch(ev, ["event_type"], "value", width=25.0)
    assert commit_stream_batch(spark, store, "hist", replay, 0) is False
    after = sorted(
        tuple(r)
        for r in read_quantile_estimates(spark, store, "hist").collect()
    )
    assert after == merged


# ---------------------------------------------------------------------------
# change-feed-driven statistics refresh


def test_refresh_histogram_exact_through_mutations(spark, docs, tmp_path):
    """After delete_scope + append on the source, an incremental
    refresh (reading only the change feed) must equal a from-scratch
    histogram of the current corpus — including dropping the fully
    deleted group."""
    from plateau_spark.operators.sketches import (
        estimate_quantiles,
        read_quantile_estimates,
        refresh_histogram_statistics,
    )
    from plateau_spark.sources.dataset import (
        read_table,
        store_dataframe_as_dataset,
        update_dataset_from_dataframe,
    )

    store = str(tmp_path / "s")
    d = docs.select("doc_id", "lang", "n_chars")
    store_dataframe_as_dataset(spark, store, "d", d, partition_on=["lang"])
    refresh_histogram_statistics(
        spark, store, "d", "stats", ["lang"], "n_chars", width=50.0
    )
    update_dataset_from_dataframe(
        spark, store, "d",
        d.where(F.col("lang") == "en").withColumn(
            "doc_id", F.col("doc_id") + 100000
        ),
        delete_scope=[{"lang": "de"}], partition_on=["lang"],
    )
    refresh_histogram_statistics(spark, store, "d", "stats")
    cur = read_table(spark, store, "d")
    got = sorted(
        tuple(r) for r in read_quantile_estimates(spark, store, "stats").collect()
    )
    want = sorted(
        tuple(r)
        for r in estimate_quantiles(cur, ["lang"], "n_chars", width=50.0).collect()
    )
    assert got == want and got
    assert not any(r[0] == "de" for r in got)
    # no-op refresh commits nothing
    g1 = refresh_histogram_statistics(spark, store, "d", "stats").generation
    g2 = refresh_histogram_statistics(spark, store, "d", "stats").generation
    assert g1 == g2


def test_refresh_distinct_incremental_and_rebuild(spark, docs, tmp_path):
    from plateau_spark.operators.sketches import (
        estimate_distinct,
        read_distinct_estimates,
        refresh_distinct_statistics,
    )
    from plateau_spark.sources.dataset import (
        read_dataset_as_dataframe,
        read_table,
        store_dataframe_as_dataset,
        update_dataset_from_dataframe,
    )

    store = str(tmp_path / "s")
    d = docs.select("doc_id", "lang", "n_chars")
    store_dataframe_as_dataset(spark, store, "d", d, partition_on=["lang"])
    refresh_distinct_statistics(spark, store, "d", "ndv", ["lang"], "doc_id")
    rows0 = read_dataset_as_dataframe(spark, store, "ndv").count()

    # insert-only change: incremental append (one new row per group)
    update_dataset_from_dataframe(
        spark, store, "d",
        d.where(F.col("lang") == "fr").withColumn(
            "doc_id", F.col("doc_id") + 200000
        ),
        partition_on=["lang"],
    )
    refresh_distinct_statistics(spark, store, "d", "ndv")
    rows1 = read_dataset_as_dataframe(spark, store, "ndv").count()
    assert rows1 == rows0 + 1  # appended, not rebuilt

    # delete: HLL cannot subtract — full rebuild (row count back to groups)
    update_dataset_from_dataframe(
        spark, store, "d", None, delete_scope=[{"lang": "zh"}]
    )
    refresh_distinct_statistics(spark, store, "d", "ndv")
    cur = read_table(spark, store, "d")
    got = sorted(
        (r[0], r[1])
        for r in read_distinct_estimates(spark, store, "ndv").collect()
    )
    want = sorted(
        tuple(r) for r in estimate_distinct(cur, ["lang"], "doc_id").collect()
    )
    assert got == want
    assert not any(lang == "zh" for lang, _ in got)


def test_refresh_guards(spark, docs, tmp_path):
    from plateau_spark.operators.sketches import (
        refresh_distinct_statistics,
        refresh_histogram_statistics,
    )
    from plateau_spark.sources.dataset import store_dataframe_as_dataset

    store = str(tmp_path / "s")
    d = docs.select("doc_id", "lang", "n_chars")
    store_dataframe_as_dataset(spark, store, "a", d)
    store_dataframe_as_dataset(spark, store, "b", d)
    with pytest.raises(ValueError):  # first call needs the parameters
        refresh_histogram_statistics(spark, store, "a", "stats")
    refresh_histogram_statistics(
        spark, store, "a", "stats", ["lang"], "n_chars", width=50.0
    )
    with pytest.raises(ValueError):  # stats dataset tracks a different source
        refresh_histogram_statistics(spark, store, "b", "stats")
    refresh_distinct_statistics(spark, store, "a", "ndv", ["lang"], "doc_id")
    with pytest.raises(ValueError):
        refresh_distinct_statistics(spark, store, "b", "ndv")


def test_stream_monitor_distinct_matches_batch(spark, tmp_path):
    """Two-micro-batch drain: merged HLL estimate must EQUAL the
    single-pass batch estimate (disjoint-batch union is register-
    identical), and n_rows must tally exactly-once."""
    import os
    import shutil

    from plateau_spark.operators.sketches import (
        estimate_distinct,
        read_distinct_estimates,
    )
    from plateau_spark.streaming.events import (
        open_parquet_stream,
        stream_monitor_distinct,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for half, pred in (("even", "event_id % 2 = 0"), ("odd", "event_id % 2 = 1")):
        out = str(tmp_path / half)
        ev.where(pred).coalesce(1).write.parquet(out)
        part = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
        shutil.copy(f"{out}/{part}", f"{src}/{half}.parquet")

    store = str(tmp_path / "store")
    q = stream_monitor_distinct(
        open_parquet_stream(spark, src, reader_options={"maxFilesPerTrigger": "1"}),
        store, "ndv", ["event_type"], "user_id",
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination()
    merged = {
        r.event_type: (r.ndv_estimate, r.n_rows)
        for r in read_distinct_estimates(spark, store, "ndv").collect()
    }
    direct = {
        r.event_type: r.ndv_estimate
        for r in estimate_distinct(ev, ["event_type"], "user_id").collect()
    }
    counts = {
        r.event_type: r.cnt
        for r in ev.groupBy("event_type").agg(F.count("user_id").alias("cnt")).collect()
    }
    assert set(merged) == set(direct)
    for et, (est, n) in merged.items():
        assert est == direct[et] and n == counts[et]


# ---------------------------------------------------------------------------
# property tests (hypothesis): the histogram monoid's contracts hold on
# arbitrary inputs, not just the fixtures


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VALS = st.lists(
    st.one_of(
        st.integers(min_value=-10_000, max_value=10_000).map(float),
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        st.none(),
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
@given(vals=_VALS, width=st.sampled_from([0.5, 7.0, 100.0]), q=st.sampled_from([0.1, 0.5, 0.99, 1.0]))
def test_histogram_quantile_bound_property(spark, vals, width, q):
    """For ANY value multiset: the estimate sits in (target, target +
    width] where target is the ceil(q*n)-th order statistic, and
    splitting the data arbitrarily then merging gives the SAME answer
    as one pass (monoid law)."""
    import math

    from plateau_spark.operators.sketches import (
        estimate_quantiles,
        histogram_sketch,
        _histogram_quantiles,
    )

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id int, v double")
    non_null = sorted(v for v in vals if v is not None)
    direct = {
        r.q: r.value_estimate
        for r in estimate_quantiles(df, [], "v", width=width, qs=[q]).collect()
    }
    if not non_null:
        assert direct == {}
        return
    target = non_null[math.ceil(q * len(non_null)) - 1]
    assert target <= direct[q] <= target + width + 1e-9

    # monoid: histogram(split A) + histogram(split B) == histogram(all)
    a = histogram_sketch(df.where("id % 2 = 0"), [], "v", width=width)
    b = histogram_sketch(df.where("id % 2 = 1"), [], "v", width=width)
    merged = a.unionByName(b).groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    got = {r.q: r.value_estimate
           for r in _histogram_quantiles(merged, [], width, [q]).collect()}
    assert got == direct


@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
def test_stats_refresh_operation_sequence_fuzz(spark, tmp_path):
    """Generative fuzz of the change-feed refresh: random SEQUENCES of
    source mutations (append / delete_scope / partition-replace /
    compact), with a histogram AND an HLL refresh after every step —
    each checked exactly against a from-scratch computation over the
    current corpus. Sequences catch the interaction bugs single-step
    tests cannot (e.g. a compact immediately after a delete nets
    rewritten labels against removed ones)."""
    import random

    from plateau_spark.operators.sketches import (
        estimate_distinct,
        estimate_quantiles,
        read_distinct_estimates,
        read_quantile_estimates,
        refresh_distinct_statistics,
        refresh_histogram_statistics,
    )
    from plateau_spark.sources.dataset import (
        compact_dataset,
        read_table,
        store_dataframe_as_dataset,
        update_dataset_from_dataframe,
    )

    for seed in (11, 47):
        rng = random.Random(seed)
        store = str(tmp_path / f"s{seed}")
        uuid = "src"
        next_k = 0

        def fresh(n, groups):
            nonlocal next_k
            rows = [
                (next_k + i, rng.choice(groups), float(rng.randint(0, 400)))
                for i in range(n)
            ]
            next_k += n
            return spark.createDataFrame(rows, "k long, g string, v double")

        store_dataframe_as_dataset(
            spark, store, uuid, fresh(20, ["a", "b", "c"]), partition_on=["g"]
        )
        refresh_histogram_statistics(
            spark, store, uuid, "hist", ["g"], "v", width=50.0
        )
        refresh_distinct_statistics(spark, store, uuid, "ndv", ["g"], "k")

        for _step in range(6):
            op = rng.choice(["append", "delete", "replace", "compact"])
            if op == "append":
                update_dataset_from_dataframe(
                    spark, store, uuid,
                    fresh(rng.randint(3, 10), ["a", "b", "c", "d"]),
                    partition_on=["g"],
                )
            elif op == "delete":
                update_dataset_from_dataframe(
                    spark, store, uuid, None,
                    delete_scope=[{"g": rng.choice(["a", "b", "c", "d"])}],
                )
            elif op == "replace":
                g = rng.choice(["a", "b", "c"])
                update_dataset_from_dataframe(
                    spark, store, uuid,
                    fresh(rng.randint(2, 6), [g]),
                    delete_scope=[{"g": g}], partition_on=["g"],
                )
            else:
                compact_dataset(spark, store, uuid)

            refresh_histogram_statistics(spark, store, uuid, "hist")
            refresh_distinct_statistics(spark, store, uuid, "ndv")
            cur = read_table(spark, store, uuid)
            got_h = sorted(
                tuple(r)
                for r in read_quantile_estimates(spark, store, "hist").collect()
            )
            want_h = sorted(
                tuple(r)
                for r in estimate_quantiles(cur, ["g"], "v", width=50.0).collect()
            )
            assert got_h == want_h, (seed, _step, op)
            got_d = sorted(
                (r[0], r[1])
                for r in read_distinct_estimates(spark, store, "ndv").collect()
            )
            want_d = sorted(
                tuple(r)
                for r in estimate_distinct(cur, ["g"], "k").collect()
            )
            assert got_d == want_d, (seed, _step, op)


def test_calibrate_from_histogram_matches_model(spark, docs, tmp_path):
    """Stats-served calibration equals the python CDF model (fraction
    of sketched rows in strictly lower buckets); unseen buckets and
    NULL scores surface as NULL rather than extrapolating."""
    import collections
    import math

    from plateau_spark.operators.sketches import (
        build_histogram_stats,
        calibrate_from_histogram,
    )

    store = str(tmp_path / "h")
    build_histogram_stats(spark, store, "h", docs, ["lang"], "n_chars", width=50.0)
    rows = calibrate_from_histogram(docs, spark, store, "h").collect()
    pdf = docs.select("lang", "n_chars").toPandas()
    hist = collections.Counter(
        (l, math.floor(c / 50.0)) for l, c in zip(pdf.lang, pdf.n_chars)
    )
    n_per = collections.Counter(pdf.lang)
    for r in rows:
        b = math.floor(r.n_chars / 50.0)
        below = sum(v for (l, bb), v in hist.items() if l == r.lang and bb < b)
        assert r.pct_rank_est == below / n_per[r.lang]
    assert len(rows) == docs.count()

    unseen = spark.createDataFrame(
        [(1, "en", 10**9), (2, "xx", 100)], "doc_id long, lang string, n_chars long"
    )
    got = {r.doc_id: r.pct_rank_est
           for r in calibrate_from_histogram(unseen, spark, store, "h").collect()}
    assert got == {1: None, 2: None}


def test_stream_monitor_topk_matches_batch_skew_profile(spark, tmp_path):
    """Two-micro-batch drain: merged exact top-k must equal the batch
    skew_profile over the same column (same tie-break contract)."""
    import os
    import shutil

    from plateau_spark.operators.dataflow import skew_profile
    from plateau_spark.streaming.events import (
        open_parquet_stream,
        read_topk_counts,
        stream_monitor_topk,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for half, pred in (("even", "event_id % 2 = 0"), ("odd", "event_id % 2 = 1")):
        out = str(tmp_path / half)
        ev.where(pred).coalesce(1).write.parquet(out)
        part = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
        shutil.copy(f"{out}/{part}", f"{src}/{half}.parquet")

    store = str(tmp_path / "store")
    q = stream_monitor_topk(
        open_parquet_stream(spark, src, reader_options={"maxFilesPerTrigger": "1"}),
        store, "topk", [], "event_type",
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination()
    got = sorted(
        (r.value, r.cnt, r.share, r.rnk)
        for r in read_topk_counts(spark, store, "topk", k=3).collect()
    )
    want = sorted(
        (r.value, r.cnt, r.share, r.rnk)
        for r in skew_profile(ev, ["event_type"], k=3).collect()
    )
    assert got == want and len(got) == 3


def test_refresh_rebuilds_when_gc_reclaimed_snapshot(spark, docs, tmp_path):
    """GC reclaiming the recorded source generation kills the change
    feed — the refresh must fall back to one atomic full rebuild, not
    fail (and the rebuilt stats must match from-scratch)."""
    from plateau_spark.operators.sketches import (
        estimate_distinct,
        estimate_quantiles,
        read_distinct_estimates,
        read_quantile_estimates,
        refresh_distinct_statistics,
        refresh_histogram_statistics,
    )
    from plateau_spark.sources.dataset import (
        compact_dataset,
        garbage_collect_dataset,
        read_table,
        store_dataframe_as_dataset,
        update_dataset_from_dataframe,
    )

    store = str(tmp_path / "s")
    d = docs.select("doc_id", "lang", "n_chars")
    store_dataframe_as_dataset(spark, store, "d", d, partition_on=["lang"])
    refresh_histogram_statistics(
        spark, store, "d", "hist", ["lang"], "n_chars", width=50.0
    )
    refresh_distinct_statistics(spark, store, "d", "ndv", ["lang"], "doc_id")
    # advance the source several generations, then GC old snapshots
    update_dataset_from_dataframe(
        spark, store, "d",
        d.where(F.col("lang") == "en").withColumn(
            "doc_id", F.col("doc_id") + 100000
        ),
        partition_on=["lang"],
    )
    compact_dataset(spark, store, "d")
    garbage_collect_dataset(store, "d")

    refresh_histogram_statistics(spark, store, "d", "hist")
    refresh_distinct_statistics(spark, store, "d", "ndv")
    cur = read_table(spark, store, "d")
    got_h = sorted(
        tuple(r) for r in read_quantile_estimates(spark, store, "hist").collect()
    )
    want_h = sorted(
        tuple(r)
        for r in estimate_quantiles(cur, ["lang"], "n_chars", width=50.0).collect()
    )
    assert got_h == want_h
    got_d = sorted(
        (r[0], r[1])
        for r in read_distinct_estimates(spark, store, "ndv").collect()
    )
    want_d = sorted(
        tuple(r) for r in estimate_distinct(cur, ["lang"], "doc_id").collect()
    )
    assert got_d == want_d


def test_stream_monitor_histogram_restart_processes_only_new_files(spark, tmp_path):
    """Checkpointed restart: a second availableNow run with the SAME
    checkpoint must process only files added since the first run —
    the merged histogram equals the batch histogram over everything,
    with no double counting of the first file."""
    import os
    import shutil

    from plateau_spark.operators.sketches import (
        estimate_quantiles,
        read_quantile_estimates,
    )
    from plateau_spark.streaming.events import (
        open_parquet_stream,
        stream_monitor_histogram,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "src")
    os.makedirs(src)
    halves = {}
    for half, pred in (("even", "event_id % 2 = 0"), ("odd", "event_id % 2 = 1")):
        out = str(tmp_path / half)
        ev.where(pred).coalesce(1).write.parquet(out)
        part = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
        halves[half] = f"{out}/{part}"

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    shutil.copy(halves["even"], f"{src}/even.parquet")
    q1 = stream_monitor_histogram(
        open_parquet_stream(spark, src), store, "hist",
        ["event_type"], "value", width=25.0,
        checkpoint_dir=ckpt, available_now=True,
    )
    q1.awaitTermination()
    first = sorted(
        tuple(r)
        for r in read_quantile_estimates(spark, store, "hist").collect()
    )
    even_only = sorted(
        tuple(r)
        for r in estimate_quantiles(
            ev.where("event_id % 2 = 0"), ["event_type"], "value", width=25.0
        ).collect()
    )
    assert first == even_only

    shutil.copy(halves["odd"], f"{src}/odd.parquet")
    q2 = stream_monitor_histogram(
        open_parquet_stream(spark, src), store, "hist",
        ["event_type"], "value", width=25.0,
        checkpoint_dir=ckpt, available_now=True,
    )
    q2.awaitTermination()
    merged = sorted(
        tuple(r)
        for r in read_quantile_estimates(spark, store, "hist").collect()
    )
    full = sorted(
        tuple(r)
        for r in estimate_quantiles(ev, ["event_type"], "value", width=25.0).collect()
    )
    assert merged == full


def test_refresh_across_metadata_only_commit(spark, docs, tmp_path):
    """A source generation advance that changes no rows (e.g. a
    post-hoc index build) yields an empty change feed — the refresh
    must commit the empty diff cleanly and keep the stats exact."""
    from plateau_spark.operators.sketches import (
        estimate_quantiles,
        read_quantile_estimates,
        refresh_histogram_statistics,
    )
    from plateau_spark.sources.dataset import (
        build_dataset_indices,
        store_dataframe_as_dataset,
    )

    store = str(tmp_path / "s")
    d = docs.select("doc_id", "lang", "n_chars")
    store_dataframe_as_dataset(spark, store, "d", d, partition_on=["lang"])
    refresh_histogram_statistics(
        spark, store, "d", "h", ["lang"], "n_chars", width=50.0
    )
    build_dataset_indices(spark, store, "d", ["doc_id"])  # metadata-only
    refresh_histogram_statistics(spark, store, "d", "h")
    got = sorted(
        tuple(r) for r in read_quantile_estimates(spark, store, "h").collect()
    )
    want = sorted(
        tuple(r)
        for r in estimate_quantiles(d, ["lang"], "n_chars", width=50.0).collect()
    )
    assert got == want and got


def test_consolidate_statistics_resets_row_count_and_preserves_results(
    spark, docs, tmp_path
):
    """After N updates the stats dataset holds N rows per group;
    consolidation collapses to one row per group(/bucket) with
    IDENTICAL read results for both tiers, preserving metadata so
    later refreshes keep working."""
    from plateau_spark.operators.sketches import (
        build_distinct_sketches,
        build_histogram_stats,
        consolidate_statistics,
        read_distinct_estimates,
        read_quantile_estimates,
        update_distinct_sketches,
        update_histogram_stats,
    )
    from plateau_spark.sources.dataset import read_dataset_as_dataframe

    store = str(tmp_path / "s")
    thirds = [docs.where(f"doc_id % 3 = {i}") for i in range(3)]
    build_histogram_stats(
        spark, store, "h", thirds[0], ["lang"], "n_chars", width=50.0
    )
    build_distinct_sketches(spark, store, "n", thirds[0], ["lang"], "doc_id")
    for part in thirds[1:]:
        update_histogram_stats(spark, store, "h", part)
        update_distinct_sketches(spark, store, "n", part)

    before_h = sorted(
        tuple(r) for r in read_quantile_estimates(spark, store, "h").collect()
    )
    before_n = sorted(
        tuple(r) for r in read_distinct_estimates(spark, store, "n").collect()
    )
    langs = docs.select("lang").distinct().count()
    assert read_dataset_as_dataframe(spark, store, "n").count() == 3 * langs

    consolidate_statistics(spark, store, "h")
    consolidate_statistics(spark, store, "n")
    assert read_dataset_as_dataframe(spark, store, "n").count() == langs
    after_h = sorted(
        tuple(r) for r in read_quantile_estimates(spark, store, "h").collect()
    )
    after_n = sorted(
        tuple(r) for r in read_distinct_estimates(spark, store, "n").collect()
    )
    assert after_h == before_h and after_n == before_n

    # metadata survives: another update + read still works
    update_histogram_stats(spark, store, "h", docs.where("doc_id % 3 = 0"))
    assert read_quantile_estimates(spark, store, "h").count() > 0


def test_consolidate_rejects_non_stats_dataset(spark, docs, tmp_path):
    from plateau_spark.operators.sketches import consolidate_statistics
    from plateau_spark.sources.dataset import store_dataframe_as_dataset

    store = str(tmp_path / "s")
    store_dataframe_as_dataset(
        spark, store, "plain", docs.select("doc_id", "lang")
    )
    with pytest.raises(ValueError):
        consolidate_statistics(spark, store, "plain")


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.one_of(st.integers(min_value=-50, max_value=50).map(float), st.none()),
        ),
        min_size=1,
        max_size=40,
    )
)
@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
def test_calibrate_percent_rank_property(spark, rows):
    """For ANY (group, score) multiset, the agg-shape calibration
    equals F.percent_rank() on non-null scores and yields NULL for
    null scores."""
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        "id int, g string, v double",
    )
    out = {r.id: r.pct_rank
           for r in calibrate_percent_rank(df, "v", ["g"]).collect()}
    ref_rows = df.where(F.col("v").isNotNull()).withColumn(
        "expected",
        F.percent_rank().over(Window.partitionBy("g").orderBy("v")),
    ).collect()
    for r in ref_rows:
        assert out[r.id] == r.expected
    for i, (g, v) in enumerate(rows):
        if v is None:
            assert out[i] is None


def test_refresh_rejects_manually_built_stats(spark, docs, tmp_path):
    """A stats dataset built via the manual tier carries no source
    generation — refreshing it must raise a typed, actionable error,
    not a bare KeyError."""
    from plateau_spark.operators.sketches import (
        build_distinct_sketches,
        build_histogram_stats,
        refresh_distinct_statistics,
        refresh_histogram_statistics,
    )
    from plateau_spark.sources.dataset import store_dataframe_as_dataset

    store = str(tmp_path / "s")
    d = docs.select("doc_id", "lang", "n_chars")
    store_dataframe_as_dataset(spark, store, "d", d)
    build_histogram_stats(spark, store, "h", d, ["lang"], "n_chars", width=50.0)
    build_distinct_sketches(spark, store, "n", d, ["lang"], "doc_id")
    # force a generation difference so the guard (not the no-op path) runs
    store_dataframe_as_dataset(
        spark, store, "d", d.limit(10), overwrite=True
    )
    with pytest.raises(ValueError, match="not generation-tracked"):
        refresh_histogram_statistics(spark, store, "d", "h")
    with pytest.raises(ValueError, match="not generation-tracked"):
        refresh_distinct_statistics(spark, store, "d", "n")


# ---------------------------------------------------------------------------
# population stability (PSI drift)


def test_population_stability_detects_planted_shift(spark, docs, tmp_path):
    from plateau_spark.operators.sketches import (
        build_histogram_stats,
        population_stability,
        population_stability_from_stats,
    )

    ref = docs.where("doc_id % 2 = 0")
    cur = docs.where("doc_id % 2 = 1").withColumn(
        "n_chars",
        F.when(F.col("lang") == "en", F.col("n_chars") + 300).otherwise(
            F.col("n_chars")
        ),
    )
    out = {r.lang: r.psi
           for r in population_stability(
               cur, ref, ["lang"], "n_chars", width=50.0
           ).collect()}
    assert out["en"] == max(out.values())  # the shifted group dominates

    # identical distributions → psi 0 exactly (same frame both sides)
    same = {r.lang: r.psi
            for r in population_stability(
                ref, ref, ["lang"], "n_chars", width=50.0
            ).collect()}
    assert all(v == 0.0 for v in same.values())

    # stats-dataset variant equals the direct computation
    store = str(tmp_path / "s")
    build_histogram_stats(spark, store, "cur", cur, ["lang"], "n_chars", width=50.0)
    build_histogram_stats(spark, store, "ref", ref, ["lang"], "n_chars", width=50.0)
    from_stats = {r.lang: r.psi
                  for r in population_stability_from_stats(
                      spark, store, "cur", "ref"
                  ).collect()}
    assert from_stats == out


def test_population_stability_from_stats_rejects_mismatched(spark, docs, tmp_path):
    from plateau_spark.operators.sketches import (
        build_histogram_stats,
        population_stability_from_stats,
    )

    store = str(tmp_path / "s")
    build_histogram_stats(spark, store, "a", docs, ["lang"], "n_chars", width=50.0)
    build_histogram_stats(spark, store, "b", docs, ["lang"], "n_chars", width=25.0)
    with pytest.raises(ValueError, match="not comparable"):
        population_stability_from_stats(spark, store, "a", "b")
