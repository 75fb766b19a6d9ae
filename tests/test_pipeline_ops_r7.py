"""Round-7 operator tests: DSIR importance resampling.

Reference anchor: none (north-star extension beyond
/root/reference/plateau — the reference has no text-selection
operators); method from Xie et al., NeurIPS 2023 "Data Selection for
Language Models via Importance Resampling" (hashed n-gram importance
weights + Gumbel-top-k resampling).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_dsir_logweight_hand_computed(spark):
    """One-token docs, one bucket per feature: log w must equal the
    closed-form smoothed log-ratio."""
    from plateau_spark.operators.sampling import (
        _hashed_ngram_features,
        dsir_logweights,
    )

    raw = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(10, "aaa")], "doc_id long, text string")
    out = {r["doc_id"]: r["logw"] for r in dsir_logweights(
        raw, target, "doc_id", "text", n_buckets=64
    ).collect()}
    # bucket ids for the two features (md5-derived, engine-side)
    b = {
        r["t"]: r["b"][0]
        for r in spark.createDataFrame([("aaa",), ("bbb",)], "t string")
        .select("t", _hashed_ngram_features("t", "dsir", 64).alias("b"))
        .collect()
    }
    assert b["aaa"] != b["bbb"]  # no collision at this size
    # models: target N=1 (one 'aaa'), raw N=2 (one each)
    def lp(c, n):
        return math.log(c + 1) - math.log(n + 64)
    expect_a = (lp(1, 1) - lp(1, 2))
    expect_b = (lp(0, 1) - lp(1, 2))
    assert abs(out[1] - round(expect_a, 6)) < 1e-6
    assert abs(out[2] - round(expect_b, 6)) < 1e-6
    assert out[1] > out[2]  # target-like doc scores higher


def test_dsir_target_like_documents_rank_higher(spark):
    from plateau_spark.operators.sampling import dsir_logweights

    raw = spark.createDataFrame(
        [(i, "science research method results" if i < 5 else "buy cheap pills now")
         for i in range(10)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100 + i, "science research experiments and results") for i in range(3)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["logw"] for r in dsir_logweights(
        raw, target, "doc_id", "text"
    ).collect()}
    assert min(out[i] for i in range(5)) > max(out[i] for i in range(5, 10))


def test_dsir_zero_feature_doc_scores_null_and_never_selected(spark):
    from plateau_spark.operators.sampling import dsir_logweights, dsir_select

    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "alpha")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "alpha")], "doc_id long, text string")
    out = {r["doc_id"]: r["logw"] for r in dsir_logweights(
        raw, target, "doc_id", "text"
    ).collect()}
    assert out[2] is None
    sel = dsir_select(raw, target, "doc_id", "text", 3)
    ids = [r["doc_id"] for r in sel.collect()]
    assert 2 not in ids and len(ids) == 2  # only featured docs selectable


def test_dsir_select_deterministic_and_bounded(spark):
    from plateau_spark.operators.sampling import dsir_select

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    target = docs.where(F.col("doc_id") % 7 == 0)
    a = sorted(r["doc_id"] for r in dsir_select(docs, target, "doc_id", "text", 20).collect())
    b = sorted(r["doc_id"] for r in dsir_select(docs, target, "doc_id", "text", 20).collect())
    assert a == b and len(a) == 20
    # temperature changes the draw (same weights, different softmax)
    c = sorted(r["doc_id"] for r in dsir_select(
        docs, target, "doc_id", "text", 20, temperature=100.0
    ).collect())
    assert c != a
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_select(docs, target, "doc_id", "text", 0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_select(docs, target, "doc_id", "text", 5, temperature=0.0)


def test_dsir_plan_broadcast_model_and_take_ordered(spark):
    """Scale shape: the bucket-model join must broadcast (model is
    <= n_buckets rows), scoring must stay free of nested loops over the
    corpus, and selection must plan TakeOrderedAndProject (partial
    top-k), never a global sort materialization."""
    from plateau_spark.operators.sampling import dsir_logweights, dsir_select

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    target = docs.where(F.col("doc_id") % 5 == 0)
    scored = dsir_logweights(docs, target, "doc_id", "text")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    sel = dsir_select(docs, target, "doc_id", "text", 10)
    splan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan


# --- CCNet per-language perplexity buckets ----------------------------------


def test_ccnet_buckets_per_group_thirds(spark):
    """Each language splits into thirds by ITS OWN NLL distribution —
    a fluent doc in a sparse language may be 'head' there while the
    same NLL would be 'tail' globally."""
    from plateau_spark.operators.text import ccnet_perplexity_buckets

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = ccnet_perplexity_buckets(docs, "doc_id", "text", "lang")
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["nll"], r["bucket"]))
    assert len(by_lang) >= 3
    for lang, pairs in by_lang.items():
        n = len(pairs)
        heads = [x for x, b in pairs if b == "head"]
        tails = [x for x, b in pairs if b == "tail"]
        if heads and tails:
            assert max(heads) <= min(tails), lang  # head = lowest NLL
        # thirds within tolerance of whole-bucket ties
        assert len(heads) <= n * (1 / 3) + max(
            sum(1 for x, _ in pairs if x == v) for v in set(x for x, _ in pairs)
        )


def test_ccnet_buckets_zero_token_docs_excluded(spark):
    from plateau_spark.operators.text import ccnet_perplexity_buckets

    df = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "", "en"), (3, "alpha", "en"),
         (4, "gamma delta", "en")],
        "doc_id long, text string, lang string",
    )
    out = ccnet_perplexity_buckets(df, "doc_id", "text", "lang")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3, 4]


def test_quality_tiers_best_low_and_groups(spark):
    """best='low' inverts the orientation; group_cols computes the CDF
    per group."""
    from plateau_spark.operators.sampling import quality_tiers

    rows = [(i, "g1", float(i)) for i in range(10)] + [
        (100 + i, "g2", float(100 + i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k long, g string, s double")
    out = quality_tiers(
        df, "s",
        tiers=(("head", 0.3), ("rest", 1.0)),
        best="low", group_cols=["g"], scale=1,
    )
    got = {r["k"]: r["tier"] for r in out.collect()}
    # per-group: the 3 SMALLEST scores of each group are head
    assert [k for k in range(10) if got[k] == "head"] == [0, 1, 2]
    assert [k for k in range(100, 110) if got[k] == "head"] == [100, 101, 102]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="best"):
        quality_tiers(df, "s", best="sideways")


# --- perceptual dHash near-dup ----------------------------------------------


def _ppm(img_rows):
    """bytes of a P6 PPM from [[(r,g,b), ...], ...]."""
    h, w = len(img_rows), len(img_rows[0])
    body = bytes(c for row in img_rows for px in row for c in px)
    return b"P6\n%d %d\n255\n" % (w, h) + body


def test_image_dhash_hand_computed(spark):
    from plateau_spark.operators.multimodal import image_dhash

    # 2x3 image: gray rows [10, 20, 5] and [7, 7, 9]
    img = [
        [(10, 10, 10), (20, 20, 20), (5, 5, 5)],
        [(7, 7, 7), (7, 7, 7), (9, 9, 9)],
    ]
    df = spark.createDataFrame([(1, bytearray(_ppm(img)))], "media_id long, payload binary")
    out = image_dhash(df).collect()
    assert len(out) == 1
    # bits (LSB first): row0: 10>20=0, 20>5=1; row1: 7>7=0, 7>9=0 -> 0b0010 = 2
    assert out[0]["dhash"] == 2 and out[0]["bits"] == 4


def test_image_dhash_perceptual_property(spark):
    """A one-pixel brightness nudge moves the hash by at most a couple
    of bits; unrelated images are far apart — the property exact
    content hashes (md5) cannot provide."""
    from plateau_spark.operators.multimodal import image_dhash

    base = [[(i * 16 + j * 8,) * 3 for j in range(4)] for i in range(4)]
    nudged = [row[:] for row in base]
    nudged[0][0] = (base[0][0][0] + 60,) * 3  # flips at most gradient bit 0
    inverted = [[(255 - px[0],) * 3 for px in row] for row in base]
    df = spark.createDataFrame(
        [(1, bytearray(_ppm(base))), (2, bytearray(_ppm(nudged))),
         (3, bytearray(_ppm(inverted)))],
        "media_id long, payload binary",
    )
    h = {r["media_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert bin(h[1] ^ h[2]).count("1") <= 1
    assert bin(h[1] ^ h[3]).count("1") >= 6  # gradient fully inverted


def test_dhash_dup_pairs_banded_recall_equals_bruteforce(spark):
    """Pigeonhole guarantee: the banded equi-join finds EVERY pair at
    hamming <= max_hamming — compare against an all-pairs popcount."""
    import itertools
    import random

    from plateau_spark.operators.multimodal import dhash_dup_pairs

    rng = random.Random(7)
    rows = [(i, rng.getrandbits(12), 12) for i in range(120)]
    df = spark.createDataFrame(rows, "media_id long, dhash long, bits int")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dhash_dup_pairs(df, bits=12, max_hamming=2).collect()
    )
    expect = sorted(
        (a, b, bin(ha ^ hb).count("1"))
        for (a, ha, _), (b, hb, _) in itertools.combinations(rows, 2)
        if bin(ha ^ hb).count("1") <= 2
    )
    assert got == expect and len(expect) > 0


def test_dhash_dup_pairs_plan_is_equi_join(spark):
    """Scale shape: candidates must come from a hash equi-join on the
    (band, value) key — never a nested loop over all pairs."""
    from plateau_spark.operators.multimodal import dhash_dup_pairs

    df = spark.range(500).select(
        F.col("id").alias("media_id"),
        (F.col("id") * 37 % 4096).alias("dhash"),
        F.lit(12).alias("bits"),
    )
    out = dhash_dup_pairs(df, bits=12, max_hamming=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_dhash_validates_inputs(spark):
    from plateau_spark.operators.multimodal import dhash_dup_pairs

    df = spark.createDataFrame([(1, 3, 12)], "media_id long, dhash long, bits int")
    with pytest.raises(ValueError, match="bits"):
        dhash_dup_pairs(df, bits=0)
    with pytest.raises(ValueError, match="max_hamming"):
        dhash_dup_pairs(df, bits=12, max_hamming=-1)


# --- audio frame features ---------------------------------------------------


def _wav(samples, rate=8000):
    import struct

    body = b"".join(struct.pack("<h", s) for s in samples)
    return (
        b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        + b"data" + len(body).to_bytes(4, "little") + body
    )


def test_audio_features_hand_computed(spark):
    import math

    from plateau_spark.operators.multimodal import audio_frame_features

    # frame 4: [3, -3, 3, -3] -> rms 3, zcr 3/3; [0, 0, 0, 0] -> rms 0, zcr 0
    df = spark.createDataFrame(
        [(1, bytearray(_wav([3, -3, 3, -3, 0, 0, 0, 0])))],
        "media_id long, payload binary",
    )
    out = {r["frame_no"]: (r["rms"], r["zcr"]) for r in
           audio_frame_features(df, frame=4).collect()}
    assert out[0] == (3.0, 1.0)
    assert out[1] == (0.0, 0.0)
    # trailing partial frame dropped
    df2 = spark.createDataFrame(
        [(1, bytearray(_wav([1] * 10)))], "media_id long, payload binary"
    )
    assert audio_frame_features(df2, frame=4).count() == 2


def test_audio_features_rejects_non_pcm16_mono(spark):
    import struct

    from plateau_spark.operators.multimodal import audio_frame_features

    good = _wav([1, 2, 3, 4])
    # stereo (channels=2) must drop
    stereo = bytearray(good)
    stereo[22:24] = struct.pack("<H", 2)
    rows = [
        (1, bytearray(good)),
        (2, stereo),
        (3, bytearray(b"not a wav at all")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = audio_frame_features(df, frame=4).collect()
    assert {r["media_id"] for r in out} == {1}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="frame"):
        audio_frame_features(df, frame=1)


# --- cluster-balanced sampling ----------------------------------------------


def test_cluster_balanced_sample_caps_every_cluster(spark):
    from plateau_spark.operators.similarity import cluster_balanced_sample

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = cluster_balanced_sample(emb, 5, k=4, iterations=1, seed_ids=[0, 1, 2, 3])
    rows = out.collect()
    per = {}
    for r in rows:
        per[r["cluster_id"]] = per.get(r["cluster_id"], 0) + 1
    assert all(c <= 5 for c in per.values())
    assert len(per) >= 2  # clusters actually form
    # deterministic draw: same set on rerun
    again = cluster_balanced_sample(emb, 5, k=4, iterations=1, seed_ids=[0, 1, 2, 3])
    assert sorted(r["vec_id"] for r in rows) == sorted(
        r["vec_id"] for r in again.collect()
    )
    # a small cluster below quota keeps all its members
    full = {r["cluster_id"]: 0 for r in rows}
    from plateau_spark.operators.similarity import kmeans_cluster

    assigned = kmeans_cluster(emb, k=4, iterations=1, seed_ids=[0, 1, 2, 3])
    sizes = {
        r["cluster_id"]: r["n"]
        for r in assigned.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    for cid, n in sizes.items():
        assert per.get(cid, 0) == min(n, 5)


# --- online dedup-on-ingest ---------------------------------------------------


def test_stream_ingest_dedup_cross_batch_first_write_wins(spark, tmp_path):
    """Two micro-batches with overlapping keys but DIFFERENT payloads:
    the committed dataset keeps the FIRST batch's row for every
    already-seen key — the dataset is the dedup state, so no watermark
    can expire it."""
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import read_table
    from plateau_spark.streaming.events import stream_ingest_dedup

    import glob
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(
        ([(1, "batch0"), (2, "batch0")], [(2, "batch1"), (3, "batch1")])
    ):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(
            str(stage)
        )
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{i}.parquet"))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = Store(str(tmp_path / "store"))
    q = stream_ingest_dedup(
        stream, store, "dd", key_cols="k",
        checkpoint_dir=str(tmp_path / "ck"), available_now=True,
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in read_table(spark, store, "dd").collect()}
    assert got == {1: "batch0", 2: "batch0", 3: "batch1"}

    # restart over the same checkpoint: nothing re-ingests
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q2 = stream_ingest_dedup(
        stream2, store, "dd", key_cols="k",
        checkpoint_dir=str(tmp_path / "ck"), available_now=True,
    )
    q2.awaitTermination(120)
    assert read_table(spark, store, "dd").count() == 3


@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
def test_stream_ingest_dedup_null_keys_never_match(spark, tmp_path):
    """ANSI NULL semantics (same contract as MERGE): NULL-keyed rows are
    never deduped — in-batch OR cross-batch — so the committed dataset
    is a function of the stream content, not of micro-batch boundaries."""
    import glob
    import shutil

    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import read_table
    from plateau_spark.streaming.events import stream_ingest_dedup

    src = tmp_path / "src"
    src.mkdir()
    batches = (
        [(1, "a"), (None, "x"), (None, "y")],
        [(1, "b"), (None, "z")],
    )
    for i, rows in enumerate(batches):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(
            str(stage)
        )
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{i}.parquet"))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = Store(str(tmp_path / "store"))
    q = stream_ingest_dedup(
        stream, store, "nk", key_cols="k",
        checkpoint_dir=str(tmp_path / "ck"), available_now=True,
    )
    q.awaitTermination(120)
    rows = sorted(
        ((r["k"], r["v"]) for r in read_table(spark, store, "nk").collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1]),
    )
    # k=1 deduped first-write-wins; EVERY NULL-key row survives
    assert rows == [(1, "a"), (None, "x"), (None, "y"), (None, "z")]


@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
def test_stream_ingest_dedup_key_index_tier(spark, tmp_path):
    """Round-9 scale tier: with ``key_index_dataset`` the sink
    anti-joins a NARROW keys-only side dataset instead of the corpus —
    O(total keys) bytes regardless of row width. Same dedup semantics
    (first write wins across batches); the side dataset holds every
    committed key exactly once and stays compactable."""
    import glob
    import shutil

    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import read_table
    from plateau_spark.streaming.events import stream_ingest_dedup

    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(
        ([(1, "b0"), (2, "b0")], [(2, "b1"), (3, "b1")])
    ):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(
            str(stage)
        )
        shutil.copy(
            glob.glob(str(stage / "part-*.parquet"))[0], str(src / f"{i}.parquet")
        )
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = Store(str(tmp_path / "store"))
    q = stream_ingest_dedup(
        stream, store, "dd", key_cols="k",
        checkpoint_dir=str(tmp_path / "ck"),
        key_index_dataset="dd_keys", available_now=True,
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in read_table(spark, store, "dd").collect()}
    assert got == {1: "b0", 2: "b0", 3: "b1"}
    # narrow side dataset: keys only, one row per committed key, with
    # its own pruning stats (zone maps on the long key)
    keys = read_table(spark, store, "dd_keys")
    assert keys.columns == ["k"]
    assert sorted(r["k"] for r in keys.collect()) == [1, 2, 3]
    kmeta = DatasetMetadata.load(store, "dd_keys")
    assert all("k" in p.stats for p in kmeta.partitions.values())


@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
def test_stream_ingest_dedup_key_index_compaction(spark, tmp_path):
    """The sink compacts its key index on the configured cadence:
    three micro-batches with compact_key_index_every=1 end with ONE
    key-index file (not one per batch), dedup stays exact, and the
    compacted index keeps its zone-map stats."""
    import glob
    import shutil

    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import read_table
    from plateau_spark.streaming.events import stream_ingest_dedup

    src = tmp_path / "src"
    src.mkdir()
    batches = [[(1, "a"), (2, "a")], [(2, "b"), (3, "b")], [(3, "c"), (4, "c")]]
    for i, rows in enumerate(batches):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(
            str(stage)
        )
        shutil.copy(
            glob.glob(str(stage / "part-*.parquet"))[0], str(src / f"{i}.parquet")
        )
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = Store(str(tmp_path / "store"))
    q = stream_ingest_dedup(
        stream, store, "dd", key_cols="k",
        checkpoint_dir=str(tmp_path / "ck"),
        key_index_dataset="dd_keys", compact_key_index_every=1,
        available_now=True,
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in read_table(spark, store, "dd").collect()}
    assert got == {1: "a", 2: "a", 3: "b", 4: "c"}
    kmeta = DatasetMetadata.load(store, "dd_keys")
    assert len(kmeta.partitions) == 1  # compacted after the last batch
    assert all("k" in p.stats for p in kmeta.partitions.values())
    assert sorted(
        r["k"] for r in read_table(spark, store, "dd_keys").collect()
    ) == [1, 2, 3, 4]


def test_gopher_signals_hand_computed(spark):
    from plateau_spark.operators.text import gopher_quality_signals

    df = spark.createDataFrame(
        [
            # 2 lines, one bulleted, one ellipsis-terminated; '##'
            (1, "- the cat sat on of mat ##\nand that dogs have fun with it ..."),
            # empty-ish doc
            (2, ""),
        ],
        "id long, text string",
    )
    row = {
        r["id"]: r
        for r in gopher_quality_signals(df, "id", "text").collect()
    }
    r1 = row[1]
    toks = "the cat sat on of mat and that dogs have fun with it".split()
    assert r1["word_count"] == len(toks) == 13
    assert r1["mean_word_len"] == round(sum(len(t) for t in toks) / 13, 6)
    assert r1["bullet_line_frac"] == 0.5
    assert r1["ellipsis_line_frac"] == 0.5
    # present from the Gopher set: the, of, and, that, have, with
    assert r1["stopword_hits"] == 6
    assert r1["alpha_word_frac"] == 1.0
    assert r1["gopher_keep"] == 0  # word_count < 50
    r2 = row[2]
    assert r2["word_count"] == 0
    assert r2["gopher_keep"] == 0


def test_gopher_keep_gate_passes_good_doc(spark):
    from plateau_spark.operators.text import gopher_quality_signals

    good = " ".join(
        ["the quick brown fox jumps over lazy dogs to be of and that have with it"] * 5
    )
    df = spark.createDataFrame([(1, good)], "id long, text string")
    r = gopher_quality_signals(df, "id", "text").collect()[0]
    assert r["word_count"] == 80
    assert r["stopword_hits"] == 8
    assert r["gopher_keep"] == 1


def test_gopher_signals_zero_shuffle_plan(spark):
    from plateau_spark.operators.text import gopher_quality_signals

    df = spark.range(10).select(
        F.col("id"), F.lit("the be to of words here").alias("text")
    )
    plan = gopher_quality_signals(df, "id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_remove_duplicate_spans_hand_computed(spark):
    from plateau_spark.operators.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one two three"),
            (2, "prefix words alpha beta gamma delta suffix tail"),
            (3, "alpha beta gamma delta"),  # exactly the span — fully covered
            (4, "totally different text with no duplicate runs"),
            (5, ""),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in remove_duplicate_spans(docs, "id", "text", k=4).collect()
    }
    # doc 1 holds the canonical (min (id,pos)) occurrence — kept whole
    assert out[1]["removed_tokens"] == 0
    assert out[1]["clean_text"] == "alpha beta gamma delta unique one two three"
    assert out[2]["removed_tokens"] == 4
    assert out[2]["clean_text"] == "prefix words suffix tail"
    # fully-covered doc must still emit a row, not vanish
    assert out[3]["total_tokens"] == 4
    assert out[3]["removed_tokens"] == 4
    assert out[3]["clean_text"] == ""
    assert out[4]["removed_tokens"] == 0
    assert out[5]["total_tokens"] == 0 and out[5]["clean_text"] == ""


def test_remove_duplicate_spans_within_doc_repeat(spark):
    from plateau_spark.operators.dedup import remove_duplicate_spans

    # the 3-gram "a b c" occurs twice INSIDE one document: the first
    # occurrence is canonical, the second is cut
    docs = spark.createDataFrame(
        [(1, "a b c x y z a b c")], "id long, text string"
    )
    r = remove_duplicate_spans(docs, "id", "text", k=3).collect()[0]
    assert r["total_tokens"] == 9
    assert r["removed_tokens"] == 3
    assert r["clean_text"] == "a b c x y z"


def test_remove_duplicate_spans_no_canonical_keeps_nothing(spark):
    from plateau_spark.operators.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in remove_duplicate_spans(
            docs, "id", "text", k=4, keep_canonical=False
        ).collect()
    }
    assert out[1]["removed_tokens"] == 4 and out[2]["removed_tokens"] == 4


def test_remove_duplicate_spans_short_docs_pass_through(spark):
    from plateau_spark.operators.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two")], "id long, text string"
    )
    out = remove_duplicate_spans(docs, "id", "text", k=4).collect()
    assert all(r["removed_tokens"] == 0 for r in out)


# --- JSONL shard export ------------------------------------------------------


def test_export_jsonl_roundtrip_and_manifest(spark, tmp_path):
    from plateau_spark.operators.export import export_with_manifest

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "shards")
    m = export_with_manifest(
        df, spark, path, key_col="doc_id", sig_cols=["doc_id", "text"],
        n_shards=4, compression=None,
    )
    rows = m.collect()
    assert sum(r["n_rows"] for r in rows) == 4
    assert all(r["n_files"] == 1 for r in rows)
    # every row re-reads intact (NULL and '' both survive the JSON trip)
    back = spark.read.schema("doc_id long, text string").json(path)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == {1: "alpha", 2: "beta", 3: None, 4: ""}


def test_export_layout_deterministic_across_runs(spark, tmp_path):
    from plateau_spark.operators.export import export_with_manifest

    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text")
    )
    a = export_with_manifest(
        df, spark, str(tmp_path / "a"), key_col="doc_id",
        sig_cols=["doc_id", "text"], n_shards=4, compression=None,
    ).orderBy("shard").collect()
    b = export_with_manifest(
        df, spark, str(tmp_path / "b"), key_col="doc_id",
        sig_cols=["doc_id", "text"], n_shards=4, compression=None,
    ).orderBy("shard").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_export_shard_read_partition_prunes(spark, tmp_path):
    from plateau_spark.operators.export import export_jsonl_shards

    df = spark.range(0, 40).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    path = str(tmp_path / "shards")
    export_jsonl_shards(df, path, key_col="doc_id", n_shards=4, compression=None)
    back = spark.read.schema("doc_id long, text string").json(path)
    one = back.where(F.col("shard") == 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # Hive-style shard dirs prune at plan time: the predicate lands in
    # PartitionFilters, not a post-scan Filter over all shards
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters")[1][:120]
    total = back.count()
    assert 0 < one.count() < total


def test_export_rejects_bad_args_and_existing_path(spark, tmp_path):
    from plateau_spark.operators.export import export_jsonl_shards

    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="n_shards"):
        export_jsonl_shards(df, str(tmp_path / "x"), key_col="doc_id", n_shards=0)
    p = str(tmp_path / "dup")
    export_jsonl_shards(df, p, key_col="doc_id", n_shards=2, compression=None)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        export_jsonl_shards(df, p, key_col="doc_id", n_shards=2, compression=None)


# --- JL random sign projection ----------------------------------------------


def test_random_projection_preserves_cosine_structure(spark):
    """JL property: after 64→16 sign projection, the nearest neighbor
    of a vector among {near-duplicate, unrelated} must stay the
    near-duplicate for the overwhelming majority of test vectors."""
    import numpy as np

    from plateau_spark.operators.similarity import random_project_embeddings

    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, 64))
    near = base + rng.normal(scale=0.05, size=(30, 64))
    far = rng.normal(size=(30, 64))
    rows = []
    for i in range(30):
        rows += [(i * 3, base[i].tolist()), (i * 3 + 1, near[i].tolist()),
                 (i * 3 + 2, far[i].tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: np.array(r["projected"]) for r in
           random_project_embeddings(df, "vec_id", "embedding", dim_out=16,
                                     round_digits=None).collect()}
    wins = 0
    for i in range(30):
        b, n, f = out[i * 3], out[i * 3 + 1], out[i * 3 + 2]
        cos = lambda a, c: float(a @ c / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-12))  # noqa: E731
        if cos(b, n) > cos(b, f):
            wins += 1
    assert wins >= 27  # ≥90% — sign-JL at 16 dims keeps neighbors


def test_random_projection_deterministic_and_validated(spark):
    from plateau_spark.operators.similarity import random_project_embeddings

    df = spark.createDataFrame(
        [(1, [float(i) for i in range(8)])], "vec_id long, embedding array<double>"
    )
    a = random_project_embeddings(df, "vec_id", "embedding", dim_out=4).collect()
    b = random_project_embeddings(df, "vec_id", "embedding", dim_out=4).collect()
    assert a == b
    with pytest.raises(ValueError, match="dim_out"):
        random_project_embeddings(df, "vec_id", "embedding", dim_out=0)
    # length mismatch fails loudly
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError)):
        random_project_embeddings(bad, "vec_id", "embedding", dim_out=2).collect()


def test_random_projection_zero_shuffle_plan(spark):
    from plateau_spark.operators.similarity import random_project_embeddings

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = random_project_embeddings(df, "vec_id", "embedding", dim_out=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_duplicate_span_stats_hand_computed(spark):
    from plateau_spark.operators.dedup import duplicate_span_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d tail one"),
            (2, "x y a b c d more"),
            (3, "a b c d a b c d"),  # 2 occurrences in one doc
        ],
        "id long, text string",
    )
    out = {r["span"]: r for r in duplicate_span_stats(docs, "id", "text", k=4).collect()}
    s = out["a b c d"]
    assert s["n_occurrences"] == 4 and s["n_docs"] == 3
    # spans occurring once never appear
    assert "x y a b" not in out


def test_duplicate_span_stats_top_n_plan(spark):
    from plateau_spark.operators.dedup import duplicate_span_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = duplicate_span_stats(docs, "doc_id", "text", k=3, top=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-N, no global sort
    rows = out.collect()
    assert len(rows) <= 10
    occ = [r["n_occurrences"] for r in rows]
    assert occ == sorted(occ, reverse=True)


@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
def test_remove_duplicate_spans_fuzz_vs_python_twin(spark):
    """Property fuzz: the distributed span-removal pipeline must agree
    with a direct single-process implementation of the spec on random
    small corpora (small vocab forces heavy span collisions)."""
    import random

    def twin(docs, k):
        toks = {i: [w for w in t.lower().strip().split() if w] for i, t in docs}
        occ = {}
        for i, tk in toks.items():
            for p in range(max(len(tk) - k, -1) + 1):
                if len(tk) >= k:
                    occ.setdefault(tuple(tk[p:p + k]), []).append((i, p))
        covered = {i: set() for i, _ in docs}
        for g, places in occ.items():
            if len(places) > 1:
                first = min(places)
                for (i, p) in places:
                    if (i, p) != first:
                        covered[i].update(range(p, p + k))
        out = {}
        for i, tk in toks.items():
            kept = [w for j, w in enumerate(tk) if j not in covered[i]]
            out[i] = (len(tk), len(tk) - len(kept), " ".join(kept))
        return out

    from plateau_spark.operators.dedup import remove_duplicate_spans

    rng = random.Random(42)
    vocab = ["aa", "bb", "cc", "dd"]
    for trial in range(5):
        k = rng.choice([2, 3])
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 10))))
            for i in range(rng.randint(2, 7))
        ]
        expect = twin(docs, k)
        df = spark.createDataFrame(docs, "id long, text string")
        got = {
            r["id"]: (r["total_tokens"], r["removed_tokens"], r["clean_text"])
            for r in remove_duplicate_spans(df, "id", "text", k=k).collect()
        }
        assert got == expect, f"trial {trial} k={k} docs={docs}"


def test_export_jsonl_escapes_hostile_text(spark, tmp_path):
    """Newlines, quotes, backslashes and non-ASCII must survive the
    JSONL round trip — a raw newline would split a record in half."""
    from plateau_spark.operators.export import export_with_manifest

    hostile = [
        (1, 'line one\nline "two"\ttabbed'),
        (2, "back\\slash and emoji é中"),
        (3, "{\"fake\": \"json\"}"),
    ]
    df = spark.createDataFrame(hostile, "doc_id long, text string")
    path = str(tmp_path / "shards")
    m = export_with_manifest(
        df, spark, path, key_col="doc_id", sig_cols=["doc_id", "text"],
        n_shards=2, compression=None,
    )
    assert sum(r["n_rows"] for r in m.collect()) == 3
    back = spark.read.schema("doc_id long, text string").json(path)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(hostile)


def test_keep_representatives_by_score(spark):
    from plateau_spark.operators.dedup import dedup_keep_representatives

    df = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0), (9, 7.0)],
        "id long, q double",
    )
    # chain 1~2~3 one cluster; 4 alone-paired with nobody; 9 unpaired
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    best = sorted(
        r["id"]
        for r in dedup_keep_representatives(
            df, pairs, "id", score_col="q", best="max"
        ).collect()
    )
    assert best == [3, 4, 9]  # 9.0 tie between 2 and 3 → larger id
    worst = sorted(
        r["id"]
        for r in dedup_keep_representatives(
            df, pairs, "id", score_col="q", best="min"
        ).collect()
    )
    assert worst == [1, 4, 9]  # min score 5.0 in cluster {1,2,3}
    default = sorted(
        r["id"] for r in dedup_keep_representatives(df, pairs, "id").collect()
    )
    assert default == [1, 4, 9]  # min-id policy unchanged
    with pytest.raises(ValueError, match="best"):
        dedup_keep_representatives(df, pairs, "id", score_col="q", best="median")


def test_keep_representatives_null_scores_lose(spark):
    from plateau_spark.operators.dedup import dedup_keep_representatives

    df = spark.createDataFrame(
        [(1, None), (2, 3.0), (10, None), (11, None)],
        "id long, q double",
    )
    pairs = spark.createDataFrame([(1, 2), (10, 11)], "id_a long, id_b long")
    for best in ("max", "min"):
        kept = sorted(
            r["id"]
            for r in dedup_keep_representatives(
                df, pairs, "id", score_col="q", best=best
            ).collect()
        )
        # cluster {1,2}: 2 (the only scored member) wins either way;
        # cluster {10,11}: all-null still keeps exactly one (by id)
        assert kept[0] == 2 and len(kept) == 2 and kept[1] in (10, 11)


def test_shard_manifest_detects_corruption(spark, tmp_path):
    """The manifest is a verification artifact: silently corrupting one
    row in one shard file must change that shard's signature (and only
    that shard's)."""
    import glob

    from plateau_spark.operators.export import export_jsonl_shards, shard_manifest

    df = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("text"),
    )
    path = str(tmp_path / "shards")
    export_jsonl_shards(df, path, key_col="doc_id", n_shards=4, compression=None)
    before = {
        r["shard"]: (r["n_rows"], r["sig_sum"], r["sig_xor"])
        for r in shard_manifest(
            spark, path, "doc_id long, text string", ["doc_id", "text"]
        ).collect()
    }
    victim = sorted(glob.glob(path + "/shard=2/*.json"))[0]
    lines = open(victim).read().splitlines()
    # SIZE-PRESERVING corruption — undetectable by file length or count
    lines[0] = lines[0].replace("payload-", "paXload-")
    open(victim, "w").write("\n".join(lines) + "\n")
    # drop Hadoop's local .crc sidecar: it would catch the rewrite
    # first — the point here is corruption the transport layer misses
    import os

    crc = os.path.join(os.path.dirname(victim), "." + os.path.basename(victim) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    spark.catalog.refreshByPath(path)
    after = {
        r["shard"]: (r["n_rows"], r["sig_sum"], r["sig_xor"])
        for r in shard_manifest(
            spark, path, "doc_id long, text string", ["doc_id", "text"]
        ).collect()
    }
    assert after[2] != before[2]          # tampering detected
    assert after[2][0] == before[2][0]    # same row count — sigs did the work
    for s in (0, 1, 3):
        assert after[s] == before[s]      # other shards untouched


def test_script_profile_hand_computed(spark):
    from plateau_spark.operators.text import script_profile

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "привет мир hello"), (3, "漢字テスト 123"),
         (4, "!!! 123"), (5, "مرحبا")],
        "id long, text string",
    )
    out = {r["id"]: r for r in script_profile(df, "id", "text").collect()}
    assert out[1]["dominant"] == "latin" and out[1]["latin_frac"] == 1.0
    # 9 cyrillic vs 5 latin letters of 14
    assert out[2]["dominant"] == "cyrillic"
    assert out[2]["cyrillic_frac"] == round(9 / 14, 6)
    # katakana letters count in n_letters but belong to no tracked script
    assert out[3]["n_letters"] == 5 and out[3]["han_frac"] == 0.4
    assert out[3]["dominant"] == "han"
    assert out[4]["n_letters"] == 0 and out[4]["dominant"] == "none"
    assert out[5]["dominant"] == "arabic"
    with pytest.raises(ValueError, match="unknown scripts"):
        script_profile(df, "id", "text", scripts=("latin", "klingon"))


def test_script_profile_zero_shuffle(spark):
    from plateau_spark.operators.text import script_profile

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = script_profile(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_span_novelty_hand_computed(spark):
    from plateau_spark.operators.dedup import span_novelty_scores

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one"),   # 3 spans, 2 novel
            (2, "x y alpha beta gamma delta"),          # 3 spans, 2 novel
            (3, "one two"),                             # too short: 0 spans
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in span_novelty_scores(docs, "id", "text", k=4).collect()}
    # "alpha beta gamma delta" occurs in docs 1 and 2 → non-novel there
    assert out[1]["n_spans"] == 3 and out[1]["novel_spans"] == 2
    assert out[1]["novelty"] == round(2 / 3, 6)
    assert out[2]["n_spans"] == 3 and out[2]["novel_spans"] == 2
    assert out[3]["n_spans"] == 0 and out[3]["novelty"] is None


def test_span_novelty_rises_after_span_dedup(spark):
    """The before/after contract: removing duplicate spans then
    re-scoring must not lower any document's novelty."""
    from plateau_spark.operators.dedup import (
        remove_duplicate_spans,
        span_novelty_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f tail"), (2, "pre a b c d e f"), (3, "a b c d e f")],
        "id long, text string",
    )
    before = {r["id"]: r["novelty"] for r in
              span_novelty_scores(docs, "id", "text", k=4).collect()}
    cleaned = remove_duplicate_spans(docs, "id", "text", k=4).select(
        "id", F.col("clean_text").alias("text")
    )
    after = {r["id"]: r["novelty"] for r in
             span_novelty_scores(cleaned, "id", "text", k=4).collect()}
    for i, b in before.items():
        a = after.get(i)
        if a is not None and b is not None:
            assert a >= b


def test_weighted_quota_equals_single_window_and_is_deterministic(spark):
    from plateau_spark.operators.sampling import weighted_quota_sample
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        r["doc_id"]
        for r in weighted_quota_sample(
            docs, ["lang"], 7, key_col="doc_id", weight_col="n_chars"
        ).collect()
    )
    # single-window reference formulation
    h = F.conv(
        F.substring(F.md5(F.encode(F.concat_ws("|", F.lit("wquota"),
            F.col("doc_id").cast("string")), "UTF-8")), 1, 8), 16, 10
    ).cast("double")
    es = -F.log((h + F.lit(0.5)) / F.lit(4294967296.0)) / F.col("n_chars").cast("double")
    w = Window.partitionBy("lang").orderBy(es.asc(), F.col("doc_id").asc())
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("n_chars") > 0)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 7)
        .collect()
    )
    assert got == want
    again = sorted(
        r["doc_id"]
        for r in weighted_quota_sample(
            docs, ["lang"], 7, key_col="doc_id", weight_col="n_chars"
        ).collect()
    )
    assert again == got


def test_weighted_quota_prefers_heavy_rows(spark):
    """Statistical property: with weights 100 vs 1, heavy rows must win
    far more of the per-group slots (deterministic given the salt)."""
    from plateau_spark.operators.sampling import weighted_quota_sample

    rows = [(g * 1000 + i, f"g{g}", 100.0 if i < 10 else 1.0)
            for g in range(20) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    kept = weighted_quota_sample(df, ["g"], 5, key_col="id", weight_col="w").collect()
    heavy = sum(1 for r in kept if r["w"] == 100.0)
    assert len(kept) == 100
    assert heavy >= 80  # ~91 expected; uniform would give ~50


def test_weighted_quota_excludes_nonpositive_weights(spark):
    from plateau_spark.operators.sampling import weighted_quota_sample

    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 0.0), (3, "g", -1.0), (4, "g", None)],
        "id long, g string, w double",
    )
    kept = [r["id"] for r in
            weighted_quota_sample(df, ["g"], 10, key_col="id", weight_col="w").collect()]
    assert kept == [1]


def _wav(samples):
    import struct

    body = b"".join(struct.pack("<h", s) for s in samples)
    return (
        b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(body).to_bytes(4, "little") + body
    )


def test_audio_fingerprint_hand_computed(spark):
    from plateau_spark.operators.multimodal import audio_fingerprint

    # bits=3 → 4 windows; with 8 samples, 2 per window.
    # energies: [1+1, 100²+100², 1+1, 200²+200²] → rising,falling,rising = 0b101
    quiet, loud, louder = [1, 1], [100, 100], [200, 200]
    df = spark.createDataFrame(
        [(1, bytearray(_wav(quiet + loud + quiet + louder))),
         (2, bytearray(b"not a wav")),
         (3, bytearray(_wav([5])))],  # too short for 4 windows
        "media_id long, payload binary",
    )
    rows = audio_fingerprint(df, bits=3).collect()
    assert len(rows) == 1 and rows[0]["media_id"] == 1
    assert rows[0]["afp"] == 0b101 and rows[0]["bits"] == 3


def test_audio_fingerprint_gain_invariant_and_pairs(spark):
    """Scaling the whole clip (volume change) preserves the contour
    fingerprint; dhash_dup_pairs finds the pair at hamming 0."""
    from plateau_spark.operators.multimodal import (
        audio_fingerprint,
        dhash_dup_pairs,
    )

    base = [1, 2, 50, 60, 3, 1, 90, 80, 2, 2, 120, 110, 4, 3]
    half = [s // 2 for s in base]
    noise = [7, 1, 2, 1, 3, 2, 1, 2, 1, 1, 2, 1, 1, 1]
    df = spark.createDataFrame(
        [(1, bytearray(_wav(base))), (2, bytearray(_wav(half))),
         (3, bytearray(_wav(noise)))],
        "media_id long, payload binary",
    )
    fps = audio_fingerprint(df, bits=6)
    got = {r["media_id"]: r["afp"] for r in fps.collect()}
    assert got[1] == got[2]  # gain-invariant contour
    pairs = dhash_dup_pairs(fps, hash_col="afp", bits=6, max_hamming=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]
