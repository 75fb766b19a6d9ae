"""Round-6 pipeline operators: SemDeDup keep-set, Bloom-prefilter
decontamination, hashed linear classifier scoring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --- semantic_dedup_keep ----------------------------------------------------


@pytest.fixture(scope="module")
def vecs(spark):
    # 0/1 are near-duplicates of each other, 2 duplicates 0, 3/4 distinct
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (2, [1.0, 0.001, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_exact_keeps_first(spark, vecs):
    from plateau_spark.operators.similarity import semantic_dedup_keep

    out = semantic_dedup_keep(vecs, threshold=0.99, method="exact")
    kept = sorted(r["vec_id"] for r in out.collect())
    # 1 and 2 are within 0.99 of the lower-id 0 -> dropped; 0/3/4 survive
    assert kept == [0, 3, 4]
    # all original columns preserved
    assert out.columns == ["vec_id", "embedding"]


def test_semdedup_lsh_superset_of_exact(spark, vecs):
    """LSH can only MISS pairs (false negatives), never invent them, so
    its keep-set is a superset of the exact tier's."""
    from plateau_spark.operators.similarity import semantic_dedup_keep

    exact = {
        r["vec_id"]
        for r in semantic_dedup_keep(vecs, threshold=0.99, method="exact").collect()
    }
    lsh = {
        r["vec_id"]
        for r in semantic_dedup_keep(
            vecs, threshold=0.99, method="lsh", bucket_bits=2
        ).collect()
    }
    assert exact <= lsh


def test_semdedup_rejects_unknown_method(vecs):
    from plateau_spark.operators.similarity import semantic_dedup_keep

    with pytest.raises(ValueError, match="method"):
        semantic_dedup_keep(vecs, method="annoy")


def test_semdedup_no_dups_is_identity(spark):
    from plateau_spark.operators.similarity import semantic_dedup_keep

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    assert semantic_dedup_keep(df, threshold=0.99, method="exact").count() == 2


# --- ngram_overlap_vs_eval_bloom --------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    from plateau_spark.entry_queries import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents").limit(120).cache()


def test_bloom_equals_exact(spark, corpus):
    """The Bloom tier is exact by construction (no false negatives +
    exact verification of the candidates): identical output to the
    broadcast-string-set tier on every row."""
    from plateau_spark.operators.dedup import (
        ngram_overlap_vs_eval,
        ngram_overlap_vs_eval_bloom,
    )

    train = corpus.where(F.col("doc_id") % 10 != 0)
    ev = corpus.where(F.col("doc_id") % 10 == 0)
    exact = ngram_overlap_vs_eval(train, ev, "doc_id", "text", n=3, threshold=0.2)
    bloom = ngram_overlap_vs_eval_bloom(
        train, ev, "doc_id", "text", n=3, threshold=0.2, n_bits=1 << 18
    )
    assert sorted(exact.collect()) == sorted(bloom.collect())


def test_bloom_tiny_filter_still_exact(spark, corpus):
    """Even a saturated 1-Kbit filter (near-100% false-positive rate)
    yields exact results — the verify join does the real work; the
    filter only controls how much reaches it."""
    from plateau_spark.operators.dedup import (
        ngram_overlap_vs_eval,
        ngram_overlap_vs_eval_bloom,
    )

    train = corpus.where(F.col("doc_id") % 10 != 0).limit(20)
    ev = corpus.where(F.col("doc_id") % 10 == 0).limit(5)
    exact = ngram_overlap_vs_eval(train, ev, "doc_id", "text")
    bloom = ngram_overlap_vs_eval_bloom(train, ev, "doc_id", "text", n_bits=1 << 10)
    assert sorted(exact.collect()) == sorted(bloom.collect())


def test_bloom_empty_eval(spark, corpus):
    from plateau_spark.operators.dedup import ngram_overlap_vs_eval_bloom

    train = corpus.limit(10)
    ev = corpus.where(F.lit(False))
    out = ngram_overlap_vs_eval_bloom(train, ev, "doc_id", "text").collect()
    assert len(out) == 10
    assert all(r["overlap_fraction"] == 0.0 and r["contaminated"] == 0 for r in out)


# --- classifier_score -------------------------------------------------------


def test_classifier_trained_weights_path(spark):
    """Broadcast weights table: score is sigmoid(mean bucket weight ×
    scale); buckets absent from the table contribute 0."""
    from plateau_spark.operators.text import classifier_score, _hashed_features_col

    df = spark.createDataFrame(
        [(1, "good clean text"), (2, "")], "doc_id long, text string"
    )
    buckets = [
        r["b"]
        for r in df.where(F.col("doc_id") == 1)
        .select(F.explode(_hashed_features_col("text", 64)).alias("b"))
        .collect()
    ]
    # weight every observed bucket 0.25 -> mean 0.25 -> logit 0.25*8 = 2
    w = spark.createDataFrame([(b, 0.25) for b in set(buckets)], "bucket long, weight double")
    out = {
        r["doc_id"]: (r["quality_prob"], r["label"])
        for r in classifier_score(df, "doc_id", "text", n_buckets=64, weights=w).collect()
    }
    assert out[1][0] == pytest.approx(1 / (1 + math.exp(-2.0)), abs=1e-6)
    assert out[1][1] == 1
    # empty doc: no features -> logit 0 -> 0.5, label fires at >= 0.5
    assert out[2][0] == pytest.approx(0.5)
    assert out[2][1] == 1


def test_classifier_derived_weights_deterministic(spark):
    from plateau_spark.operators.text import classifier_score

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")],
        "doc_id long, text string",
    )
    out = classifier_score(df, "doc_id", "text").collect()
    scores = {r["doc_id"]: r["quality_prob"] for r in out}
    assert scores[1] == scores[2]  # pure function of the text
    assert all(0.0 <= s <= 1.0 for s in scores.values())


# --- dedup_keep_representatives ---------------------------------------------


def test_keep_representatives_transitive_chain(spark):
    """A~B~C chain: keep-representatives keeps only A, even though A and
    C never paired directly (transitive-closure semantics)."""
    from plateau_spark.operators.dedup import dedup_keep_representatives

    df = spark.createDataFrame([(i, f"doc{i}") for i in range(5)], "id long, t string")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    kept = sorted(
        r["id"] for r in dedup_keep_representatives(df, pairs, "id").collect()
    )
    assert kept == [0, 3, 4]


def test_keep_representatives_empty_pairs_is_identity(spark):
    from plateau_spark.operators.dedup import dedup_keep_representatives

    df = spark.createDataFrame([(i, "x") for i in range(4)], "id long, t string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_keep_representatives(df, pairs, "id").count() == 4


# --- contaminated_by_substring ----------------------------------------------


def test_substring_decontamination_flags_verbatim(spark):
    from plateau_spark.operators.dedup import contaminated_by_substring

    train = spark.createDataFrame(
        [
            (1, "a long document that embeds THE SECRET EVAL ANSWER STRING here"),
            (2, "a perfectly clean training document with original content"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [("THE SECRET EVAL ANSWER STRING",), ("short",)], "snippet string"
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in contaminated_by_substring(
            train, ev, "doc_id", "text", eval_text_col="snippet", min_len=20
        ).collect()
    }
    # "short" is below min_len and never tested; only doc 1 hits
    assert out == {1: 1, 2: 0}


def test_substring_decontamination_eval_size_guard(spark):
    from plateau_spark.operators.dedup import contaminated_by_substring

    train = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(f"needle string number {i:06d} padded",) for i in range(30)], "s string"
    )
    with pytest.raises(ValueError, match="max_eval_strings"):
        contaminated_by_substring(
            train, ev, "doc_id", "text", eval_text_col="s", max_eval_strings=10
        )


def test_substring_decontamination_empty_eval(spark):
    from plateau_spark.operators.dedup import contaminated_by_substring

    train = spark.createDataFrame([(1, "anything")], "doc_id long, text string")
    ev = spark.createDataFrame([], "s string")
    out = contaminated_by_substring(
        train, ev, "doc_id", "text", eval_text_col="s"
    ).collect()
    assert [(r["doc_id"], r["contaminated"]) for r in out] == [(1, 0)]


# --- hot-key-safe dedup / quota (round-6 scale hardening) --------------------


def test_exact_dedup_tiebreak_no_window(spark):
    """The tie-breaker pick must be a map-side-combined aggregate, not a
    window sort (hot-key straggler shape)."""
    from plateau_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, 5, "a"), (1, 3, "b"), (2, 9, "c")], "k long, tb long, v string"
    )
    out = exact_dedup(df, ["k"], tie_breaker="tb")
    assert sorted(out.collect()) == [(1, 3, "b"), (2, 9, "c")]
    assert out.columns == ["k", "tb", "v"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # map-side partial combine, no single-task-per-key window sort
    assert "Window" not in plan and "partial_min" in plan


def test_keep_last_no_window_and_matches_reference_rule(spark):
    from plateau_spark.operators.dedup import drop_duplicates_keep_last

    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        "k long, ts long, v string",
    )
    out = drop_duplicates_keep_last(df, ["k"], ["ts"])
    assert sorted(out.collect()) == [(1, 20, "new"), (2, 5, "only")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "partial_max" in plan


def test_keep_last_map_column_falls_back_to_window(spark):
    """Map columns are not struct-orderable: the window fallback must
    engage and still return the right rows."""
    from plateau_spark.operators.dedup import drop_duplicates_keep_last

    df = spark.createDataFrame(
        [(1, 10, {"a": 1}), (1, 20, {"b": 2})],
        "k long, ts long, m map<string,int>",
    )
    out = drop_duplicates_keep_last(df, ["k"], ["ts"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["ts"] == 20 and rows[0]["m"] == {"b": 2}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan


def test_quota_tournament_equals_single_window(spark):
    """The two-level tournament must return EXACTLY the single-window
    result set (global top-quota ⊆ union of per-bucket top-quotas)."""
    from pyspark.sql import Window
    from plateau_spark.operators.sampling import _hash_unit, quota_sample

    rows = [(i, "g" + str(i % 3)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, g string")
    out = sorted(quota_sample(df, ["g"], 40, key_col="k").collect())
    w = Window.partitionBy("g").orderBy(
        _hash_unit("k", "quota").asc(), F.col("k").asc()
    )
    ref = sorted(
        df.withColumn("__rk__", F.row_number().over(w))
        .where(F.col("__rk__") <= 40)
        .drop("__rk__")
        .collect()
    )
    assert out == ref
    counts = [
        r["c"]
        for r in quota_sample(df, ["g"], 40, key_col="k")
        .groupBy("g")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    assert all(c == 40 for c in counts)


# --- randomized differential checks (fixed seed, numpy reference) -----------


def test_semdedup_exact_matches_numpy_reference(spark):
    """Exact-tier keep-set vs a numpy brute-force of the keep-first rule
    over 80 clustered random vectors."""
    import numpy as np
    from plateau_spark.operators.similarity import semantic_dedup_keep

    rng = np.random.RandomState(7)
    centers = rng.randn(8, 16)
    V = np.vstack(
        [c + 0.02 * rng.randn(10, 16) for c in centers]  # 8 tight clusters
    )
    order = rng.permutation(len(V))
    V = V[order]
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<float>",
    )
    thr = 0.98
    Vf = V.astype(np.float32).astype(np.float64)  # match array<float> storage
    N = Vf / np.linalg.norm(Vf, axis=1, keepdims=True)
    G = N @ N.T
    expect = {
        i
        for i in range(len(V))
        if not any(G[i, j] >= thr for j in range(i))
    }
    got = {
        r["vec_id"]
        for r in semantic_dedup_keep(df, threshold=thr, method="exact").collect()
    }
    assert got == expect


def test_bloom_equals_exact_randomized(spark):
    """Bloom tier vs exact tier over synthetic texts engineered for
    heavy cross-doc n-gram sharing (boilerplate + shared vocab)."""
    import numpy as np
    from plateau_spark.operators.dedup import (
        ngram_overlap_vs_eval,
        ngram_overlap_vs_eval_bloom,
    )

    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(40)]
    boiler = "all rights reserved contact us for details"
    rows = []
    for i in range(60):
        words = [vocab[j] for j in rng.randint(0, len(vocab), 25)]
        text = " ".join(words) + (" " + boiler if i % 3 == 0 else "")
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    train = docs.where(F.col("doc_id") % 5 != 0)
    ev = docs.where(F.col("doc_id") % 5 == 0)
    exact = ngram_overlap_vs_eval(train, ev, "doc_id", "text", n=3, threshold=0.15)
    bloom = ngram_overlap_vs_eval_bloom(
        train, ev, "doc_id", "text", n=3, threshold=0.15, n_bits=1 << 14
    )
    assert sorted(exact.collect()) == sorted(bloom.collect())


# --- winnowing fingerprints -------------------------------------------------


def _ref_winnow(text: str, k: int = 8, w: int = 4) -> set[str]:
    """Pure-Python reference of the winnowing pipeline (hashlib md5 —
    independent of both Spark and DuckDB)."""
    import hashlib
    import re

    t = re.sub("[^a-z0-9]+", " ", (text or "").strip().lower())
    grams = [
        hashlib.md5(t[i : i + k].encode()).hexdigest()[:8]
        for i in range(max(len(t) - k + 1, 1))
    ]
    return {min(grams[j : j + w]) for j in range(max(len(grams) - w + 1, 1))}


def test_winnow_matches_python_reference(spark):
    import random

    from plateau_spark.operators.text import winnow_fingerprints

    rng = random.Random(17)
    vocab = [f"tok{i}" for i in range(50)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60))))
        for i in range(40)
    ] + [(40, ""), (41, "ab"), (42, None), (43, "  Mixed CASE, punct!! ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: set(r["fingerprints"])
        for r in winnow_fingerprints(docs, "doc_id", "text").collect()
    }
    assert set(out) == {r[0] for r in rows}
    for doc_id, text in rows:
        assert out[doc_id] == _ref_winnow(text), f"doc {doc_id}"


def test_winnow_shared_substring_guarantee(spark):
    """The winnowing guarantee: documents sharing a substring of length
    >= k + w - 1 (after normalization) share >= 1 fingerprint."""
    from plateau_spark.operators.text import winnow_fingerprints

    passage = "the rain in spain falls mainly on the plain"
    rows = [
        (0, "intro words before " + passage),
        (1, passage + " and then entirely different trailing content here"),
        (2, "no overlap with anything else zzz qqq vvv www"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r["doc_id"]: set(r["fingerprints"])
        for r in winnow_fingerprints(docs, "doc_id", "text", k=8, w=4).collect()
    }
    assert fps[0] & fps[1], "shared passage must yield a shared fingerprint"
    assert not (fps[0] & fps[2])
    assert not (fps[1] & fps[2])


def test_winnow_overlap_pairs_finds_copied_passage(spark):
    from plateau_spark.operators.dedup import winnow_overlap_pairs

    passage = (
        "copyright is not claimed on this long shared passage which is "
        "verbatim identical across the two documents that embed it"
    )
    rows = [
        (0, "first document unique prefix " + passage),
        (1, passage + " second document unique suffix content"),
        (2, "completely different prose about gardening and tomatoes"),
        (3, "astronomy telescopes observing remote planets and stars"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fingerprints"]
        for r in winnow_overlap_pairs(
            docs, "doc_id", "text", min_shared=2, max_fp_df=None
        ).collect()
    }
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)


def test_winnow_hot_fingerprint_cap_drops_boilerplate(spark):
    """A fingerprint present in > max_fp_df docs must not generate
    candidate pairs (the hot-key guard that bounds the self-join)."""
    from plateau_spark.operators.dedup import winnow_overlap_pairs

    import hashlib

    boiler = "all rights reserved terms of service privacy policy contact"
    # unique halves are md5 gibberish so no two docs share a k-gram
    # outside the boilerplate
    rows = [
        (
            i,
            hashlib.md5(f"a{i}".encode()).hexdigest()
            + " "
            + hashlib.md5(f"b{i}".encode()).hexdigest()
            + " "
            + boiler,
        )
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = winnow_overlap_pairs(
        docs, "doc_id", "text", min_shared=1, max_fp_df=None
    ).count()
    capped = winnow_overlap_pairs(
        docs, "doc_id", "text", min_shared=1, max_fp_df=5
    ).count()
    assert uncapped > 0
    assert capped == 0


# --- embedding quantization -------------------------------------------------


def test_quantize_reconstruction_error_bounded(spark):
    """Dequantized values must be within scale/2 of the originals, and
    every quantized level within the int8 range."""
    import numpy as np

    from plateau_spark.operators.similarity import quantize_embeddings

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df, "vec_id", "embedding").collect()}
    for vec_id, vec in rows:
        scale, qvec = out[vec_id]["scale"], out[vec_id]["qvec"]
        # float32 storage rounds the input; compare against that
        v32 = np.asarray(vec, dtype=np.float32).astype(np.float64)
        assert max(abs(q) for q in qvec) <= 127
        recon = np.asarray(qvec, dtype=np.float64) * scale
        assert np.max(np.abs(recon - v32)) <= scale / 2 + 1e-12
        # numpy twin of the exact rule: floor(v/scale + 0.5)
        expect = np.floor(v32 / scale + 0.5).astype(int)
        assert list(expect) == list(qvec)


def test_quantize_zero_vector_guard(spark):
    from plateau_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df, "vec_id", "embedding").collect()}
    assert rows[0]["scale"] == 0.0
    assert rows[0]["qvec"] == [0, 0, 0]
    assert rows[1]["qvec"][1] == -127  # max-|v| element hits the full level


# --- stratified sampling ----------------------------------------------------


def test_stratified_sample_fractions_and_determinism(spark):
    from plateau_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id long, lang string",
    )
    out1 = stratified_sample(
        df, ["lang"], {"en": 0.5, "de": 0.1}, key_col="doc_id"
    )
    got1 = sorted(r["doc_id"] for r in out1.collect())
    got2 = sorted(r["doc_id"] for r in out1.collect())
    assert got1 == got2  # pure function of the key
    by_lang = {
        r["lang"]: r["c"]
        for r in out1.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    assert 400 <= by_lang.get("en", 0) <= 600  # ~0.5 of 1000
    assert 50 <= by_lang.get("de", 0) <= 160  # ~0.1 of 1000


def test_stratified_sample_default_fraction_and_full_keep(spark):
    from plateau_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(300)],
        "doc_id long, lang string",
    )
    out = stratified_sample(
        df, ["lang"], {"en": 1.0}, key_col="doc_id", default_fraction=0.0
    )
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en"}
    assert out.count() == 100  # fraction 1.0 keeps the whole stratum


def test_stratified_sample_null_group_key(spark):
    from plateau_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "en")], "doc_id long, lang string"
    )
    out = stratified_sample(
        df, ["lang"], {None: 1.0}, key_col="doc_id", default_fraction=0.0
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


def test_stratified_sample_arity_error(spark):
    import pytest as _pytest

    from plateau_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([(1, "en", "web")], "id long, lang string, src string")
    with _pytest.raises(ValueError, match="arity"):
        stratified_sample(df, ["lang", "src"], {"en": 0.5}, key_col="id")


# --- quality tiers ----------------------------------------------------------


def test_quality_tiers_exact_cdf_split(spark):
    from plateau_spark.operators.sampling import quality_tiers

    # 1000 distinct buckets, uniform: head = top 100 scores exactly
    df = spark.createDataFrame(
        [(i, i / 1000.0) for i in range(1000)], "id long, score double"
    )
    out = {r["id"]: r["tier"] for r in quality_tiers(df, "score").collect()}
    assert all(out[i] == "head" for i in range(900, 1000))
    assert all(out[i] == "middle" for i in range(500, 900))
    assert all(out[i] == "tail" for i in range(500))


def test_quality_tiers_tie_bucket_is_atomic(spark):
    from plateau_spark.operators.sampling import quality_tiers

    # 50% of rows share the top score: its bucket's cf = 0.5 > 0.1, so
    # the WHOLE bucket lands in middle — ties never straddle a boundary.
    rows = [(i, 0.9) for i in range(50)] + [(50 + i, i / 1000.0) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, score double")
    out = {r["id"]: r["tier"] for r in quality_tiers(df, "score").collect()}
    assert {out[i] for i in range(50)} == {"middle"}


def test_quality_tiers_bad_boundaries(spark):
    import pytest as _pytest

    from plateau_spark.operators.sampling import quality_tiers

    df = spark.createDataFrame([(1, 0.5)], "id long, score double")
    with _pytest.raises(ValueError, match="end at boundary"):
        quality_tiers(df, "score", tiers=[("head", 0.3)])


# --- unigram LM scoring -----------------------------------------------------


def test_unigram_logprob_hand_computed(spark):
    import math

    from plateau_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b"), (3, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["nll"] for r in unigram_logprob(df, "doc_id", "text").collect()}
    # corpus: a×2, b×2, total 4 → every token logp = ln(1/2)
    assert abs(out[1] - math.log(2)) < 1e-6
    assert abs(out[2] - math.log(2)) < 1e-6
    assert out[3] is None  # empty doc: undefined perplexity


def test_unigram_logprob_external_model(spark):
    import math

    from plateau_spark.operators.text import unigram_logprob

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    model = spark.createDataFrame(
        [("x", math.log(0.25)), ("y", math.log(0.5))], "token string, logp double"
    )
    out = unigram_logprob(df, "doc_id", "text", model=model).collect()
    expect = (-math.log(0.25) - math.log(0.5)) / 2
    assert abs(out[0]["nll"] - expect) < 1e-6


def test_unigram_logprob_oov_floor_not_dropped(spark):
    """Round-7 fix (advisor): OOV tokens under an external model were
    inner-joined away, so an all-garbage document scored as fluent. Now
    each OOV token is charged a floor penalty (min model logp − ln 10
    by default, or an explicit oov_logp), and oov_col exposes the
    per-document OOV fraction."""
    import math

    from plateau_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(1, "x y"), (2, "zz qq"), (3, "x zz")], "doc_id long, text string"
    )
    model = spark.createDataFrame(
        [("x", math.log(0.25)), ("y", math.log(0.5))], "token string, logp double"
    )
    out = {
        r["doc_id"]: (r["nll"], r["oov_frac"])
        for r in unigram_logprob(
            df, "doc_id", "text", model=model, oov_col="oov_frac"
        ).collect()
    }
    floor_nll = -math.log(0.25) + math.log(10.0)  # rarest in-vocab − ln 10
    assert abs(out[1][0] - (-math.log(0.25) - math.log(0.5)) / 2) < 1e-6
    assert out[1][1] == 0.0
    assert abs(out[2][0] - floor_nll) < 1e-6  # all-OOV doc: pure penalty
    assert out[2][1] == 1.0
    assert abs(out[3][0] - (-math.log(0.25) + floor_nll) / 2) < 1e-6
    assert out[3][1] == 0.5
    # the garbage doc scores WORSE than the fluent one (the inverted
    # signal the inner join produced: doc 2 used to score NULL-fluent)
    assert out[2][0] > out[1][0]
    # explicit oov_logp overrides the derived floor
    out2 = {
        r["doc_id"]: r["nll"]
        for r in unigram_logprob(
            df, "doc_id", "text", model=model, oov_logp=math.log(1e-6)
        ).collect()
    }
    assert abs(out2[2] - (-math.log(1e-6))) < 1e-6


def test_unigram_logprob_rare_tokens_score_higher(spark):
    from plateau_spark.operators.text import unigram_logprob

    common = "the cat sat on the mat " * 10
    df = spark.createDataFrame(
        [(i, common) for i in range(20)] + [(99, "zyxw qvut kjih")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["nll"] for r in unigram_logprob(df, "doc_id", "text").collect()}
    assert out[99] > out[0]  # garbled text = higher mean NLL


# --- C4 line-level cleaning -------------------------------------------------


def test_c4_clean_lines_rules(spark):
    from plateau_spark.operators.text import c4_clean_lines

    text = "\n".join([
        "this line has enough words to survive.",   # kept
        "too short.",                                # < 5 words
        "this line has no terminal punctuation at all",  # no punct
        "this line mentions JavaScript so it goes away.",  # javascript
        'a quoted line with five words here."',      # kept (quote terminal)
        "does a question count as terminal?",        # kept
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = c4_clean_lines(df, "doc_id", "text").collect()[0]
    kept = row["clean_text"].split("\n")
    assert row["kept_lines"] == 3
    assert kept[0].startswith("this line has enough")
    assert kept[1].startswith("a quoted")
    assert kept[2].startswith("does a question")
    assert row["page_ok"] == 1  # 3 surviving lines, no gates tripped


def test_c4_clean_page_gates(spark):
    from plateau_spark.operators.text import c4_clean_lines

    good = "one two three four five six.\n" * 3
    df = spark.createDataFrame(
        [
            (1, good),
            (2, good + "lorem ipsum dolor sit amet here."),  # lorem gate
            (3, good.replace("six.", "six {.")),             # brace gate
            (4, "one two three four five six.\n" * 2),       # < 3 lines
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["page_ok"] for r in c4_clean_lines(df, "doc_id", "text").collect()}
    assert out == {1: 1, 2: 0, 3: 0, 4: 0}


def test_c4_clean_empty_and_whitespace(spark):
    from plateau_spark.operators.text import c4_clean_lines

    df = spark.createDataFrame(
        [(1, ""), (2, "   \n  \n ")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in c4_clean_lines(df, "doc_id", "text").collect()}
    for did in (1, 2):
        assert rows[did]["kept_lines"] == 0
        assert rows[did]["clean_text"] == ""
        assert rows[did]["page_ok"] == 0


# --- mixture sampling -------------------------------------------------------


def test_mixture_sample_clips_and_thins(spark):
    from plateau_spark.operators.sampling import mixture_sample

    # src A: 100 rows of size 10 (1000 units); src B: 1000 rows of size
    # 10 (10000 units); weights 1:1, budget 2000 → A target 1000 =
    # keep-all (clip), B target 1000/10000 = keep_p 0.1
    rows = [(i, "A", 10) for i in range(100)] + [
        (100 + i, "B", 10) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = mixture_sample(
        df, ["source"], {"A": 1.0, "B": 1.0},
        key_col="doc_id", budget=2000, size_col="n",
        keep_prob_col="keep_p",
    )
    got = out.groupBy("source").agg(
        F.count("*").alias("c"), F.first("keep_p").alias("p")
    ).collect()
    by = {r["source"]: r for r in got}
    assert by["A"]["c"] == 100 and by["A"]["p"] == 1.0
    assert abs(by["B"]["p"] - 0.1) < 1e-12
    assert 60 <= by["B"]["c"] <= 160  # ~100 of 1000


def test_mixture_sample_drops_unlisted_sources(spark):
    from plateau_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "doc_id long, source string"
    )
    out = mixture_sample(df, ["source"], {"A": 1.0}, key_col="doc_id", budget=100)
    assert [r["source"] for r in out.collect()] == ["A"]


def test_mixture_sample_determinism_and_validation(spark):
    import pytest as _pytest

    from plateau_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "A") for i in range(500)], "doc_id long, source string"
    )
    out = mixture_sample(df, ["source"], {"A": 1.0}, key_col="doc_id", budget=100)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b and 50 <= len(a) <= 160
    with _pytest.raises(ValueError, match="sum to > 0"):
        mixture_sample(df, ["source"], {"A": 0.0}, key_col="doc_id", budget=10)
    with _pytest.raises(ValueError, match="budget"):
        mixture_sample(df, ["source"], {"A": 1.0}, key_col="doc_id", budget=0)


# --- centroid outlier scoring ----------------------------------------------


def test_centroid_outlier_scores_hand_computed(spark):
    import math

    from plateau_spark.operators.similarity import centroid_outlier_scores

    # centroid of [(1,0), (0,1)] = (0.5, 0.5); both vectors at 45° →
    # sim = cos(45°); a third vector (1,1) is the centroid direction
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])]
    # centroid over all three = (2/3, 2/3) — recompute expectations
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["centroid_sim"] for r in centroid_outlier_scores(df, "vec_id", "embedding").collect()}
    c = (2 / 3, 2 / 3)
    for vid, v in [(1, (1.0, 0.0)), (2, (0.0, 1.0)), (3, (1.0, 1.0))]:
        dot = v[0] * c[0] + v[1] * c[1]
        expect = dot / (math.hypot(*v) * math.hypot(*c))
        assert abs(out[vid] - expect) < 1e-6
    assert out[3] > out[1]  # centroid-aligned vector scores highest


def test_centroid_outlier_flags_the_off_cluster_vector(spark):
    import numpy as np

    from plateau_spark.operators.similarity import centroid_outlier_scores

    rng = np.random.RandomState(3)
    base = rng.randn(16)
    rows = [
        (i, [float(x) for x in base + rng.randn(16) * 0.05]) for i in range(30)
    ]
    rows.append((99, [float(x) for x in -base]))  # the anti-cluster outlier
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["centroid_sim"] for r in centroid_outlier_scores(df, "vec_id", "embedding").collect()}
    assert out[99] == min(out.values())
    assert out[99] < 0 < min(out[i] for i in range(30))


# --- decontaminate_minhash (fuzzy cross-corpus) -----------------------------


@pytest.fixture(scope="module")
def contamination_corpora(spark):
    eval_df = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog near the river bank"),
            (101, "completely unrelated evaluation question about astronomy and stars"),
        ],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # near-verbatim copy of eval 100 (one word changed)
            (1, "the quick brown fox jumps over the lazy dog near the wide river bank"),
            # unrelated
            (2, "grocery list milk eggs bread butter cheese apples oranges bananas"),
            # partial overlap with eval 100 but below threshold
            (3, "a lazy dog slept all day"),
        ],
        "doc_id long, text string",
    )
    return train, eval_df


@pytest.mark.parametrize("family", ["siphash", "md5"])
def test_decontaminate_minhash_flags_near_copy(spark, contamination_corpora, family):
    from plateau_spark.operators.dedup import decontaminate_minhash

    train, eval_df = contamination_corpora
    out = decontaminate_minhash(
        train, eval_df, "doc_id", "text",
        num_perm=16, bands=8, jaccard_threshold=0.5, hash_family=family,
    ).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["n_eval_matches"] == 1
    assert out[0]["max_jaccard"] > 0.5


def test_decontaminate_minhash_shuffle_fallback_same_result(
    spark, contamination_corpora
):
    """broadcast_eval=False (too-big-to-broadcast eval side) returns the
    identical result through the shuffle-hash band join."""
    from plateau_spark.operators.dedup import decontaminate_minhash

    train, eval_df = contamination_corpora
    kw = dict(num_perm=16, bands=8, jaccard_threshold=0.5, hash_family="md5")
    a = decontaminate_minhash(train, eval_df, "doc_id", "text", broadcast_eval=True, **kw)
    b = decontaminate_minhash(train, eval_df, "doc_id", "text", broadcast_eval=False, **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_decontaminate_minhash_broadcasts_eval_side(spark, contamination_corpora):
    """The 100 TB plan shape: the banded EVAL table is broadcast — the
    training corpus must not shuffle for the candidate join."""
    from plateau_spark.operators.dedup import decontaminate_minhash

    train, eval_df = contamination_corpora
    out = decontaminate_minhash(
        train, eval_df, "doc_id", "text",
        num_perm=16, bands=8, jaccard_threshold=0.5, hash_family="md5",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_decontaminate_minhash_validates_args(spark, contamination_corpora):
    from plateau_spark.operators.dedup import decontaminate_minhash

    train, eval_df = contamination_corpora
    with pytest.raises(ValueError, match="divisible"):
        decontaminate_minhash(train, eval_df, "doc_id", "text", num_perm=10, bands=4)
    with pytest.raises(ValueError, match="hash_family"):
        decontaminate_minhash(
            train, eval_df, "doc_id", "text", hash_family="sha9000"
        )


# --- deterministic_shuffle (training-epoch order) ---------------------------


def test_deterministic_shuffle_is_reproducible_and_seed_sensitive(spark):
    from plateau_spark.operators.sampling import deterministic_shuffle

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    o1 = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=1).collect()]
    o2 = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=1).collect()]
    o3 = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=2).collect()]
    assert o1 == o2                      # same seed → identical order
    assert o1 != o3                      # different seed → different order
    assert sorted(o1) == list(range(200))  # a permutation, nothing lost
    assert o1 != list(range(200))        # actually shuffled


def test_deterministic_shuffle_md5_family_matches_xxhash_permutation_set(spark):
    from plateau_spark.operators.sampling import deterministic_shuffle

    df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    md5_order = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=3, hash_family="md5").collect()]
    assert sorted(md5_order) == list(range(50))
    with pytest.raises(ValueError, match="hash_family"):
        deterministic_shuffle(df, "doc_id", hash_family="crc32")


def test_deterministic_shuffle_limit_plan_is_take_ordered(spark):
    """LIMIT k over the epoch order must collapse to per-partition top-k
    (TakeOrderedAndProject), not a global sort."""
    from plateau_spark.operators.sampling import deterministic_shuffle

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, "doc_id", seed=1).limit(10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_deterministic_shuffle_full_sort_is_range_exchange(spark):
    """The full-epoch reorder is a range exchange + local sort — the
    scale-safe distributed total order (no single-partition sort)."""
    from plateau_spark.operators.sampling import deterministic_shuffle

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    plan = (
        deterministic_shuffle(df, "doc_id", seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan.lower()


# --- kmeans_cluster ---------------------------------------------------------


def test_kmeans_cluster_separates_obvious_clusters(spark):
    from plateau_spark.operators.similarity import kmeans_cluster

    rows = (
        [(i, [10.0 + (i % 3) * 0.01, 0.0, 0.0]) for i in range(0, 10)]
        + [(i, [0.0, 10.0 + (i % 3) * 0.01, 0.0]) for i in range(10, 20)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_cluster(df, k=2, iterations=2, seed_ids=[0, 10]).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    assert by_cluster[0] == set(range(0, 10))
    assert by_cluster[1] == set(range(10, 20))
    assert all(r["cosine"] > 0.99 for r in out)


def test_kmeans_cluster_deterministic_and_validates_seeds(spark):
    from plateau_spark.operators.similarity import kmeans_cluster

    df = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    a = sorted(map(tuple, kmeans_cluster(df, k=3, iterations=1, seed_ids=[0, 1, 2]).collect()))
    b = sorted(map(tuple, kmeans_cluster(df, k=3, iterations=1, seed_ids=[0, 1, 2]).collect()))
    assert a == b
    # hash-seeded variant also runs and is a full assignment
    c = kmeans_cluster(df, k=3, iterations=1)
    assert c.count() == 40
    with pytest.raises(ValueError, match="seed vectors"):
        kmeans_cluster(df, k=2, iterations=0, seed_ids=[0, 999]).collect()


def test_kmeans_cluster_empty_cluster_keeps_seed_centroid(spark):
    """A seed that captures no vectors in the assignment round keeps its
    centroid rather than producing NaNs."""
    from plateau_spark.operators.similarity import kmeans_cluster

    # seeds 0 and 1 point the same way; every vector lands on one of them
    rows = [(i, [1.0, 0.0]) for i in range(5)] + [(5, [0.9999, 0.0001])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_cluster(df, k=2, iterations=2, seed_ids=[0, 5]).collect()
    assert len(out) == 6
    assert all(r["cosine"] == r["cosine"] for r in out)  # no NaN


# --- mine_bitext_pairs ------------------------------------------------------


def test_bitext_mining_finds_translation_pairs(spark):
    """Hand-built corpora: a0/b0 and a1/b1 are near-identical cross-
    lingual pairs; b9 is a 'hub' close to everything — margin scoring
    keeps the true pairs and refuses the hub as a best match."""
    from plateau_spark.operators.similarity import mine_bitext_pairs

    a = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.05, 0.0]),
            (1, [0.0, 1.0, 0.05, 0.0]),
            (2, [0.0, 0.0, 0.05, 1.0]),   # no counterpart in B
        ],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [
            (10, [0.99, 0.01, 0.05, 0.0]),   # pair of a0
            (11, [0.01, 0.99, 0.05, 0.0]),   # pair of a1
            (19, [0.5, 0.5, 0.5, 0.5]),      # hub
        ],
        "vec_id long, embedding array<float>",
    )
    out = mine_bitext_pairs(a, b, k=2, margin_threshold=0.0)
    rows = {r["id_a"]: r for r in out.collect()}
    assert rows[0]["id_b"] == 10
    assert rows[1]["id_b"] == 11
    # the hub-penalty property: b19's high neighborhood average drags
    # every margin involving it BELOW the true pairs' margins, so a
    # margin threshold separates them where raw cosine could not
    assert rows[2]["id_b"] == 19  # a2's only plausible match IS the hub
    assert rows[2]["margin"] < rows[0]["margin"]
    assert rows[2]["margin"] < rows[1]["margin"]


def test_bitext_margin_definition_and_determinism(spark):
    from plateau_spark.operators.similarity import mine_bitext_pairs

    a = spark.createDataFrame(
        [(i, [float(i % 3 + 1), float((i * 7) % 5 + 1)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [(100 + i, [float(i % 4 + 1), float((i * 3) % 5 + 1)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    r1 = sorted(map(tuple, mine_bitext_pairs(a, b, k=3).collect()))
    r2 = sorted(map(tuple, mine_bitext_pairs(a, b, k=3).collect()))
    assert r1 == r2
    for row in mine_bitext_pairs(a, b, k=3).collect():
        assert row["margin"] > 0
        # one best match per id_a
    ids = [r[0] for r in r1]
    assert len(ids) == len(set(ids))


# --- bigram_logprob ---------------------------------------------------------


def test_bigram_logprob_hand_computed(spark):
    import math

    from plateau_spark.operators.text import bigram_logprob

    # corpus: "a b a b" + "a b" → bigrams: (a,b)x3, (b,a)x1; unigrams a:3 b:3
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["nll2"] for r in bigram_logprob(df, "doc_id", "text", lam=0.5).collect()}
    n = 6
    p_ab = 0.5 * (3 / 4) + 0.5 * (3 / n)   # c(a,b)/c(a·)=3/4? c(a·)= bigrams starting a = 3
    # careful: left counts come from bigram table: a→3, b→1
    p_ab = 0.5 * (3 / 3) + 0.5 * (3 / n)
    p_ba = 0.5 * (1 / 1) + 0.5 * (3 / n)
    exp1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    exp2 = -math.log(p_ab)
    assert abs(out[1] - exp1) < 1e-5
    assert abs(out[2] - exp2) < 1e-5


def test_bigram_logprob_short_docs_null_and_rare_higher(spark):
    from plateau_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [
            (1, "common words common words common words"),
            (2, "zxqv jkwp"),          # rare bigram
            (3, "single"),              # <2 tokens → NULL
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["nll2"] for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert out[3] is None and out[4] is None
    assert out[2] > out[1]  # rare wording scores higher NLL


# --- score_weighted_sample --------------------------------------------------


def test_score_weighted_sample_properties(spark):
    from plateau_spark.operators.sampling import score_weighted_sample

    df = spark.createDataFrame(
        [(i, 1.0 if i < 100 else (0.0 if i < 200 else None)) for i in range(300)],
        "k long, s double",
    )
    out = score_weighted_sample(df, "k", "s", floor=0.0)
    kept = [r["k"] for r in out.collect()]
    assert sorted(kept)[:100] == list(range(100))   # score 1.0 → always kept
    assert all(k < 100 for k in kept)               # score 0.0 / NULL → dropped
    # deterministic
    again = [r["k"] for r in score_weighted_sample(df, "k", "s", floor=0.0).collect()]
    assert sorted(again) == sorted(kept)
    # mid-score keeps a calibrated fraction
    mid = spark.createDataFrame([(i, 0.5) for i in range(2000)], "k long, s double")
    frac = score_weighted_sample(mid, "k", "s").count() / 2000
    assert 0.45 < frac < 0.55
    with pytest.raises(ValueError, match="floor"):
        score_weighted_sample(df, "k", "s", floor=0.9, ceiling=0.1)
