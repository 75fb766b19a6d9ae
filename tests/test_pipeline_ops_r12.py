"""Round-12 operator tests: pinned-model IVF-PQ serving path
(fit-free build + exact numpy replay) and shortlist determinism under
heavy ADC ties / different file layouts.

Reference behavior: plateau has no ANN surface; these pin OUR
contracts — the persisted-index serving path is a pure function of
(corpus, model, queries), independent of how the index files are laid
out on disk.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM, M, SUB, KK = 16, 4, 4, 4
N_CELLS = 3


def _pinned_centroids():
    return [
        (c, [((c * 23 + d * 7) % 17 - 8) / 16.0 for d in range(DIM)])
        for c in range(N_CELLS)
    ]


def _pinned_model():
    books = [
        [
            [((j * 37 + c * 11 + d * 5) % 19 - 9) / 16.0 for d in range(SUB)]
            for c in range(KK)
        ]
        for j in range(M)
    ]
    return {"m": M, "k": KK, "dim": DIM, "sub_dim": SUB, "codebooks": books}


@pytest.fixture(scope="module")
def tie_corpus(spark):
    # 8 distinct base vectors × 30 copies → 30-way ADC ties inside
    # every code group; distinct ids so tie-breaks are observable
    rng = np.random.default_rng(7)
    bases = rng.normal(size=(8, DIM)).round(3)
    rows = [
        (int(i), [float(x) for x in bases[i % 8]])
        for i in range(240)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _numpy_serving_replay(rows, queries, centroids, model, *, k, nprobe, overfetch):
    """Bit-identical replay of the Spark serving path: normalized-GEMM
    coarse argmax, expanded-L2 residual encode, per-(query, cell) ADC
    tables, (rounded dist, id) shortlist, exact rerank."""
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = np.array([r[1] for r in rows], dtype=np.float64)
    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    C = np.array([v for _, v in centroids], dtype=np.float64)
    books = [np.array(b, dtype=np.float64) for b in model["codebooks"]]

    # _assign_to_centroids: cosine argmax over normalized rows
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cell = cids[np.argmax(Vn @ Cn.T, axis=1)]

    # residual + encode_pq's expanded formula
    R = V - C[np.searchsorted(cids, cell)]
    codes = np.empty((len(V), M), dtype=np.int64)
    for j in range(M):
        S = R[:, j * SUB:(j + 1) * SUB]
        d2 = (
            (S * S).sum(axis=1)[:, None]
            - 2.0 * S @ books[j].T
            + (books[j] * books[j]).sum(axis=1)[None, :]
        )
        codes[:, j] = d2.argmin(axis=1)

    out = []
    fetch = k * overfetch
    for qid, qv in queries:
        q = np.array(qv, dtype=np.float64)
        dcell = ((q[None, :] - C) ** 2).sum(axis=1)
        probe = cids[np.lexsort((cids, dcell))[:nprobe]]
        cand_ids, cand_d = [], []
        for c in probe:
            mask = cell == c
            if not mask.any():
                continue
            r = q - C[np.searchsorted(cids, c)]
            t = np.empty((M, KK))
            for j in range(M):
                S = r[j * SUB:(j + 1) * SUB]
                t[j] = ((S[None, :] - books[j]) ** 2).sum(axis=1)
            d = np.zeros(mask.sum())
            Cc = codes[mask]
            for j in range(M):
                d += t[j, Cc[:, j]]
            cand_ids.extend(ids[mask])
            cand_d.extend(d)
        order = sorted(
            range(len(cand_ids)),
            key=lambda i: (round(cand_d[i], 6), cand_ids[i]),
        )[:fetch]
        short = [cand_ids[i] for i in order]
        # exact rerank
        exact = []
        for vid in short:
            v = V[ids == vid][0]
            exact.append((round(float(((v - q) ** 2).sum()), 6), int(vid)))
        exact.sort()
        for rank, (d2, vid) in enumerate(exact[:k], start=1):
            out.append((int(qid), vid, d2, rank))
    return sorted(out)


def test_ivfpq_pinned_matches_numpy_replay_under_heavy_ties(
    spark, tie_corpus, tmp_path
):
    from plateau_spark.operators.similarity import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    store = str(tmp_path / "s")
    build_ivfpq_index(
        spark, store, "ix", tie_corpus,
        centroids=_pinned_centroids(), pq_model=_pinned_model(),
    )
    queries = tie_corpus.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        (r.query_id, r.vec_id, r.dist2, r.rank)
        for r in query_ivfpq_index(
            spark, store, "ix", queries, k=10, nprobe=2,
            refine_with=tie_corpus, overfetch=4,
        ).collect()
    )
    rows = [(r.vec_id, r.embedding) for r in tie_corpus.collect()]
    qrows = [(r.query_id, r.embedding) for r in queries.collect()]
    want = _numpy_serving_replay(
        rows, qrows, _pinned_centroids(), _pinned_model(),
        k=10, nprobe=2, overfetch=4,
    )
    assert got == want


def test_ivfpq_shortlist_independent_of_file_layout(spark, tie_corpus, tmp_path):
    """The ADC pre-selection keeps every row at or below the take-th
    rounded distance, so tied candidates can never be dropped
    arbitrarily per scan batch — results are identical whether the
    index was written from 1 input partition or 8."""
    from plateau_spark.operators.similarity import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    queries = tie_corpus.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    results = []
    for tag, nparts in (("a", 1), ("b", 8)):
        store = str(tmp_path / tag)
        build_ivfpq_index(
            spark, store, "ix", tie_corpus.repartition(nparts),
            centroids=_pinned_centroids(), pq_model=_pinned_model(),
        )
        results.append(
            sorted(
                (r.query_id, r.vec_id, r.dist2, r.rank)
                for r in query_ivfpq_index(
                    spark, store, "ix", queries, k=10, nprobe=2,
                    refine_with=tie_corpus, overfetch=4,
                ).collect()
            )
        )
    assert results[0] == results[1]


def test_ivfpq_pinned_build_runs_no_fit_jobs(spark, tie_corpus, tmp_path):
    """centroids= + pq_model= must skip both k-means fits: the stored
    model metadata is exactly the pinned input."""
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.operators.similarity import build_ivfpq_index
    from plateau_spark.sources.dataset import _ensure_store

    store = str(tmp_path / "s")
    build_ivfpq_index(
        spark, store, "ix", tie_corpus,
        centroids=_pinned_centroids(), pq_model=_pinned_model(),
    )
    meta = DatasetMetadata.load(_ensure_store(store), "ix").metadata["ivfpq"]
    assert meta["codebooks"] == _pinned_model()["codebooks"]
    assert [
        [cid, vec] for cid, vec in _pinned_centroids()
    ] == [[int(c), [float(x) for x in v]] for c, v in meta["centroids"]]


# ---------------------------------------------------------------------------
# semantic decontamination


@pytest.fixture(scope="module")
def decon_frames(spark):
    rng = np.random.default_rng(11)
    ev_vecs = rng.normal(size=(6, DIM))
    rows_ev = [(int(100 + i), [float(x) for x in ev_vecs[i]]) for i in range(6)]
    # train: 3 exact copies of eval vectors (contaminated), one scaled
    # copy (cosine 1.0 — scale-invariant), the rest independent noise
    rows_tr = [
        (0, [float(x) for x in ev_vecs[0]]),
        (1, [float(x) for x in ev_vecs[1]]),
        (2, [float(x) for x in ev_vecs[2]]),
        (3, [float(2.5 * x) for x in ev_vecs[0]]),
    ] + [
        (int(10 + i), [float(x) for x in rng.normal(size=DIM)])
        for i in range(40)
    ]
    tr = spark.createDataFrame(rows_tr, "vec_id long, embedding array<double>")
    ev = spark.createDataFrame(rows_ev, "eval_id long, embedding array<double>")
    return tr, ev


def test_decontaminate_semantic_broadcast_flags_copies(spark, decon_frames):
    from plateau_spark.operators.similarity import decontaminate_semantic

    tr, ev = decon_frames
    out = decontaminate_semantic(
        tr, ev, eval_id_col="eval_id", threshold=0.95
    ).collect()
    got = {r.vec_id: (r.n_eval_matches, r.max_cosine, r.nearest_eval_id) for r in out}
    # the exact and scaled copies are flagged with cosine 1.0 against
    # their source eval vector; random dim-16 noise never reaches 0.95
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == (1, 1.0, 100)
    assert got[1] == (1, 1.0, 101)
    assert got[2] == (1, 1.0, 102)
    assert got[3] == (1, 1.0, 100)


def test_decontaminate_semantic_lsh_subset_of_broadcast(spark, decon_frames):
    from plateau_spark.operators.similarity import decontaminate_semantic

    tr, ev = decon_frames
    exact = {
        r.vec_id: (r.n_eval_matches, r.max_cosine, r.nearest_eval_id)
        for r in decontaminate_semantic(
            tr, ev, eval_id_col="eval_id", threshold=0.95
        ).collect()
    }
    lsh = {
        r.vec_id: (r.n_eval_matches, r.max_cosine, r.nearest_eval_id)
        for r in decontaminate_semantic(
            tr, ev, eval_id_col="eval_id", threshold=0.95, method="lsh",
            n_bits=4,
        ).collect()
    }
    # LSH is recall-approximate: a subset of the exact hits, and an
    # identical copy ALWAYS lands in its source's bucket (same
    # hyperplane signs), so the exact-copy rows must all be found
    assert set(lsh) <= set(exact)
    assert {0, 1, 2} <= set(lsh)
    for k, v in lsh.items():
        assert exact[k][0] >= v[0]   # n_eval_matches can only shrink
        assert exact[k][1] >= v[1]   # max_cosine can only shrink


def test_decontaminate_semantic_rejects_unknown_method(spark, decon_frames):
    from plateau_spark.operators.similarity import decontaminate_semantic

    tr, ev = decon_frames
    with pytest.raises(ValueError, match="Unknown method"):
        decontaminate_semantic(tr, ev, eval_id_col="eval_id", method="nope")


def test_decontaminate_semantic_gemm_matches_broadcast(spark, decon_frames):
    """The Arrow GEMM tier is a throughput re-expression of the codegen
    broadcast tier: identical hit set and (rounded) values — results
    differ only by float summation order."""
    from plateau_spark.operators.similarity import decontaminate_semantic

    tr, ev = decon_frames

    def canon(df):
        return sorted(
            (r.vec_id, r.n_eval_matches, round(r.max_cosine, 6), r.nearest_eval_id)
            for r in df.collect()
        )

    a = canon(decontaminate_semantic(tr, ev, eval_id_col="eval_id", threshold=0.95))
    b = canon(
        decontaminate_semantic(
            tr, ev, eval_id_col="eval_id", threshold=0.95, method="gemm"
        )
    )
    assert a == b
    assert len(a) == 4  # the copies, per the broadcast-tier test


def test_decontaminate_semantic_zero_norm_vectors_never_flag(spark):
    """A zero vector has no direction: under ANSI mode its 0/0 cosine
    RAISES and kills the scan (non-ANSI yields NULL). A NaN-component
    vector's cosine is NaN, which Spark compares as >= any threshold —
    unguarded, it is flagged against the entire benchmark. All three
    tiers must drop both."""
    from plateau_spark.operators.similarity import decontaminate_semantic

    tr = spark.createDataFrame(
        [(0, [0.0] * DIM), (1, [1.0] + [0.0] * (DIM - 1))],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(100, [0.0] * DIM), (101, [1.0] + [0.0] * (DIM - 1))],
        "eval_id long, embedding array<double>",
    )
    for method in ("broadcast", "gemm", "lsh"):
        got = sorted(
            (r.vec_id, r.n_eval_matches, r.max_cosine, r.nearest_eval_id)
            for r in decontaminate_semantic(
                tr, ev, eval_id_col="eval_id", threshold=0.9, method=method
            ).collect()
        )
        # only the real copy pair survives; the zero vectors flag nothing
        assert got == [(1, 1, 1.0, 101)], method


@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
def test_cosine_operators_survive_zero_vectors(spark):
    """One degenerate embedding in a corpus must neither crash an ANSI
    scan (0/0 raises on zero norms) nor outrank real scores (a
    NaN-component vector's cosine is NaN, which Spark compares as
    greater than every double): cosine_sim_col yields NULL for both,
    rankings exclude them, thresholds drop them, and the IVF/k-means
    assignment stays deterministic."""
    from plateau_spark.operators.similarity import (
        cosine_dup_pairs_blocked,
        cosine_dup_pairs_bruteforce,
        cosine_topk_bruteforce,
        cosine_topk_lsh,
        ivf_centroids,
    )

    rows = [(0, [0.0] * DIM)] + [
        (int(i), [float((i * 7 + d) % 5 - 2) for d in range(DIM)])
        for i in range(1, 12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where("vec_id in (0, 1)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = cosine_topk_bruteforce(emb, q, k=3).collect()
    # the zero QUERY produces no ranked rows (all cosines NULL);
    # the zero CORPUS row never appears in any result
    assert all(r.vec_id != 0 for r in top)
    assert {r.query_id for r in top} == {1}
    lsh = cosine_topk_lsh(emb, q, k=3, n_bits=3).collect()
    assert all(r.vec_id != 0 for r in lsh)

    bf = cosine_dup_pairs_bruteforce(emb, threshold=0.5).collect()
    bl = cosine_dup_pairs_blocked(emb, threshold=0.5).collect()
    assert all(0 not in (r.id_a, r.id_b) for r in bf)
    assert all(0 not in (r.id_a, r.id_b) for r in bl)

    cents = ivf_centroids(emb, n_centroids=3, refine_iterations=1)
    assert len(cents) == 3  # fit survives the zero row


@pytest.mark.slow  # exhaustive fuzz/property tier; fast-tier coverage remains (pytest.ini)
def test_cosine_operators_survive_nan_vectors(spark):
    """Spark compares NaN as greater than every double, so an unguarded
    NaN-component embedding ranks #1 for every query and passes every
    threshold. guarded_cosine nanvl's it to NULL: the row vanishes from
    rankings, pair sets and decontamination flags in every tier."""
    from plateau_spark.operators.similarity import (
        cosine_dup_pairs_bruteforce,
        cosine_topk_bruteforce,
        decontaminate_semantic,
    )

    nan = float("nan")
    rows = [(0, [nan] + [1.0] * (DIM - 1))] + [
        (int(i), [float((i * 7 + d) % 5 - 2) for d in range(DIM)])
        for i in range(1, 8)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where("vec_id in (0, 1)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = cosine_topk_bruteforce(emb, q, k=3).collect()
    assert all(r.vec_id != 0 for r in top)     # NaN corpus row never ranked
    assert {r.query_id for r in top} == {1}    # NaN query yields nothing

    pairs = cosine_dup_pairs_bruteforce(emb, threshold=0.5).collect()
    assert all(0 not in (r.id_a, r.id_b) for r in pairs)

    ev = emb.where("vec_id >= 4").select(
        F.col("vec_id").alias("eval_id"), "embedding"
    )
    for method in ("broadcast", "gemm"):
        got = decontaminate_semantic(
            emb.where("vec_id < 4"), ev, eval_id_col="eval_id",
            threshold=0.99, method=method,
        ).collect()
        assert all(r.vec_id != 0 for r in got), method


def test_decontaminate_gemm_null_embedding_and_empty_eval(spark):
    """The gemm kernel must not crash on a NULL train embedding (the
    SQL tiers drop it via NULL cosine) and must return an empty result
    for an empty benchmark, like its siblings."""
    from plateau_spark.operators.similarity import decontaminate_semantic

    rows = [(0, None), (1, [1.0] * DIM), (2, [1.0] * DIM)]
    tr = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ev = spark.createDataFrame(
        [(100, [1.0] * DIM)], "eval_id long, embedding array<double>"
    )
    for method in ("broadcast", "gemm"):
        got = sorted(
            r.vec_id
            for r in decontaminate_semantic(
                tr, ev, eval_id_col="eval_id", threshold=0.99, method=method
            ).collect()
        )
        assert got == [1, 2], method
    empty_ev = ev.where("eval_id < 0")
    for method in ("broadcast", "gemm"):
        assert (
            decontaminate_semantic(
                tr, empty_ev, eval_id_col="eval_id", method=method
            ).count()
            == 0
        ), method


def test_decontaminate_semantic_gemm_scores_every_eval_dimension(spark):
    """A ragged eval set (mixed vector lengths) must not crash the gemm
    tier NOR silently drop the minority dimension's benchmarks: the
    kernel groups eval rows by dim and scores each train row against
    its own-dim group — pair-for-pair the broadcast tier's semantics
    (mismatched-dim pairs are NULL there, same-dim pairs score)."""
    from plateau_spark.operators.similarity import decontaminate_semantic

    rng = np.random.default_rng(23)
    ev16 = rng.normal(size=(3, 16))
    ev8 = rng.normal(size=(2, 8))
    rows_ev = [(int(100 + i), [float(x) for x in ev16[i]]) for i in range(3)] + [
        (int(200 + i), [float(x) for x in ev8[i]]) for i in range(2)
    ]
    # train mixes both dims: one exact copy per dim group + noise rows
    rows_tr = (
        [(0, [float(x) for x in ev16[1]]), (1, [float(x) for x in ev8[0]])]
        + [(int(10 + i), [float(x) for x in rng.normal(size=16)]) for i in range(20)]
        + [(int(40 + i), [float(x) for x in rng.normal(size=8)]) for i in range(20)]
    )
    tr = spark.createDataFrame(rows_tr, "vec_id long, embedding array<double>")
    ev = spark.createDataFrame(rows_ev, "eval_id long, embedding array<double>")

    broadcast = {
        r.vec_id: (r.n_eval_matches, r.max_cosine, r.nearest_eval_id)
        for r in decontaminate_semantic(
            tr, ev, eval_id_col="eval_id", threshold=0.95
        ).collect()
    }
    gemm = {
        r.vec_id: (r.n_eval_matches, r.max_cosine, r.nearest_eval_id)
        for r in decontaminate_semantic(
            tr, ev, eval_id_col="eval_id", threshold=0.95, method="gemm"
        ).collect()
    }
    # BOTH dim groups' contamination found, identically to broadcast
    assert set(gemm) == set(broadcast) == {0, 1}
    assert gemm[0][2] == 101 and gemm[1][2] == 200
    for k in gemm:
        assert gemm[k][0] == broadcast[k][0]
        assert gemm[k][2] == broadcast[k][2]
        assert abs(gemm[k][1] - broadcast[k][1]) < 1e-9
