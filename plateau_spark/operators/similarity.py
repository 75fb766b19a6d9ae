"""Similarity search over embedding columns (array<float>).

North-star extension operators (not in the reference, SURVEY.md §7
Phase 3). Two tiers:

  - brute-force exact cosine top-k — the correctness baseline; one
    broadcast of the (small) query set, zip_with/aggregate dot products
    inside codegen, ranked by a window. Linear scan: right answer at
    any scale where a full pass is acceptable.
  - LSH-bucketed ANN — the 100 TB path: deterministic random-hyperplane
    sign buckets co-partition corpus and queries, so each query only
    scans its bucket(s). Recall tunable via number of hyperplanes and
    multi-probe (two independent bucketings OR-combined).

No MLlib dependency (works on plain array<float>), no Python UDFs.
"""

from __future__ import annotations

import math
import random
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a, b) -> Column:
    """Sequential-order dot product of two array columns (deterministic)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_sim_col(a, b) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_bucket_col(vec_col, n_bits: int, *, seed: int = 7, dim: int | None = None) -> Column:
    """Sign-of-projection bucket id (int) from n_bits hyperplanes.

    The planes are literals baked into the plan (broadcast-free, a few
    KB); the projection is a zip_with/aggregate fold per plane.
    """
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    d = dim or 16
    planes = _hyperplanes(d, n_bits, seed)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(p) for p in plane]), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × scan corpus.

    Output: (query_id, vec_id, cosine, rank). Ties broken by corpus id
    for determinism. One corpus scan regardless of |queries| (the join
    is a broadcast nested loop — no shuffle of the corpus); the ranking
    shuffle moves only |corpus|×|queries| score rows, pre-pruned per
    task by the window's partial top-k (AQE + codegen).
    """
    q = queries.select(
        F.col(query_id_col).alias("__qid__"), F.col(vec_col).alias("__qv__")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col("__qid__").alias(query_id_col),
        F.col(id_col),
        cosine_sim_col(F.col(vec_col), F.col("__qv__")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_bits: int = 6,
    dim: int = 16,
) -> DataFrame:
    """ANN top-k: hyperplane buckets co-partition corpus and queries,
    exact cosine re-rank within the bucket (multi-probe via two seeds).

    The scale path: the corpus is scanned once to bucket (narrow), the
    join is an equi-join on the bucket id (shuffle-hash or broadcast of
    the bucketed queries), and only in-bucket pairs are scored.
    """
    cb = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cv__"),
        hyperplane_bucket_col(vec_col, n_bits, seed=7, dim=dim).alias("__b1__"),
        hyperplane_bucket_col(vec_col, n_bits, seed=77, dim=dim).alias("__b2__"),
    )
    qb = queries.select(
        F.col(query_id_col).alias("__qid__"), F.col(vec_col).alias("__qv__"),
        hyperplane_bucket_col(vec_col, n_bits, seed=7, dim=dim).alias("__b1__"),
        hyperplane_bucket_col(vec_col, n_bits, seed=77, dim=dim).alias("__b2__"),
    )
    cand = cb.join(
        F.broadcast(qb),
        (cb["__b1__"] == qb["__b1__"]) | (cb["__b2__"] == qb["__b2__"]),
    ).select(
        F.col("__qid__").alias(query_id_col),
        F.col(id_col),
        cosine_sim_col(F.col("__cv__"), F.col("__qv__")).alias("cosine"),
    ).dropDuplicates([query_id_col, id_col])
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
