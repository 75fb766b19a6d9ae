"""Mergeable distinct-count sketch statistics: HyperLogLog sketches
computed map-side, persisted as a plateau side dataset, and advanced
incrementally on append.

Why sketches are first-class at 100 TB: an exact ``COUNT(DISTINCT
user_id)`` shuffles every distinct value across the cluster — O(ndv)
network per query, repeated on every refresh. An HLL sketch is a
fixed-size (2^lg_k registers, KBs) commutative monoid: each task
sketches its partition locally, the merge is a register-wise max, and
an *incremental corpus append only sketches the NEW rows* — the
existing corpus is never rescanned. Spark 4 ships Apache DataSketches
HLL natively (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), so the whole path is JVM codegen with zero
Python.

The persisted layout mirrors the BM25/IVF side-index pattern
(operators/retrieval.py, operators/similarity.py): the statistics ARE
a plateau dataset — atomic commits, GC, time travel all apply. Each
``update_distinct_sketches`` call appends ONE row per group (the
sketch of just that batch); the read side unions per group, so writes
are O(batch) and reads merge a handful of KB-size binaries per group.

Reference parity note: the reference engine has no sketch tier; this
is a north-star extension (SURVEY.md §7 Phase 3) motivated by its
dataset-statistics surface (``collect_dataset_metadata``) — same
"statistics as data" idea, but mergeable and incrementally
maintainable.

Standard error is ~1.04/sqrt(2^lg_k): lg_k=12 → ~1.6%, lg_k=13 →
~1.15%. Estimates are deterministic for a given input multiset (the
sketch hash is fixed), so tests can assert tight tolerance bands.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: DataSketches default; ~1.15% standard error, 8 KB dense sketch.
DEFAULT_LG_K = 13

_META_KEY = "distinct_sketch"


def sketch_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One HLL sketch row per group: (group_cols..., sketch BINARY,
    n_rows BIGINT). Map-side partial sketches merge in the exchange —
    the shuffle payload per group is one 2^lg_k-register sketch per
    upstream task, never the values themselves. NULL values do not
    enter the sketch (matching COUNT(DISTINCT col) semantics)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.count(F.col(value_col)).alias("n_rows"),
    )


def estimate_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-group distinct-count estimate: (group_cols..., ndv_estimate
    BIGINT). The direct (non-persisted) tier — one codegen aggregation,
    no raw-value shuffle."""
    sk = sketch_distinct(df, group_cols, value_col, lg_k=lg_k)
    return sk.select(
        *group_cols, F.hll_sketch_estimate("sketch").alias("ndv_estimate")
    )


def build_distinct_sketches(
    spark,
    store,
    dataset_uuid: str,
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lg_k: int = DEFAULT_LG_K,
    overwrite: bool = False,
):
    """Persist per-group HLL sketches of ``df[value_col]`` as a plateau
    dataset (one row per group: group_cols..., sketch, n_rows). The
    sketch parameters ride in user metadata so updates sketch new
    batches with the SAME lg_k (sketches with different lg_k still
    union — DataSketches downsamples — but keeping it fixed preserves
    the error bound)."""
    from plateau_spark.sources.dataset import store_dataframe_as_dataset

    sk = sketch_distinct(df, group_cols, value_col, lg_k=lg_k)
    return store_dataframe_as_dataset(
        spark,
        store,
        dataset_uuid,
        sk,
        overwrite=overwrite,
        metadata={
            _META_KEY: {
                "group_cols": list(group_cols),
                "value_col": value_col,
                "lg_k": int(lg_k),
            }
        },
    )


def update_distinct_sketches(
    spark,
    store,
    dataset_uuid: str,
    new_df: DataFrame,
):
    """Advance persisted sketches with a NEW batch of rows — O(batch)
    work: sketches only ``new_df`` and APPENDS one row per group
    touched (an ordinary atomic dataset append; no read-merge-rewrite
    of existing state, so concurrent readers never see a half-merged
    sketch). The read side (:func:`read_distinct_estimates`) unions all
    rows per group — HLL union is associative and commutative, so
    append order never matters.

    Append-only contract (same as update_text_index): re-submitting
    rows already sketched does not over-count the ESTIMATE (HLL is
    idempotent on duplicate values — the same value sets the same
    register) but does inflate the exact ``n_rows`` tally.
    """
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.sources.dataset import (
        _ensure_store,
        update_dataset_from_dataframe,
    )

    st = _ensure_store(store)
    meta = DatasetMetadata.load(st, dataset_uuid).metadata[_META_KEY]
    sk = sketch_distinct(
        new_df, meta["group_cols"], meta["value_col"], lg_k=int(meta["lg_k"])
    )
    return update_dataset_from_dataframe(spark, st, dataset_uuid, sk)


def read_distinct_estimates(spark, store, dataset_uuid: str) -> DataFrame:
    """Union the persisted per-batch sketches and estimate:
    (group_cols..., ndv_estimate BIGINT, n_rows BIGINT). Reads KB-size
    binaries — never the source corpus. ``hll_union_agg`` tolerates
    mixed lg_k (downsampling to the smallest), so datasets written
    across a lg_k config change still read."""
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.sources.dataset import _ensure_store, read_table

    st = _ensure_store(store)
    meta = DatasetMetadata.load(st, dataset_uuid).metadata[_META_KEY]
    group_cols = meta["group_cols"]
    sk = read_table(spark, st, dataset_uuid)
    merged = sk.groupBy(*group_cols).agg(
        F.hll_union_agg("sketch", F.lit(True)).alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.select(
        *group_cols,
        F.hll_sketch_estimate("sketch").alias("ndv_estimate"),
        "n_rows",
    )
