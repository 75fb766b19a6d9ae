"""Record linkage / entity resolution: blocking → pairwise comparison →
match scoring → entity clustering.

Not in the reference (its pipeline surface stops at dataset I/O —
SURVEY.md §2.7); this is a north-star extension every large-scale data
integration / training-data pipeline needs: the same real-world entity
arrives from multiple feeds with typos, reformatting and conflicting
ids, and naive all-pairs comparison is O(n²) — a non-starter at 100 TB.

Scale design (the textbook blocked-linkage shape, kept fully JVM-side):

- **Blocking**: each record emits one row per blocking key (a cheap
  deterministic expression: phone suffix, name prefix, soundex-ish
  code). Candidate generation is an EQUI-self-join on the key — the
  only shuffle is on the blocking key, and the pair count is
  Σ block_size² instead of n². Hot blocks (a null phone, a default
  name) would re-introduce the quadratic, so ``max_block_size``
  drops oversized blocks by documented contract — the same hot-key
  cap contract as ``ngram_jaccard_pairs(max_shingle_df=...)``
  (operators/dedup.py).
- **Comparison**: per-field normalized Levenshtein similarity
  ``1 - lev(a,b) / greatest(len(a), len(b))`` — a built-in codegen
  expression in Spark (and ANSI-ish enough that DuckDB replays it
  bit-for-bit: integer distance, one double division). The weighted
  score is a left-to-right fold over the field list, so the float
  result is reproducible cross-engine.
- **Resolution**: matched pairs → connected components via
  ``duplicate_clusters`` (operators/dedup.py) — distributed
  label propagation with the bounded driver fast path.

A 1000-executor run shuffles each record once per blocking key,
compares within blocks only, and resolves on the (tiny) match graph.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from plateau_spark.operators.dedup import duplicate_clusters

__all__ = [
    "field_similarity_col",
    "candidate_pairs",
    "match_pairs",
    "resolve_entities",
]


def field_similarity_col(a: Column | str, b: Column | str) -> Column:
    """Normalized Levenshtein similarity in [0, 1]: ``1 - lev/maxlen``.

    NULL on either side → similarity NULL (unknown, not 0) so callers
    can decide missing-field policy; two empty strings → 1.0 (equal).
    Pure codegen (no UDF).
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    maxlen = F.greatest(F.length(a), F.length(b))
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(maxlen == 0, F.lit(1.0)).otherwise(
            F.lit(1.0) - F.levenshtein(a, b).cast("double") / maxlen.cast("double")
        )
    )


def _blocked_rows(
    records: DataFrame,
    id_col: str,
    blocking_keys: Sequence[Column],
    payload_cols: Sequence[str],
    max_block_size: int | None,
) -> DataFrame:
    """One row per (blocking key, record): (__bk__, __block__, __id__,
    payload...). NULL keys never block; blocks above ``max_block_size``
    are dropped (degenerate-key contract)."""
    if not blocking_keys:
        raise ValueError("candidate_pairs needs at least one blocking key")
    # ONE scan emitting all keys via posexplode (pos = the key index),
    # not a union of per-key selects: the union form re-scanned the
    # records once per blocking key, and every consumer of the blocked
    # rows (the self-join legs, the oversized-block aggregation)
    # multiplied that re-scan again
    keyed = records.select(
        F.posexplode(
            F.array(*[expr.cast("string") for expr in blocking_keys])
        ).alias("__bk__", "__block__"),
        F.col(id_col).alias("__id__"),
        *[F.col(c) for c in payload_cols],
    ).where(F.col("__block__").isNotNull())
    if max_block_size is not None:
        # two-level count (map-side partial) — never materializes a block
        sizes = keyed.groupBy("__bk__", "__block__").agg(
            F.count("*").alias("__bn__")
        )
        keyed = keyed.join(
            F.broadcast(
                sizes.where(F.col("__bn__") > max_block_size).select(
                    "__bk__", "__block__"
                )
            ),
            ["__bk__", "__block__"],
            "left_anti",
        )
    return keyed


def candidate_pairs(
    records: DataFrame,
    id_col: str,
    blocking_keys: Sequence[Column],
    *,
    max_block_size: int | None = 10_000,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs that share at least one blocking key,
    with ``id_a < id_b`` and exact-once semantics (a pair co-blocked by
    several keys appears once).

    ``blocking_keys``: expressions over ``records``; NULL keys never
    block (a NULL phone must not create one giant block). Blocks larger
    than ``max_block_size`` are dropped entirely — documented contract:
    an oversized block means the key is degenerate for these records
    and would cost size² comparisons while carrying ~zero linkage
    signal. Pass None to disable (exact mode for small/curated feeds).
    """
    keyed = _blocked_rows(records, id_col, blocking_keys, [], max_block_size)
    left = keyed.select("__bk__", "__block__", F.col("__id__").alias("id_a"))
    right = keyed.select("__bk__", "__block__", F.col("__id__").alias("id_b"))
    return (
        left.join(right, ["__bk__", "__block__"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def match_pairs(
    records: DataFrame,
    id_col: str,
    blocking_keys: Sequence[Column],
    compare_cols: Sequence[str],
    *,
    weights: Sequence[float] | None = None,
    threshold: float = 0.9,
    max_block_size: int | None = 10_000,
) -> DataFrame:
    """Blocked pairwise matching → (id_a, id_b, score) for pairs whose
    weighted mean field similarity is >= ``threshold``.

    ``compare_cols`` are compared with normalized Levenshtein
    (``field_similarity_col``); a NULL similarity contributes neither
    weight nor value (pairwise-available weighting). The score is a
    deterministic left-to-right fold over the field list, so it is
    bit-reproducible (and DuckDB-replayable for the oracle twin).

    Plan shape: the payload rides the blocking rows, so scoring happens
    INSIDE the block self-join and the threshold filter runs BEFORE the
    pair-dedup aggregation — the expensive shuffle sees only matches
    (a pair co-blocked by several keys is scored per co-block, which is
    cheap codegen, and deduped once past the filter; the score is a
    pure function of the pair so every co-block agrees). This beats
    candidate_pairs → re-join-payloads → score, which shuffles the full
    candidate set twice more.
    """
    if weights is None:
        weights = [1.0] * len(compare_cols)
    if len(weights) != len(compare_cols):
        raise ValueError("weights must align with compare_cols")
    keyed = _blocked_rows(
        records, id_col, blocking_keys, compare_cols, max_block_size
    )
    # Per-leg lengths ride into the join (computed once per ROW, n not
    # n² evaluations; 4 bytes/field of extra shuffle) to feed the
    # length-bound pre-filter below the Levenshtein scoring.
    a = keyed.select(
        "__bk__",
        "__block__",
        F.col("__id__").alias("id_a"),
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
        *[F.length(F.col(c)).alias(f"__al_{c}") for c in compare_cols],
    )
    b = keyed.select(
        "__bk__",
        "__block__",
        F.col("__id__").alias("id_b"),
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
        *[F.length(F.col(c)).alias(f"__bl_{c}") for c in compare_cols],
    )
    # explicit repartition by the join key (REPARTITION_BY_NUM): AQE
    # sizes post-shuffle partitions by INPUT bytes, but this join's
    # output is quadratic per block with Levenshtein scoring inside —
    # letting AQE coalesce the tiny input onto a few tasks serializes
    # the expensive stage. The explicit count pins the parallelism.
    from plateau_spark.core.conf import shuffle_partitions_conf

    # tolerant accessor: vendor platforms pre-set this conf to "auto"
    n_part = shuffle_partitions_conf(records.sparkSession)
    a = a.repartition(n_part, "__bk__", "__block__")
    b = b.repartition(n_part, "__bk__", "__block__")
    joined = a.join(b, ["__bk__", "__block__"]).where(
        F.col("id_a") < F.col("id_b")
    )
    # Length-bound pre-filter (guide §3.2: cut the expensive expression's
    # row count before it runs): lev(a,b) >= |len(a)-len(b)|, so each
    # field similarity is bounded above by 1 - |Δlen|/maxlen with the
    # SAME null pattern as the real similarity, and — weights being
    # non-negative — the weighted mean of upper bounds bounds the score.
    # Floating-point safety: when lev == |Δlen| the two divisions see
    # identical integer operands (bit-identical result), and correctly-
    # rounded IEEE ops are monotone, so score_fp <= bound_fp holds at
    # the bit level — a pair passing `score >= threshold` always passes
    # the bound filter, making the pre-filter exactly result-preserving.
    # It evaluates as part of the join condition (cheap integer math),
    # so pairs it kills never reach the Levenshtein projection.
    if all(w >= 0 for w in weights):
        num_ub = F.lit(0.0)
        den_ub = F.lit(0.0)
        for c, w in zip(compare_cols, weights):
            la, lb = F.col(f"__al_{c}"), F.col(f"__bl_{c}")
            maxlen = F.greatest(la, lb)
            ub = F.when(
                la.isNull() | lb.isNull(), F.lit(None).cast("double")
            ).otherwise(
                F.when(maxlen == 0, F.lit(1.0)).otherwise(
                    F.lit(1.0)
                    - F.abs(la - lb).cast("double") / maxlen.cast("double")
                )
            )
            num_ub = num_ub + F.coalesce(ub * F.lit(float(w)), F.lit(0.0))
            den_ub = den_ub + F.when(ub.isNull(), F.lit(0.0)).otherwise(
                F.lit(float(w))
            )
        # conjunct order in the merged join condition (checked against
        # the captured plan): this bound lands FIRST, the pushed-down
        # Levenshtein score second — so the expensive expression only
        # evaluates on pairs the integer bound lets through
        joined = joined.where(
            (den_ub > 0) & (num_ub / den_ub >= F.lit(float(threshold)))
        )
    # stage the per-field similarities as ONE projection: each
    # Levenshtein evaluates once per pair (an alias is an attribute
    # reference downstream; inlining `sim` into both the weighted sum
    # and the availability mask would recompute it per reference)
    staged = joined.select(
        "id_a",
        "id_b",
        *[
            field_similarity_col(F.col(f"__a_{c}"), F.col(f"__b_{c}")).alias(
                f"__sim_{c}"
            )
            for c in compare_cols
        ],
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    for c, w in zip(compare_cols, weights):
        sim = F.col(f"__sim_{c}")
        num = num + F.coalesce(sim * F.lit(float(w)), F.lit(0.0))
        den = den + F.when(sim.isNull(), F.lit(0.0)).otherwise(F.lit(float(w)))
    score = F.when(den > 0, num / den)
    return (
        staged.select("id_a", "id_b", score.alias("score"))
        .where(F.col("score") >= F.lit(float(threshold)))
        .groupBy("id_a", "id_b")
        .agg(F.max("score").alias("score"))
    )


def resolve_entities(
    records: DataFrame,
    id_col: str,
    blocking_keys: Sequence[Column],
    compare_cols: Sequence[str],
    *,
    weights: Sequence[float] | None = None,
    threshold: float = 0.9,
    max_block_size: int | None = 10_000,
) -> DataFrame:
    """End-to-end entity resolution: ``match_pairs`` → connected
    components → (id, entity_id) where ``entity_id`` is the smallest
    member id of the entity. Records that matched nothing resolve to
    themselves (total clustering over the input)."""
    pairs = match_pairs(
        records,
        id_col,
        blocking_keys,
        compare_cols,
        weights=weights,
        threshold=threshold,
        max_block_size=max_block_size,
    )
    clusters = duplicate_clusters(pairs, "id_a", "id_b")
    ids = records.select(F.col(id_col).alias("id"))
    return ids.join(clusters, "id", "left").select(
        "id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("entity_id")
    )
