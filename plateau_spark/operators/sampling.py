"""Deterministic sampling / splitting for training-data pipelines.

North-star extension operators (not in the reference, SURVEY.md §2.7).
Everything here is reproducible across engines and runs: the randomness
source is md5 of a key column, so a row's split/sample fate is a pure
function of its key — re-running on new hardware, a different engine, or
a grown corpus never reshuffles previously assigned rows (the property
train/val splits actually need; Spark's df.sample is seed×partitioning
dependent and DuckDB can't replay it).

All operators are single narrow projections or one windowed shuffle —
no Python, no driver state; identical cost profile at 100 TB.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plateau_spark.core.caching import persist_shared


def _hash_unit(key_col: str, salt: str) -> F.Column:
    """Uniform [0, 1) double from md5(salt|key) — 8 hex chars = 32 bits,
    bit-reproducible in any engine with md5 (DuckDB twin:
    CAST('0x'||substr(md5(...),1,8) AS BIGINT) / 4294967296.0)."""
    h = F.md5(F.encode(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")), "UTF-8"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def deterministic_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    *,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split with probability ~fractions,
    as a pure function of ``key_col`` (stable under reruns, engine
    changes, and corpus growth). Fractions must sum to ≤ 1; remainder
    rows get the LAST split name (so {"train": .9, "val": .1} is exact).
    """
    total = sum(fractions.values())
    if not 0 < total <= 1 + 1e-9:
        raise ValueError(f"fractions must sum to (0, 1], got {total}")
    u = _hash_unit(key_col, salt)
    names = list(fractions)
    expr = F.lit(names[-1])
    acc = 0.0
    # build the when-chain from the first boundary up
    conds = []
    for name, frac in fractions.items():
        acc += frac
        conds.append((name, acc))
    for name, bound in reversed(conds[:-1]):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    # rows above the last boundary (only when total < 1) also fall into
    # the last split via the otherwise-chain above
    return df.withColumn(split_col, expr)


def temperature_resample(
    df: DataFrame,
    group_cols: Sequence[str],
    *,
    key_col: str,
    target_rows: int,
    alpha: float = 0.7,
    salt: str = "temp",
    keep_prob_col: str | None = None,
) -> DataFrame:
    """Temperature-flattened group resampling — the multilingual
    training-mix policy (sample language g with probability ∝ p_g^α,
    α<1 upweights the tail): q_g = n_g^α / Σ n_h^α, per-row keep
    probability = min(1, q_g·target_rows / n_g), kept iff
    md5-uniform(key) < keep_p. Downsampling only (a keep_p that clips
    at 1 leaves that group complete; no row duplication) — so the
    realized mix approaches the temperature mix as target_rows allows.

    Determinism: the keep decision is a pure function of ``key_col``
    (same md5-unit source as ``deterministic_split``), so the sample is
    reproducible across engines/runs and stable under corpus growth
    within unchanged groups.

    Scale shape: one tiny keyed agg (|groups| rows) broadcast-joined
    back, then a codegen filter — no window, no skew sensitivity.
    ``keep_prob_col`` optionally emits the per-row keep probability.

    NULL group keys form a real group: the join back is null-safe
    (``eqNullSafe``), so rows with a NULL key participate in the mix at
    exactly the probability their count implies, instead of being
    counted in the denominator and then silently dropped.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    group_cols = list(group_cols)
    counts = df.groupBy(*group_cols).agg(F.count("*").alias("__n__"))
    qdenom = counts.agg(F.sum(F.pow(F.col("__n__"), F.lit(alpha))).alias("__d__"))
    probs = counts.crossJoin(F.broadcast(qdenom)).select(
        *group_cols,
        F.least(
            F.lit(1.0),
            F.pow(F.col("__n__"), F.lit(alpha))
            / F.col("__d__")
            * F.lit(float(target_rows))
            / F.col("__n__"),
        ).alias("__keep_p__"),
    )
    join_cond = reduce(
        lambda a, b: a & b, [df[c].eqNullSafe(probs[c]) for c in group_cols]
    )
    out = (
        df.join(F.broadcast(probs), join_cond)
        .select(df["*"], probs["__keep_p__"])
        .where(_hash_unit(key_col, salt) < F.col("__keep_p__"))
    )
    if keep_prob_col is not None:
        return out.withColumnRenamed("__keep_p__", keep_prob_col)
    return out.drop("__keep_p__")


def quota_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    quota: int,
    *,
    key_col: str,
    salt: str = "quota",
) -> DataFrame:
    """At most ``quota`` rows per group, chosen deterministically (the
    quota ranks by md5(salt|key) — a reproducible uniform draw, so the
    same rows win on every engine/run). The balancing step for skewed
    sources/languages before training.

    Scale shape: a TWO-LEVEL tournament, not one window. Groups are hot
    by definition here (a whole language/domain is one group), and a
    window keyed on ``group_cols`` alone sorts every row of that group
    in ONE task — the straggler shape at 100 TB. Stage 1 ranks within
    (group, hash-bucket) — each task holds ~n_g/buckets rows — and keeps
    the per-bucket top-``quota``; stage 2 re-ranks the surviving
    ≤ buckets×quota rows per group. The global top-quota is contained in
    the union of per-bucket top-quotas, so the result is IDENTICAL to
    the single-window formulation (asserted by tests); the second sort
    is bounded regardless of group size. Stage-2 memory bounds quota to
    ~10⁷ per group at default buckets; beyond that, raise
    ``tournament_buckets`` awareness or pre-split groups.
    """
    rank_keys = [_hash_unit(key_col, salt).asc(), F.col(key_col).asc()]
    buckets = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(buckets))
    w1 = Window.partitionBy(*group_cols, "__bkt__").orderBy(*rank_keys)
    survivors = (
        df.withColumn("__bkt__", bucket)
        .withColumn("__rk__", F.row_number().over(w1))
        .where(F.col("__rk__") <= quota)
        .drop("__bkt__", "__rk__")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*rank_keys)
    return (
        survivors.withColumn("__rk__", F.row_number().over(w2))
        .where(F.col("__rk__") <= quota)
        .drop("__rk__")
    )

def stratified_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    fractions: "dict[tuple | str, float]",
    *,
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep each row with the
    fraction configured for its group (``sampleBy`` semantics, but as a
    pure function of ``key_col`` so the sample is reproducible across
    engines/runs and stable under corpus growth — Spark's native
    ``DataFrame.sampleBy`` is seed×partitioning dependent).

    ``fractions`` maps a group value (scalar for one group column, tuple
    for several) to its keep fraction; unlisted groups fall back to
    ``default_fraction`` (0.0 = drop — the "curate named sources, drop
    the rest" policy).

    Scale shape: the fraction table is O(|configured groups|) rows,
    broadcast-joined (null-safe) back onto the data, then one codegen
    filter — no window, no skew sensitivity, identical at 100 TB.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    group_cols = list(group_cols)
    rows = []
    for gval, frac in fractions.items():
        if not isinstance(gval, tuple):
            gval = (gval,)
        if len(gval) != len(group_cols):
            raise ValueError(
                f"group value {gval!r} arity != group_cols {group_cols}"
            )
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {gval!r} not in [0, 1]: {frac}")
        rows.append((*gval, float(frac)))
    spark = df.sparkSession
    # explicit schema (group-col types lifted from df): a stratum value
    # of NULL is legal (NULL-keyed groups are real groups here), and
    # inference can't type an all-NULL column
    from pyspark.sql import types as T

    by_name = {f.name: f for f in df.schema.fields}
    missing = [c for c in group_cols if c not in by_name]
    if missing:
        raise ValueError(f"group_cols not in DataFrame: {missing}")
    schema = T.StructType(
        [T.StructField(c, by_name[c].dataType, True) for c in group_cols]
        + [T.StructField("__frac__", T.DoubleType(), False)]
    )
    ftab = spark.createDataFrame(rows, schema)
    join_cond = reduce(
        lambda a, b: a & b, [df[c].eqNullSafe(ftab[c]) for c in group_cols]
    )
    return (
        df.join(F.broadcast(ftab), join_cond, "left")
        .select(
            df["*"],
            F.coalesce(ftab["__frac__"], F.lit(float(default_fraction))).alias(
                "__frac__"
            ),
        )
        .where(_hash_unit(key_col, salt) < F.col("__frac__"))
        .drop("__frac__")
    )


def quality_tiers(
    df: DataFrame,
    score_col: str,
    *,
    tiers: Sequence[tuple[str, float]] = (
        ("head", 0.1),
        ("middle", 0.5),
        ("tail", 1.0),
    ),
    scale: int = 1000,
    tier_col: str = "tier",
    best: str = "high",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """CCNet-style corpus tiering: label each row head/middle/tail by
    the empirical CDF of its quality score (head = best ``tiers[0][1]``
    fraction, descending). The whole score-bucket a row belongs to gets
    ONE tier (ties never straddle a boundary), so the labeling is
    deterministic and engine-independent.

    Scale shape: scores are bucketed to ``floor(score*scale)`` (exact
    integer op — no float rounding-mode ambiguity across engines), so
    the CDF is a keyed aggregation down to ≤ O(scale) histogram rows
    (map-side combine shrinks hot buckets), one tiny single-partition
    window over the histogram, and a broadcast join back. No global
    sort of the data ever happens — the shape CCNet's sort-by-perplexity
    formulation would need — so this holds at 100 TB.

    ``best="high"`` (default) puts the LARGEST scores in the first
    tier; ``best="low"`` the smallest (the perplexity/NLL orientation:
    CCNet's head is the LOWEST-perplexity slice). ``group_cols``
    computes the CDF within each group (CCNet tiers per LANGUAGE): the
    histogram keys on (groups, bucket), the window partitions by the
    groups — still ≤ O(|groups|·scale) histogram rows, still no data
    sort.
    """
    tiers = list(tiers)
    if not tiers or abs(tiers[-1][1] - 1.0) > 1e-9:
        raise ValueError("tiers must be non-empty and end at boundary 1.0")
    if best not in ("high", "low"):
        raise ValueError(f"best must be 'high' or 'low', got {best!r}")
    group_cols = list(group_cols)
    bucket = F.floor(F.col(score_col) * F.lit(int(scale))).cast("long")
    hist = (
        df.select(*group_cols, bucket.alias("__b__"))
        .groupBy(*group_cols, "__b__")
        .agg(F.count("*").alias("__c__"))
    )
    # tiny table (≤ |groups|·(scale+1) rows): per-group window is fine
    order = F.col("__b__").desc() if best == "high" else F.col("__b__").asc()
    w = Window.partitionBy(*group_cols).orderBy(order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = hist.select(
        *group_cols,
        "__b__",
        (
            F.sum("__c__").over(w) * F.lit(1.0) / F.sum("__c__").over(total)
        ).alias("__cf__"),
    )
    expr = F.lit(tiers[-1][0])
    for name, bound in reversed(tiers[:-1]):
        expr = F.when(F.col("__cf__") <= F.lit(float(bound)), F.lit(name)).otherwise(expr)
    labeled = cdf.select(*group_cols, "__b__", expr.alias(tier_col))
    return (
        df.withColumn("__b__", bucket)
        .join(F.broadcast(labeled), [*group_cols, "__b__"])
        .drop("__b__")
    )


def mixture_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    weights: "dict[tuple | str, float]",
    *,
    key_col: str,
    budget: int,
    size_col: str | None = None,
    salt: str = "mix",
    keep_prob_col: str | None = None,
) -> DataFrame:
    """Token-budget corpus mixing: downsample each source toward a
    target mix. Source s gets a target of ``budget * w_s / Σw``
    units (rows, or ``size_col`` units — e.g. token counts); its
    per-row keep probability is ``min(1, target_s / size_s)``.
    Sources absent from ``weights`` are dropped (weight 0) — the
    "curate named sources into a fixed training budget" policy
    (the static variant of DoReMi-style mixture weighting).

    Determinism: the keep decision is a pure md5 function of
    ``key_col`` (same source as ``deterministic_split``), so the mix
    is reproducible across engines/runs; a clipped source (keep_p = 1)
    contributes everything it has.

    Scale shape: one keyed agg down to |sources| rows, the weight
    table broadcast-joined onto it driver-free, then one broadcast
    join back to the data and a codegen filter — no window, no data
    shuffle, no skew sensitivity at 100 TB.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    group_cols = list(group_cols)
    wrows = []
    for gval, w in weights.items():
        if not isinstance(gval, tuple):
            gval = (gval,)
        if len(gval) != len(group_cols):
            raise ValueError(
                f"weight key {gval!r} arity != group_cols {group_cols}"
            )
        if w < 0:
            raise ValueError(f"negative weight for {gval!r}: {w}")
        wrows.append((*gval, float(w)))
    wsum = sum(r[-1] for r in wrows)
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")

    from pyspark.sql import types as T

    by_name = {f.name: f for f in df.schema.fields}
    missing = [c for c in group_cols if c not in by_name]
    if missing:
        raise ValueError(f"group_cols not in DataFrame: {missing}")
    wschema = T.StructType(
        [T.StructField(c, by_name[c].dataType, True) for c in group_cols]
        + [T.StructField("__w__", T.DoubleType(), False)]
    )
    wtab = df.sparkSession.createDataFrame(wrows, wschema)

    unit = F.lit(1.0) if size_col is None else F.col(size_col).cast("double")
    sizes = df.groupBy(*group_cols).agg(F.sum(unit).alias("__sz__"))
    jc = reduce(
        lambda a, b: a & b, [sizes[c].eqNullSafe(wtab[c]) for c in group_cols]
    )
    probs = sizes.join(F.broadcast(wtab), jc, "inner").select(
        *[sizes[c] for c in group_cols],
        F.least(
            F.lit(1.0),
            F.col("__w__") / F.lit(wsum) * F.lit(float(budget)) / F.col("__sz__"),
        ).alias("__keep_p__"),
    )
    jc2 = reduce(
        lambda a, b: a & b, [df[c].eqNullSafe(probs[c]) for c in group_cols]
    )
    out = (
        df.join(F.broadcast(probs), jc2)
        .select(df["*"], probs["__keep_p__"])
        .where(_hash_unit(key_col, salt) < F.col("__keep_p__"))
    )
    if keep_prob_col is not None:
        return out.withColumnRenamed("__keep_p__", keep_prob_col)
    return out.drop("__keep_p__")


def deterministic_shuffle(
    df: DataFrame,
    id_cols: Sequence[str] | str,
    *,
    seed: int | str = 0,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Deterministic global pseudo-random reorder — the training-epoch
    shuffle: every epoch's data order is a pure function of (ids, seed),
    reproducible across runs/clusters and independent of input file
    layout. Change ``seed`` per epoch for a fresh order.

    Plan shape: ORDER BY a seeded hash of the id columns → Spark's sort
    is a RANGE exchange (sampled boundaries, one pass) + per-partition
    sort — the standard distributed total order, no driver state and no
    single-task bottleneck at 100 TB. Downstream ``LIMIT k`` collapses
    to TakeOrderedAndProject (per-partition top-k, no global sort), so
    "first N of the epoch" is cheap. Writing the result with
    ``store_dataframe_as_dataset`` preserves the order per file via the
    final sort's partitioning.

    ``hash_family``: "xxhash64" (default, JVM codegen) or "md5" (64-bit
    prefix of md5 — bit-reproducible in any engine, the oracle family).
    Ties (hash collisions) break on the id columns, so the order is a
    strict total order either way.

    The returned frame carries ``__shuffle_key__`` (drop it after any
    re-partitioning write if undesired); downstream zips/packs can use
    it as the epoch-position key.
    """
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    ids = [F.col(c) for c in id_cols]
    if hash_family == "xxhash64":
        key = F.xxhash64(F.lit(str(seed)), *ids)
    elif hash_family == "md5":
        key = F.conv(
            F.substring(
                F.md5(F.encode(F.concat_ws(":", F.lit(str(seed)), *ids), "UTF-8")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    return df.withColumn("__shuffle_key__", key).orderBy(
        "__shuffle_key__", *id_cols
    )


def score_weighted_sample(
    df: DataFrame,
    key_col: str,
    score_col: str,
    *,
    salt: str = "sws",
    floor: float = 0.0,
    ceiling: float = 1.0,
) -> DataFrame:
    """Soft quality filtering (FineWeb-style): keep each row with
    probability equal to its per-row score (clamped to
    ``[floor, ceiling]``) — a hard threshold throws away everything
    below the line; weighting keeps a calibrated fraction of mid-quality
    data, which matters when the filter model is imperfect.

    Row fate is a pure md5 hash of ``key_col`` compared against the
    row's own clamped score: deterministic across reruns/engines, no
    RNG state, zero shuffle (one codegen filter). NULL scores drop
    (an unscored row has no keep probability).
    """
    if not 0.0 <= floor <= ceiling <= 1.0:
        raise ValueError(f"need 0 <= floor <= ceiling <= 1, got [{floor}, {ceiling}]")
    p = F.least(
        F.greatest(F.col(score_col).cast("double"), F.lit(float(floor))),
        F.lit(float(ceiling)),
    )
    return df.where(_hash_unit(key_col, salt) < p)


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
# 2023): select raw-corpus documents whose hashed n-gram profile looks
# like a small high-quality TARGET corpus. The standard
# pretraining-data curation shape: fit two hashed bag-of-ngrams models
# (target and raw), score every raw document with its log importance
# weight, then Gumbel-top-k resample (sampling without replacement
# proportional to softmax of the weights).
# ---------------------------------------------------------------------------


def _hashed_ngram_features(text_col: str, salt: str, n_buckets: int) -> F.Column:
    """Array of md5-hashed feature buckets (unigrams + bigrams, WITH
    duplicates — DSIR counts feature occurrences). 15 hex chars = 60
    bits, bit-reproducible in DuckDB as ('0x'||substr(md5(...),1,15))
    ::BIGINT % n_buckets (both operands non-negative → % == pmod)."""
    from plateau_spark.core.exprs import bind_col
    from plateau_spark.operators.text import _word_tokens

    def _feats(toks):
        # toks is a bound lambda variable (bind_col): tokenize once per
        # row instead of once per reference (5 refs below)
        bigrams = F.when(
            F.size(toks) >= 2,
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.transform(
            F.concat(toks, bigrams),
            lambda t: F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.encode(F.concat_ws("|", F.lit(salt), t), "UTF-8")),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(int(n_buckets)),
            ),
        )

    return bind_col(_word_tokens(text_col), _feats)


def _bucket_counts(df: DataFrame, text_col: str, salt: str, n_buckets: int) -> DataFrame:
    """(bucket, count) over a corpus — one explode pass + one keyed agg
    (map-side combine absorbs hot buckets); ≤ n_buckets result rows."""
    return (
        df.select(
            F.explode(_hashed_ngram_features(text_col, salt, n_buckets)).alias("__b__")
        )
        .groupBy("__b__")
        .agg(F.count("*").alias("__c__"))
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 4096,
    salt: str = "dsir",
    score_col: str = "logw",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document DSIR log importance weight over ``raw``:

        log w(x) = Σ_{f ∈ features(x)} [ log p̂_target(b(f)) − log p̂_raw(b(f)) ]

    with hashed uni+bigram features and add-one smoothing per bucket
    (log p̂(b) = log(c_b + 1) − log(N + n_buckets)) — the paper's hashed
    n-gram generative model, closed-form so the whole fit + scoring is
    oracle-checkable. High logw = looks like the target distribution.

    100 TB shape: ONE explode pass over raw feeds both the model fit
    and the scoring — per-(doc, bucket) counts are aggregated once
    (keyed, map-side combined), the raw bucket model folds out of them
    (≤ n_buckets rows — KBs, broadcast to the scoring join), and
    scoring joins the deduped (doc, bucket) rows (never the raw feature
    stream) against the broadcast model with a k·diff weighted sum.
    The expensive part — scanning the corpus and md5-hashing every
    uni+bigram — happens exactly once; the target corpus (small by
    construction in DSIR) gets its own single pass. No Python, no
    windows, no driver state. Documents with zero features score NULL.
    """
    import math

    doc_buckets = (
        raw.select(
            F.col(id_col),
            F.explode(_hashed_ngram_features(text_col, salt, n_buckets)).alias("__b__"),
        )
        .groupBy(id_col, "__b__")
        .agg(F.count("*").alias("__k__"))
    )
    # the once-per-corpus promise above is only true if the (doc,
    # bucket, count) frame is actually shared: it feeds THREE consumers
    # (raw bucket model, its total, the scoring join) and Spark
    # re-evaluates the whole explode+hash DAG per consumer (verified: 6
    # corpus scans in the executed plan, zero ReusedExchange). Cache
    # both aggregates — persist(), not localCheckpoint, so the plan
    # stays lazy, lineage survives executor loss, and blocks are
    # evictable (see winnow_overlap_pairs). doc_buckets rows are three
    # longs at ≤ distinct-buckets-per-doc density; t_counts is
    # ≤ n_buckets rows.
    # persist_shared: registry-bounded, releasable via
    # core.caching.release_shared_caches (r14 — persists with no release
    # path accumulate CacheManager entries for the session's life)
    doc_buckets = persist_shared(doc_buckets)
    t_counts = persist_shared(_bucket_counts(target, text_col, salt, n_buckets))
    r_counts = doc_buckets.groupBy("__b__").agg(F.sum("__k__").alias("__c__"))
    # totals fold out of the bucket counts (≤ n_buckets rows) — scanning
    # the corpora again for F.sum(F.size(features)) would double the
    # explode passes for the same number
    n_t = t_counts.agg(F.sum("__c__").alias("n"))
    n_r = r_counts.agg(F.sum("__c__").alias("n"))
    # every scored feature occurs in raw (the doc itself is raw), so the
    # raw counts relation covers all buckets the join will probe; the
    # target side null-fills to c=0 (pure smoothing mass)
    model = (
        r_counts.withColumnRenamed("__c__", "__cr__")
        .join(t_counts.withColumnRenamed("__c__", "__ct__"), "__b__", "left")
        .crossJoin(F.broadcast(n_t.withColumnRenamed("n", "__nt__")))
        .crossJoin(F.broadcast(n_r.withColumnRenamed("n", "__nr__")))
        .select(
            "__b__",
            (
                (F.log(F.coalesce(F.col("__ct__"), F.lit(0)) + F.lit(1))
                 - F.log(F.col("__nt__") + F.lit(float(n_buckets))))
                - (F.log(F.col("__cr__") + F.lit(1))
                   - F.log(F.col("__nr__") + F.lit(float(n_buckets))))
            ).alias("__diff__"),
        )
    )
    scored = (
        doc_buckets.join(F.broadcast(model), "__b__")
        .groupBy(id_col)
        .agg(F.sum(F.col("__diff__") * F.col("__k__")).alias("__lw__"))
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(F.col(id_col), F.round("__lw__", round_digits).alias(score_col))
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    *,
    n_buckets: int = 4096,
    salt: str = "dsir",
    temperature: float = 1.0,
    score_col: str = "logw",
) -> DataFrame:
    """Gumbel-top-k DSIR selection: keep the ``k`` raw documents with the
    largest ``logw/temperature + Gumbel(doc)`` — exactly sampling k
    documents WITHOUT replacement with probability proportional to
    softmax(logw/temperature) (the Gumbel-top-k trick the paper uses).
    The Gumbel noise is a pure md5 hash of the document id
    (g = −ln(−ln(u)), u = (md5₃₂ + 0.5) / 2³²), so the selection is
    deterministic across engines and reruns. temperature → 0 degrades
    to plain top-k; large temperature → uniform sampling. The top-k is
    ``orderBy(...).limit(k)`` — Spark plans TakeOrderedAndProject
    (per-task partial top-k, never a global sort materialization), the
    scale-correct shape for k ≪ corpus. Zero-feature (NULL-logw)
    documents are never selected."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    # the ranking key derives from the ROUNDED weight: both engines then
    # key identical float operands (the md5 Gumbel term is bit-exact
    # integer arithmetic), so the selected SET is cross-engine stable —
    # ordering by the raw double sum would let last-ulp addition-order
    # noise flip ranks at the k boundary
    scored = dsir_logweights(
        raw, target, id_col, text_col,
        n_buckets=n_buckets, salt=salt, score_col=score_col, round_digits=6,
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws("|", F.lit(salt + ":gumbel"), F.col(id_col).cast("string")),
                    "UTF-8",
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    gumbel = -F.log(-F.log(u))
    keyed = scored.where(F.col(score_col).isNotNull()).withColumn(
        "__gk__", F.col(score_col) / F.lit(float(temperature)) + gumbel
    )
    return (
        keyed.orderBy(F.col("__gk__").desc(), F.col(id_col).asc())
        .limit(int(k))
        .select(id_col, score_col)
    )


def weighted_quota_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    quota: int,
    *,
    key_col: str,
    weight_col: str,
    salt: str = "wquota",
) -> DataFrame:
    """At most ``quota`` rows per group, sampled WITHOUT replacement
    with probability proportional to ``weight_col`` — the
    Efraimidis-Spirakis one-pass scheme (rank by ``-ln(u)/w`` with a
    deterministic md5 uniform ``u``, keep the per-group smallest
    ``quota``), so "keep the k best-weighted-lottery docs per
    language/domain" is rerun- and engine-stable. The weighted
    counterpart of :func:`quota_sample` (uniform) and the fixed-SIZE
    counterpart of :func:`score_weighted_sample` (expected-fraction).

    Rows with NULL or non-positive weight are excluded (zero-weight
    items are unsampleable by definition). Ties (identical keys) break
    by ``key_col``.

    Scale shape: the same TWO-LEVEL tournament as ``quota_sample`` —
    per-(group, hash-bucket) top-``quota`` first, then the bounded
    ≤ buckets×quota survivors re-rank per group — because groups (a
    language, a domain) are hot by definition and a single
    group-partitioned window would sort a whole group in one task.
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")),
                    "UTF-8",
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)  # (0,1) — never exactly 0
    es = -F.log(u) / F.col(weight_col).cast("double")
    eligible = df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    rank_keys = [es.asc(), F.col(key_col).asc()]
    buckets = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(buckets))
    w1 = Window.partitionBy(*group_cols, "__bkt__").orderBy(*rank_keys)
    survivors = (
        eligible.withColumn("__bkt__", bucket)
        .withColumn("__rk__", F.row_number().over(w1))
        .where(F.col("__rk__") <= quota)
        .drop("__bkt__", "__rk__")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*rank_keys)
    return (
        survivors.withColumn("__rk__", F.row_number().over(w2))
        .where(F.col("__rk__") <= quota)
        .drop("__rk__")
    )


def calibrate_percent_rank(
    df: DataFrame,
    score_col: str,
    group_cols: Sequence[str] = (),
    *,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Calibrate a raw quality score to its per-group percentile rank
    in [0, 1] — EXACT ``percent_rank()`` semantics ((#rows with a
    strictly smaller score) / (n - 1)), the normalization step before
    mixing scores from different scorers/languages into one corpus
    ordering (a raw perplexity of 80 means different things in 'en'
    and 'zh'; its within-language percentile does not).

    Scale shape — why not ``F.percent_rank().over(...)`` directly: a
    window over ``partitionBy(group)`` sorts EVERY row of a group in
    ONE task, full row payload included — the single-partition-per-
    group trap (a 100 TB corpus with 40% English puts 40 TB through
    one task). Here the window runs over the DISTINCT (group, score)
    aggregate instead: a keyed count agg (map-side combined), a
    running sum over score-distinct rows only, and a join back on
    (group, score). Payload through the sort is three small columns;
    duplicates collapse. Worst case (all-distinct continuous scores)
    degrades to the same cardinality as the naive window but still
    carries only the 3-column frame — discretize upstream (e.g.
    ``F.round(score, 3)``) when that matters.

    NULL scores get a NULL rank (they never participate — matching
    ``PERCENT_RANK`` over a NULLS-excluded frame is undefined across
    engines, so they are excluded outright). Single-row groups get 0.0
    (the SQL convention: (1-1)/max(n-1, 1)).
    """
    gcols = list(group_cols)
    nn = df.where(F.col(score_col).isNotNull())
    counts = nn.groupBy(*gcols, score_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w_run = Window.partitionBy(*gcols).orderBy(F.col(score_col).asc())
    w_all = Window.partitionBy(*gcols)
    pct = (
        counts.withColumn("__below", F.sum("__cnt").over(w_run) - F.col("__cnt"))
        .withColumn("__n", F.sum("__cnt").over(w_all))
        .select(
            *gcols,
            score_col,
            F.when(
                F.col("__n") > 1,
                F.col("__below").cast("double") / (F.col("__n") - F.lit(1)),
            )
            .otherwise(F.lit(0.0))
            .alias(out_col),
        )
    )
    return df.join(pct, on=[*gcols, score_col], how="left")


def mixture_plan(
    df: DataFrame,
    group_cols: Sequence[str],
    weights: "dict[tuple | str, float]",
    *,
    budget: int,
    size_col: str | None = None,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Pre-training mixture PLANNING table - the diagnostic companion of
    :func:`mixture_sample`: per source, how many units exist, how many
    the weighted budget asks for, and the implied epoch count
    (target / available). ``epochs > 1`` means the source repeats;
    ``over_epoch_cap`` flags sources the plan would repeat beyond
    ``max_epochs`` (the empirically-degrading regime - rebalance the
    weights or shrink the budget before launching the run).

    One keyed agg down to |sources| rows + broadcast weight literals -
    the Llama-style "epochs per source" table computed in-engine
    against the real corpus instead of a spreadsheet. All ratios are
    single double divisions over exact integer sums (oracle-exact).
    Sources absent from ``weights`` get weight 0 (epochs 0): listed,
    not silently dropped.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    unit = F.col(size_col).cast("long") if size_col else F.lit(1).cast("long")
    avail = df.groupBy(*group_cols).agg(F.sum(unit).alias("available"))
    # \x1f (unit separator) can't appear in real group values, so joined
    # multi-column keys like ('a','bc') and ('ab','c') never collide
    _SEP = "\x1f"
    key = (
        F.col(group_cols[0]).cast("string")
        if len(group_cols) == 1
        else F.concat_ws(_SEP, *[F.col(c).cast("string") for c in group_cols])
    )
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    wexpr = F.lit(0.0)
    for k, w in weights.items():
        lit = k if isinstance(k, str) else _SEP.join(map(str, k))
        wexpr = F.when(key == F.lit(lit), F.lit(float(w))).otherwise(wexpr)
    planned = avail.select(
        *group_cols,
        "available",
        wexpr.alias("weight"),
        (F.lit(float(budget)) * wexpr / F.lit(total_w)).alias("target"),
    )
    epochs = F.col("target") / F.col("available").cast("double")
    return planned.select(
        *group_cols,
        "available",
        "weight",
        "target",
        epochs.alias("epochs"),
        (epochs > F.lit(float(max_epochs))).alias("over_epoch_cap"),
    )
