"""Sparse-retrieval index operators: a persisted BM25 inverted index
as a plateau dataset.

The batch scorer (``operators/text.py:bm25_topk``) re-derives term
statistics from the corpus on every call — right for one-off scoring,
wrong for a serving path over a 100 TB corpus. Here the classic
build-once/query-many split: ``build_text_index`` materializes the
posting lists (term, doc, tf, dl) ONCE as a term-clustered dataset
with term zone maps + Bloom sidecars, and ``query_text_index`` turns a
query batch into a file-pruned dataset read that touches O(query
terms) files, never the corpus — the lexical twin of the persisted IVF
ANN index (``operators/similarity.py:build_ivf_index``). The index IS
a dataset: atomic commit, GC, compaction, time travel all apply.

Reference parity note: the reference engine has no retrieval tier;
this is a north-star extension (SURVEY.md §7 Phase 3) built entirely
on the dataset layer's pruning substrate (plans/zonemaps.py,
plans/blooms.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: BM25 parameters (Okapi defaults; Lucene idf variant).
DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def _tokens(col: str) -> F.Column:
    """The shared corpus tokenizer (identical to text.py/bm25_topk)."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(col))), r"[^\p{L}\p{N}]+"), lambda t: t != ""
    )


def _postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, <id_col>, tf, dl) posting rows from a document frame.

    The token array materializes once per row (explode_outer skips the
    inferred size>0 pre-filter that would re-expand the tokenizer), and
    doc length = the array size rides every exploded row into the tf
    aggregation — no per-doc window/aggregation or join anywhere.
    """
    exploded = (
        df.select(F.col(id_col).alias("__id__"), _tokens(text_col).alias("__toks__"))
        .select(
            "__id__",
            F.size("__toks__").cast("long").alias("__dl__"),
            F.explode_outer("__toks__").alias("term"),
        )
        .where(F.col("term").isNotNull())
    )
    return (
        exploded.groupBy("__id__", "term")
        .agg(F.count("*").alias("tf"), F.first("__dl__").alias("dl"))
        .select("term", F.col("__id__").alias(id_col), "tf", "dl")
    )


def build_text_index(
    spark,
    store,
    index_uuid: str,
    corpus: DataFrame,
    *,
    id_col: str,
    text_col: str,
    index_files: int = 32,
    overwrite: bool = False,
):
    """Build and persist a BM25 inverted index over ``corpus``.

    One explode + one map-side-combined (doc, term) count agg; doc
    length rides every posting row (denormalized — the classic posting
    design, one fewer join per query) as the token-array size carried
    through the explode — no per-doc window/shuffle exists in the
    build. Postings are HASH-CLUSTERED BY TERM into ``index_files``
    files (repartition(n, term) + sortWithinPartitions — hash puts each
    term's postings in exactly ONE file and, unlike repartitionByRange,
    needs no range-sampling job that would execute the whole posting
    pipeline one extra time), and per-file Bloom sidecars on term (the
    string-column pruning substrate — zone maps are numeric-only here
    because parquet writers may truncate string min/max) let a query's
    term IN-predicate prune the file list to the files actually holding
    its terms.
    Corpus-level stats (N, avgdl) land in user metadata — df per term
    is NOT stored: a pruned read returns every posting of the probed
    terms, so df is one count-agg over the already-pruned frame. The
    total token count is a Dataset Observation riding the write job
    (sum of tf over the postings written == sum of doc lengths), so
    the only extra corpus pass is a column-pruned countDistinct over
    the id column — the corpus text is tokenized exactly once.

    Documents with no tokens contribute no postings but count in N and
    in the avgdl denominator (same contract as ``bm25_topk``).
    """
    from pyspark.sql import Observation

    from plateau_spark.sources.dataset import store_dataframe_as_dataset

    postings = _postings(corpus, id_col, text_col)

    # ids only — no tokenizer in this pass (toklen rides the write)
    n_docs = int(
        corpus.agg(F.countDistinct(id_col).alias("n")).collect()[0]["n"] or 0
    )
    if not n_docs:
        raise ValueError("cannot build a text index over an empty corpus")

    obs = Observation()
    clustered = (
        postings.observe(obs, F.sum("tf").alias("toklen"))
        .repartition(index_files, "term")
        .sortWithinPartitions("term")
    )

    def _bm25_metadata() -> dict:
        # evaluated by store_dataframe_as_dataset AFTER the write job,
        # when the observed metric is available
        toklen = int(obs.get["toklen"] or 0)
        return {
            "bm25": {
                "id_col": id_col,
                "text_col": text_col,
                "n_docs": n_docs,
                # total token count rides along so incremental appends
                # (update_text_index) can recompute avgdl EXACTLY
                "toklen": toklen,
                "avgdl": toklen / n_docs,
            }
        }

    return store_dataframe_as_dataset(
        spark,
        store,
        index_uuid,
        clustered,
        bloom_filter_columns=["term"],
        overwrite=overwrite,
        metadata=_bm25_metadata,
    )


def update_text_index(
    spark,
    store,
    index_uuid: str,
    new_docs: DataFrame,
):
    """Append new documents to a persisted BM25 index incrementally —
    O(new docs) work, no rebuild: the new postings (same explode + tf
    agg with the doc length riding the exploded rows, as the build)
    land as an ordinary dataset
    append (atomic commit; the dataset-level Bloom declaration builds
    sidecars for the new files automatically), and the corpus stats in
    user metadata advance exactly (n_docs += new docs, toklen += new
    tokens, avgdl recomputed from the totals). Because per-term df is
    derived from the pruned read at query time — never stored — a
    post-append ``query_text_index`` returns EXACTLY what a fresh
    ``bm25_topk``/rebuild over the full corpus would (test-asserted).

    Append-only contract (like the dataset layer's update semantics):
    the caller must not re-add an already-indexed ``id_col`` value —
    postings are keyed by (term, id) and a duplicate id would
    double-count its terms. New files span the term range until the
    next ``compact_dataset`` restores term clustering; Bloom pruning
    is per-file, so reads stay correct and pruned either way.
    """
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.sources.dataset import (
        _ensure_store,
        update_dataset_from_dataframe,
    )

    from pyspark.sql import Observation

    st = _ensure_store(store)
    meta = DatasetMetadata.load(st, index_uuid)
    bm25 = dict(meta.metadata["bm25"])
    id_col, text_col = bm25["id_col"], bm25["text_col"]

    postings = _postings(new_docs, id_col, text_col)

    # same stats shape as the build: ids-only agg (no tokenizer), new
    # token total observed on the append's own write job
    n_new = int(
        new_docs.agg(F.countDistinct(id_col).alias("n")).collect()[0]["n"] or 0
    )
    obs = Observation()

    def _bm25_metadata() -> dict:
        n2 = int(bm25["n_docs"]) + n_new
        toklen2 = int(bm25["toklen"]) + int(obs.get["toklen"] or 0)
        out = dict(bm25)
        out.update(n_docs=n2, toklen=toklen2, avgdl=toklen2 / n2)
        return {"bm25": out}

    # override (not merge): user-metadata merge DROPS conflicting leaves
    # by the reference rule, but index stats MUST advance on append
    return update_dataset_from_dataframe(
        spark,
        st,
        index_uuid,
        postings.observe(obs, F.sum("tf").alias("toklen")),
        override_metadata=_bm25_metadata,
    )


def mine_hard_negatives(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    pairs: DataFrame,
    *,
    query_text_col: str = "query_text",
    positive_id_col: str = "positive_id",
    query_id_col: str = "query_id",
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """BM25 hard-negative mining for retrieval/embedding training
    (DPR-style): for each (query, positive document) training pair,
    the top-``k`` BM25-scored corpus documents EXCLUDING the positive —
    the lexically-confusable negatives that make contrastive training
    hard. ``pairs`` holds (query_id, query_text, positive_id).

    Composition: ``bm25_topk`` over the corpus with the pair queries
    (broadcast — training-pair batches are small next to the corpus),
    then an anti-filter on the pair's own positive id and a re-rank, so
    every query still yields ``k`` negatives when available. Scale cost
    is the one BM25 pass; the positive filter is a broadcast join.

    Returns (query_id, <id_col>, score, rank) with rank 1..k per query
    over the negatives only.
    """
    from pyspark.sql import Window

    from plateau_spark.operators.text import bm25_topk

    qrows = pairs.select(query_id_col, query_text_col, positive_id_col).collect()
    if not qrows:
        raise ValueError("pairs must be non-empty")
    queries = {str(r[query_id_col]): r[query_text_col] for r in qrows}
    if len(queries) != len(qrows):
        raise ValueError("query ids in pairs must be unique")
    # k+1 candidates: dropping the positive must still leave k
    scored = bm25_topk(corpus, id_col, text_col, queries, k=k + 1, k1=k1, b=b)
    positives = pairs.select(
        F.col(query_id_col).cast("string").alias(query_id_col),
        F.col(positive_id_col).alias(id_col),
    )
    negatives = scored.join(F.broadcast(positives), [query_id_col, id_col], "left_anti")
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        negatives.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def rrf_fuse(
    rankings,
    *,
    id_col: str,
    query_id_col: str = "query_id",
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N per-query
    rankings — the standard hybrid-search combiner for dense (cosine
    top-k) + sparse (BM25) retrieval: each list contributes
    ``1/(rrf_k + rank)`` per (query, doc), summed across lists.
    Rank-only fusion sidesteps score-scale mismatch between retrievers
    and — because every input rank is already engine-deterministic —
    keeps the fused ranking fully deterministic too (round(score, 6) +
    doc-id tie-break, same convention as the retrievers).

    ``rankings``: DataFrames each holding (query_id_col, id_col, rank).
    Returns (query_id, <id_col>, rrf_score, n_lists, rank) — ``n_lists``
    is how many input rankings contained the doc.

    Scale shape: a union of the (already small — O(queries × k) rows)
    ranking frames + one keyed agg + windowed top-k. The heavy lifting
    stays in the retrievers.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    from functools import reduce

    from pyspark.sql import Window

    contribs = [
        r.select(
            F.col(query_id_col).cast("string").alias(query_id_col),
            F.col(id_col),
            (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias("__c__"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = u.groupBy(query_id_col, id_col).agg(
        F.round(F.sum("__c__"), 6).alias("rrf_score"),
        F.count("*").alias("n_lists"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rrf_score", "n_lists", "rank")
    )


def query_text_index(
    spark,
    store,
    index_uuid: str,
    queries,
    *,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    query_id_col: str = "query_id",
) -> DataFrame:
    """BM25 top-k over a persisted inverted index (``build_text_index``).

    The query batch's distinct terms (human-scale — bounded driver
    state, like IVF probe cells) become an IN-predicate on the
    posting dataset's term column: per-file Bloom sidecars prune the
    file list to the posting files actually holding those terms, the
    scan reads only (term, id, tf, dl), and scoring is a broadcast
    query-term join + one keyed agg over the pruned frame. Identical
    scores to ``bm25_topk`` on the same corpus (same formula, same
    round(…, 6) + doc-id tie-break).
    """
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.sources.dataset import _ensure_store, read_dataset_as_dataframe
    from pyspark.sql import Window

    st = _ensure_store(store)
    meta = DatasetMetadata.load(st, index_uuid)
    bm25 = meta.metadata["bm25"]
    id_col, n_docs, avgdl = bm25["id_col"], int(bm25["n_docs"]), float(bm25["avgdl"])

    qrows = list(queries.items()) if isinstance(queries, dict) else list(queries)
    if not qrows:
        raise ValueError("queries must be non-empty")
    qdf = spark.createDataFrame(qrows, f"{query_id_col} string, __qtext__ string")
    qterms = qdf.select(
        query_id_col, F.explode(_tokens("__qtext__")).alias("term")
    ).dropDuplicates([query_id_col, "term"])
    terms = sorted({r["term"] for r in qterms.select("term").distinct().collect()})
    if not terms:
        raise ValueError("queries tokenize to no terms")

    postings = read_dataset_as_dataframe(
        spark,
        st,
        index_uuid,
        columns=["term", id_col, "tf", "dl"],
        predicates=[[("term", "in", terms)]],
    )
    # df per probed term: the pruned read holds ALL postings of these
    # terms (one row per (term, doc)) — a tiny per-term count off the
    # pruned read, broadcast back: the postings cross exactly one wide
    # exchange (the scoring agg) and the df exchange is bounded by the
    # probed terms. (The r15 count(*)-window form paid an extra
    # exchange+sort of the postings by term — reverted r16 with the
    # batch scorer, see operators/text.py.)
    dfreq = postings.groupBy("term").agg(F.count("*").alias("__df__"))
    postings = postings.join(F.broadcast(dfreq), "term")

    idf = F.log(
        F.lit(1.0) + (F.lit(n_docs) - F.col("__df__") + 0.5) / (F.col("__df__") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )
