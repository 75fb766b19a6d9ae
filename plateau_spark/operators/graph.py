"""Link-graph analytics for web-corpus curation: weighted PageRank.

Not in the reference (SURVEY.md §2.7 — no graph surface); north-star
extension: domain-level PageRank / centrality is a standard quality
prior for web-crawl training data (seed-domain weighting, crawl
frontier ordering, spam demotion) — the Common Crawl ecosystem ranks
hosts exactly this way.

Scale shape: the classic distributed PageRank loop —
  - out-weights computed ONCE (one keyed agg, integer-exact for count
    weights) and carried on the edge frame, which is checkpointed so
    the join lineage doesn't grow per iteration;
  - each iteration is one hash join (edges ⋈ ranks on src, the same
    key every round — AQE reuses the layout) plus one groupBy(dst);
  - ranks are |V|-sized (domains, not documents) — tiny next to the
    corpus; the edge frame is the big side and it never re-shuffles
    on a different key.
A dst-side hot domain (everyone links to google.com) concentrates one
reducer; the aggregation is associative partial-combine, so map-side
combine absorbs it.

``deterministic_fold=True`` makes each node's contribution sum a
sorted left-to-right fold (collect_list → array_sort → aggregate)
instead of ``sum()`` — bit-reproducible across engines/partitionings
(the oracle-twin mode, same discipline as the embedding dot products
in entry_queries.py). Production mode (False) uses plain ``sum()``:
same result up to float association, no per-group array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    *,
    damping: float = 0.85,
    iterations: int = 3,
    deterministic_fold: bool = False,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Weighted PageRank over an edge list → (node, rank).

    ``edges``: one row per (src, dst[, weight]); duplicate pairs are
    combined by weight sum (count when ``weight_col`` is None).

    Dangling (no-out-edge) nodes: by default their rank mass leaks each
    iteration — keep self-loops in the input (or pre-add them) if the
    graph has sinks. ``redistribute_dangling=True`` applies the
    standard correction instead: the summed rank of dangling nodes is
    spread uniformly over ALL nodes each iteration
    (``r'(v) = (1-d)/|V| + d·(Σ contribs + dm/|V|)``). Cost: one extra
    scalar aggregation job per iteration over the |V|-sized rank frame
    (KB-scale driver state) — the dangling node set itself is computed
    once. Under ``deterministic_fold`` the dangling sum is also a
    sorted fold, keeping the whole update bit-reproducible.

    Ranks initialize to 1/|V| and update
    ``r'(v) = (1-d)/|V| + d·Σ_u r(u)·w(u,v)/outw(u)`` for
    ``iterations`` rounds. |V| is one count job (driver scalar — node
    sets are domain-scale, not corpus-scale).
    """
    if not 0 < damping < 1:
        raise ValueError("damping must be in (0, 1)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1).cast("double")
    )
    e = (
        edges.groupBy(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .agg(F.sum(w).alias("w"))
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    e = e.join(outw, "src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    base = F.lit(1.0 - damping) / F.lit(float(n))
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
    dangling = None
    if redistribute_dangling:
        # computed once: nodes with no out-edges (anti join vs out-weights)
        dangling = nodes.join(
            outw.withColumnRenamed("src", "node"), "node", "left_anti"
        ).localCheckpoint(eager=False)
    for _ in range(iterations):
        dm_term = F.lit(0.0)
        if redistribute_dangling:
            dr = dangling.join(ranks, "node")
            if deterministic_fold:
                dm_row = dr.agg(
                    F.aggregate(
                        F.array_sort(F.collect_list(F.struct("node", "rank"))),
                        F.lit(0.0),
                        lambda acc, x: acc + x["rank"],
                    ).alias("dm")
                ).first()
            else:
                dm_row = dr.agg(F.sum("rank").alias("dm")).first()
            dm = float(dm_row["dm"] or 0.0)
            dm_term = F.lit(dm) / F.lit(float(n))
        contrib_val = (F.col("rank") * F.col("w")) / F.col("ow")
        joined = e.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select("src", "dst", contrib_val.alias("val"))
        if deterministic_fold:
            contribs = joined.groupBy("dst").agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("src", "val"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["val"],
                ).alias("c")
            )
        else:
            contribs = joined.groupBy("dst").agg(F.sum("val").alias("c"))
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    base
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + dm_term)
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
