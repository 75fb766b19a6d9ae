"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is collected to exhaustion (count of materialized rows) so
the measured time includes the full scan/shuffle/write work, not just
plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from plateau_spark.entry_queries import QUERIES  # noqa: E402
from plateau_spark.session import get_spark  # noqa: E402

# Headline set: the scan/join/agg relational core, the dataset write+
# pruned-read lifecycle, and one of each north-star family. Kept to the
# queries whose runtime is dominated by engine work (not tiny fixtures).
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "window_top_order_per_customer",
    "dataset_pruned_read",
    "dataset_index_read",
    "dataset_bucketed_write",
    "agg_to_lists",
    "dedup_keep_last",
    "text_stats",
    "text_quality",
    "ngram_jaccard",
    "ngram_jaccard_capped",
    "minhash_pairs",
    "simhash_fingerprints",
    "embedding_dup_pairs",
    "embedding_dup_pairs_lsh",
    "sample_split_assign",
    "pipeline_training_data",
    "cosine_topk",
    "streaming_windowed_counts",
    "streaming_sessionize",
    "text_repetition",
    "text_pii_scrub",
    "decontaminate_ngrams",
    "asof_join_events",
    "range_join_windows",
    "sample_temperature",
    "text_chunks",
    "dedup_corpus_docs",
    "dataset_compact_read",
    "streaming_ingest_dataset",
    "dataset_zonemap_read",
    "dataset_schema_evolution",
    "pack_sequences",
    "cosine_topk_ivf_persisted",
    "dedup_paragraphs_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("plateau-spark-bench")
    # warm-up actions so JVM/codegen and Python-worker-pool startup
    # (fixed session costs, not query work) aren't billed to the first query
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s.str.len(), "long")
    spark.range(256, numPartitions=32).selectExpr("cast(id as string) s").select(
        _warm(col("s"))
    ).count()

    # One broken query must never null the whole bench (rounds 3 and 4
    # produced zero perf signal because a streaming crash aborted the
    # loop): every query runs inside try/except, errors are recorded
    # per-query, and the JSON summary line is ALWAYS emitted.
    times: dict[str, object] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.time()
        try:
            fn = QUERIES[name]
            n = fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — bench must survive anything
            msg = f"{type(exc).__name__}: {exc}"
            errors[name] = msg[:500]
            times[name] = {"err": msg[:200]}
            print(f"# {name}: FAILED ({msg.splitlines()[0][:160]})", file=sys.stderr)
            continue
        dt = round(time.time() - t0, 3)
        times[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    summary = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        summary["errors"] = errors
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
