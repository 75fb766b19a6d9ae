"""Block-store lifecycle helpers for lazily checkpointed frames.

``localCheckpoint(eager=False)`` is the repo's standard cure for
union/iteration branches re-evaluating an expensive upstream plan
(BENCH_NOTES round 10) — but the persisted RDD blocks live until the
JVM ContextCleaner notices the RDD is unreachable, so a session running
many checkpoint-heavy operators accumulates executor storage memory and
shows GROWING run-to-run variance (dedup_lsh_quality measured
10.6–15.8 s across identical 4x runs, r11 verdict nit). Operators whose
result no longer depends on a checkpoint (driver-materialized reports,
superseded iteration frontiers) release it explicitly instead of
waiting for the cleaner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(*dfs: DataFrame) -> None:
    """Free the persisted blocks behind ``df.localCheckpoint(...)``
    frames.

    Safe no-op for frames that are not checkpoint-backed (the analyzed
    plan is only a ``LogicalRDD`` for checkpointed/RDD-backed frames)
    and for any JVM-side surprise — releasing cache is an optimization,
    never worth failing the operator. The caller must be DONE with the
    frame: after release, consuming it raises (the checkpoint is the
    plan's only lineage).
    """
    for df in dfs:
        try:
            plan = df._jdf.queryExecution().analyzed()
            if plan.getClass().getName().endswith(".LogicalRDD"):
                plan.rdd().unpersist(False)
        except Exception:  # noqa: BLE001 — cache release is best-effort
            pass
