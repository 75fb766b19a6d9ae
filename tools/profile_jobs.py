"""Per-job timeline for one registry query: run warm reps with the UI
REST API enabled, then print each job's duration, the driver gap before
it, and its task count for the LAST rep — the harness behind the
round-15 under-parallelization findings (single-task GEMM sweeps,
AQE-coalesced scoring joins, per-batch driver gaps).

Usage: python tools/profile_jobs.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, "/root/repo")

from plateau_spark.session import get_spark  # noqa: E402

from __spark_entry__ import queries  # noqa: E402


def _ts(s: str) -> float:
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = get_spark(
        "profile-jobs", **{"spark.ui.enabled": "true", "spark.ui.port": "4049"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = queries()[name]
    first_job = 0
    for rep in range(reps):
        ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []
        if rep == reps - 1:
            first_job = (max(ids) + 1) if ids else 0
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"rep{rep}: {time.time() - t0:.3f}s")

    app_id = spark.sparkContext.applicationId
    url = (
        f"http://localhost:4049/api/v1/applications/{app_id}"
        f"/jobs?status=succeeded"
    )
    jobs = [
        j
        for j in json.loads(urllib.request.urlopen(url).read())
        if j["jobId"] >= first_job
    ]
    jobs.sort(key=lambda j: j["submissionTime"])
    prev_end = None
    tot_dur = tot_gap = 0.0
    for j in jobs:
        sub, comp = _ts(j["submissionTime"]), _ts(j["completionTime"])
        gap = sub - prev_end if prev_end is not None else 0.0
        prev_end = max(prev_end or comp, comp)
        tot_dur += comp - sub
        tot_gap += max(gap, 0)
        print(
            f"job {j['jobId']:>3} dur={comp - sub:6.3f}s gap={gap:6.3f}s "
            f"tasks={j['numTasks']:>4} {j['name'][:75]}"
        )
    print(
        f"sum job dur={tot_dur:.3f}s  sum gaps={tot_gap:.3f}s  "
        f"jobs={len(jobs)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
