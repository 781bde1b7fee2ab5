"""Per-query Spark-job profiler (optimization guide §1: measure first).

Runs one catalog query (or a few) under a unique job group and reports:
wall seconds, number of Spark jobs launched, and each job's first-stage
callsite name — the scheduling-overhead census for the lifecycle
queries, where ~every job is ~0.1-0.3 s of pure local orchestration.

Usage: python tools/job_profile.py q218_incremental_sync_closure [more...]
       REPS=3 python tools/job_profile.py q218_...   (warm medians)
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgresml_spark.session import get_spark  # noqa: E402


def profile(spark, fn, sf_dir: str) -> dict:
    sc = spark.sparkContext
    group = f"prof-{uuid.uuid4().hex[:10]}"
    sc.setJobGroup(group, "job_profile")
    t0 = time.perf_counter()
    try:
        df = fn(spark, sf_dir)
        n = len(df.collect())
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    wall = time.perf_counter() - t0
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    tracker = sc.statusTracker()
    jobs = sorted(tracker.getJobIdsForGroup(group))
    names = []
    for j in jobs:
        info = tracker.getJobInfo(j)
        stage_name = ""
        if info and info.stageIds:
            si = tracker.getStageInfo(min(info.stageIds))
            if si:
                stage_name = si.name
        names.append((j, stage_name))
    return {"wall": wall, "rows": n, "n_jobs": len(jobs), "jobs": names}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "1"))
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    spark = get_spark("job_profile")
    # warm parquet footers like bench.py
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for qname in sys.argv[1:]:
        fn = queries[qname]
        for rep in range(reps):
            r = profile(spark, fn, sf_dir)
            print(f"\n=== {qname} rep {rep}: {r['wall']:.2f}s  "
                  f"{r['n_jobs']} jobs  {r['rows']} rows")
            for j, nm in r["jobs"]:
                print(f"  job {j}: {nm}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
