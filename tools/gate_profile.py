#!/usr/bin/env python
"""Noise-immune measurement for registry queries: wall time AND the
number of Spark jobs/stages/tasks each invocation schedules.

Job count is a deterministic property of the code (ambient box drift
cannot change it), so before/after job counts are the primary receipt
for the job-floor optimizations of the r13 round; wall times (median of
reps) are the secondary, drift-prone receipt.

Usage: python tools/gate_profile.py <reps> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from python_cdc_spark.io import enable_table_cache
    from python_cdc_spark.queries import QUERIES
    from python_cdc_spark.session import get_spark

    spark = get_spark(app_name="gate_profile")
    spark.sparkContext.setLogLevel("ERROR")
    enable_table_cache(spark, sf_dir)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    out = {}
    for name in names:
        fn = QUERIES[name].fn
        walls, jobs, stages = [], [], []
        for rep in range(reps):
            group = f"{name}-rep{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
            ids = tracker.getJobIdsForGroup(group)
            jobs.append(len(ids))
            n_st = 0
            for jid in ids:
                ji = tracker.getJobInfo(jid)
                if ji is not None:
                    n_st += len(ji.stageIds)
            stages.append(n_st)
        out[name] = {
            "wall_median": round(statistics.median(walls), 3),
            "walls": [round(w, 3) for w in walls],
            "jobs": jobs,
            "stages": stages,
        }
        print(f"# {name}: wall={out[name]['wall_median']}s of {out[name]['walls']} "
              f"jobs={jobs} stages={stages}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
