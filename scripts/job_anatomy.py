#!/usr/bin/env python
"""Dump the honest (cold-cache) job anatomy of one registered query:
per-job stage/task counts + the final AQE executed plan. Diagnostic
(r12).

    python scripts/job_anatomy.py <query> [out.txt]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    name = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/anatomy_{name}.txt"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from covid_engineering_spark.session import get_spark
    from covid_engineering_spark.functions import caching
    from covid_engineering_spark.queries import registry

    spark = get_spark(app_name=f"anatomy-{name}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    fn = registry()[name]
    tracker = spark.sparkContext.statusTracker()

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    mat(fn(spark, sf_dir))  # warmup
    caching.reset()
    jobs_before = set(tracker.getJobIdsForGroup(None))
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t_build = time.perf_counter() - t0
    t1 = time.perf_counter()
    mat(df)
    t_exec = time.perf_counter() - t1
    lines = [f"{name}: build={t_build:.3f}s exec={t_exec:.3f}s"]
    for j in sorted(set(tracker.getJobIdsForGroup(None)) - jobs_before):
        ji = tracker.getJobInfo(j)
        if ji is None:
            continue
        st = []
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None and si.numCompletedTasks > 0:
                st.append(f"s{sid}:{si.numTasks}t:{si.name.split(' at ')[0]}")
        lines.append(f"  job {j}: {' | '.join(st)}")
    plan = df._jdf.queryExecution().executedPlan().toString()
    body = "\n".join(lines) + "\n\nEXECUTED PLAN (final AQE):\n" + plan
    with open(out_path, "w") as f:
        f.write(body)
    print("\n".join(lines))
    print(f"plan -> {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
