#!/usr/bin/env python
"""Per-query cost breakdown for the headline bench (guide §1: measure
first). For each headline query, on a warm session, splits the steady-
state cost into:

* ``build``  — Python DataFrame construction + analysis,
* ``plan``   — Catalyst optimization + physical planning
  (``queryExecution().executedPlan()`` forced),
* ``exec``   — the noop-sink execution (includes AQE re-planning),

and counts the Spark jobs/stages/tasks the execution launched (status
tracker deltas). Writes one JSON file so optimization targets the real
sink — driver-side planning vs executor work vs stage count.

    python scripts/bench_breakdown.py [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_breakdown.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from covid_engineering_spark.session import get_spark
    from covid_engineering_spark.queries import registry
    from bench import HEADLINE

    names = sys.argv[2:] or HEADLINE
    spark = get_spark(app_name="bench-breakdown", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    tracker = spark.sparkContext.statusTracker()

    # r12: match bench.py's honest methodology — evict evicting_cache
    # frames before every measured execution so the breakdown times
    # per-execution cost (cache BUILDS included), not warm-cache reads.
    from covid_engineering_spark.functions import caching as _caching

    def one(name: str, fn) -> dict:
        _caching.reset()
        spark.sparkContext.setJobDescription(f"breakdown:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        jobs_before = tracker.getJobIdsForGroup(None)
        df.write.mode("overwrite").format("noop").save()
        t3 = time.perf_counter()
        jobs_after = tracker.getJobIdsForGroup(None)
        new_jobs = set(jobs_after) - set(jobs_before)
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        return {
            "build": round(t1 - t0, 3),
            "plan": round(t2 - t1, 3),
            "exec": round(t3 - t2, 3),
            "total": round(t3 - t0, 3),
            "jobs": len(new_jobs),
            "stages_run": n_stages,
            "tasks": n_tasks,
        }

    results: dict[str, dict] = {}
    for name in names:
        fn = reg.get(name)
        if fn is None:
            continue
        try:
            one(name, fn)  # warmup (codegen, caches)
            r1 = one(name, fn)
            r2 = one(name, fn)
            best = r1 if r1["total"] <= r2["total"] else r2
            results[name] = best
            print(
                f"{name:34s} total={best['total']:7.3f} build={best['build']:6.3f}"
                f" plan={best['plan']:6.3f} exec={best['exec']:7.3f}"
                f" jobs={best['jobs']:3d} stages={best['stages_run']:3d}"
                f" tasks={best['tasks']:4d}",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001 - record and continue
            results[name] = {"error": repr(ex)[:300]}
            print(f"{name}: ERROR {ex!r}", file=sys.stderr, flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    totals = [r["total"] for r in results.values() if "total" in r]
    print(f"sum_total={sum(totals):.1f}s over {len(totals)} queries")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
