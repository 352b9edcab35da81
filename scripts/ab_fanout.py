#!/usr/bin/env python
"""A/B a read-path variant over a query subset (guide §1: measure
first). Runs the bench methodology (warmup + median of 3, noop sink)
over the named queries in THIS process's env (e.g. SPARK_GRAFT_FANOUT)
and prints one JSON line, so two invocations with different env give
the comparison.

    SPARK_GRAFT_FANOUT=0 python scripts/ab_fanout.py /tmp/a.json q1 ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

DEFAULT = [
    # compute-dense map stages fed directly by the scan
    "dedup_substring",
    "dedup_substring_strip",
    "pipe_bloom_decontaminate",
    "dedup_minhash_lsh",
    "pipe_curate_corpus",
    "text_perplexity",
    "wrangle_clean_complete",
    # cheap relational tier (regression watch: added exchange cost)
    "q1_pricing_summary",
    "q3_top_orders",
    "j1_broadcast_lookup",
    "a12_cube",
    "q9_product_profit",
    # iterative / cached-vector tier
    "emb_kmeans_lloyd",
    "ann_ivf_kmeans_topk",
    "ann_graph_greedy",
    "emb_knn_graph",
    "emb_semdedup",
    "emb_hard_negatives",
    "ann_rerank_topk",
    "emb_rp_recall",
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab.json"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from covid_engineering_spark.session import get_spark
    from covid_engineering_spark.queries import registry

    spark = get_spark(app_name="ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    # r12: honest methodology — evict evicting_cache frames before
    # every timed run (bench.py does the same), so both A/B arms time
    # per-execution cost including cache builds.
    from covid_engineering_spark.functions import caching as _caching

    timings = {}
    total = 0.0
    for name in names:
        fn = reg[name]
        spark.sparkContext.setJobDescription(f"ab:{name}")
        mat(fn(spark, sf_dir))  # warmup
        samples = []
        for _ in range(3):
            _caching.reset()
            t0 = time.perf_counter()
            mat(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        total += timings[name]
    out = {
        "fanout": os.environ.get("SPARK_GRAFT_FANOUT", "1"),
        "total": round(total, 3),
        "queries": timings,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
