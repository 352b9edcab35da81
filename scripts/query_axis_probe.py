#!/usr/bin/env python
"""Query-axis probe for ann_graph_greedy (VERDICT r10 #5): the
production shape is many queries against ONE standing graph, so the
corpus-axis probe (0.197 exponent) tells only half the story. Here the
corpus is FIXED (sf0.1 embeddings) and the query set grows 1x/10x/100x
(8 -> 80 -> 800 queries); the timed path is the SERVING walk
(``with_eval=False`` — no brute-force evaluation harness, which is
O(|Q| * corpus) by construction and sampled in production).

What bounds this axis: the per-hop state frame is |Q| x beam rows and
the candidate frame |Q| x beam x max_degree rows, both BROADCAST to
the corpus/edge join — so per-query cost stays flat until the
broadcast frames outgrow executor memory (~10^7 query-rows per wave);
past that the move is batching query waves, not a different plan.

Prints one JSON line. Run: python scripts/query_axis_probe.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession

    from covid_engineering_spark.operators.similarity import (
        N_QUERIES,
        graph_greedy_search,
    )
    from covid_engineering_spark.session import configure_existing
    from covid_engineering_spark.sources import read_table

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    configure_existing(spark)
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, BASE, "embeddings")

    def run(nq: int) -> None:
        graph_greedy_search(
            emb, n_queries=nq, with_eval=False
        ).write.mode("overwrite").format("noop").save()

    out: dict = {
        "metric": "query_axis_probe",
        "pipeline": "ann_graph_greedy",
        "base": BASE,
        "corpus": "fixed (sf0.1 embeddings)",
        "timed_path": "serving walk only (with_eval=False)",
    }
    timings: dict[int, float] = {}
    for mult in (1, 10, 100):
        nq = N_QUERIES * mult
        spark.catalog.clearCache()
        run(nq)  # warmup: JVM/codegen + cache fill
        spark.catalog.clearCache()
        t0 = time.time()
        run(nq)
        timings[mult] = time.time() - t0
        out[f"t_q{mult}x_sec"] = round(timings[mult], 2)
    out["exponent_10x"] = round(
        math.log(timings[10] / timings[1]) / math.log(10), 3
    )
    out["exponent_100x"] = round(
        math.log(timings[100] / timings[1]) / math.log(100), 3
    )
    out["n_queries"] = {m: N_QUERIES * m for m in timings}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
