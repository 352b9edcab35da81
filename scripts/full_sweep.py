#!/usr/bin/env python
"""Full differential sweep: run EVERY registered query against its
DuckDB oracle at an arbitrary scale directory — the driver's contract,
but over the whole registry and at scales the driver never checks.

    python scripts/full_sweep.py [sf_dir]     # default /root/testdata/sf0.1

Exit code 1 on any mismatch. Worth running at sf0.1 once per round:
the larger scale exercises thresholds, sketch collisions, and rounding
magnitudes the small SFs never reach — the sf0.1 sweep caught a real
one-ulp ROUND divergence in the SIRD MSE (values ~1e11, where DuckDB's
scale-by-10^k round leaves exact-integer double range).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from tests.oracle_check import compare, duck_con

    queries, oracle_sql = entry.queries(), entry.oracle_sql()
    con = duck_con(sf_dir)
    bad: list[tuple[str, object]] = []
    t0 = time.time()
    for name in sorted(oracle_sql):
        try:
            res = compare(queries[name](spark, sf_dir), con, oracle_sql[name])
            if not res["match"]:
                bad.append(
                    (name, {k: v for k, v in res.items() if k != "match"})
                )
                print("MISMATCH", name, flush=True)
        except Exception as ex:  # noqa: BLE001 - report and continue
            bad.append((name, repr(ex)[:300]))
            print("ERROR", name, flush=True)
    # rows-only entries still must execute
    for name in set(queries) - set(oracle_sql):
        try:
            queries[name](spark, sf_dir).count()
        except Exception as ex:  # noqa: BLE001
            bad.append((name, repr(ex)[:300]))
            print("ERROR (rows-only)", name, flush=True)
    print(
        f"swept {len(queries)} queries ({len(oracle_sql)} oracles) at "
        f"{sf_dir} in {time.time() - t0:.0f}s; failures: {len(bad)}"
    )
    for b in bad:
        print(b)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
