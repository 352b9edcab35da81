#!/usr/bin/env python
"""Spot-check named queries against their DuckDB twins at one or more
SFs (the same compare the driver applies). Usage:

    python scripts/oracle_spot.py sf0.01[,sf0.1] q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    sfs = sys.argv[1].split(",")
    names = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")

    from covid_engineering_spark.session import get_spark
    from covid_engineering_spark.queries import oracles, registry
    from tests.oracle_check import compare, duck_con

    spark = get_spark(app_name="oracle-spot", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    reg, orc = registry(), oracles()
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duck_con(sf_dir)
        for name in names:
            res = compare(reg[name](spark, sf_dir), con, orc[name])
            ok = res["match"]
            bad += 0 if ok else 1
            print(f"{sf} {name}: {'OK' if ok else 'MISMATCH ' + repr(res)[:600]}")
        con.close()
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
