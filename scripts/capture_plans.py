#!/usr/bin/env python
"""Capture ``.explain("formatted")`` for headline queries into
``plans/<tag>/<query>_<suffix>.txt`` (the optimization-round evidence
contract: judges read these files instead of running Spark).

    python scripts/capture_plans.py <tag> <suffix> [query ...]

e.g. ``python scripts/capture_plans.py r11 before`` captures every
headline query's formatted plan to ``plans/r11/<q>_before.txt``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from covid_engineering_spark.session import get_spark
    from covid_engineering_spark.queries import registry
    from bench import HEADLINE

    names = sys.argv[3:] or HEADLINE
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture-plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    for name in names:
        fn = reg.get(name)
        if fn is None:
            print(f"{name}: not in registry", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"{name}: {len(txt)} chars -> {path}", flush=True)
        except Exception as ex:  # noqa: BLE001 - capture what we can
            print(f"{name}: ERROR {ex!r}", file=sys.stderr, flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
