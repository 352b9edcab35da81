#!/usr/bin/env python
"""End-to-end quickstart: the reference app's full analytical flow as
one engine script.

    python examples/quickstart.py [complete_csv] [out_dir]

Ingests the reference's complete.csv (schema-declared, 'NA'-aware),
runs the 9-stage cleaning pipeline for every country at once, writes
the cleaned store hive-partitioned by country (per-country queries
become partition-pruned scans), estimates the time-varying SIRD
parameters + R₀ trajectories, and runs the Netherlands→Belgium
transfer simulation — the reference's test_SIR_Model — printing a
small sample of each result.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_engineering_spark import schemas
from covid_engineering_spark.operators.covid import (
    estimate_params,
    r0_trajectory,
    transfer_simulation,
)
from covid_engineering_spark.operators.wrangling import clean_complete
from covid_engineering_spark.session import get_spark
from covid_engineering_spark.sources import read_covid_csv, write_partitioned

POPULATION = [("Netherlands", 17134872.0), ("Belgium", 11589623.0)]


def main(
    complete_csv: str = "/root/reference/complete.csv",
    out_dir: str = "/tmp/covid_engine_quickstart",
) -> None:
    spark = get_spark(app_name="quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    complete = read_covid_csv(
        spark, complete_csv, schemas.COMPLETE, schemas.COMPLETE_RENAMES
    )
    cleaned = clean_complete(complete).cache()
    print(f"cleaned rows: {cleaned.count()} across "
          f"{cleaned.select('country_region').distinct().count()} countries")

    write_partitioned(cleaned, f"{out_dir}/cleaned", "country_region")
    nl = spark.read.parquet(f"{out_dir}/cleaned").filter(
        F.col("country_region") == "Netherlands"
    )
    print(f"partition-pruned Netherlands read: {nl.count()} rows")

    pop = spark.createDataFrame(
        POPULATION, "country_region string, population double"
    )
    params = estimate_params(cleaned, pop)
    r0 = r0_trajectory(cleaned, pop)
    print("parameter estimates (tail):")
    for row in params.orderBy("country_region", "date").tail(3):
        print("  ", row)
    print(f"R0 series rows: {r0.count()}")

    sim = transfer_simulation(cleaned, pop, "Netherlands", "Belgium")
    print("transfer simulation (Netherlands params -> Belgium), head:")
    for row in sim.orderBy("t").take(3):
        print("  ", row)


if __name__ == "__main__":
    main(*sys.argv[1:3])
