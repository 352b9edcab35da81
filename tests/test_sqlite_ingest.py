"""S2/S3 ingest (SURVEY.md §2.1): catalog enumeration + whole-table
SQLite load, as the one-shot SQLite→Parquet migration. The reference
re-slurps every DB table into pandas on every run (main.py:223-235);
the engine converts once and reads Parquet thereafter.
"""

import sqlite3

import pytest

from covid_engineering_spark.sources import sqlite_to_parquet


@pytest.fixture(scope="module")
def db_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("db") / "covid_database.db")
    with sqlite3.connect(p) as conn:
        conn.execute(
            "CREATE TABLE worldometer_data "
            '("Country.Region" TEXT, "Continent" TEXT, "Population" INTEGER)'
        )
        conn.executemany(
            "INSERT INTO worldometer_data VALUES (?, ?, ?)",
            [("Netherlands", "Europe", 17134872), ("Belgium", "Europe", 11589623)],
        )
        conn.execute(
            'CREATE TABLE usa_county_wise ("Admin2" TEXT, "Date" TEXT, "Deaths" INTEGER)'
        )
        conn.execute(
            "INSERT INTO usa_county_wise VALUES ('King', '1/22/20', 0)"
        )
    return p


def test_sqlite_to_parquet_migrates_catalog(spark, db_path, tmp_path):
    out = sqlite_to_parquet(db_path, str(tmp_path / "pq"))
    # Catalog enumeration found both tables; names normalized.
    assert set(out) == {"worldometer_data", "usa_county_wise"}

    wd = spark.read.parquet(out["worldometer_data"])
    # Dotted reference headers arrive snake_cased for unquoted SQL use.
    assert set(wd.columns) == {"country_region", "continent", "population"}
    rows = {r.country_region: r.population for r in wd.collect()}
    assert rows == {"Netherlands": 17134872, "Belgium": 11589623}

    uc = spark.read.parquet(out["usa_county_wise"])
    assert uc.count() == 1 and set(uc.columns) == {"admin2", "date", "deaths"}
