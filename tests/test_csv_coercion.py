"""S4 (SURVEY.md §2.1): encoding-aware re-read with date coercion —
the reference's ``pd.to_datetime(..., errors='coerce')`` +
``dropna(subset=['Date'])`` (main.py:239-241). In the engine,
``to_date`` yields null for unparseable input and the caller decides
to drop; 'NA' literals parse as null via the reader option.
"""

import pytest

from pyspark.sql import functions as F

from covid_engineering_spark import schemas
from covid_engineering_spark.sources import read_covid_csv


@pytest.fixture(scope="module")
def dirty_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "dirty_day_wise.csv"
    p.write_text(
        "Date,Confirmed,Deaths,Recovered,Active,New cases,New deaths,"
        "New recovered,Deaths / 100 Cases,Recovered / 100 Cases,"
        "Deaths / 100 Recovered,No. of countries\n"
        "2020-01-22,555,17,28,510,0,0,0,3.06,5.05,60.71,6\n"
        "not-a-date,100,1,2,97,0,0,0,1.0,2.0,50.0,6\n"
        "2020-01-24,941,NA,36,879,295,8,6,2.76,3.83,NA,9\n"
    )
    return str(p)


def test_bad_dates_coerce_to_null_then_drop(spark, dirty_csv):
    df = read_covid_csv(
        spark, dirty_csv, schemas.DAY_WISE, schemas.DAY_WISE_RENAMES
    )
    assert df.count() == 3
    assert df.filter(F.col("date").isNull()).count() == 1  # coerced
    kept = df.na.drop(subset=["date"])  # the reference's dropna step
    assert kept.count() == 2
    assert {str(r.date) for r in kept.collect()} == {"2020-01-22", "2020-01-24"}


def test_na_literals_parse_as_null(spark, dirty_csv):
    df = read_covid_csv(
        spark, dirty_csv, schemas.DAY_WISE, schemas.DAY_WISE_RENAMES
    )
    row = df.filter(F.col("date") == "2020-01-24").first()
    assert row.deaths is None  # 'NA' string -> null, not a parse error
    assert row.deaths_per_100_recovered is None
    assert row.recovered == 36
