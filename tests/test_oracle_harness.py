"""Meta-tests for the differential harness itself: compare() must
actually FAIL on wrong values, wrong schema, and wrong row counts —
otherwise 73 green oracles prove nothing.
"""

import duckdb
import pytest

from covid_engineering_spark.sources import read_table

from tests.conftest import SF_SMOKE
from tests.oracle_check import compare


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW nation AS SELECT * FROM '{SF_SMOKE}/nation.parquet'"
    )
    return c


def test_detects_value_drift(spark, con):
    df = read_table(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    ok = compare(df, con, "SELECT n_nationkey, n_name FROM nation")
    assert ok["match"]
    drift = compare(
        df, con, "SELECT n_nationkey + 1 AS n_nationkey, n_name FROM nation"
    )
    assert not drift["match"]


def test_detects_missing_rows(spark, con):
    df = read_table(spark, SF_SMOKE, "nation").select("n_nationkey")
    short = compare(
        df, con, "SELECT n_nationkey FROM nation WHERE n_nationkey <> 3"
    )
    assert not short["match"]


def test_detects_schema_mismatch(spark, con):
    df = read_table(spark, SF_SMOKE, "nation").select(
        "n_nationkey", "n_name"
    )
    renamed = compare(
        df, con, "SELECT n_nationkey, n_name AS nation_name FROM nation"
    )
    assert not renamed["match"]
