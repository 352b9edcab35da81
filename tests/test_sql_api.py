"""Dual API surface: the same engine tables answer through
``spark.sql`` over registered views exactly as through the DataFrame
registry — the contract that lets reference users bring raw SQL.
"""

from covid_engineering_spark.queries import registry
from covid_engineering_spark.sources import register_star

from tests.conftest import SF_SMOKE


def test_sql_matches_dataframe_q1(spark):
    register_star(spark, SF_SMOKE)
    got = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    want = {
        (r.l_returnflag, r.l_linestatus): (r.sum_qty, r.count_order)
        for r in registry()["q1_pricing_summary"](spark, SF_SMOKE).collect()
    }
    assert len(got) == len(want) > 0
    for r in got:
        assert want[(r.l_returnflag, r.l_linestatus)] == (r.sum_qty, r.count_order)


def test_views_cover_all_star_tables(spark):
    tables = register_star(spark, SF_SMOKE)
    for name in tables:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {name}").first().n >= 0
