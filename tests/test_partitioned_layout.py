"""Partition-pruned layout (SURVEY.md §4): cleaned COVID data written
hive-partitioned by country must turn the per-country equality filter
(P2 — the reference's hottest access path) into a PartitionFilter,
i.e. other countries' files are never opened.
"""

import pytest

from pyspark.sql import functions as F

from covid_engineering_spark.plans import partition_filters, pushed_filters
from covid_engineering_spark.sources import read_table, write_partitioned

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def partitioned_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("part") / "by_segment")
    # customer partitioned by market segment stands in for the COVID
    # cleaned-by-country layout (same shape: low-cardinality string key).
    write_partitioned(
        read_table(spark, SF_SMOKE, "customer"), d, "c_mktsegment"
    )
    return d


def test_equality_filter_becomes_partition_pruning(spark, partitioned_dir):
    df = (
        spark.read.parquet(partitioned_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    pf = partition_filters(df)
    assert pf and any("BUILDING" in p for p in pf), pf
    # the predicate is resolved by the directory layout, not the reader
    assert not any("c_mktsegment" in p for p in pushed_filters(df))


def test_partitioned_roundtrip_is_lossless(spark, partitioned_dir):
    back = spark.read.parquet(partitioned_dir)
    orig = read_table(spark, SF_SMOKE, "customer")
    assert back.count() == orig.count()
    got = {
        (r.c_custkey, r.c_mktsegment)
        for r in back.select("c_custkey", "c_mktsegment").collect()
    }
    want = {
        (r.c_custkey, r.c_mktsegment)
        for r in orig.select("c_custkey", "c_mktsegment").collect()
    }
    assert got == want
