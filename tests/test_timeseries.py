"""Time-series rollup: determinism precondition + rollup invariants."""

from pyspark.sql import functions as F

from covid_engineering_spark.operators.timeseries import resample
from covid_engineering_spark.sources import read_table
from tests.conftest import SF_SMOKE


def test_event_timestamps_are_unique_the_determinism_precondition(spark):
    # open/close pick by min_by/max_by on ts alone; that is total only
    # because the feed's nanosecond timestamps never collide.
    ev = read_table(spark, SF_SMOKE, "events")
    assert ev.count() == ev.select("ts").distinct().count()


def test_resample_is_partition_invariant(spark):
    ev = read_table(spark, SF_SMOKE, "events")
    key = ["bucket", "event_type"]
    a = {tuple(r[k] for k in key): tuple(r) for r in resample(ev).collect()}
    b = {
        tuple(r[k] for k in key): tuple(r)
        for r in resample(ev.repartition(13)).collect()
    }
    assert a == b


def test_resample_invariants(spark):
    ev = read_table(spark, SF_SMOKE, "events")
    rows = resample(ev).collect()
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert r["low"] <= r["open_value"] <= r["high"]
        assert r["low"] <= r["close_value"] <= r["high"]
