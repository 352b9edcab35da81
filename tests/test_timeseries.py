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


def test_sessionize_splits_on_the_gap_boundary(spark):
    from covid_engineering_spark.operators.timeseries import sessionize

    ev = spark.createDataFrame(
        [
            # user 7: two events 1 h apart, then an 9-h gap, then one more
            (1, "2024-01-01 00:00:00", 7),
            (2, "2024-01-01 01:00:00", 7),
            (3, "2024-01-01 10:00:00", 7),
            # user 8: a single event
            (4, "2024-01-01 00:30:00", 8),
        ],
        "event_id long, ts string, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        r["event_id"]: r["session_id"] for r in sessionize(ev).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_is_partition_invariant_and_total(spark):
    from covid_engineering_spark.operators.timeseries import sessionize

    ev = read_table(spark, SF_SMOKE, "events")
    a = {r["event_id"]: r["session_id"] for r in sessionize(ev).collect()}
    b = {
        r["event_id"]: r["session_id"]
        for r in sessionize(ev.repartition(13)).collect()
    }
    assert a == b and len(a) == ev.count()
    assert max(a.values()) > 1  # the 8-h gap yields real multi-session users
