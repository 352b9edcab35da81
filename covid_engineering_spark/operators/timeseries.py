"""Time-series rollup (beyond-reference extension): the hypertable
downsample — raw events resampled to fixed buckets with
open/high/low/close/sum aggregates, the query shape behind every
metrics store and OHLC feed.

Scale shape: one groupBy on (bucket, type) with full partial
aggregation — the shuffle carries one row per bucket per type, so a
year of nanosecond events rolls up through a shuffle bounded by
buckets × types, not by raw rows. At 100 TB pair this with the
range-clustered layout (``write_range_sorted`` on ts) so the scan
side prunes to the requested time slice before aggregating.

Determinism: open/close use ``min_by``/``max_by`` on the event
timestamp; the synthetic feed's nanosecond timestamps are globally
unique (asserted in tests), so the selection is total-ordered without
a composite tiebreak (which the SQL oracle's ``arg_min`` cannot
express).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_engineering_spark.functions import dsum
from covid_engineering_spark.sources import read_table

EVERY = "hour"


def resample(ev: DataFrame, every: str = EVERY) -> DataFrame:
    """Downsample events to ``every``-sized buckets per event_type:
    count, exact (decimal) sum, first/last value by event time, min
    and max.
    """
    return (
        ev.groupBy(
            F.date_trunc(every, "ts").alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("sum_value"),
            F.min_by("value", "ts").alias("open_value"),
            F.max_by("value", "ts").alias("close_value"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
        )
    )


def q_ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample(read_table(spark, sf_dir, "events"))


QUERIES = {"ts_resample": q_ts_resample}

ORACLES = {
    "ts_resample": """
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
               event_type,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
                   AS sum_value,
               arg_min(value, CAST(ts AS TIMESTAMP)) AS open_value,
               arg_max(value, CAST(ts AS TIMESTAMP)) AS close_value,
               MIN(value) AS low,
               MAX(value) AS high
        FROM events
        GROUP BY 1, 2
    """,
}
