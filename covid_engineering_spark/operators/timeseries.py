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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_engineering_spark.functions import dsum
from covid_engineering_spark.sources import read_table

EVERY = "hour"
#: Inactivity gap that closes a session. The synthetic feed's per-user
#: inter-arrival median is ~7.7 h, so 8 h yields a real mix of multi-
#: event and singleton sessions (~2 events/session at sf0.01) instead
#: of degenerating to one-event sessions.
SESSION_GAP = "INTERVAL 8 HOURS"


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


def sessionize(ev: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Assign every event a per-user ``session_id``: a new session
    starts when the gap to the previous event of the SAME user exceeds
    ``gap`` (a SQL interval literal). The batch complement of the
    ``stream_session`` windowed aggregate — this one labels the raw
    rows, which is what downstream per-session feature extraction
    joins against.

    Scale shape: two window passes over ONE shuffle on ``user_id``
    (lag, then the running flag sum reuse the same partitioning —
    Catalyst plans a single Exchange). The gap test is pure interval
    arithmetic on the event-time column: no epoch casts, so the exact
    same µs comparison runs in the SQL oracle. Per-user state never
    leaves its partition, so a 100 TB feed sessionizes with shuffle
    bounded by the raw rows of the largest single user.
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    new_s = (
        prev.isNull() | (F.col("ts") > prev + F.expr(gap))
    ).cast("long")
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("new_s", new_s)
        .withColumn("session_id", F.sum("new_s").over(run))
        .select("event_id", "user_id", "ts", "session_id")
    )


def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(read_table(spark, sf_dir, "events"))


QUERIES = {"ts_resample": q_ts_resample, "ts_sessionize": q_ts_sessionize}

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
    "ts_sessionize": """
        WITH flagged AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN lag(CAST(ts AS TIMESTAMP))
                             OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        OR CAST(ts AS TIMESTAMP) >
                           lag(CAST(ts AS TIMESTAMP))
                             OVER (PARTITION BY user_id ORDER BY ts)
                           + INTERVAL 8 HOUR
                        THEN 1 ELSE 0 END AS new_s
            FROM events
        )
        SELECT event_id, user_id, ts,
               CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM flagged
    """,
}
