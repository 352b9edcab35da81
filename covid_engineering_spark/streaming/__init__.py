from covid_engineering_spark.streaming.dedup import stream_dedup
from covid_engineering_spark.streaming.stateful import running_user_totals
from covid_engineering_spark.streaming.windows import (
    QUERIES,
    ORACLES,
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = [
    "QUERIES",
    "ORACLES",
    "running_user_totals",
    "stream_dedup",
    "session_agg",
    "sliding_agg",
    "stream_events",
    "tumbling_agg",
]
