from covid_engineering_spark.streaming import dedup as _dedup
from covid_engineering_spark.streaming import windows as _windows
from covid_engineering_spark.streaming.dedup import stream_dedup
from covid_engineering_spark.streaming.stateful import running_user_totals
from covid_engineering_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

QUERIES = {**_windows.QUERIES, **_dedup.QUERIES}
ORACLES = {**_windows.ORACLES, **_dedup.ORACLES}

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
