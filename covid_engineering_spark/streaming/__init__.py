from covid_engineering_spark.streaming import dedup as _dedup
from covid_engineering_spark.streaming import joins as _joins
from covid_engineering_spark.streaming import windows as _windows
from covid_engineering_spark.streaming.dedup import stream_dedup
from covid_engineering_spark.streaming.neardup import stream_near_dup
from covid_engineering_spark.streaming.joins import (
    attributed_clicks,
    stream_attributed_clicks,
)
from covid_engineering_spark.streaming.stateful import running_user_totals
from covid_engineering_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

QUERIES = {**_windows.QUERIES, **_dedup.QUERIES, **_joins.QUERIES}
ORACLES = {**_windows.ORACLES, **_dedup.ORACLES, **_joins.ORACLES}

__all__ = [
    "QUERIES",
    "ORACLES",
    "attributed_clicks",
    "running_user_totals",
    "stream_attributed_clicks",
    "stream_dedup",
    "stream_near_dup",
    "session_agg",
    "sliding_agg",
    "stream_events",
    "tumbling_agg",
]
