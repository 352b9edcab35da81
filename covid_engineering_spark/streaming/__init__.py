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
    "session_agg",
    "sliding_agg",
    "stream_events",
    "tumbling_agg",
]
