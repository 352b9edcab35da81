"""Session-scoped evicting cache for query-internal reuse frames.

Several queries cache an intermediate frame that multiple plan
branches read (shingle tables, daily series): the returned DataFrame
still reads from the cached blocks lazily, so the query itself cannot
unpersist. But a long-lived session re-invoking the same query (the
bench's warmup + timed runs, a notebook, the driver loop) must not
accumulate one cached copy per invocation. ``evicting_cache`` keeps
exactly ONE live cached frame per key: each call unpersists the
previous holder before caching the new one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LAST: dict[str, DataFrame] = {}


def evicting_cache(df: DataFrame, key: str) -> DataFrame:
    """Cache ``df``, evicting whatever frame this ``key`` cached last."""
    prev = _LAST.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session of the old frame may already be stopped
    out = df.cache()
    _LAST[key] = out
    return out
