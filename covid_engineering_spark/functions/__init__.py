from covid_engineering_spark.functions.caching import evicting_cache
from covid_engineering_spark.functions.diagnostics import (
    key_skew_stats,
    non_finite_counts,
)
from covid_engineering_spark.functions.scalar import (
    clamp_eps,
    davg,
    dsum,
    missing_count,
    safe_div,
)

__all__ = [
    "clamp_eps",
    "davg",
    "dsum",
    "evicting_cache",
    "key_skew_stats",
    "missing_count",
    "non_finite_counts",
    "safe_div",
]
