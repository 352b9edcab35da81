"""Query registry: assembles every operator's `(spark, sf_dir) ->
DataFrame` callable and its DuckDB oracle SQL into the dicts that
``__spark_entry__`` exposes to the verification driver.

Modules register themselves via ``QUERIES`` / ``ORACLES`` dicts; a
query without an oracle entry gets the driver's weaker rows-only check
(reserved for genuinely non-SQL-expressible ops like the SIRD
simulation kernels).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from covid_engineering_spark import streaming
from covid_engineering_spark.operators import (
    dedup,
    multimodal,
    relational,
    similarity,
    simulation,
    text,
    windows,
    wrangling,
)

_MODULES = [
    relational,
    windows,
    wrangling,
    simulation,
    dedup,
    similarity,
    text,
    multimodal,
    streaming,
]


def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update(mod.QUERIES)
    return out


def oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    unknown = out.keys() - registry().keys()
    if unknown:
        raise ValueError(f"oracles without queries: {sorted(unknown)}")
    return out
