"""Scale-adaptive fan-out for compute-dense scans (guide §2.2/§6).

The engine's map-heavy operators — k-gram shingling, per-token text
metrics, md5/xxhash shingle builds, dot-product codebook assignment —
do orders of magnitude more CPU work per input byte than a relational
scan, and their parallelism is whatever the SCAN gives them: Spark
splits parquet by bytes (``maxPartitionBytes``, and never below one
row group), so a small file, or any file written as a single row
group, yields fewer map tasks than the session has cores and the
whole stage runs on one core while the rest idle. At real corpus
scale the same scan carries thousands of splits and needs nothing.

:func:`fan_out` bridges the two regimes: round-robin repartition to
the session's default parallelism ONLY when the frame's current
layout has fewer partitions. The trigger condition itself bounds the
cost — the exchange moves a frame small enough to have produced too
few splits — and at scale the condition is false and the call is the
identity, so nothing here is tuned to local[32]: local[8] fans to 8,
a 1000-core cluster never fans at all (guide §2: derive partitioning
from the live layout, not a constant).

Only correct for operators whose results are partition- and
order-independent (every groupBy/join/window-by-key aggregation in
the engine — NOT ``global_prefix_sum``'s pid-carrying frames or the
``monotonically_increasing_id`` salt draw); the oracle sweep
re-proves each registered user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    current layout has fewer partitions; identity otherwise.

    The partition count comes from the frame's physical layout
    (``df.rdd.getNumPartitions()`` — planning only, no job). Call this
    on scans / scan-shaped frames feeding compute-dense map work, not
    on frames downstream of an exchange (those already carry the
    shuffle-partition or AQE-coalesced layout).
    """
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism
    try:
        have = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - exotic plans; skip fan-out
        return df
    return df.repartition(want) if have < want else df
