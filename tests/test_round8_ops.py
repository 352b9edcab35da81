"""Round-8 births.

- a26_mg_heavy — distributed Misra-Gries summary: the theorem's two
  guarantees (underestimate within N/(k+1); every item over N/(k+1)
  present) must hold on the fixture AND on an adversarially skewed
  synthetic corpus, and the summary must stay inside its k-counter
  budget per group.
"""

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _exact_counts(rows):
    out = {}
    for et, uid in rows:
        out[(et, uid)] = out.get((et, uid), 0) + 1
    return out


def test_mg_heavy_invariants_on_fixture(spark):
    from covid_engineering_spark.operators.relational import (
        MG_K,
        q_a26_mg_heavy,
    )
    from covid_engineering_spark.sources import read_table

    out = q_a26_mg_heavy(spark, SF_SMOKE).collect()
    assert out, "summary must be non-empty on the fixture"
    ev = read_table(spark, SF_SMOKE, "events")
    exact = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    totals = {}
    for (et, _), n in exact.items():
        totals[et] = totals.get(et, 0) + n
    per_type = {}
    for r in out:
        per_type[r["event_type"]] = per_type.get(r["event_type"], 0) + 1
        c = exact[(r["event_type"], r["user_id"])]
        assert r["cnt"] == c  # the emitted exact count is exact
        assert 1 <= r["mg_est"] <= c  # underestimate, never zero
        assert r["mg_err"] == c - r["mg_est"]
        assert r["err_within_bound"]
        # the emitted bound column is the real theorem bound
        assert (c - r["mg_est"]) * (MG_K + 1) <= totals[r["event_type"]]
    # counter budget: at most k survivors per group
    assert all(n <= MG_K for n in per_type.values())


def test_mg_heavy_guaranteed_coverage_on_skew(spark):
    """Every item with cnt*(k+1) > N must survive the distributed
    reduction — the Misra-Gries guarantee the Mergeable Summaries
    merge preserves. Build a corpus where three users dominate one
    event type and assert all three are retained with estimates
    inside the bound, while the long uniform tail is (correctly)
    summarized away.
    """
    from covid_engineering_spark.operators.dedup import portable_hash64
    from covid_engineering_spark.operators.relational import (
        MG_K,
        MG_SHARDS,
    )

    raw = []
    for uid, n in [(1, 400), (2, 300), (3, 200)]:  # heavy heads
        raw += [("hot", uid)] * n
    for uid in range(100, 180):  # 80-user uniform tail
        raw += [("hot", uid)] * 5
    total = len([r for r in raw if r[0] == "hot"])
    ev = spark.createDataFrame(raw, "event_type STRING, user_id BIGINT")

    # replicate the registered reduction on an arbitrary frame (the
    # registered query reads the events table; same operator shape)
    shard = F.pmod(
        portable_hash64(F.col("user_id").cast("string"), 26),
        F.lit(MG_SHARDS),
    )
    counts = ev.groupBy(
        "event_type", shard.alias("shard"), "user_id"
    ).agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w1 = Window.partitionBy("event_type", "shard").orderBy(
        F.desc("cnt"), F.asc("user_id")
    )
    top1 = counts.withColumn("rn", F.row_number().over(w1)).filter(
        F.col("rn") <= MG_K + 1
    )
    g1 = Window.partitionBy("event_type", "shard")
    t1 = F.coalesce(
        F.max(F.when(F.col("rn") == MG_K + 1, F.col("cnt"))).over(g1),
        F.lit(0),
    )
    s1 = (
        top1.withColumn("t1", t1)
        .filter((F.col("rn") <= MG_K) & (F.col("cnt") > F.col("t1")))
        .select(
            "event_type",
            "user_id",
            "cnt",
            (F.col("cnt") - F.col("t1")).alias("dec1"),
        )
    )
    w2 = Window.partitionBy("event_type").orderBy(
        F.desc("dec1"), F.asc("user_id")
    )
    top2 = s1.withColumn("rn2", F.row_number().over(w2)).filter(
        F.col("rn2") <= MG_K + 1
    )
    g2 = Window.partitionBy("event_type")
    t2 = F.coalesce(
        F.max(F.when(F.col("rn2") == MG_K + 1, F.col("dec1"))).over(g2),
        F.lit(0),
    )
    s2 = (
        top2.withColumn("t2", t2)
        .filter((F.col("rn2") <= MG_K) & (F.col("dec1") > F.col("t2")))
        .select(
            "event_type",
            "user_id",
            "cnt",
            (F.col("dec1") - F.col("t2")).alias("mg_est"),
        )
    )
    got = {r["user_id"]: r for r in s2.collect()}
    exact = _exact_counts(raw)
    # guarantee 1: the three heads all clear cnt*(k+1) > N -> present
    for uid, n in [(1, 400), (2, 300), (3, 200)]:
        assert n * (MG_K + 1) > total  # test is non-vacuous
        assert uid in got, f"guaranteed heavy hitter {uid} missing"
        r = got[uid]
        assert r["cnt"] == exact[("hot", uid)] == n
        # guarantee 2: estimate within the theorem bound
        assert n - total / (MG_K + 1) <= r["mg_est"] <= n
    # budget: the tail cannot push the summary past k counters
    assert len(got) <= MG_K
