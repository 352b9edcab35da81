"""applyInPandasWithState end-to-end: state must accumulate across
micro-batches (forced with maxFilesPerTrigger=1) and the final emitted
totals must equal the batch groupBy answer.
"""

import pytest

from pyspark.sql import functions as F

from covid_engineering_spark import schemas
from covid_engineering_spark.sources import read_table
from covid_engineering_spark.streaming.stateful import running_user_totals

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_state"))
    ev = read_table(spark, SF_SMOKE, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(d)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(d)
    return d


def test_stateful_totals_accumulate_across_batches(spark, source_dir):
    stream = (
        spark.readStream.schema(schemas.STAR["events"])
        .option("maxFilesPerTrigger", 1)  # force >= 2 micro-batches
        .parquet(source_dir)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    batches = q.recentProgress
    assert len([p for p in batches if p["numInputRows"] > 0]) >= 2

    # update-mode memory sink appends every emission; the LAST row per
    # user carries the lifetime total.
    emitted = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rid DESC) AS rn
            FROM (SELECT *, monotonically_increasing_id() AS rid FROM user_totals)
        ) WHERE rn = 1
        """
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value) for r in emitted}

    want_rows = (
        spark.read.parquet(source_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("tv"),
        )
        .collect()
    )
    want = {r.user_id: (r.n, r.tv) for r in want_rows}
    assert set(got) == set(want)
    for uid, (n, tv) in want.items():
        gn, gtv = got[uid]
        assert gn == n, (uid, gn, n)
        assert abs(gtv - tv) < 0.05, (uid, gtv, tv)  # float fold-order slack


def test_state_store_is_rocksdb(spark, source_dir):
    # The engine session defaults to the RocksDB provider (session.py):
    # watermark-bounded state becomes a disk bound, not a heap bound.
    # Confirm the provider is really in effect by its progress metrics.
    assert "RocksDBStateStoreProvider" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )
    stream = (
        spark.readStream.schema(schemas.STAR["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals_rocksdb")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    ops = [p for p in q.recentProgress if p.get("stateOperators")]
    assert ops, "no stateful operator progress recorded"
    metrics = ops[-1]["stateOperators"][0].get("customMetrics", {})
    assert any(k.startswith("rocksdb") for k in metrics), metrics
