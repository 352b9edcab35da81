"""Structured Streaming execution test: the SAME windowed-aggregation
code runs as an incremental streaming query (file source, availableNow
trigger, memory sink) and must produce exactly the batch answer —
Spark's batch/streaming unification, demonstrated rather than claimed.
"""

import pytest

from pyspark.sql import functions as F

from covid_engineering_spark.sources import read_table
from covid_engineering_spark.streaming.windows import stream_events, tumbling_agg

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    """Stage the events table as a directory of parquet chunks, as a
    file-source stream would receive them (two 'arrivals').
    """
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = read_table(spark, SF_SMOKE, "events")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(d)
    ev.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(d)
    return d


def test_streaming_equals_batch(spark, source_dir):
    q = (
        stream_events(spark, source_dir)
        .writeStream.format("memory")
        .queryName("tumble_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.window_start), str(r.window_end)): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM tumble_stream").collect()
    }
    want = {
        (str(r.window_start), str(r.window_end)): (r.n_events, r.sum_value)
        for r in tumbling_agg(spark.read.parquet(source_dir)).collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_plan_is_stateful(spark, source_dir):
    # The streaming frame must carry the event-time watermark that
    # bounds state at scale — no watermark means unbounded state.
    sdf = stream_events(spark, source_dir)
    assert sdf.isStreaming
    assert "watermark" in sdf.explain.__self__._jdf.queryExecution().analyzed().toString().lower()
