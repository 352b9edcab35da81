"""Malformed-input handling on the JSONL ingest path: at crawl scale
some fraction of lines is always broken (truncated uploads, encoding
damage), and a 100 TB job must quarantine them without dying or
silently dropping good rows. PERMISSIVE mode + a _corrupt_record
column is the Spark contract for that."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from covid_engineering_spark import schemas


def _schema_with_corrupt():
    return T.StructType(
        list(schemas.STAR["documents"].fields)
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )


def test_corrupt_jsonl_lines_are_quarantined_not_fatal(spark, tmp_path):
    path = str(tmp_path / "docs.jsonl")
    good = [
        {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10},
        {"doc_id": 2, "text": "gamma", "lang": "en", "source": "s1", "n_chars": 5},
    ]
    with open(path, "w") as f:
        for row in good:
            f.write(json.dumps(row) + "\n")
        f.write('{"doc_id": 3, "text": "trunc')  # truncated upload
        f.write("\n\x00\x01 not json at all\n")
    df = (
        spark.read.schema(_schema_with_corrupt())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark disallows lazily querying only the corrupt-record column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN); materialize the parse first —
    # which is what a real quarantine job does anyway (parse once,
    # split into good/bad sinks).
    df = df.cache()
    df.count()
    ok = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert ok.count() == 2
    assert {r["doc_id"] for r in ok.collect()} == {1, 2}
    assert bad.count() == 2  # both broken lines quarantined with payload
    assert all(r["_corrupt_record"] for r in bad.collect())


def test_failfast_mode_surfaces_the_damage(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError

    path = str(tmp_path / "bad.jsonl")
    with open(path, "w") as f:
        f.write('{"doc_id": 1, "text": "x", "lang": "en", "source": "s", "n_chars": 1}\n')
        f.write("not json\n")
    df = (
        spark.read.schema(schemas.STAR["documents"])
        .option("mode", "FAILFAST")
        .json(path)
    )
    with pytest.raises(Py4JJavaError):
        df.count()


def test_staging_is_isolated_per_source_dir(spark):
    """Regression: the per-query staging dir is keyed on (query,
    sf_dir). A later invocation against a DIFFERENT source must not
    wipe or overwrite the stage a previous invocation's still-lazy
    DataFrame reads from — the old per-prefix key silently served the
    second source's rows to the first frame."""
    from covid_engineering_spark.operators.ingest import q_s6_jsonl_scan
    from tests.conftest import SF_SMOKE

    other = SF_SMOKE.replace("sf0.001", "sf0.01")
    df_small = q_s6_jsonl_scan(spark, SF_SMOKE)      # stage A (lazy)
    df_big = q_s6_jsonl_scan(spark, other)           # stage B (disjoint)
    from pyspark.sql import functions as F

    def chars(df):
        return df.agg(F.sum("n_chars").alias("s")).first().s

    got_small = chars(df_small)                      # A must survive B
    got_big = chars(df_big)
    want_small = chars(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))
    want_big = chars(spark.read.parquet(f"{other}/documents.parquet"))
    assert got_small == want_small
    assert got_big == want_big
    assert want_small != want_big  # the probe is non-vacuous
