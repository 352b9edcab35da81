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
