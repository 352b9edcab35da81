"""Unigram-LM scoring: exactness invariants, rare/hot populations, and
the provable bound on the broadcast (hot-vocabulary) side."""

from pyspark.sql import functions as F

from covid_engineering_spark.operators.text import (
    UNIGRAM_HOT_DIV,
    unigram_lm,
)
from covid_engineering_spark.sources import read_table
from tests.conftest import SF_SMOKE


def test_unigram_totals_and_rare_population(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    rows = unigram_lm(docs).collect()
    assert len(rows) == docs.count()
    # Token totals reconcile exactly with a direct count.
    direct = dict(
        docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    )
    for r in rows:
        assert r["n_tokens"] == direct[r["doc_id"]]
        assert 0 <= r["rare_count"] <= r["n_tokens"]
        assert r["rare_ratio"] == r["rare_count"] / r["n_tokens"]
    # Both rare and non-rare tokens exist on the synthetic corpus —
    # otherwise the oracle match is vacuous.
    assert any(r["rare_count"] > 0 for r in rows)
    assert any(r["rare_count"] < r["n_tokens"] for r in rows)


def test_hot_vocab_is_provably_bounded(spark):
    # At most HOT_DIV tokens can each hold >= 1/HOT_DIV of corpus
    # mass — the broadcast build side is bounded by construction at
    # ANY corpus size. Verify the bound is tight on the real corpus.
    docs = read_table(spark, SF_SMOKE, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cf"))
    )
    total = tf.agg(F.sum("cf")).collect()[0][0]
    hot = tf.filter(F.col("cf") * UNIGRAM_HOT_DIV >= total).count()
    assert hot <= UNIGRAM_HOT_DIV


def test_unigram_partition_invariant(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    a = {r["doc_id"]: tuple(r) for r in unigram_lm(docs).collect()}
    b = {
        r["doc_id"]: tuple(r)
        for r in unigram_lm(docs.repartition(13)).collect()
    }
    assert a == b
