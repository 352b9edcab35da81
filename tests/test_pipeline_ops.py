"""Training-data pipeline tier: deterministic split, per-source
quota, decontamination, and duplicate-cluster resolution. The oracle
twins run in test_oracle.py; these tests pin the properties the SQL
comparison cannot see (partition independence, convergence, planted
adversarial fixtures).
"""

from pyspark.sql import functions as F

from covid_engineering_spark.operators.dedup import ngram_jaccard_pairs
from covid_engineering_spark.operators.pipeline import (
    QUOTA_PER_SOURCE,
    connected_components,
    decontaminate,
    quota_per_group,
    split_assign,
)
from covid_engineering_spark.sources import read_table
from tests.conftest import SF_SMOKE


def test_split_is_partition_independent(spark):
    """The firewall property: a repartition (any physical layout
    change) must not move a single document across splits."""
    docs = read_table(spark, SF_SMOKE, "documents")
    base = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs).select("doc_id", "split").collect()
    }
    shuffled = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs.repartition(7, "source"))
        .select("doc_id", "split")
        .collect()
    }
    assert base == shuffled


def test_split_is_total_and_roughly_proportioned(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    counts = {
        r["split"]: r["n"]
        for r in split_assign(docs).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert total == docs.count()
    assert set(counts) == {"train", "val", "test"}
    # 79.7/10.2/10.2 nominal; wide tolerance at 50 docs.
    assert counts["train"] / total > 0.6
    assert counts["val"] / total < 0.3
    assert counts["test"] / total < 0.3


def test_quota_caps_every_group_and_keeps_the_best(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    kept = quota_per_group(
        docs, "source", [F.col("n_chars").desc(), F.col("doc_id")], n=2
    )
    rows = kept.select("doc_id", "source", "n_chars").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    full = docs.select("doc_id", "source", "n_chars").collect()
    for src, members in by_src.items():
        assert len(members) <= 2
        kept_ids = {m["doc_id"] for m in members}
        expected = sorted(
            (r for r in full if r["source"] == src),
            key=lambda r: (-r["n_chars"], r["doc_id"]),
        )[:2]
        assert kept_ids == {r["doc_id"] for r in expected}, src


def test_decontaminate_counts_planted_overlap(spark):
    # shingle frames are (doc_id, s); docs 1 and 2 share eval n-grams
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha beta"),
            (2, "gamma delta"),
            (2, "unshared gram"),
            (3, "clean gram"),
        ],
        "doc_id long, s string",
    )
    eval_sh = spark.createDataFrame(
        [(100, "alpha beta"), (100, "gamma delta")], "doc_id long, s string"
    )
    out = {
        r["doc_id"]: r["n_shared"]
        for r in decontaminate(corpus, eval_sh).collect()
    }
    assert out == {1: 1, 2: 2}


def test_connected_components_matches_union_find(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    pairs = ngram_jaccard_pairs(docs).select("d1", "d2")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    # plain-Python union-find over the same collected pair list
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = pairs.collect()
    for r in edges:
        a, b = find(r["d1"]), find(r["d2"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    want = {v: find(v) for v in parent}
    assert got == want
    assert got  # non-degenerate: the synthetic corpus has near-dups
    # canonical survivor is the cluster minimum
    assert all(cl <= d for d, cl in got.items())


def test_connected_components_closes_a_long_chain(spark):
    # a path graph is the worst case for diameter; 9 edges -> 1 cluster
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "d1 long, d2 long"
    )
    got = connected_components(pairs).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert {r["doc_id"] for r in got} == set(range(10))


def test_quota_default_matches_constant(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    kept = quota_per_group(docs, "source", [F.col("doc_id")])
    mx = kept.groupBy("source").agg(F.count("*").alias("n")).agg(
        F.max("n").alias("m")
    ).collect()[0]["m"]
    assert mx <= QUOTA_PER_SOURCE
