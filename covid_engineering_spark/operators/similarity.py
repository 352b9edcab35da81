"""Similarity-search tier (BASELINE.json north star): approximate
nearest neighbor over the ``embeddings`` array<float> column.

Two paths:

* brute-force cosine top-k — the exactness baseline: broadcast the
  (small) query set against the full corpus, rank per query. Linear in
  corpus size per query; the right answer and the right plan when the
  query set is small (the corpus is never shuffled, only scanned).
* LSH-bucketed ANN — the scale path: sign-random-projection bit
  buckets built from deterministic hyperplanes; only same-bucket
  corpus vectors are scored. Sub-linear candidate sets at the cost of
  recall, verified against the brute-force path in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_engineering_spark.operators.dedup import cosine_expr
from covid_engineering_spark.sources import read_table

TOP_K = 5
N_QUERIES = 8
N_PLANES = 8
DIM = 64


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: for each of the first 8 vectors, the
    5 nearest others. The query side is broadcast; ranking is one
    window per query partition with deterministic tie-breaks.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb")
    )
    cos = cosine_expr(F.col("q_emb"), F.col("n_emb"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-generated, fixed
    seed) — reproducible across runs and engines without any RNG
    library dependency.
    """
    state = 42
    planes = []
    for _ in range(N_PLANES):
        row = []
        for _ in range(DIM):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to [-0.5, 0.5)
            row.append((state >> 11) / float(1 << 53) - 0.5)
        planes.append(row)
    return planes


def bucket_expr(emb_col):
    """Sign-random-projection bucket id: bit i = sign(v · plane_i)."""
    bucket = F.lit(0)
    for i, plane in enumerate(_hyperplanes()):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(emb_col, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: score only corpus vectors in the query's
    hyperplane-sign bucket. The bucket id is a plain integer column,
    so the candidate join is an equi-join Catalyst can shuffle-hash —
    no cross product at any scale. Top-k per query as in brute force.
    (No SQL oracle — recall is probabilistic; tests measure recall
    against the brute-force path.)
    """
    emb = read_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", bucket_expr(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        F.col("bucket"),
    )
    cos = cosine_expr(F.col("q_emb"), F.col("n_emb"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


QUERIES = {
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
}

ORACLES = {
    "ann_cosine_topk": f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q_id, e.vec_id AS n_id,
                   ROUND(list_dot_product(
                       list_transform(q_emb, x -> CAST(x AS DOUBLE)),
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE))
                   ), 6) AS cosine
            FROM embeddings e CROSS JOIN q
            WHERE q_id <> e.vec_id
        )
        SELECT q_id, n_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
            SELECT q_id, n_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rank
            FROM scored
        ) t WHERE rank <= {TOP_K}
    """,
}
