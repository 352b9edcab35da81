#!/usr/bin/env python
"""Similarity search over an embedding corpus: the ANN tier as one
engine script.

    python examples/similarity_search.py [sf_dir]

Over the ``embeddings`` table (``vec_id``, ``label``,
``embedding array<float>``), this runs the retrieval stack a
vector-heavy pipeline ships:

1. brute-force cosine top-k — the exactness baseline (broadcast query
   set, the corpus is scanned once, never shuffled);
2. LSH ANN — multi-table sign-random-projection buckets, candidates
   scored exactly; recall measured inline against the baseline;
3. IVF ANN — deterministic sampled-init + one-Lloyd-step codebook,
   inverted-list probes; recall measured inline;
4. blocked exact kNN graph — the all-pairs primitive with the salted
   sub-block skew guard;
5. nearest-centroid assignment — vector quantization against the
   per-label centroids;
6. embedding near-dup pairs — the cosine dedup path on its salted
   block join, plus the MinHash bucket-stats pre-flight on the
   documents table (the "no silent caps" report).

Everything is lazy DataFrame composition; the one materialization is
the LSH bucket index (the production shape: a real pipeline persists
its sketch index).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_engineering_spark.operators.dedup import (
    embedding_pairs,
    lsh_bucket_stats,
)
from covid_engineering_spark.operators.similarity import (
    assign_nearest_centroid,
    deterministic_codebook,
    ivf_topk,
    knn_graph,
    q_ann_cosine_topk,
    q_ann_lsh_topk,
)
from covid_engineering_spark.session import get_spark
from covid_engineering_spark.sources import read_table


def _pairs(rows) -> set:
    return {(r["q_id"], r["n_id"]) for r in rows}


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="similarity-search")
    spark.sparkContext.setLogLevel("ERROR")

    emb = read_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()

    # 1. exactness baseline
    brute = _pairs(q_ann_cosine_topk(spark, sf_dir).collect())
    print(f"brute-force top-5 neighbors for 8 queries over {n_vecs} vectors: {len(brute)} pairs")

    # 2-3. the two approximate indexes, recall measured on the spot
    lsh = _pairs(q_ann_lsh_topk(spark, sf_dir).collect())
    print(f"lsh ann recall vs brute force: {len(lsh & brute) / len(brute):.3f}")
    ivf = _pairs(ivf_topk(emb, deterministic_codebook(emb)).collect())
    print(f"ivf ann recall vs brute force: {len(ivf & brute) / len(brute):.3f}")

    # 4. blocked exact kNN graph (salted skew guard inside)
    graph = knn_graph(emb)
    n_edges = graph.count()
    n_blocks = emb.select("label").distinct().count()
    print(f"knn graph: {n_edges} edges across {n_blocks} label blocks")

    # 5. vector quantization against per-label centroids
    assigned = assign_nearest_centroid(emb)
    agree = assigned.filter("vec_id >= 0").count()
    print(f"nearest-centroid assignment: {agree} vectors quantized")

    # 6. cosine near-dup pairs + the bucket-cap pre-flight
    dups = embedding_pairs(emb, threshold=0.4).count()
    print(f"embedding near-dup pairs at cosine >= 0.4: {dups}")
    docs = read_table(spark, sf_dir, "documents")
    stats = lsh_bucket_stats(docs, portable=True).head()
    print(
        "minhash bucket pre-flight: "
        f"{stats['n_buckets']} buckets, max membership {stats['max_bucket']}, "
        f"{stats['capped_buckets']} over the cap"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
