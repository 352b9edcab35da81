#!/usr/bin/env python
"""Scale probe: measure the two heaviest pipelines at 1x and 10x of
sf0.1 (~6M events / ~100k documents at 10x — the sf1-equivalent the
driver does not generate) and report the scaling exponent.

The 10x corpus is a key-shifted blowup, NOT a verbatim copy:

* events: each replica offsets user_id (new countries/users) and
  event_id — 10x the KEYS, the realistic 100 TB shape, so per-key
  window partitions stay bounded and parallelism grows with data.
* documents: each replica offsets doc_id and glues a replica suffix
  onto every word — token count, word order, and frequency
  distribution are preserved exactly, in-replica near-dup structure
  is untouched, and across replicas the shingle sets are disjoint.
  (A verbatim copy — or a doc-level suffix tweak, measured exponent
  1.49 — keeps cross-replica docs near-dups, so every dup cluster
  grows 10x and the probe measures duplication growth ~quadratic in
  cluster size, not the engine. An interleaved separator token was
  no better: it creates one-content-word shingles whose document
  frequency tracks common words, inflating cross-doc similarity.)
  The 1x baseline gets the SAME transformation (one replica), so the
  transform cost cancels out of the ratio.

Prints one JSON line: per-pipeline seconds at 1x and 10x plus the
log10 scaling exponent (1.0 = perfectly linear).

Run: python scripts/scale_probe.py   (writes scratch data under /tmp)
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_PROBE_X", "10"))
#: Comma-separated pipeline-name filter (empty = all): lets a deeper
#: blowup (e.g. SPARK_GRAFT_PROBE_X=30) probe just the heavy pipelines
#: without paying for the whole suite at that scale.
ONLY = {
    p for p in os.environ.get("SPARK_GRAFT_PROBE_ONLY", "").split(",") if p
}
#: Which tables the blowup materializes (comma list; default all).
#: A single-tier ONLY run (say, the embedding pipelines at 1000x)
#: otherwise pays minutes writing a 600M-row events blowup it never
#: reads — and at deep X the unread tables' scratch competes for the
#: same disk the probed pipelines spill to.
TABLES = {
    t
    for t in os.environ.get(
        "SPARK_GRAFT_PROBE_TABLES", "events,documents,embeddings,tpch"
    ).split(",")
    if t
}


def _blowup(spark, out_dir: str, replicas: int) -> None:
    """Key-shifted corpus blowup as ONE generator pass per table:
    explode a replica-index sequence and apply the per-replica
    transforms as column arithmetic over it — a single plan node at
    any depth, where the former per-replica unionByName loop built an
    N-way union whose analysis cost grows with N (fine at 10-100
    replicas, prohibitive at 1000). Row content is identical to the
    loop form; only row order differs, which nothing downstream
    observes. A repartition ahead of the explode keeps write
    parallelism: the base files are 1-2 splits, and exploding in
    place would funnel the full blown-up table through those tasks.
    """
    from covid_engineering_spark.operators.similarity import DIM
    from covid_engineering_spark.sources import read_table

    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("_rep")
    i = F.col("_rep")
    il = i.cast("long")

    ev = read_table(spark, BASE, "events").repartition(64)
    # events: each replica offsets user_id (new countries/users) and
    # event_id — N× the KEYS, the realistic 100 TB shape, so per-key
    # window partitions stay bounded and parallelism grows with data.
    ev_n = ev.select(rep, "*").select(
        (F.col("event_id") + il * F.lit(10**12)).alias("event_id"),
        "ts",
        (F.col("user_id") + il * F.lit(10**7)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )

    # documents: 'w' -> 'wr{i}': every word (hence every shingle)
    # becomes replica-unique without changing token count or
    # distribution (see the module docstring for why a verbatim copy
    # or a doc-level tweak measures duplication growth, not the
    # engine).
    docs = read_table(spark, BASE, "documents").repartition(64)
    doc_n = docs.select(rep, "*").select(
        (F.col("doc_id") + il * F.lit(10**9)).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("r"), i.cast("string")),
            ),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )

    # embeddings: offset vec_id AND label per replica — N× the BLOCKS
    # at constant block size (shard growth): blocked kNN/pagerank/
    # semdedup pipelines must scale with block count, never
    # re-quadratically. The label stays an integer (declared schema;
    # max offset 999*10^6 fits int32). Each replica's vectors are
    # additionally dimension-ROTATED (reversed as well past DIM
    # replicas) — norm- and within-replica-dot-preserving, so every
    # replica does bit-identical work, but cross-replica centroids
    # are no longer bit-equal: without this, any global
    # nearest-centroid step tie-breaks every replica's identical
    # centroid onto replica 0's label and cells grow in SIZE instead
    # of COUNT — the probe would measure the verbatim-copy artifact,
    # not the engine.
    emb = read_table(spark, BASE, "embeddings").repartition(32)
    d = i % DIM
    rolled = F.concat(
        F.slice("embedding", d + F.lit(1), F.lit(DIM) - d),
        F.slice("embedding", F.lit(1), d),
    )
    rolled = F.when(
        F.floor(i / DIM).cast("int") % 2 == 1, F.reverse(rolled)
    ).otherwise(rolled)
    emb_n = emb.select(rep, "*").select(
        (F.col("vec_id") + il * F.lit(10**9)).alias("vec_id"),
        rolled.alias("embedding"),
        (F.col("label") + i * F.lit(10**6)).alias("label"),
    )

    # Orders-only tier ("orders"): just the orders blowup, for
    # single-table pipelines (rfm/a25) at depths where the full tpch
    # blowup's 600M-row lineitem would dominate the probe's cost
    # without ever being read.
    if "orders" in TABLES and "tpch" not in TABLES:
        orders = read_table(spark, BASE, "orders").repartition(64)
        orders.select(rep, "*").select(
            (F.col("o_orderkey") + il * F.lit(10**9)).alias("o_orderkey"),
            (F.col("o_custkey") + il * F.lit(10**7)).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, "orders.parquet")
        )

    # TPC-H star tier ("tpch"): key-shifted replicas of the fact and
    # dimension tables TOGETHER — orderkeys, custkeys, suppkeys and
    # partkeys offset consistently on both sides of every join, so
    # referential structure (orders per customer, lines per order,
    # suppliers per part) is preserved exactly while the KEY SPACE
    # grows N×. nation/region are fixed-cardinality dimensions at
    # every SF and copy through verbatim (c_nationkey/s_nationkey are
    # untouched, so the nation joins keep their fan-in).
    if "tpch" in TABLES:
        orders = read_table(spark, BASE, "orders").repartition(32)
        ord_n = orders.select(rep, "*").select(
            (F.col("o_orderkey") + il * F.lit(10**9)).alias("o_orderkey"),
            (F.col("o_custkey") + il * F.lit(10**7)).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        li = read_table(spark, BASE, "lineitem").repartition(64)
        li_n = li.select(rep, "*").select(
            (F.col("l_orderkey") + il * F.lit(10**9)).alias("l_orderkey"),
            (F.col("l_partkey") + il * F.lit(10**7)).alias("l_partkey"),
            (F.col("l_suppkey") + il * F.lit(10**5)).alias("l_suppkey"),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        cust = read_table(spark, BASE, "customer").repartition(8)
        cust_n = cust.select(rep, "*").select(
            (F.col("c_custkey") + il * F.lit(10**7)).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )
        supp = read_table(spark, BASE, "supplier").repartition(4)
        supp_n = supp.select(rep, "*").select(
            (F.col("s_suppkey") + il * F.lit(10**5)).alias("s_suppkey"),
            "s_name",
            "s_nationkey",
            "s_acctbal",
        )
        part = read_table(spark, BASE, "part").repartition(4)
        part_n = part.select(rep, "*").select(
            (F.col("p_partkey") + il * F.lit(10**7)).alias("p_partkey"),
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            "p_retailprice",
        )
        for name, frame in (
            ("orders", ord_n),
            ("lineitem", li_n),
            ("customer", cust_n),
            ("supplier", supp_n),
            ("part", part_n),
            ("nation", read_table(spark, BASE, "nation")),
            ("region", read_table(spark, BASE, "region")),
        ):
            frame.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{name}.parquet")
            )

    if "events" in TABLES:
        ev_n.write.mode("overwrite").parquet(
            os.path.join(out_dir, "events.parquet")
        )
    if "documents" in TABLES:
        doc_n.write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents.parquet")
        )
    if "embeddings" in TABLES:
        emb_n.write.mode("overwrite").parquet(
            os.path.join(out_dir, "embeddings.parquet")
        )


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    from covid_engineering_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from covid_engineering_spark.operators.pipeline import connected_components
    from covid_engineering_spark.operators.wrangling import (
        _synthetic_complete,
        clean_complete,
    )
    from covid_engineering_spark.session import get_spark
    from covid_engineering_spark.sources import read_table

    # 256 initial shuffle partitions: sized for the 10x run (AQE
    # coalesces them back down at 1x) — exactly the knob a real
    # cluster scales with data volume. Deeper blowups scale both the
    # partition count and the local driver heap (local mode hosts
    # every executor thread + all broadcast builds in one JVM).
    deep = REPLICAS > 100
    # Deep probes also switch shuffle/spill compression to zstd
    # (default lz4): the 1000x document-tier pair shuffle died on the
    # box's ~80G scratch under lz4 (PROBE_r08_x1000), and zstd
    # compresses the suffixed-trigram shuffle blocks ~2x tighter for
    # CPU this box has idle during a spill-bound stage. This is the
    # probe config only — exactly the knob a real cluster would set —
    # and the VERDICT r08 #7 lever; the other lever (narrowing the
    # pair-stage projection) is a no-op: the shuffle already carries
    # only (doc_id, shingle) and the shingle IS the join key.
    spark = get_spark(
        app_name="scale-probe",
        shuffle_partitions=512 if deep else 256,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.io.compression.codec": os.environ.get(
                "SPARK_GRAFT_PROBE_CODEC", "zstd"
            ),
        }
        if deep
        else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import atexit
    import shutil

    # scratch blowups are ~70 MB per run and were accumulating across
    # rounds (the same leak class the ingest staging fix closed) —
    # remove them at exit, success or not
    small = tempfile.mkdtemp(prefix="ces_probe1_")
    big = tempfile.mkdtemp(prefix="ces_probeN_")
    atexit.register(shutil.rmtree, small, ignore_errors=True)
    atexit.register(shutil.rmtree, big, ignore_errors=True)
    _blowup(spark, small, 1)
    _blowup(spark, big, REPLICAS)

    def wrangle(sf_dir):
        clean_complete(_synthetic_complete(spark, sf_dir)).write.mode(
            "overwrite"
        ).format("noop").save()

    def minhash(sf_dir):
        # portable=True: probe the REGISTERED (md5 double-hash) form,
        # not the xxhash production variant — the exponent on record
        # must describe the code the driver actually verifies.
        minhash_lsh_pairs(
            read_table(spark, sf_dir, "documents"), portable=True
        ).write.mode("overwrite").format("noop").save()

    def clusters(sf_dir):
        # the full resolution path: guarded pair generation + CC loop
        # (the loop itself materializes per round, so the noop sink
        # only adds the final projection)
        connected_components(
            ngram_jaccard_pairs(read_table(spark, sf_dir, "documents"))
        ).write.mode("overwrite").format("noop").save()

    def keep(sf_dir):
        # retention on top of cluster resolution: + quality scoring and
        # the per-cluster survivor window
        from covid_engineering_spark.operators.pipeline import keep_best
        from covid_engineering_spark.operators.text import quality_frame

        docs = read_table(spark, sf_dir, "documents")
        keep_best(
            docs,
            connected_components(ngram_jaccard_pairs(docs)),
            quality_frame(docs),
        ).write.mode("overwrite").format("noop").save()

    def curate(sf_dir):
        # the flagship composite: normalize + exact dedup + clusters +
        # retention + split as one plan (its cluster stage re-derives
        # pairs over NORMALIZED text, so this is not just keep_best)
        from covid_engineering_spark.operators.pipeline import curate_corpus

        curate_corpus(read_table(spark, sf_dir, "documents")).write.mode(
            "overwrite"
        ).format("noop").save()

    def curate_gated(sf_dir):
        # the r07+ funnel shape (examples/corpus_curation.py): the
        # map-side Gopher gate runs FIRST (cheapest per byte, no
        # shuffle), so every shuffle-bearing stage downstream sees a
        # constant fraction of the bytes. The probe question (VERDICT
        # r07 next-round #6): does gating first pull the composite's
        # deep-scale wall down proportionally, and does its exponent
        # stay <= the ungated one?
        #
        # Blowup interaction, measured before settling on this form:
        # the key-shifted corpus suffixes EVERY word ('w' -> 'wr{i}')
        # to keep cross-replica shingles disjoint, which breaks the
        # two LEXICON rules — Gopher's required-word floor and the
        # blocklist term match are suffix-exact, so they kill/clear
        # everything at every depth and the "gated funnel" probe
        # degenerates to a gate-scan probe (first attempt measured a
        # nonsense -0.1 exponent on a near-empty funnel). The probe
        # therefore gates with the SIZE/SHAPE rules only (word-count
        # window, mean-word-length window, symbol and bullet caps,
        # alpha floor — all invariant under the suffix transform,
        # min_kinds=0 disables just the required-word rule), which
        # keeps the kill-rate constant across depths — the property
        # the production gate has on real data.
        #
        # The gate is the PREDICATE form (gopher_gate_col), evaluated
        # inside the scan: the first join-the-audit-frame-back form
        # cost a second scan + a corpus-sized shuffle join that
        # erased the entire downstream saving (measured 9.48s vs the
        # ungated 9.34s at 1x; predicate form ~55% of the wall).
        from covid_engineering_spark.operators.pipeline import curate_corpus
        from covid_engineering_spark.operators.text import gopher_gate_col

        docs = read_table(spark, sf_dir, "documents")
        gated = docs.filter(gopher_gate_col(min_kinds=0))
        curate_corpus(gated).write.mode("overwrite").format("noop").save()

    def sess(sf_dir):
        # window-heavy events path: user keys grow with the data, so
        # per-partition state must stay bounded
        from covid_engineering_spark.operators.timeseries import sessionize

        sessionize(read_table(spark, sf_dir, "events")).write.mode(
            "overwrite"
        ).format("noop").save()

    def unigram(sf_dir):
        # vocabulary join path: the blowup multiplies the VOCABULARY
        # 10x (replica-suffixed words) while per-token frequencies
        # stay flat — the worst case for the skew-split join's tail
        # side, which must grow linearly, never quadratically
        from covid_engineering_spark.operators.text import unigram_lm

        unigram_lm(read_table(spark, sf_dir, "documents")).write.mode(
            "overwrite"
        ).format("noop").save()

    def active(sf_dir):
        # distinct-collapse + 7x fan-out path: 10x the users over the
        # same calendar span, so pairs grow 10x and per-day
        # count-distinct state grows with users
        from covid_engineering_spark.operators.timeseries import active_users

        active_users(read_table(spark, sf_dir, "events")).write.mode(
            "overwrite"
        ).format("noop").save()

    def anomaly(sf_dir):
        # rolled-up window path: bucket×type cardinality is CONSTANT
        # under the blowup (same span, denser buckets), so the window
        # cost must stay flat and only the pre-agg scan scales
        from covid_engineering_spark.operators.timeseries import (
            rolling_anomaly,
        )

        rolling_anomaly(read_table(spark, sf_dir, "events")).write.mode(
            "overwrite"
        ).format("noop").save()

    def snapdiff(sf_dir):
        # full-outer hash-compare path: both snapshot sides scale with
        # the corpus; one sort-merge join, no broadcast to blow up
        from covid_engineering_spark.operators.pipeline import (
            q_pipe_snapshot_diff,
        )

        q_pipe_snapshot_diff(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def incnear(sf_dir):
        # guarded batch-vs-corpus shingle join: the whole point is
        # that the candidate set is bounded by |batch shingles|·max_df
        # — if the guard slipped, this would go quadratic in the blowup
        from covid_engineering_spark.operators.pipeline import (
            q_pipe_near_dup_incremental,
        )

        q_pipe_near_dup_incremental(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def knn(sf_dir):
        # blocked kNN at 10x the BLOCKS (constant block size): cost is
        # Σ block², so growth must track block count — linear — never
        # re-quadratic; the half-pair explode and salted grid ride along
        from covid_engineering_spark.operators.similarity import knn_graph

        knn_graph(read_table(spark, sf_dir, "embeddings")).write.mode(
            "overwrite"
        ).format("noop").save()

    def pr(sf_dir):
        # kNN edges + 3 integer PageRank iterations: joins/aggs all
        # key-partitioned, so 10x nodes/edges should be ~linear
        from covid_engineering_spark.operators.similarity import (
            knn_graph,
            pagerank,
        )

        edges = knn_graph(
            read_table(spark, sf_dir, "embeddings")
        ).select("src_id", "n_id")
        pagerank(edges).write.mode("overwrite").format("noop").save()

    def ivfpq(sf_dir):
        # coarse cells are CONSTANT (seed draw), lists grow 10x: probe
        # cost per query is (PROBE/K)·N·M code lookups — linear in N
        from covid_engineering_spark.operators.similarity import ivfpq_topk

        ivfpq_topk(read_table(spark, sf_dir, "embeddings")).write.mode(
            "overwrite"
        ).format("noop").save()

    def semd(sf_dir):
        # SemDeDup: cells grow 10x in COUNT (replica-offset labels) at
        # constant cell size, so Σ cell² pair work must grow linearly
        # with the corpus, never re-quadratically
        from covid_engineering_spark.operators.similarity import semdedup

        semdedup(read_table(spark, sf_dir, "embeddings")).write.mode(
            "overwrite"
        ).format("noop").save()

    def hardneg(sf_dir):
        # in-batch hard-negative mining: n_batch = ceil(N/cap) grows
        # with the corpus at CONSTANT batch size, so pair work is
        # N × cap — the probe must show linear, never re-quadratic
        from covid_engineering_spark.operators.similarity import (
            hard_negatives,
        )

        hard_negatives(read_table(spark, sf_dir, "embeddings")).write.mode(
            "overwrite"
        ).format("noop").save()

    def q7(sf_dir):
        # TPC-H star-join spine at N× keys: the lineitem⨝orders
        # shuffle scales with the facts while both nation broadcasts
        # stay 25 rows — wall time must track the fact side linearly
        from covid_engineering_spark.operators.relational import (
            q_q7_nation_volume,
        )

        q_q7_nation_volume(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def rfm(sf_dir):
        # |customers| grows N× through the r07 global_ntile plan:
        # range-repartition + per-partition rank + broadcast offsets,
        # three times — every stage's parallelism grows with the
        # data, so the probe must show the single-task sort of the
        # r06 plan (its fastest-growing term) is gone
        from covid_engineering_spark.operators.relational import (
            q_rfm_segments,
        )

        q_rfm_segments(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def ewma(sf_dir):
        # bucket×type cardinality is CONSTANT under the blowup (same
        # calendar span, denser buckets), so the 16-bucket list
        # window must stay flat and only the pre-agg scan scales —
        # the rolling_anomaly regime with a collect_list frame
        from covid_engineering_spark.operators.timeseries import ewma

        ewma(read_table(spark, sf_dir, "events")).write.mode(
            "overwrite"
        ).format("noop").save()

    def sq8(sf_dir):
        # map-side encode against a broadcast stats row: N× vectors,
        # zero shuffles on the encode path — must be flat-linear
        from covid_engineering_spark.operators.similarity import sq8_encode

        sq8_encode(read_table(spark, sf_dir, "embeddings")).write.mode(
            "overwrite"
        ).format("noop").save()

    def bm25(sf_dir):
        # N× docs: tf rows scale with matching tokens only (map-side
        # term filter before the explode), df/corpus stats stay
        # ≤|terms| and 1 row, final cut is TakeOrderedAndProject —
        # must track the scan linearly
        from covid_engineering_spark.operators.text import bm25_rank
        from covid_engineering_spark.sources import read_table

        bm25_rank(read_table(spark, sf_dir, "documents")).write.mode(
            "overwrite"
        ).format("noop").save()

    def rangesearch(sf_dir):
        # N× corpus vectors against a FIXED query set: candidates are
        # bucket equi-join rows, queries broadcast — linear in corpus,
        # never pairwise
        from covid_engineering_spark.operators.similarity import (
            range_search,
        )
        from covid_engineering_spark.sources import read_table

        range_search(read_table(spark, sf_dir, "embeddings")).write.mode(
            "overwrite"
        ).format("noop").save()

    def madanom(sf_dir):
        # same regime as ts_ewma/ts_anomaly: bucket×type cardinality
        # constant under the blowup, so the two exact-median aggs run
        # over an unchanging frame and only the pre-agg scan scales
        from covid_engineering_spark.operators.timeseries import (
            mad_anomaly,
        )
        from covid_engineering_spark.sources import read_table

        mad_anomaly(read_table(spark, sf_dir, "events")).write.mode(
            "overwrite"
        ).format("noop").save()

    def heavyhitters(sf_dir):
        # N× users (key-shifted blowup): the (type,user) partial agg
        # grows linearly, the totals frame stays |types| rows
        from covid_engineering_spark.operators.relational import (
            q_a23_heavy_hitters,
        )

        q_a23_heavy_hitters(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def perplex(sf_dir):
        # the unigram_lm regime: tf/vocab cached, hot-token broadcast
        # split — per-(doc,term) rows scale with corpus tokens, the
        # vocabulary join must stay skew-free
        from covid_engineering_spark.operators.text import perplexity
        from covid_engineering_spark.sources import read_table

        perplexity(read_table(spark, sf_dir, "documents")).write.mode(
            "overwrite"
        ).format("noop").save()

    def pctl(sf_dir):
        # cells are capped at types x 24 whatever the feed size; only
        # the pre-agg scan scales (the ts_ewma/ts_mad regime)
        from covid_engineering_spark.operators.timeseries import (
            percentile_profile,
        )
        from covid_engineering_spark.sources import read_table

        percentile_profile(
            read_table(spark, sf_dir, "events")
        ).write.mode("overwrite").format("noop").save()

    def cms(sf_dir):
        # sketch build is one partial-aggregated hash agg with a
        # types x 192-row output however many users arrive — the
        # fixed-memory property being probed
        from covid_engineering_spark.operators.relational import (
            q_a24_cms_heavy,
        )

        q_a24_cms_heavy(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def hamming(sf_dir):
        # 16 bytes per corpus vector against 8 broadcast query codes:
        # the cheapest brute-force scan in the engine — must be
        # flat-linear however deep the corpus goes
        from covid_engineering_spark.operators.similarity import (
            hamming_topk,
        )
        from covid_engineering_spark.sources import read_table

        hamming_topk(read_table(spark, sf_dir, "embeddings")).write.mode(
            "overwrite"
        ).format("noop").save()

    def mrl(sf_dir):
        # two brute-force passes (full-dim + 16-dim prefix) against a
        # fixed query set: linear in corpus vectors, prefix side ~4x
        # cheaper per row
        from covid_engineering_spark.operators.similarity import (
            mrl_recall,
        )
        from covid_engineering_spark.sources import read_table

        mrl_recall(read_table(spark, sf_dir, "embeddings")).write.mode(
            "overwrite"
        ).format("noop").save()

    def downtime(sf_dir):
        # spine cardinality is bounded by the time span (constant
        # under the blowup); only the observed-bucket pre-agg scan
        # scales
        from covid_engineering_spark.operators.timeseries import (
            downtime_gaps,
        )
        from covid_engineering_spark.sources import read_table

        downtime_gaps(read_table(spark, sf_dir, "events")).write.mode(
            "overwrite"
        ).format("noop").save()

    def staticenrich(sf_dir):
        # broadcast dim join (fact never shuffles for it) + one
        # (segment x type)-key agg — must track the fact scan
        from covid_engineering_spark.sources import read_table
        from covid_engineering_spark.streaming.joins import (
            segment_rollup,
        )

        segment_rollup(
            read_table(spark, sf_dir, "events"),
            read_table(spark, sf_dir, "customer"),
        ).write.mode("overwrite").format("noop").save()

    def quantcuts(sf_dir):
        # one partial-aggregated pass over the per-customer rollup:
        # twelve quantile sketches + exact buffers over |customers|
        # rows — must track the orders scan, nothing else grows
        from covid_engineering_spark.operators.relational import (
            q_a25_quantile_cuts,
        )

        q_a25_quantile_cuts(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def rprecall(sf_dir):
        # map-side 16-dim projection + two brute-force passes against
        # a fixed query set — linear in corpus vectors, projected
        # side 4x cheaper per row (the mrl_recall regime)
        from covid_engineering_spark.operators.similarity import (
            rp_recall,
        )
        from covid_engineering_spark.sources import read_table

        rp_recall(read_table(spark, sf_dir, "embeddings")).write.mode(
            "overwrite"
        ).format("noop").save()

    def kanon(sf_dir):
        # quasi-tuple agg collapses the corpus to |lang x source|
        # rows broadcast back onto the scan — the gate itself is
        # map-side, so growth must track the documents scan
        from covid_engineering_spark.operators.pipeline import (
            k_anonymize,
        )
        from covid_engineering_spark.sources import read_table

        k_anonymize(read_table(spark, sf_dir, "documents")).write.mode(
            "overwrite"
        ).format("noop").save()

    def ppssample(sf_dir):
        # the global_prefix_sum spine at N x docs: range exchange +
        # pid-window running sum + broadcast offsets — must track the
        # documents scan, same regime as rfm's rank stages
        from covid_engineering_spark.operators.pipeline import (
            weighted_sample,
        )
        from covid_engineering_spark.sources import read_table

        weighted_sample(
            read_table(spark, sf_dir, "documents")
        ).write.mode("overwrite").format("noop").save()

    def gopher(sf_dir):
        # pure map-side rule stack (the blocklist regime): one scan,
        # per-row array math, no shuffle — must be flat-linear
        from covid_engineering_spark.operators.text import gopher_rules
        from covid_engineering_spark.sources import read_table

        gopher_rules(read_table(spark, sf_dir, "documents")).write.mode(
            "overwrite"
        ).format("noop").save()

    def holtp(sf_dir):
        # the ewma regime with a trend term: bucket x type cardinality
        # is constant under the blowup, so the coefficient-fold window
        # stays flat and only the pre-agg scan scales
        from covid_engineering_spark.operators.timeseries import holt
        from covid_engineering_spark.sources import read_table

        holt(read_table(spark, sf_dir, "events")).write.mode(
            "overwrite"
        ).format("noop").save()

    def mgheavy(sf_dir):
        # the Misra-Gries summary: the blowup multiplies USERS (keys),
        # so per-(type, shard) groups get wider while WindowGroupLimit
        # keeps each map task's forward at k+1 rows per group — the
        # count shuffle should dominate and scale linearly, the
        # summary stages stay constant-size
        from covid_engineering_spark.operators.relational import (
            q_a26_mg_heavy,
        )

        q_a26_mg_heavy(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def dsir(sf_dir):
        # corpus-wide token explode collapsed to the <=512-bucket
        # model (constant-size broadcast at any depth); the per-doc
        # weight shuffle carries |doc x distinct-bucket| rows and
        # must scale with the corpus, never faster
        from covid_engineering_spark.operators.pipeline import (
            q_pipe_dsir_select,
        )

        q_pipe_dsir_select(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def dsir_gumbel(sf_dir):
        # identical weight plan to dsir; the Gumbel draw adds one
        # map-side hash+libm expression over the weight frame, so the
        # exponent must track pipe_dsir_select's
        from covid_engineering_spark.operators.pipeline import (
            q_pipe_dsir_gumbel,
        )

        q_pipe_dsir_gumbel(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def substr(sf_dir):
        # positional-gram explode is linear; the dup-gram set is
        # map-side combined (one shuffled row per distinct gram), the
        # probe's suffixed replicas keep cross-replica grams disjoint
        # so duplication density is scale-invariant
        from covid_engineering_spark.operators.dedup import (
            q_dedup_substring,
        )

        q_dedup_substring(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def substr_hashed(sf_dir):
        # the xxhash64 gram-key production path: same plan as substr
        # with 8-byte BIGINT shuffle keys in place of ~50-byte gram
        # strings — the named lever behind the exact-string form's
        # 0.699 exponent at 100x (VERDICT r09 #2)
        from covid_engineering_spark.operators.dedup import (
            substring_dup_spans,
        )
        from covid_engineering_spark.sources import read_table

        substring_dup_spans(
            read_table(spark, sf_dir, "documents"), hashed=True
        ).write.mode("overwrite").format("noop").save()

    def substr_strip(sf_dir):
        # the removal form: span frame + per-doc span collapse + one
        # corpus join + map-side token excision — must track the
        # analysis form plus one linear join
        from covid_engineering_spark.operators.dedup import (
            q_dedup_substring_strip,
        )

        q_dedup_substring_strip(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def substr_strip_hashed(sf_dir):
        # the strip form on the PRODUCTION gram path (library default
        # since r11): both gram shuffles carry xxhash64 BIGINT keys —
        # exponent must track <= the exact-string form's, like the
        # analysis pair
        from covid_engineering_spark.operators.dedup import (
            substring_strip,
        )
        from covid_engineering_spark.sources import read_table

        substring_strip(
            read_table(spark, sf_dir, "documents"), hashed=True
        ).write.mode("overwrite").format("noop").save()

    def incnear_lsh(sf_dir):
        # the standing-index incremental form: batch signatures probe
        # capped corpus band buckets, candidates <= |batch|*bands*cap
        # — the lever behind the exact form's 0.529 exponent
        # (VERDICT r09 #4); must probe flatter than incnear
        from covid_engineering_spark.operators.pipeline import (
            q_pipe_near_dup_incremental_lsh,
        )

        q_pipe_near_dup_incremental_lsh(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    # standing-index scratch, staged ONCE per sf_dir on the warmup
    # call (the production contract: the index is maintained between
    # runs, so its build cost is per-refresh, not per-batch) — the
    # TIMED run reads the persisted layout and pays only the batch's
    # shingle/minhash work plus the probe/verify joins.
    _nd_index_paths: dict = {}

    def incnear_lsh_prebuilt(sf_dir):
        from covid_engineering_spark.operators.pipeline import (
            near_dup_incremental_lsh,
            read_near_dup_index,
            write_near_dup_index,
        )
        from covid_engineering_spark.sources import read_table

        docs = read_table(spark, sf_dir, "documents")
        if sf_dir not in _nd_index_paths:
            path = tempfile.mkdtemp(prefix="ces_ndidx_")
            write_near_dup_index(
                docs.filter(F.col("doc_id") % 5 != 0), path, portable=True
            )
            _nd_index_paths[sf_dir] = path
        near_dup_incremental_lsh(
            None,
            docs.filter(F.col("doc_id") % 5 == 0),
            portable=True,
            index=read_near_dup_index(spark, _nd_index_paths[sf_dir]),
        ).write.mode("overwrite").format("noop").save()

    # FIXED-batch incremental probes: the production question for a
    # standing index is per-batch cost with the BATCH CONSTANT as the
    # corpus grows (the x1000 runs above grow both together). Replica
    # 0 keeps the base doc_id range (<10^9), so this batch is the
    # same ~|base|/5 docs at any X; only the index side scales.
    _FIXED_BATCH = (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 10**9)

    def incnear_lsh_fixedbatch(sf_dir):
        from covid_engineering_spark.operators.pipeline import (
            near_dup_incremental_lsh,
            read_near_dup_index,
            write_near_dup_index,
        )
        from covid_engineering_spark.sources import read_table

        docs = read_table(spark, sf_dir, "documents")
        if sf_dir not in _nd_index_paths:
            path = tempfile.mkdtemp(prefix="ces_ndidx_")
            write_near_dup_index(
                docs.filter(F.col("doc_id") % 5 != 0), path, portable=True
            )
            _nd_index_paths[sf_dir] = path
        near_dup_incremental_lsh(
            None,
            docs.filter(_FIXED_BATCH),
            portable=True,
            index=read_near_dup_index(spark, _nd_index_paths[sf_dir]),
        ).write.mode("overwrite").format("noop").save()

    def incnear_lsh_pushdown(sf_dir):
        # the scan-pruned probe: batch bucket keys + candidate ids
        # pushed as literal In filters into the clustered index scans
        # — must probe FLAT where fixedbatch still pays the index scan
        from covid_engineering_spark.operators.pipeline import (
            probe_near_dup_index,
            write_near_dup_index,
        )
        from covid_engineering_spark.sources import read_table

        docs = read_table(spark, sf_dir, "documents")
        if sf_dir not in _nd_index_paths:
            path = tempfile.mkdtemp(prefix="ces_ndidx_")
            write_near_dup_index(
                docs.filter(F.col("doc_id") % 5 != 0), path, portable=True
            )
            _nd_index_paths[sf_dir] = path
        probe_near_dup_index(
            spark,
            _nd_index_paths[sf_dir],
            docs.filter(_FIXED_BATCH),
            portable=True,
        ).write.mode("overwrite").format("noop").save()

    def kmeans(sf_dir):
        # iterated Lloyd at N x vectors: every E-step is map-side
        # against a broadcast <=K-row codebook, every M-step shuffle
        # carries cells x DIM rows — the rounds must track the vector
        # scan linearly, never re-shuffle the corpus
        from covid_engineering_spark.operators.similarity import (
            kmeans_lloyd,
        )
        from covid_engineering_spark.sources import read_table

        kmeans_lloyd(read_table(spark, sf_dir, "embeddings")).write.mode(
            "overwrite"
        ).format("noop").save()

    def contam(sf_dir):
        # the decontaminate regime with per-doc accounting: the eval
        # side is a fixed benchmark, the shared-count join carries
        # matching shingles only — must track the corpus scan
        from covid_engineering_spark.operators.pipeline import (
            q_pipe_contamination_report,
        )

        q_pipe_contamination_report(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def bloomdecon(sf_dir):
        # the prescreen regime: the bit-set frame is FIXED geometry
        # (<= BLOOM_BITS rows at any eval size), probes ride broadcast
        # joins, only Bloom-positives reach the exact verify — total
        # must track the corpus shingle scan, like the gate
        from covid_engineering_spark.operators.pipeline import (
            q_pipe_bloom_decontaminate,
        )

        q_pipe_bloom_decontaminate(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def triangles(sf_dir):
        # degree-ordered wedges at 10x the BLOCKS (constant block
        # size): kNN edges grow linearly, per-vertex oriented
        # out-degree stays bounded by the in-block k, so wedge volume
        # — and the census — must track edge count, never m^1.5
        from covid_engineering_spark.operators.similarity import (
            q_graph_triangle_count,
        )

        q_graph_triangle_count(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def entropy(sf_dir):
        # corpus-bytes char explode collapsed at the first partial
        # agg (<= |alphabet| rows/doc survive the shuffle): linear in
        # corpus bytes by construction
        from covid_engineering_spark.operators.text import (
            q_text_entropy,
        )

        q_text_entropy(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def pca(sf_dir):
        # 3 power rounds + Rayleigh tail: per round one map-side
        # 64-float broadcast fold + one posexplode into 64 dim keys —
        # the corpus is scanned (cached) but never shuffled, so
        # growth must track the scan
        from covid_engineering_spark.operators.similarity import (
            q_emb_pca_power,
        )

        q_emb_pca_power(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def colloc(sf_dir):
        # PMI extraction: map-side bigram algebra collapses to
        # vocabulary-sized frames at the first partial agg; the
        # candidate/vocab joins are bounded by vocabulary — growth
        # must track the token scan
        from covid_engineering_spark.operators.text import (
            q_text_collocations,
        )

        q_text_collocations(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def intervaljoin(sf_dir):
        # binned interval join at Nx the KEYS: anchors grow linearly
        # with events, each explodes into <=3 hour bins, the equi-join
        # shuffles on (type, bin) — growth must track the event scan,
        # never the nested-loop blowup the raw range predicate plans
        from covid_engineering_spark.operators.relational import (
            q_j9_binned_interval_join,
        )

        q_j9_binned_interval_join(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def anngraph(sf_dir):
        # graph build (kNN at Nx the blocks) + fixed-budget walk: the
        # walk's work is |Q|*beam*degree per hop — CONSTANT in corpus
        # size — so growth must track the kNN-graph build, which the
        # knn probe already pins near-linear
        from covid_engineering_spark.operators.similarity import (
            q_ann_graph_greedy,
        )

        q_ann_graph_greedy(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def jsdiv(sf_dir):
        # per-source JS divergence: corpus collapses at the first
        # (source, token) partial agg; everything after is bounded by
        # vocabulary x sources — must track the token scan
        from covid_engineering_spark.operators.text import (
            q_text_js_divergence,
        )

        q_text_js_divergence(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def tsdecomp(sf_dir):
        # additive decomposition: one corpus resample shuffle, then
        # type-bounded trend window + <=types x 7 seasonal cells
        from covid_engineering_spark.operators.timeseries import (
            q_ts_decompose,
        )

        q_ts_decompose(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def qcls(sf_dir):
        # broadcast linear model: one md5 per token map-side, 512-row
        # broadcast join, partial-agg per doc — must ride the scan
        from covid_engineering_spark.operators.pipeline import (
            q_pipe_quality_classifier,
        )

        q_pipe_quality_classifier(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def curr(sf_dir):
        # curriculum = global_ntile + prefix sum: two range
        # repartitions + bounded offsets windows, no single-partition
        # sort at any size
        from covid_engineering_spark.operators.pipeline import (
            q_pipe_curriculum_order,
        )

        q_pipe_curriculum_order(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def lpa(sf_dir):
        # LPA at Nx the BLOCKS: kNN edges grow linearly, each round is
        # one edge-keyed join + (node,label) partial agg + per-node
        # rank over <=degree rows
        from covid_engineering_spark.operators.similarity import (
            q_graph_label_propagation,
        )

        q_graph_label_propagation(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def rerank(sf_dir):
        # two-stage retrieval: stage 1 is the ADC scan (codes only),
        # stage 2 touches <=|Q|*shortlist float rows — total must
        # track the code scan, never add a second float pass
        from covid_engineering_spark.operators.similarity import (
            q_ann_rerank_topk,
        )

        q_ann_rerank_topk(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def outliers(sf_dir):
        # per-label outlier gate: zero corpus shuffles — distance pass
        # map-side against broadcast centroids, moments collapse to
        # <=labels rows; must track the vector scan
        from covid_engineering_spark.operators.similarity import (
            q_emb_outliers,
        )

        q_emb_outliers(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def qsketch(sf_dir):
        # mergeable quantile summary: one rank window per (type,
        # shard) — the only corpus-sized sorts — plus the bounded
        # merge and one verification scan
        from covid_engineering_spark.operators.relational import (
            q_a27_quantile_sketch,
        )

        q_a27_quantile_sketch(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    # standing navigable-graph index scratch, staged ONCE per sf_dir
    # on the warmup call (the same per-refresh contract as the
    # near-dup index above).
    _graph_index_paths: dict = {}

    def gserve(sf_dir):
        # the serving loop against the standing graph index: beam
        # state on the driver, per-hop In-pruned adjacency/vector
        # scans — per-query cost must stay ~flat as the graph grows
        from covid_engineering_spark.operators.similarity import (
            N_QUERIES,
            graph_greedy_serve,
            write_graph_index,
        )
        from covid_engineering_spark.sources import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        if sf_dir not in _graph_index_paths:
            path = tempfile.mkdtemp(prefix="ces_gidx_")
            write_graph_index(emb, path)
            _graph_index_paths[sf_dir] = path
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
        graph_greedy_serve(spark, _graph_index_paths[sf_dir], q)

    def qhist(sf_dir):
        # bounded-domain exact quantiles: one partial-agg histogram
        # collapse is the only corpus pass — must track the scan with
        # a bounded tail, the lever the a27 0.633 depth row names
        from covid_engineering_spark.operators.relational import (
            q_a28_quantile_hist,
        )

        q_a28_quantile_hist(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def kcorepeel(sf_dir):
        # mutual-kNN k-core at Nx the BLOCKS: edges grow linearly,
        # each peel round is one vertex-keyed degree agg + two
        # semi-joins on checkpointed frames; cascade DEPTH is a local
        # property of block topology, so round count must stay flat
        # while per-round cost tracks the edge scan
        from covid_engineering_spark.operators.similarity import (
            q_graph_kcore,
        )

        q_graph_kcore(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    out: dict = {"metric": "scale_probe", "x": REPLICAS, "base": BASE}
    seen_names: set = set()
    for name, fn in (
        ("wrangle_clean_complete", wrangle),
        ("dedup_minhash_lsh", minhash),
        ("dedup_clusters", clusters),
        ("pipe_keep_best", keep),
        ("pipe_curate_corpus", curate),
        ("pipe_curate_corpus_gated", curate_gated),
        ("ts_sessionize", sess),
        ("text_unigram_lm", unigram),
        ("ts_active_users", active),
        ("ts_anomaly", anomaly),
        ("pipe_snapshot_diff", snapdiff),
        ("pipe_near_dup_incremental", incnear),
        ("emb_knn_graph", knn),
        ("graph_pagerank", pr),
        ("ann_ivfpq_topk", ivfpq),
        ("emb_semdedup", semd),
        ("emb_hard_negatives", hardneg),
        ("q7_nation_volume", q7),
        ("rfm_segments", rfm),
        ("ts_ewma", ewma),
        ("emb_sq8", sq8),
        ("text_bm25", bm25),
        ("ann_range_search", rangesearch),
        ("ts_mad_anomaly", madanom),
        ("a23_heavy_hitters", heavyhitters),
        ("text_perplexity", perplex),
        ("ts_percentile_profile", pctl),
        ("a24_cms_heavy", cms),
        ("emb_mrl_recall", mrl),
        ("ts_downtime_detect", downtime),
        ("stream_static_enrich", staticenrich),
        ("ann_hamming_topk", hamming),
        ("a25_quantile_cuts", quantcuts),
        ("emb_rp_recall", rprecall),
        ("pipe_k_anonymity", kanon),
        ("pipe_weighted_sample", ppssample),
        ("text_gopher_rules", gopher),
        ("ts_holt", holtp),
        ("a26_mg_heavy", mgheavy),
        ("pipe_dsir_select", dsir),
        ("pipe_dsir_gumbel", dsir_gumbel),
        ("dedup_substring", substr),
        ("dedup_substring_hashed", substr_hashed),
        ("dedup_substring_strip", substr_strip),
        ("dedup_substring_strip_hashed", substr_strip_hashed),
        ("pipe_near_dup_incremental_lsh", incnear_lsh),
        ("pipe_near_dup_incremental_lsh_prebuilt", incnear_lsh_prebuilt),
        ("pipe_near_dup_incremental_lsh_fixedbatch", incnear_lsh_fixedbatch),
        ("pipe_near_dup_incremental_lsh_pushdown", incnear_lsh_pushdown),
        ("emb_kmeans_lloyd", kmeans),
        ("pipe_contamination_report", contam),
        ("pipe_bloom_decontaminate", bloomdecon),
        ("graph_triangle_count", triangles),
        ("text_entropy", entropy),
        ("emb_pca_power", pca),
        ("text_collocations", colloc),
        ("j9_binned_interval_join", intervaljoin),
        ("ann_graph_greedy", anngraph),
        ("ann_graph_serve_prebuilt", gserve),
        ("graph_kcore", kcorepeel),
        ("text_js_divergence", jsdiv),
        ("ts_decompose", tsdecomp),
        ("pipe_quality_classifier", qcls),
        ("pipe_curriculum_order", curr),
        ("graph_label_propagation", lpa),
        ("ann_rerank_topk", rerank),
        ("emb_outliers", outliers),
        ("a27_quantile_sketch", qsketch),
        ("a28_quantile_hist", qhist),
    ):
        if ONLY and name not in ONLY:
            continue
        seen_names.add(name)
        # Release the previous pipeline's lingering blocks (cached
        # frames, localCheckpoint RDDs await async ContextCleaner GC)
        # so each measurement starts from the same storage state —
        # without this, the checkpoint-heavy cluster pipelines inherit
        # memory pressure from whatever ran before them and the
        # exponents drift run to run. clearCache ALSO runs between the
        # warmup and the timed run: cache-backed queries reuse a warm
        # internal frame across invocations (the bench's steady-state
        # behavior), but the probe's question is the COLD end-to-end
        # cost at 10x — a timed run reading the warmup's cache skips
        # the very scan whose scaling is being measured. So: warmup =
        # warm JVM/codegen; timed = cold data, warm JVM.
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        fn(small)  # warmup at 1x (JVM/codegen)
        spark.catalog.clearCache()
        t1 = _time(lambda: fn(small))
        fn(big)  # warmup at 10x
        spark.catalog.clearCache()
        t10 = _time(lambda: fn(big))
        out[name] = {
            "t_1x_sec": round(t1, 2),
            f"t_{REPLICAS}x_sec": round(t10, 2),
            "exponent": round(math.log(t10 / t1) / math.log(REPLICAS), 3),
        }
    if ONLY:
        unknown = ONLY - seen_names
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_PROBE_ONLY names not in the pipeline set: "
                f"{sorted(unknown)}"
            )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
