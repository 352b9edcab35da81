"""Query registry: assembles every operator's `(spark, sf_dir) ->
DataFrame` callable and its DuckDB oracle SQL into the dicts that
``__spark_entry__`` exposes to the verification driver.

Modules register themselves via ``QUERIES`` / ``ORACLES`` dicts; a
query without an oracle entry would get the driver's weaker rows-only
check — as of round 3 there are NONE: all 129 registered queries carry
SQL twins (the last holdout, the IVF ANN index, switched its
registered codebook to a deterministic SQL-replayable form; the
MLlib-KMeans codebook stays available as a lib function).

Registration ORDER is part of the driver contract: the driver hashes
exactly the first 50 registry entries, so ``PRIORITY`` pins the
verification window explicitly. Each round the window rotates: entries
without a driver CORRECTNESS row yet go first, then the hard tier for
re-verification. Everything after slot 50 holds a green driver row
from an earlier round (CORRECTNESS_r01/r02.json) and keeps its local
DuckDB-differential coverage (tests/test_oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from covid_engineering_spark import streaming
from covid_engineering_spark.operators import (
    covid,
    dedup,
    ingest,
    multimodal,
    pipeline,
    relational,
    similarity,
    simulation,
    text,
    timeseries,
    windows,
    wrangling,
)

_MODULES = [
    relational,
    windows,
    wrangling,
    simulation,
    covid,
    ingest,
    dedup,
    pipeline,
    similarity,
    text,
    timeseries,
    multimodal,
    streaming,
]

#: The first 50 registry entries — the driver's verification window.
#: Round-3 rotation: every round-2 window slot greened in
#: CORRECTNESS_r02.json, so the never-driver-checked tail
#: (ROUND3_ROTATED in tests/test_registry_order.py) rotates to the
#: front, followed by the operators born this round (ROUND3_NEW).
#: TWENTY-NINE r02-green entries are displaced past slot 50 to make
#: room (enumerated in the ROUND3_NEW comments below — their
#: verification history is on record in CORRECTNESS_r02.json); the
#: rest of the window re-verifies the hard tier.
PRIORITY = [
    # Never driver-checked: the round-2 tail, first in line.
    "ts_funnel",
    "ts_cohort",
    "ts_gapfill",
    "pipe_cdc_upsert",
    "pipe_pii_scrub",
    "pipe_dup_rate",
    "pipe_stratified_sample",
    "text_normalize",
    "emb_knn_graph",
    # New in round 3: the flagship curation composite, the
    # one-shuffle 5-step funnel, rolling z-score anomaly flags,
    # DAU/WAU rollup, corpus snapshot diff, Gopher-rule quality
    # filtering, unigram-LM scoring, incremental exact + near-dup
    # batch dedup, mixture planning, the hourly seasonality profile,
    # and the stream-stream interval join — never driver-checked, so
    # they claim window slots immediately (displacing, together with
    # the three below, TWENTY-FOUR r02-green entries past slot 50:
    # the five ingest round-trips beyond s1/s2, w7_rank,
    # w8_range_frame, text_tfidf, text_token_stats, text_quality,
    # text_fingerprint, text_top_terms, stream_slide, pipe_split_hash,
    # pipe_pack_chunks, pipe_quota_source, pipe_decontaminate,
    # pipe_mixture_sample, pipe_length_hist, ts_resample,
    # ts_sessionize, m3_param_series, m4_r0_series, x3_sird_mse —
    # verification history on record).
    "pipe_curate_corpus",
    "ts_funnel_steps",
    "ts_anomaly",
    "ts_active_users",
    "pipe_snapshot_diff",
    "pipe_quality_filter",
    "text_unigram_lm",
    "pipe_dedup_incremental",
    "pipe_near_dup_incremental",
    "pipe_mixture_plan",
    "ts_hourly_profile",
    "stream_interval_join",
    # Also new in round 3: PIVOT/UNPIVOT and nearest-centroid
    # assignment (vector quantization) — window slots claimed by
    # displacing m3_param_series, m4_r0_series, x3_sird_mse past
    # slot 50 (all three r02-green; m1/x1/x2 stay as family reps).
    "a16_pivot",
    "a17_unpivot",
    "emb_assign_nearest",
    # Third round-3 batch: the mergeable-sketch percentile (the 100 TB
    # quantile path, bound-checked like a14), the frame-sampling
    # fan-out, and the resize stage, each with a byte-arithmetic twin —
    # displacing stream_tumble, text_repetition, and text_langid (all
    # r02-green with REAL row counts; their families keep
    # representatives in the window).
    "a18_approx_percentile",
    "mm_frame_sample",
    "mm_resize",
    # Fourth round-3 batch: the TPC-H Q2-shape decorrelated argmin
    # join — displacing ann_cosine_topk (r02-green; ann_lsh/ann_ivf/
    # emb_centroid keep the ANN family in the window).
    "q2_min_cost_supplier",
    # Fifth round-3 batch: incremental rollup maintenance — partials
    # merged and hash-proven equal to the full recompute (displacing
    # covid_param_series, r02-green; covid_transfer_sim keeps the
    # family in the window).
    "ts_rollup_incremental",
    # Hard tier, re-verified (r02-green).
    "w6_interpolate",
    "wrangle_clean_complete",
    "x1_sird_sim",
    # x3 re-enters the window: its MSE emission changed this round
    # (2dp large-magnitude stabilization), so the r02 row no longer
    # describes the shipped output; x2 (unchanged, r02-green) cedes
    # the slot.
    "x3_sird_mse",
    "m1_ols_origin",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    # dedup_embedding stays IN the window: its only driver row
    # (r02) was a vacuous 0-vs-0-rows match at the production 0.95
    # threshold; the registry form now runs at 0.4 precisely so the
    # driver checks real pair values — that non-vacuous check has
    # never run driver-side, so the entry cannot be parked on history.
    "dedup_embedding",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "emb_centroid",
    "stream_session",
    "stream_dedup",
    "mm_feature_extract",
    "s1_csv_scan",
    "s2_sqlite_ingest",
    "covid_transfer_sim",
    "pipe_keep_best",
]


def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update(mod.QUERIES)
    missing = [n for n in PRIORITY if n not in out]
    if missing:
        raise ValueError(f"PRIORITY names without implementations: {missing}")
    ordered = {n: out[n] for n in PRIORITY}
    ordered.update({n: fn for n, fn in out.items() if n not in ordered})
    return ordered


def oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    unknown = out.keys() - registry().keys()
    if unknown:
        raise ValueError(f"oracles without queries: {sorted(unknown)}")
    return out
