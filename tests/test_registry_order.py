"""Registration-order guard: the verification driver hashes the FIRST
50 registry entries, so the order is a contract, not an accident. This
pins the window so a refactor cannot silently push a hard operator out
of driver verification.
"""

from covid_engineering_spark.queries import PRIORITY, oracles, registry

#: Names that round 1 left without a driver CORRECTNESS row — round 2
#: exists to get these verified, so they must all sit inside the window.
ROUND1_UNVERIFIED = {
    "w6_interpolate",
    "wrangle_clean_complete",
    "x1_sird_sim",
    "x2_sird_transfer",
    "x3_sird_mse",
    "m1_ols_origin",
    "m3_param_series",
    "m4_r0_series",
    "w7_rank",
    "w8_range_frame",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_token_stats",
    "text_tfidf",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "text_top_terms",
    "stream_tumble",
    "stream_slide",
    "stream_session",
    "mm_feature_extract",
}


def test_priority_is_exactly_the_first_50():
    assert len(PRIORITY) == 50
    assert len(set(PRIORITY)) == 50
    assert list(registry())[:50] == PRIORITY


def test_unverified_tier_sits_inside_the_driver_window():
    assert ROUND1_UNVERIFIED <= set(PRIORITY)


def test_new_round2_entries_sit_inside_the_driver_window():
    assert {
        "s1_csv_scan",
        "s2_sqlite_ingest",
        "s5_sink_partitioned",
        "covid_param_series",
        "covid_transfer_sim",
        "pipe_split_hash",
        "pipe_quota_source",
        "pipe_decontaminate",
        "pipe_pack_chunks",
        "pipe_mixture_sample",
        "dedup_clusters",
        "s6_jsonl_scan",
        "s7_orc_roundtrip",
        "s8_sink_compact",
        "s9_sink_range_sorted",
        "stream_dedup",
        "emb_centroid",
        "ts_resample",
        "text_repetition",
        "ts_sessionize",
        "pipe_keep_best",
        "pipe_length_hist",
    } <= set(PRIORITY)


#: Operators added AFTER the round-2 window saturated: they queue in
#: the tail (every window slot already holds a never-driver-checked
#: entry, so displacing one would trade a verified-never query for a
#: verified-never query) and MUST rotate into the round-3 window once
#: CORRECTNESS_r02 greens the current 50. Each still carries the full
#: local contract (DuckDB oracle at sf0.001 via test_oracle.py).
ROUND3_PENDING = {
    "ts_funnel",
    "ts_cohort",
    "ts_gapfill",
    "pipe_cdc_upsert",
    "pipe_pii_scrub",
    "pipe_dup_rate",
    "pipe_stratified_sample",
    "text_normalize",
    "emb_knn_graph",
}


def test_everything_after_the_window_was_green_in_round1():
    # Entries pushed past slot 50 must either hold a green
    # CORRECTNESS_r01 row (their verification history is on record) or
    # be declared round-3 rotation candidates above.
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "CORRECTNESS_r01.json")
    with open(path) as f:
        r01 = json.load(f)
    green = {
        k
        for k, v in r01.items()
        if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
    }
    tail = list(registry())[50:]
    unaccounted = [n for n in tail if n not in green and n not in ROUND3_PENDING]
    assert not unaccounted, unaccounted


def test_round3_pending_all_registered_with_oracles():
    reg, orc = registry(), oracles()
    missing = [n for n in ROUND3_PENDING if n not in reg]
    assert not missing, missing
    # pending entries are exactly the tail's new names — none may hide
    # inside the window (that would silently displace a never-checked op)
    assert not (ROUND3_PENDING & set(PRIORITY))
    no_oracle = [n for n in ROUND3_PENDING if n not in orc]
    assert not no_oracle, no_oracle


def test_oracle_keys_all_resolve():
    reg = registry()
    assert set(oracles()) <= set(reg)
