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


def test_everything_after_the_window_was_green_in_round1():
    # Entries pushed past slot 50 must be exactly ones with a green
    # CORRECTNESS_r01 row (their verification history is on record).
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
    not_previously_green = [n for n in tail if n not in green]
    assert not not_previously_green, not_previously_green


def test_oracle_keys_all_resolve():
    reg = registry()
    assert set(oracles()) <= set(reg)
