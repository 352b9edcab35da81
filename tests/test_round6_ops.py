"""Semantic tests for the round-6 operators, beyond the oracle
differential (tests/test_oracle.py already hash-checks every
registered query against DuckDB): bound and invariant properties the
differential can't express — quantization-error bounds, recall
bracketing, TPC-H shape cross-checks against their naive forms.
"""

import pytest
from pyspark.sql import functions as F

from covid_engineering_spark.operators import relational as R
from covid_engineering_spark.operators import similarity as S
from covid_engineering_spark.sources import read_table

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# embedding tier
# ---------------------------------------------------------------------------


def test_dim_stats_shape_and_moments(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    rows = S.dim_stats(emb).collect()
    assert len(rows) == S.DIM
    assert {r.dim for r in rows} == set(range(1, S.DIM + 1))
    for r in rows:
        assert r.n_vals == n
        assert r.min_micro <= r.max_micro
        # Cauchy–Schwarz on integers: n·Σx² ≥ (Σx)².
        assert r.n_vals * r.sumsq_micro >= r.sum_micro**2


def test_sq8_codes_bounded_and_error_within_half_step(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    stats = {r.dim: r for r in S.dim_stats(emb).collect()}
    # Per-dim reconstruction error of round-to-nearest-code is at most
    # half a quantization step (+1 micro for the two float→micro
    # round-trips); the per-vector total is the sum of those bounds.
    bound = sum(
        (stats[d].max_micro - stats[d].min_micro) / (2 * 255) + 1.0
        for d in stats
    )
    out = S.sq8_encode(emb).collect()
    assert len(out) == emb.count()
    for r in out:
        assert 0 <= r.code_sum <= 255 * S.DIM
        assert r.err_micro >= 0
        assert r.err_micro <= bound + 1e-6, (r.vec_id, r.err_micro, bound)


def test_sq8_constant_dimension_codes_zero(spark):
    # A degenerate (min == max) dimension must encode as code 0 with
    # zero reconstruction error, not divide by zero.
    df = spark.createDataFrame(
        [(i, [0.5] * S.DIM) for i in range(4)], "vec_id: long, embedding: array<float>"
    )
    out = S.sq8_encode(df).collect()
    for r in out:
        assert r.code_sum == 0
        assert r.err_micro == 0


def test_recall_eval_brackets_and_matches_direct_overlap(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    rows = S.recall_eval(emb).collect()
    assert len(rows) == S.N_QUERIES
    for r in rows:
        assert 0 <= r.n_hits <= S.TOP_K
        assert abs(r.recall_at_k - r.n_hits / S.TOP_K) < 1e-9
    # Cross-check one query's overlap against collected sets.
    exact = {
        (r.q_id, r.n_id)
        for r in S.q_cosine_frame(emb).collect()
    }
    approx = {
        (r.q_id, r.n_id)
        for r in S.ivf_topk(emb, S.deterministic_codebook(emb)).collect()
    }
    got = {r.q_id: r.n_hits for r in rows}
    for q in got:
        want = len({p for p in exact if p[0] == q} & approx)
        assert got[q] == want


# ---------------------------------------------------------------------------
# time-series tier: window identities vs the sequential textbook folds
# ---------------------------------------------------------------------------


def test_ewma_matches_sequential_truncated_fold(spark):
    from covid_engineering_spark.operators import timeseries as T

    ev = read_table(spark, SF_SMOKE, "events")
    rows = T.ewma(ev).orderBy("event_type", "bucket").collect()
    # Rebuild per-type series and fold sequentially with dyadic weights.
    series = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(r)
    for typ, rs in series.items():
        xs = [r.x_cents for r in rs]
        for t, r in enumerate(rs):
            tail = xs[max(0, t - (T.EWMA_W - 1)) : t + 1]
            k = len(tail)
            num = sum(
                v * (1 << (T.EWMA_W - 1 - k + j + 1))
                for j, v in enumerate(tail)
            )
            den = (1 << T.EWMA_W) - (1 << (T.EWMA_W - k))
            assert r.ewma_num == num and r.ewma_den == den, (typ, t)
            assert r.ewma_cents == num // den
    # The smoother must damp: ewma range within the raw range.
    for typ, rs in series.items():
        lo, hi = min(r.x_cents for r in rs), max(r.x_cents for r in rs)
        for r in rs:
            assert lo - 1 <= r.ewma_cents <= hi + 1


def test_cusum_matches_sequential_page_fold(spark):
    from covid_engineering_spark.operators import timeseries as T

    ev = read_table(spark, SF_SMOKE, "events")
    rows = T.cusum_changepoint(ev).orderBy("event_type", "bucket").collect()
    series = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(r)
    for typ, rs in series.items():
        ref = rs[0].ref_cents
        s = 0
        for r in rs:
            assert r.ref_cents == ref  # one reference per type
            s = max(0, s + (r.x_cents - ref - ref // 2))
            assert r.cusum_cents == s, (typ, r.bucket)
            assert r.drift_flag == (s > T.CUSUM_H_MEANS * ref)


def test_rfm_scores_are_quintiles_and_segment_decomposes(spark):
    out = R.QUERIES["rfm_segments"](spark, SF_SMOKE).collect()
    n = len(out)
    for col in ("r_score", "f_score", "m_score"):
        vals = [getattr(r, col) for r in out]
        assert set(vals) <= set(range(1, 6))
        # ntile balance: bucket sizes differ by at most 1
        from collections import Counter

        c = Counter(vals)
        assert max(c.values()) - min(c.values()) <= 1
        assert sum(c.values()) == n
    for r in out:
        assert r.rfm_segment == r.r_score * 100 + r.f_score * 10 + r.m_score


def test_salted_join_is_bit_equal_to_plain_join(spark):
    got = {
        r.o_orderpriority: (r.n_lines, r.sum_qty)
        for r in R.QUERIES["j8_salted_join"](spark, SF_SMOKE).collect()
    }
    li = read_table(spark, SF_SMOKE, "lineitem")
    orders = read_table(spark, SF_SMOKE, "orders")
    want = {
        r.o_orderpriority: (r.n_lines, r.sum_qty)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .collect()
    }
    assert got == want


def test_mode_agrees_with_pandas_and_breaks_ties_low(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    pdf = li.select("l_returnflag", "l_quantity").toPandas()
    rows = {r.l_returnflag: r for r in R.QUERIES["a22_mode"](spark, SF_SMOKE).collect()}
    for flag, g in pdf.groupby("l_returnflag"):
        vc = g.l_quantity.astype("int64").value_counts()
        top = vc.max()
        want_qty = min(q for q, n in vc.items() if n == top)
        r = rows[flag]
        assert (r.mode_qty, r.mode_count) == (want_qty, top)
        assert r.n_distinct_qty == vc.size


def test_source_gate_is_relative_and_conserves_docs(spark):
    from covid_engineering_spark.operators import pipeline as P

    out = P.QUERIES["pipe_source_gate"](spark, SF_SMOKE).collect()
    n_docs_total = read_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in out) == n_docs_total
    # Self-calibrating bar: unless quality is perfectly uniform, both
    # verdicts must occur (some sources above the corpus mean, some
    # below) — the gate can never be vacuous.
    verdicts = {r.pass_quality for r in out}
    assert verdicts == {True, False}
    for r in out:
        assert r.admitted == (r.pass_dup and r.pass_quality)
        assert r.retained_docs == (r.n_docs if r.admitted else 0)


def test_corr_moments_match_pandas(spark):
    import math

    li = read_table(spark, SF_SMOKE, "lineitem")
    pdf = li.select("l_returnflag", "l_quantity", "l_extendedprice").toPandas()
    pdf["x"] = pdf.l_quantity.astype("int64")
    pdf["y"] = (pdf.l_extendedprice * 100 + 0.5).apply(math.floor).astype("int64")
    rows = R.QUERIES["a21_corr_moments"](spark, SF_SMOKE).collect()
    for r in rows:
        g = pdf[pdf.l_returnflag == r.l_returnflag]
        want = g.x.corr(g.y)
        assert abs(r.corr_qty_price - want) < 1e-4, (r.l_returnflag,)
        # Slope: cov/var in cents per quantity unit.
        beta = g.x.cov(g.y) / g.x.var()
        assert abs(r.beta_cents_per_qty - beta) < 1e-2


def test_snaive_pairs_align_exactly_one_week(spark):
    from covid_engineering_spark.operators import timeseries as T
    import datetime as dt

    ev = read_table(spark, SF_SMOKE, "events")
    rows = T.snaive_backtest(ev).collect()
    assert len(rows) >= 1
    # Rebuild the aligned-pair count per type directly.
    cents = {}
    for r in (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(F.sum(T._cents()).alias("x"))
        .collect()
    ):
        cents[(r.event_type, r.bucket)] = r.x
    for r in rows:
        pairs = [
            (v, cents[(t, b - dt.timedelta(days=7))])
            for (t, b), v in cents.items()
            if t == r.event_type and (t, b - dt.timedelta(days=7)) in cents
        ]
        assert r.n_pairs == len(pairs)
        assert r.abs_err_cents == sum(abs(a - f) for a, f in pairs)
        assert r.mae_cents == r.abs_err_cents // r.n_pairs


# ---------------------------------------------------------------------------
# TPC-H shapes: cross-checks against the naive/alternative formulation
# ---------------------------------------------------------------------------


def test_q13_buckets_cover_every_customer(spark):
    rows = R.QUERIES["q13_cust_distribution"](spark, SF_SMOKE).collect()
    n_cust = read_table(spark, SF_SMOKE, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust


def test_q18_threshold_agrees_with_window_formulation(spark):
    # The rollup-join decorrelation must agree with a windowed SUM
    # OVER (PARTITION BY order) formulation of the same HAVING.
    li = read_table(spark, SF_SMOKE, "lineitem")
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey")
    alt = (
        li.withColumn(
            "sum_qty", F.sum(F.col("l_quantity").cast("long")).over(w)
        )
        .filter(F.col("sum_qty") > 250)
        .select("l_orderkey")
        .distinct()
        .count()
    )
    got = R.QUERIES["q18_large_orders"](spark, SF_SMOKE).count()
    assert got == alt


def test_q15_revenue_is_the_global_max(spark):
    rows = R.QUERIES["q15_top_supplier"](spark, SF_SMOKE).collect()
    assert len(rows) >= 1
    li = read_table(spark, SF_SMOKE, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1996-03-31")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(revenue.cast("decimal(28,6)")).cast("double"), 2
        ).alias("total_revenue")
    )
    mx = per_supp.agg(F.max("total_revenue")).first()[0]
    for r in rows:
        assert r.total_revenue == mx


def test_q22_every_result_customer_lacks_urgent_orders(spark):
    out = R.QUERIES["q22_global_balance"](spark, SF_SMOKE)
    total = out.agg(F.sum("numcust")).first()[0]
    cust = read_table(spark, SF_SMOKE, "customer")
    urgent_cust = (
        read_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    no_urgent = (
        cust.join(urgent_cust, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .count()
    )
    # The no-urgent pool upper-bounds the result (the balance filter
    # and cntrycode subset only shrink it).
    assert total is not None and 0 < total <= no_urgent


# ---------------------------------------------------------------------------
# round-6 late tier: Hamming ANN, bigram LM, blocklist gate, autocorr
# ---------------------------------------------------------------------------


def test_bq_encode_is_the_sign_bit_in_two_words(spark):
    """Known-sign vector: dims 1..64 alternate +/-, so lo == hi ==
    the 0101... 32-bit mask; an all-negative vector codes (0, 0)."""
    alt = [0.5 if i % 2 == 0 else -0.5 for i in range(64)]
    neg = [-1.0] * 64
    emb = spark.createDataFrame(
        [(0, alt), (1, neg)], "vec_id long, embedding array<float>"
    )
    rows = {r.vec_id: (r.lo, r.hi) for r in S.bq_encode(emb).collect()}
    mask = sum(1 << i for i in range(0, 32, 2))  # bits 0,2,...,30
    assert rows[0] == (mask, mask)
    assert rows[1] == (0, 0)


def test_hamming_topk_matches_python_bruteforce(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    codes = {r.vec_id: (r.lo, r.hi) for r in S.bq_encode(emb).collect()}

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    got = [
        (r.q_id, r.n_id, r.hamming, r.rank)
        for r in S.hamming_topk(emb).collect()
    ]
    for q in range(S.N_QUERIES):
        scored = sorted(
            (ham(codes[q], c), n)
            for n, c in codes.items()
            if n != q
        )
        want = [
            (q, n, h, i + 1)
            for i, (h, n) in enumerate(scored[: S.TOP_K])
        ]
        mine = sorted((t for t in got if t[0] == q), key=lambda t: t[3])
        assert mine == want


def test_bigram_lm_counts_and_short_doc_contract(spark):
    from covid_engineering_spark.operators.text import bigram_lm

    docs = spark.createDataFrame(
        [
            (1, "x", "a b a b c"),   # bigrams: ab ba ab bc -> 4 total, 3 distinct
            (2, "x", "a b"),         # 1 bigram
            (3, "x", "loner"),       # < 2 tokens: NO row
        ],
        "doc_id long, source string, text string",
    )
    rows = {r.doc_id: r for r in bigram_lm(docs).collect()}
    assert set(rows) == {1, 2}
    assert (rows[1].n_bigrams, rows[1].distinct_bigrams) == (4, 3)
    assert (rows[2].n_bigrams, rows[2].distinct_bigrams) == (1, 1)
    # integer conservation: rare_count never exceeds n_bigrams
    for r in rows.values():
        assert 0 <= r.rare_count <= r.n_bigrams
        assert abs(r.novelty_ratio - r.rare_count / r.n_bigrams) < 1e-12


def test_blocklist_density_boundary_is_exact(spark):
    """hits * 12 > n_tokens: 1 hit in 11 tokens blocks (12 > 11);
    1 hit in 12 tokens does NOT (12 > 12 is false)."""
    from covid_engineering_spark.operators.pipeline import (
        blocklist_filter,
    )

    pad = lambda n: " ".join(["ok"] * n)
    docs = spark.createDataFrame(
        [
            (1, "x", "spam " + pad(10)),  # 1/11 -> blocked
            (2, "x", "spam " + pad(11)),  # 1/12 -> clean
            (3, "x", pad(5)),             # 0 hits -> clean
        ],
        "doc_id long, source string, text string",
    )
    rows = {r.doc_id: r for r in blocklist_filter(docs).collect()}
    assert rows[1].blocked and rows[1].block_hits == 1
    assert not rows[2].blocked and rows[2].block_hits == 1
    assert not rows[3].blocked and rows[3].block_hits == 0


def test_autocorr_matches_numpy_corrcoef(spark):
    import numpy as np
    import pandas as pd

    from covid_engineering_spark.operators.timeseries import autocorr

    ev = read_table(spark, SF_SMOKE, "events")
    got = {
        r.event_type: (r.n_pairs, r.autocorr_lag1)
        for r in autocorr(ev).collect()
    }
    pdf = ev.toPandas()
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    pdf["cents"] = np.floor(pdf["value"] * 100 + 0.5).astype("int64")
    for et, g in pdf.groupby("event_type"):
        s = (
            g.groupby("bucket")["cents"].sum().sort_index().to_numpy(
                dtype="float64"
            )
        )
        x, y = s[1:], s[:-1]
        want = float(np.corrcoef(x, y)[0, 1])
        n_pairs, r_got = got[et]
        assert n_pairs == len(x)
        assert abs(r_got - round(want, 6)) <= 1e-6


def test_bm25_matches_python_reference(spark):
    """Re-derive BM25 in Python over the smoke corpus — same term
    set, same 8dp-rounded idf, same micro conversion — and check the
    returned top-N (set, scores, hit counts)."""
    import math
    from collections import Counter, defaultdict

    from covid_engineering_spark.operators.text import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOPN,
        bm25_rank,
    )

    docs = read_table(spark, SF_SMOKE, "documents")
    texts = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    n_docs = len(texts)
    total_dl = sum(len(ws) for ws in texts.values())
    tf = {
        d: Counter(w for w in ws if w in BM25_TERMS)
        for d, ws in texts.items()
    }
    df = Counter(t for c in tf.values() for t in c)
    k1_1 = BM25_K1 + 1.0
    c0 = BM25_K1 * (1.0 - BM25_B)
    c1 = BM25_K1 * BM25_B
    scores: dict[int, int] = defaultdict(int)
    hits: dict[int, int] = defaultdict(int)
    for d, c in tf.items():
        dl = len(texts[d])
        for t, f in c.items():
            idf8 = round(
                math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0), 8
            )
            norm = f + c0 + c1 * ((dl * n_docs) / total_dl)
            scores[d] += math.floor(idf8 * (f * k1_1) / norm * 1e6 + 0.5)
            hits[d] += 1
    want = sorted(
        ((-s, d) for d, s in scores.items())
    )[:BM25_TOPN]
    got = {
        r.doc_id: (r.bm25_micros, r.n_hit_terms)
        for r in bm25_rank(docs).collect()
    }
    assert set(got) == {d for _, d in want}
    for neg_s, d in want:
        # the oracle differential proves engine-exactness; here allow
        # ±2 micros for Python-vs-JVM round() edge behaviour
        assert abs(got[d][0] - (-neg_s)) <= 2, (d, got[d][0], -neg_s)
        assert got[d][1] == hits[d]


def test_range_search_is_thresholded_subset_of_bruteforce(spark):
    """Every returned pair clears tau; every returned pair is a true
    cosine neighbor (subset of brute force at the same tau); every
    query keeps at least one neighbor on the fixture (recall sanity,
    not a guarantee of the method)."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    vecs = {r.vec_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        # mirror the engine's sequential left-fold
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return round(acc, 6)

    brute = {
        (q, n)
        for q in range(S.N_QUERIES)
        for n in vecs
        if n != q and cos(vecs[q], vecs[n]) >= S.RANGE_TAU
    }
    got = [(r.q_id, r.n_id, r.cosine) for r in
           S.range_search(emb).collect()]
    assert got, "range search returned nothing on the fixture"
    for q_id, n_id, c in got:
        assert c >= S.RANGE_TAU
        assert (q_id, n_id) in brute
    # LSH recall is probabilistic: a query whose only tau-neighbors
    # share no bucket legitimately comes back empty (q=2 at sf0.001).
    # Most queries must still land.
    assert len({q for q, _, _ in got}) >= S.N_QUERIES - 2


def test_mad_anomaly_flags_injected_spike(spark):
    """Hand-computable series per type: the spike (and only the
    spike) flags, including the degenerate mad2 == 0 series where any
    deviation must flag."""
    import datetime as dt

    from covid_engineering_spark.operators.timeseries import mad_anomaly

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # type a: five flat buckets + one spike -> mad2 == 0, dev>0 flags
    for i, v in enumerate([5.0, 5.0, 5.0, 5.0, 5.0, 50.0]):
        rows.append((t0 + dt.timedelta(hours=i), "a", v))
    # type b: varied buckets, one spike
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0]):
        rows.append((t0 + dt.timedelta(hours=i), "b", v))
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )
    out = {
        (r.event_type, r.x_cents): (r.med2, r.mad2, r.is_anomaly)
        for r in mad_anomaly(ev).collect()
    }
    # type a: med2 = 2*500, mad2 = 0; only the 5000-cent spike flags
    assert out[("a", 500)] == (1000, 0, False)
    assert out[("a", 5000)] == (1000, 0, True)
    # type b: med = 300 cents, devs |2x-600| = [400,200,0,200,19400],
    # mad2 = 2*200 = 400; flag iff dev*2 > 400*5 = 2000
    assert out[("b", 300)] == (600, 400, False)
    assert out[("b", 400)] == (600, 400, False)
    assert out[("b", 10000)] == (600, 400, True)


def test_heavy_hitters_bar_is_relative_to_group_mean(spark):
    """One user 5x over the mean flags; a uniform group flags nobody
    (the self-calibrating property a fixed support phi lacks)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # type a: user 1 has 10 events, users 2-5 have 2 each
    # mean = 18/5 = 3.6; bar 1.5x -> 5.4: only user 1
    for i in range(10):
        rows.append((i, t0, 1, "a", 1.0, "{}"))
    eid = 10
    for u in (2, 3, 4, 5):
        for _ in range(2):
            rows.append((eid, t0, u, "a", 1.0, "{}"))
            eid += 1
    # type b: perfectly uniform -> nobody exceeds 1.5x the mean
    for u in (1, 2, 3):
        for _ in range(4):
            rows.append((eid, t0, u, "b", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from covid_engineering_spark.operators.relational import (
        q_a23_heavy_hitters,
    )

    counts = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("cnt")
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_users")
    )
    got = (
        counts.join(F.broadcast(totals), "event_type")
        .filter(
            F.col("cnt") * F.col("n_users") * R.HH_DEN
            > F.col("total") * R.HH_NUM
        )
        .select("event_type", "user_id", "cnt")
        .collect()
    )
    assert {(r.event_type, r.user_id, r.cnt) for r in got} == {
        ("a", 1, 10)
    }


def test_cms_never_underestimates_and_candidates_match_exact(spark):
    """The CMS invariant (est >= exact, for every candidate, always)
    plus candidate-set equality with the exact heavy-hitter pass."""
    from covid_engineering_spark.operators.relational import (
        q_a23_heavy_hitters,
        q_a24_cms_heavy,
    )

    exact = {
        (r.event_type, r.user_id): r.cnt
        for r in q_a23_heavy_hitters(spark, SF_SMOKE).collect()
    }
    rows = q_a24_cms_heavy(spark, SF_SMOKE).collect()
    assert {(r.event_type, r.user_id) for r in rows} == set(exact)
    for r in rows:
        assert r.cnt == exact[(r.event_type, r.user_id)]
        assert r.est >= r.cnt
        assert r.overcount == r.est - r.cnt
        assert r.est_ge_exact is True


def test_mrl_recall_matches_python_overlap(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}

    def topk(width):
        out = {}
        for q in range(S.N_QUERIES):
            scored = []
            for n, v in vecs.items():
                if n == q:
                    continue
                acc = 0.0
                for x, y in zip(vecs[q][:width], v[:width]):
                    acc += x * y
                scored.append((-round(acc, 6), n))
            scored.sort()
            out[q] = {n for _, n in scored[: S.TOP_K]}
        return out

    full, pre = topk(64), topk(S.MRL_DIM)
    got = {r.q_id: (r.n_hits, r.recall_at_k)
           for r in S.mrl_recall(emb).collect()}
    assert set(got) == set(range(S.N_QUERIES))
    for q in got:
        overlap = len(full[q] & pre[q])
        assert got[q][0] == overlap
        assert abs(got[q][1] - round(overlap / S.TOP_K, 4)) < 1e-9


def test_perplexity_micro_accounting_hand_corpus(spark):
    """Three-doc corpus with a hand-computable unigram model: corpus
    counts a=3 b=2 c=1 (total 6); every micro contribution derives
    from round(ln(6/cf), 8)."""
    import math

    from covid_engineering_spark.operators.text import perplexity

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c"), (3, "c c a" if False else "c")],
        "doc_id long, text string",
    )
    # corpus: doc1 = a a b, doc2 = a b c, doc3 = c -> a=3 b=2 c=2?
    # recompute: tokens: doc1 [a,a,b], doc2 [a,b,c], doc3 [c]
    # cf: a=3, b=2, c=2, total=7
    def nll_micro(cf, total=7):
        return math.floor(round(math.log(total / cf), 8) * 1e6 + 0.5)

    na, nb, nc = nll_micro(3), nll_micro(2), nll_micro(2)
    want = {
        1: (3, 2 * na + nb),
        2: (3, na + nb + nc),
        3: (1, nc),
    }
    got = {
        r.doc_id: (r.n_tokens, r.nll_micros, r.mean_nll_micros)
        for r in perplexity(docs).collect()
    }
    for d, (n, micros) in want.items():
        assert got[d][0] == n
        assert got[d][1] == micros
        assert got[d][2] == micros // n


def test_percentile_profile_cells_bounded_and_ordered(spark):
    from covid_engineering_spark.operators.timeseries import (
        percentile_profile,
        resample,
    )

    ev = read_table(spark, SF_SMOKE, "events")
    rows = percentile_profile(ev).collect()
    n_types = ev.select("event_type").distinct().count()
    assert len(rows) <= n_types * 24
    assert sum(r.n_buckets for r in rows) == (
        ev.groupBy(
            F.date_trunc("hour", "ts"), "event_type"
        ).count().count()
    )
    for r in rows:
        assert 0 <= r.hour <= 23
        assert r.p50 <= r.p90


def test_downtime_gaps_rebuilds_known_holes(spark):
    """Hand-built feed: type 'a' emits hours 0,1,2,5,6,9 -> gaps
    [3..4] (2h) and [7..8] (2h); type 'b' is dense -> zero rows."""
    import datetime as dt

    from covid_engineering_spark.operators.timeseries import (
        downtime_gaps,
    )

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for h in (0, 1, 2, 5, 6, 9):
        rows.append((t0 + dt.timedelta(hours=h), "a", 1.0))
    for h in range(4):
        rows.append((t0 + dt.timedelta(hours=h), "b", 1.0))
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )
    got = {
        (r.event_type, r.gap_start.hour, r.gap_end.hour, r.n_hours)
        for r in downtime_gaps(ev).collect()
    }
    assert got == {("a", 3, 4, 2), ("a", 7, 8, 2)}
