"""Training-data pipeline tier (beyond-reference extension): the
corpus-management operations a 100 TB pretraining pipeline runs after
dedup/quality — deterministic splits, per-source quotas, benchmark
decontamination, and duplicate-cluster resolution.

Scale design notes:

* split: bucket on the LEXICOGRAPHIC prefix of md5(doc_id). No RNG, no
  state — the same document lands in the same split on every engine,
  every rerun, any partitioning, which is the property a train/eval
  firewall actually needs (``sample()``/``randomSplit`` are
  partition-order dependent and silently reshuffle membership on a
  repartition). Pure codegen expressions; the scan is the only cost.
* quota: per-source cap is one ranked window — the shuffle is on
  ``source``, and a skewed mega-source bounds at O(its rows log rows)
  locally. For top-k << group size, Spark's WindowGroupLimit pushes
  the rank filter below the sort at scale.
* decontamination: the eval-suite side of the join is tiny and fixed
  in a real pipeline (a benchmark corpus does not grow with the
  crawl), so the n-gram join is effectively map-side; here the eval
  set is carved from ``documents`` (so the oracle can see it) and the
  hint is left to AQE per the no-O(corpus)-broadcast-hints rule.
* clusters: connected components by iterative min-label propagation
  (the Pregel/GraphX formulation): each round is one join + one
  partial-aggregated groupBy, and the round count is the component
  DIAMETER — near-dup clusters are dense and shallow (a cluster of k
  rewrites of one page has diameter ~2), so this converges in a
  handful of rounds where a driver-side union-find would need the
  whole edge list on one machine. ``localCheckpoint`` truncates the
  lineage each round so the plan does not grow with iterations.

Reference parity: the reference app has no corpus tier — these extend
it per SURVEY.md §2 (LLM-data-pipeline mandate).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_engineering_spark.operators.relational import global_prefix_sum
from covid_engineering_spark.operators.dedup import (
    _SHINGLES_SQL,
    JACCARD_THRESHOLD,
    NGRAM_MAX_DF,
    _portable_hash_sql,
    ngram_jaccard_pairs,
    shingles_of,
)
from covid_engineering_spark.operators.text import (
    EN_STOP,
)
from covid_engineering_spark.operators.text import (
    sql_quality_score as _sql_quality_score,
)
from covid_engineering_spark.sources import read_table

#: Split boundaries on the first two hex chars of md5(doc_id):
#: 0x00-0xcb train (204/256 ~ 79.7%), 0xcc-0xe5 val (26/256 ~ 10.2%),
#: 0xe6-0xff test (26/256 ~ 10.2%). String comparison on lowercase hex
#: is byte-identical across Spark and the SQL oracle.
SPLIT_TRAIN_UPPER = "cc"
SPLIT_VAL_UPPER = "e6"
QUOTA_PER_SOURCE = 10
#: Word-n-gram size for benchmark decontamination. 4 is small enough
#: to catch paraphrased leakage on short synthetic docs; real
#: pipelines use 8-13 on full pages.
DECON_NGRAM = 4
#: Synthetic "benchmark suite": every 13th document stands in for the
#: eval corpus so the check is self-contained and oracle-visible.
DECON_EVAL_MOD = 13
CC_MAX_ROUNDS = 20


def split_assign(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Assign each row a deterministic train/val/test split from the
    md5 of its key — content-stable, partition-independent.
    """
    h2 = F.substring(F.md5(F.col(key).cast("string")), 1, 2)
    return docs.withColumn(
        "split",
        F.when(h2 < SPLIT_TRAIN_UPPER, F.lit("train"))
        .when(h2 < SPLIT_VAL_UPPER, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def q_pipe_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_assign(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "split"
    )


def quota_per_group(
    df: DataFrame,
    group: str,
    order,
    n: int = QUOTA_PER_SOURCE,
) -> DataFrame:
    """Keep at most ``n`` rows per ``group``, best-first by ``order``
    (a list of Column sort keys; make the last a unique tiebreak so
    the kept set is deterministic).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(*order)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
    )


def q_pipe_quota_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source balancing: keep the 10 longest documents per source
    (tie-broken by doc_id so the kept set is reproducible).
    """
    docs = read_table(spark, sf_dir, "documents")
    return quota_per_group(
        docs,
        "source",
        [F.col("n_chars").desc(), F.col("doc_id")],
    ).select("doc_id", "source", "n_chars", "rk")


def decontaminate(
    corpus_shingles: DataFrame, eval_shingles: DataFrame
) -> DataFrame:
    """Count per-document n-gram overlap with an eval suite. Input
    frames are (doc_id, s) shingle tables; output is one row per
    contaminated corpus document with its shared-n-gram count.
    """
    ev = eval_shingles.select("s").distinct()
    return (
        corpus_shingles.join(ev, "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


def q_pipe_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_engineering_spark.functions import evicting_cache

    docs = read_table(spark, sf_dir, "documents")
    # both join sides derive from the same shingle frame: cache it so
    # the scan + explode runs once, not once per branch (same reason
    # minhash_lsh_pairs caches its shingles); evicting so re-invocation
    # in a long-lived session holds one cached copy, not one per call
    sh = evicting_cache(shingles_of(docs, DECON_NGRAM), "decon_shingles")
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    return decontaminate(sh.filter(~is_eval), sh.filter(is_eval))


def contamination_report(
    corpus_shingles: DataFrame,
    eval_shingles: DataFrame,
    corpus_docs: DataFrame,
) -> DataFrame:
    """GRADED eval-suite contamination per corpus document — the
    measured complement to :func:`decontaminate`'s binary gate (which
    drops a doc on ANY shared n-gram). Contamination studies (the
    GPT-3/PaLM appendix methodology) need the FRACTION: per document,
    how much of its n-gram set the benchmark suite covers, with a
    severity band — ``clean`` (zero overlap), ``partial``, ``high``
    (the suite covers ≥ half the doc's n-grams, tested as the integer
    cross-multiplication ``2·n_shared ≥ n_shingles`` — no float
    reaches the comparison). Every corpus doc gets a row, including
    shingle-less ones (too short / NULL text → ``n_shingles`` 0,
    ``shared_frac`` NULL, ``clean``) — absence must be auditable, not
    silent.

    Scale shape: identical to the gate — the eval side is tiny and
    fixed in production (a benchmark does not grow with the crawl),
    the shared-count join carries only matching shingles, and both
    per-doc aggregations partial-combine map-side. One extra LEFT
    join back onto the doc spine (broadcast-sized per-doc counters at
    any corpus scale a reporter would run this on — AQE picks).
    """
    zero = F.lit(0).cast("long")
    ev = eval_shingles.select("s").distinct()
    shared = (
        corpus_shingles.join(ev, "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("_shared"))
    )
    sizes = corpus_shingles.groupBy("doc_id").agg(
        F.count("*").alias("_n")
    )
    n_sh = F.coalesce(F.col("_n").cast("long"), zero)
    n_shd = F.coalesce(F.col("_shared").cast("long"), zero)
    return (
        corpus_docs.select("doc_id")
        .join(sizes, "doc_id", "left")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            n_sh.alias("n_shingles"),
            n_shd.alias("n_shared"),
            F.when(n_sh > 0, F.round(n_shd / n_sh, 6)).alias(
                "shared_frac"
            ),
            F.when(n_shd == 0, F.lit("clean"))
            .when(2 * n_shd >= n_sh, F.lit("high"))
            .otherwise(F.lit("partial"))
            .alias("band"),
        )
    )


def q_pipe_contamination_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from covid_engineering_spark.functions import evicting_cache

    docs = read_table(spark, sf_dir, "documents")
    sh = evicting_cache(
        shingles_of(docs, DECON_NGRAM), "contam_shingles"
    )
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    return contamination_report(
        sh.filter(~is_eval),
        sh.filter(is_eval),
        docs.filter(F.col("doc_id") % DECON_EVAL_MOD != 0),
    )


#: Bloom prescreen geometry for `pipe_bloom_decontaminate`. 16384 bits
#: at ~8k eval shingles (sf0.01) loads the filter to ~0.5 set-bit
#: density, so with k=2 probes the measured false-positive rate sits
#: near (1-e^-1)^2 ~ 15% — high enough that the n_false_pos column is
#: genuinely exercised by the driver's hash check, low enough that the
#: prescreen still discards most of the corpus-side join input.
BLOOM_BITS = 16384
BLOOM_K = 2


def _bloom_positions(k: int = BLOOM_K, m: int = BLOOM_BITS) -> list:
    """The k Bloom bit positions of shingle column ``s``, via the same
    Kirsch-Mitzenmacher double-hash family as the portable MinHash
    signatures (dedup.py `_minhash_signatures`): one md5 split into two
    56-bit halves, g_i = (h1 + i*h2) mod m. 56-bit halves keep
    h1 + (k-1)*h2 far below int64 overflow in both engines.
    """
    md = F.md5(F.col("s"))
    h1 = F.conv(F.substring(md, 1, 14), 16, 10).cast("long")
    h2 = F.conv(F.substring(md, 15, 14), 16, 10).cast("long")
    return [(h1 + F.lit(i) * h2) % F.lit(m) for i in range(k)]


def bloom_decontaminate(
    corpus_shingles: DataFrame,
    eval_shingles: DataFrame,
    corpus_docs: DataFrame,
    m: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom-prescreened decontamination: the scale form of
    :func:`decontaminate` for when the eval suite is too large to
    broadcast as raw n-grams. The eval shingle set collapses to a
    <= m-row set-bit frame (broadcast at ANY eval size — the filter is
    fixed geometry, the suite is not); every distinct corpus shingle
    probes its k bit positions map-side through k broadcast joins (no
    shuffle), and only Bloom-POSITIVE shingles reach the exact verify
    join. A Bloom negative is definitive, so the exact join's left side
    shrinks by the true-negative mass; positives are then split into
    exact hits and counted false positives — the report shows both, so
    the prescreen's precision is measured in-engine, not assumed.

    Per corpus document: total shingles, Bloom-positive count, exact
    overlap count, false-positive count, and the contamination verdict
    (any exact hit). Every corpus doc gets a row (shingle-less docs
    report zeros) — absence must be auditable, not silent. All counters
    are integers; no float reaches the hash check.
    """
    from covid_engineering_spark.functions import evicting_cache

    pos = _bloom_positions(k, m)
    # The distinct eval shingle set feeds BOTH the filter build and the
    # exact-verify join; cached (lazily — it materializes inside the
    # bits checkpoint job below, costing no extra action) so the
    # eval-side distinct aggregation runs once per execution, not twice.
    # Bounded by the eval suite's shingle count, which is fixed in
    # production however large the crawl grows.
    ev_set = evicting_cache(
        eval_shingles.select("s").distinct(), "bloom_ev_set"
    )
    bits = (
        ev_set.select(
            F.explode(F.array(*pos)).alias("bit")
        ).distinct()
    )
    # Materialize the set-bit frame ONCE (r11, the bounded-frame
    # checkpoint discipline): left lazy, each of the k probe joins
    # broadcast-builds its own copy of this subtree, so the eval-side
    # scan + explode + distinct shuffle ran k times per execution.
    # The frame is ≤ m rows BY CONSTRUCTION (fixed filter geometry,
    # however large the eval suite), so the eager localCheckpoint is a
    # bounded micro-materialization at any scale.
    bits = bits.localCheckpoint(eager=True)
    probe = corpus_shingles.select("s").distinct().select(
        "s", *[p.alias(f"p{i}") for i, p in enumerate(pos)]
    )
    passed = probe
    for i in range(k):
        side = F.broadcast(
            bits.select(
                F.col("bit").alias(f"p{i}"), F.lit(True).alias(f"ok{i}")
            )
        )
        passed = passed.join(side, f"p{i}", "left")
    passed = passed.filter(
        reduce(lambda a, b: a & b, [F.col(f"ok{i}") for i in range(k)])
    ).select("s")
    ev = ev_set.withColumn("x", F.lit(True))
    verdict = passed.join(ev, "s", "left").select(
        "s", F.coalesce(F.col("x"), F.lit(False)).alias("is_exact")
    )
    joined = corpus_shingles.join(verdict, "s", "left")
    agg = joined.groupBy("doc_id").agg(
        F.count("*").alias("_n"),
        F.count("is_exact").alias("_pre"),
        F.sum(
            F.when(F.col("is_exact"), F.lit(1)).otherwise(F.lit(0))
        ).alias("_ex"),
    )
    zero = F.lit(0).cast("long")
    n_sh = F.coalesce(F.col("_n").cast("long"), zero)
    n_pre = F.coalesce(F.col("_pre").cast("long"), zero)
    n_ex = F.coalesce(F.col("_ex").cast("long"), zero)
    return (
        corpus_docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            n_sh.alias("n_shingles"),
            n_pre.alias("n_prescreen"),
            n_ex.alias("n_exact"),
            (n_pre - n_ex).alias("n_false_pos"),
            (n_ex > 0).alias("contaminated"),
        )
    )


def q_pipe_bloom_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from covid_engineering_spark.functions import evicting_cache

    docs = read_table(spark, sf_dir, "documents", fan=True)
    sh = evicting_cache(
        shingles_of(docs, DECON_NGRAM), "bloom_shingles"
    )
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    return bloom_decontaminate(
        sh.filter(~is_eval),
        sh.filter(is_eval),
        docs.filter(F.col("doc_id") % DECON_EVAL_MOD != 0),
    )


def q_pipe_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer-efficiency audit per language: characters per
    (BPE-ish regex) token and tokens per whitespace word — the
    fertility numbers that decide how much of a multilingual corpus a
    fixed token budget actually buys, and the first thing to check
    when a language is under-served by the tokenizer (high fertility
    = more tokens per unit text = less content per training step).

    Exactness: per-doc counters are integers; the per-lang ratios are
    computed on the SUMS (one truncating ``DIV``/``//`` on exact
    BIGINTs — the corpus-level ratio, NOT a mean of per-doc ratios,
    which would weight short docs equally with long ones). NULL text
    contributes to ``n_docs`` but not to the sums (all three counters
    are NULL together); a lang whose docs are all payload-less
    reports NULL ratios via the explicit zero guard — DuckDB raises
    on ``// 0`` where Spark returns NULL, so the guard is parity, not
    styling. One partial-aggregated groupBy on ``lang``: the shuffle
    carries language cardinality, never the corpus.
    """
    docs = read_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.length("text").cast("long").alias("c"),
        F.array_size(F.split(F.col("text"), " "))
        .cast("long")
        .alias("w"),
        F.array_size(
            F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0)
        )
        .cast("long")
        .alias("t"),
    )
    agg = per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("c").alias("sum_chars"),
        F.sum("w").alias("sum_words"),
        F.sum("t").alias("sum_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "sum_chars",
        "sum_words",
        "sum_tokens",
        F.when(
            F.coalesce(F.col("sum_tokens"), F.lit(0)) > 0,
            F.expr("sum_chars * 1000000 DIV sum_tokens"),
        ).alias("chars_per_token_micros"),
        F.when(
            F.coalesce(F.col("sum_words"), F.lit(0)) > 0,
            F.expr("sum_tokens * 1000000 DIV sum_words"),
        ).alias("tokens_per_word_micros"),
    )


#: Token budget per packed training chunk.
PACK_BUDGET = 512
#: Per-source keep thresholds on the first two hex chars of a salted
#: md5 — i.e. keep-rates of 64/256, 128/256, 192/256, and ~100% by
#: source number mod 4. 'g0' compares above every hex string, so the
#: fourth class keeps everything.
MIX_THRESHOLDS = ["40", "80", "c0", "g0"]


def pack_chunks(
    docs: DataFrame,
    group: str | list[str] = "source",
    order: str = "doc_id",
    budget: int = PACK_BUDGET,
) -> DataFrame:
    """Deterministic greedy sequence packing: within each ``group``
    (one column or several, ordered by ``order``), assign documents to
    fixed-token-budget chunks by exclusive-prefix token count — the
    streaming analogue of packing docs into training sequences. One
    window shuffle on the group key; packing is inherently
    order-defined, so the sequential dependency lives inside each
    group partition and groups pack in parallel. For an unbounded
    source, add a coarse time bucket to the group key to bound
    partition size. When packing a split corpus, include the split
    column in ``group`` — a chunk must never straddle the train/eval
    firewall.

    NULL ``text``: ``n_tokens`` is NULL and the document rides its
    group's packing order as a zero-width passenger — window ``SUM``
    skips NULLs in both engines, so the prefix (and every other
    document's ``chunk_id``) is unaffected, and the row still gets the
    chunk assignment its position implies.
    """
    from pyspark.sql import Window

    group_cols = [group] if isinstance(group, str) else list(group)
    n_tokens = F.array_size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("chunk_id", F.floor(prefix / budget))
    )


def q_pipe_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return pack_chunks(docs).select("doc_id", "source", "n_tokens", "chunk_id")


def q_pipe_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: each source keeps a deterministic
    fraction of its documents (rates 25/50/75/100% by source number),
    decided by a salted md5 bucket per document — the reproducible
    form of mixture-weight sampling (upsampling high-quality sources /
    downsampling crawl). Pure scan-side filter expressions: no
    shuffle, no RNG state, membership survives any repartition. The
    salt decorrelates the decision from the train/val/test split,
    which hashes the same key.
    """
    docs = read_table(spark, sf_dir, "documents")
    h2 = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))), 1, 2
    )
    # A source not matching 'src<N>' extracts '' -> null int; give it
    # an explicit keep-all default (class 3) instead of letting the
    # null comparison silently drop the row — the oracle's TRY_CAST +
    # ELSE branch lands on the same class.
    src_num = F.coalesce(
        F.regexp_extract(F.col("source"), r"src(\d+)", 1).cast("int"),
        F.lit(3),
    )
    thr = F.element_at(
        F.array(*[F.lit(t) for t in MIX_THRESHOLDS]), src_num % 4 + 1
    )
    return docs.filter(h2 < thr).select("doc_id", "source")


#: Target mixture weights per source CLASS (src_num % 4, matching
#: pipe_mixture_sample's class assignment); they sum to 1.
MIX_TARGETS = (0.4, 0.3, 0.2, 0.1)


def q_pipe_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture PLANNING — the step before ``pipe_mixture_sample``:
    per source, its actual token share vs its class's target share,
    and the per-source sampling rate (capped at 1) that would hit the
    target. The report a data-mixing run is driven by.

    Scale shape: one partial-aggregated groupBy on ``source``
    collapses the corpus to source cardinality; every derived figure
    (corpus total, class source-counts, shares, rates) is a window
    over that TINY frame — the single-partition global window is over
    #sources rows, not the corpus, so it is bounded by construction.
    All inputs to the divisions are exact integers; each output is one
    IEEE division rounded to 6dp, so the SQL twin agrees bit-for-bit.
    """
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    src_num = F.coalesce(
        F.regexp_extract(F.col("source"), r"src(\d+)", 1).cast("int"),
        F.lit(3),
    )
    # NULL text contributes no tokens (array_size is NULL-on-NULL and
    # SUM skips NULLs in both engines) but still counts in n_docs — a
    # source whose every document is payload-less plans NULL shares.
    per_src = (
        docs.withColumn("cls", src_num % 4)
        .groupBy("source", "cls")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.array_size(F.split("text", " ")).cast("long")).alias(
                "n_tokens"
            ),
        )
    )
    w_all = Window.partitionBy()
    w_cls = Window.partitionBy("cls")
    total = F.sum("n_tokens").over(w_all)
    n_in_cls = F.count("*").over(w_cls)
    cls_target = F.element_at(
        F.array(*[F.lit(t) for t in MIX_TARGETS]), F.col("cls") + 1
    )
    target_share = cls_target / n_in_cls
    rate = F.least(F.lit(1.0), target_share * total / F.col("n_tokens"))
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        "cls",
        F.round(F.col("n_tokens") / total, 6).alias("token_share"),
        F.round(target_share, 6).alias("target_share"),
        F.round(rate, 6).alias("sampling_rate"),
    )


def connected_components(
    pairs: DataFrame, max_rounds: int = CC_MAX_ROUNDS
) -> DataFrame:
    """Resolve near-dup pairs (d1, d2) into clusters: every document
    that appears in a pair gets ``cluster_id`` = the minimum doc_id
    reachable through the pair graph (the canonical survivor).

    Iterative min-label propagation; see the module docstring for why
    the round count is the component diameter. The driver-side loop
    holds only a convergence COUNTER per round — never the data.
    """
    from covid_engineering_spark.functions import evicting_cache

    # SELF-LOOPS ride the cached edge frame (r12): with (v, v) present
    # for every endpoint, "min label over my neighbors" automatically
    # includes my OWN label, so each round is one join + one partial
    # aggregation — the r11 form needed an extra left-join back onto
    # the labels frame per round just to keep the own-label candidate,
    # and a prev_lbl carry column just to detect convergence. Duplicate
    # self-loop rows (a doc in many pairs) are harmless under min().
    # ONE map-side Generate fans each pair into its 4 edge rows
    # (forward, mirror, both self-loops). The union form Catalyst would
    # otherwise need re-derives the ENTIRE pair-generation pipeline once
    # per branch — Catalyst plans trees, not DAGs — so the edge cache
    # build paid the shingle self-join 2x before r12 (and 4x with
    # self-loops as union branches). The explode pays it exactly once.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("d1").alias("src"), F.col("d2").alias("dst")),
                F.struct(F.col("d2").alias("src"), F.col("d1").alias("dst")),
                F.struct(F.col("d1").alias("src"), F.col("d1").alias("dst")),
                F.struct(F.col("d2").alias("src"), F.col("d2").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # evicting_cache, NOT localCheckpoint: the edge frame's lineage is
    # fixed (no loop grows it — only the labels chain needs checkpoint
    # truncation).
    edges = evicting_cache(edges, "cc_edges")
    # Round 0 fused into initialization: min(dst) over the self-looped
    # edges IS "least(v, min neighbor)" — the r11 form spent a distinct
    # exchange + an eager checkpoint just to seed lbl = v, then paid a
    # full round to reach this state. localCheckpoint(eager=False)
    # truncates the plan NOW but materializes inside the convergence
    # aggregate below — one action per round instead of a checkpoint
    # job plus a count job (guide §2.4: two ops keyed the same way
    # share one pass).
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("lbl"))
        .select(F.col("src").alias("v"), "lbl")
        .localCheckpoint(eager=False)
    )

    def _label_sum(frame: DataFrame) -> object:
        # Labels only ever DECREASE (min over a set that includes the
        # current label via the self-loop), so the exact decimal sum is
        # strictly monotone: sum unchanged <=> no label changed.
        # DECIMAL(38,0) keeps the sum exact for any id domain where
        # count*max_id < 10^38 — far past any real corpus.
        return frame.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).head()["s"]

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_rounds):
        # pointer jumping (path halving): adopt the label OF the label —
        # every label is itself a vertex, so this inner self-join never
        # drops rows. Neighbor-min alone needs DIAMETER rounds (a k-node
        # chain takes k); with the jump the label horizon doubles per
        # round, so rounds ~ log2(diameter) and max_rounds=20 covers any
        # component a real corpus holds. ``labels`` is checkpoint-backed,
        # so the two references share one materialization instead of
        # duplicating the subtree (Catalyst plans trees, not DAGs).
        a, b = labels.alias("a"), labels.alias("b")
        jumped = a.join(b, F.col("a.lbl") == F.col("b.v")).select(
            F.col("a.v").alias("v"),
            F.least(F.col("a.lbl"), F.col("b.lbl")).alias("lbl"),
        )
        new = (
            edges.join(jumped, edges.dst == jumped.v)
            .groupBy("src")
            .agg(F.min("lbl").alias("lbl"))
            .select(F.col("src").alias("v"), "lbl")
            .localCheckpoint(eager=False)
        )
        new_sum = _label_sum(new)
        labels = new
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # Returning partially-propagated labels would silently split
        # clusters; fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    return labels.select(
        F.col("v").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end duplicate resolution: guarded exact n-gram Jaccard
    pairs -> connected components -> (doc_id, cluster_id).
    """
    docs = read_table(spark, sf_dir, "documents")
    return connected_components(ngram_jaccard_pairs(docs))


def keep_best(docs: DataFrame, clusters: DataFrame, quality: DataFrame) -> DataFrame:
    """The retention step a dedup pipeline actually ships: one
    survivor per near-dup cluster, best-first by quality score
    (doc_id tiebreak). ``clusters`` holds (doc_id, cluster_id) for
    docs that appear in a dup pair; everything else is its own
    singleton cluster (cluster_id = doc_id), so the output is a FULL
    keep-list, not just the contested docs.
    """
    from covid_engineering_spark.functions import evicting_cache

    # Both halves of the retention split (contested join + singleton
    # anti join) consume the scored frame, and Catalyst re-derives
    # uncached subtrees per consumer — cache it so the quality scoring
    # and the attach join run once (measured at the 100x probe: the
    # uncached form re-ran the whole quality pipeline twice).
    scored = evicting_cache(
        docs.select("doc_id").join(
            quality.select("doc_id", "quality_score"), "doc_id"
        ),
        "keep_best_scored",
    )
    return _keep_best_scored(scored, clusters)


def _keep_best_scored(scored: DataFrame, clusters: DataFrame) -> DataFrame:
    """Survivor pick over an already-scored corpus — (doc_id,
    quality_score) plus the (doc_id, cluster_id) contested set.

    Scale shape (the r05 rewrite): ``clusters`` is tiny relative to
    the corpus — only docs that appear in a dup pair — so membership
    is resolved with two broadcast-sized joins (inner for the
    contested docs, left_anti for the singletons) and the ranked
    window + cluster count run over the CONTESTED SUBSET ONLY.
    Singletons (the overwhelming corpus majority) are emitted
    map-side with n_docs=1 and never shuffle at all. The previous
    shape windowed the whole corpus by cluster_id — a corpus-wide
    shuffle+sort whose cost the 100x probe put at the top of the
    curation composite; this one's window shuffle is bounded by the
    contested-doc count, independent of corpus size.
    """
    from pyspark.sql import Window

    contested = scored.join(clusters, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    size_w = Window.partitionBy("cluster_id")
    winners = (
        contested.withColumn("rk", F.row_number().over(w))
        .withColumn("n_docs", F.count("*").over(size_w))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc_id"),
            "n_docs",
            "quality_score",
        )
    )
    singles = scored.join(
        clusters.select("doc_id"), "doc_id", "left_anti"
    ).select(
        F.col("doc_id").alias("cluster_id"),
        F.col("doc_id").alias("kept_doc_id"),
        F.lit(1).cast("long").alias("n_docs"),
        "quality_score",
    )
    # cluster_id spaces are disjoint (a contested cluster's label is
    # the min doc_id of a doc that is itself in `clusters`), so this
    # union is a partition, not a merge.
    return winners.unionByName(singles)


def q_pipe_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_engineering_spark.operators.text import quality_frame

    from covid_engineering_spark.functions import evicting_cache

    docs = read_table(spark, sf_dir, "documents")
    clusters = connected_components(ngram_jaccard_pairs(docs))
    # quality_frame covers exactly the corpus doc_ids, so it IS the
    # scored universe — skipping keep_best's docs⨝quality attach join
    # (a corpus×corpus doc_id shuffle) without changing one row; cached
    # because both halves of the retention split consume it.
    scored = evicting_cache(
        quality_frame(docs).select("doc_id", "quality_score"),
        "keep_best_scored",
    )
    return _keep_best_scored(scored, clusters)


#: Character-length histogram bucket width for corpus profiling.
HIST_BUCKET_CHARS = 25


def q_pipe_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling in one scan: fixed-width document-length
    histogram with per-bucket exact totals (docs, chars, whitespace
    tokens, min/max length). All-integer outputs — no float rounding
    to drift against the oracle. Scale shape: pure partial aggregation;
    the shuffle carries one row per bucket (~hundreds), so profiling
    100 TB costs exactly one pass over the scan plus a broadcast-sized
    exchange. The floor-divide bucket is the portable form of
    ``width_bucket`` (identical integer arithmetic in both engines).
    """
    docs = read_table(spark, sf_dir, "documents")
    # NULL n_chars rows land in one NULL bucket (both engines group
    # NULL keys together); NULL text contributes nothing to
    # sum_ws_tokens (NULL-on-NULL array_size + NULL-skipping SUM).
    bucket = F.floor(F.col("n_chars") / HIST_BUCKET_CHARS)
    return (
        docs.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(
                F.array_size(F.split(F.col("text"), " ")).cast("long")
            ).alias("sum_ws_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .withColumn("lo_chars", F.col("bucket") * HIST_BUCKET_CHARS)
    )


#: Exact per-stratum sample size for the stratified sampler.
STRATUM_N = 20


def stratified_sample(
    df: DataFrame, strata: list[str], key: str = "doc_id", n: int = STRATUM_N
) -> DataFrame:
    """Exact-N uniform sample per stratum, reproducibly: rank rows
    within each stratum by md5(key) — a uniform, content-stable order
    — and keep the first ``n``. Unlike ``sampleBy`` (per-row coin
    flips: approximate counts, partition-order dependent), this
    yields EXACTLY min(n, stratum size) rows and the same rows on
    every engine, every layout. One ranked window on the strata key;
    Spark's WindowGroupLimit pushes the rank filter below the full
    sort for n << stratum size, so a mega-stratum never fully sorts.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    return (
        df.withColumn("sample_rk", F.row_number().over(w))
        .filter(F.col("sample_rk") <= n)
    )


def q_pipe_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 uniformly-chosen docs per (lang, source) stratum —
    the eval-set construction step (fixed-size per-cell samples, not
    proportional ones).
    """
    docs = read_table(spark, sf_dir, "documents")
    return stratified_sample(docs, ["lang", "source"]).select(
        "doc_id", "lang", "source", "sample_rk"
    )


def cdc_upsert(changelog: DataFrame, keys: list[str], ts: str = "ts") -> DataFrame:
    """Latest-wins changelog compaction — the batch form of ``MERGE
    INTO`` that keeps, per key, only the most recent version. The
    maintenance query behind every snapshot refresh of a mutable
    corpus (re-crawled pages, re-scored documents, corrected labels).

    Spark-first shape: ``max_by`` aggregation, NOT a ranked window —
    partial aggregation compacts each map-side partition before the
    shuffle, so the exchange carries at most one row per key per input
    partition, where a ``row_number`` window would shuffle and sort
    EVERY version of every key. Determinism requires a total order on
    ``ts`` within a key (the synthetic feed's timestamps are globally
    unique; production changelogs use a (ts, sequence) struct).
    """
    others = [c for c in changelog.columns if c not in keys and c != ts]
    return changelog.groupBy(*keys).agg(
        F.max(ts).alias(ts),
        *[F.max_by(c, ts).alias(c) for c in others],
    )


def q_pipe_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact the event log to the latest state per (user, event
    type) — e.g. "each user's most recent purchase/click/error".
    """
    ev = read_table(spark, sf_dir, "events")
    return cdc_upsert(
        ev.select("user_id", "event_type", "ts", "value", "props"),
        keys=["user_id", "event_type"],
    )


def scd2_history(
    changelog: DataFrame, keys: list[str], ts: str = "ts", seq: str | None = None
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 history: turn a changelog into
    one row per VERSION per key with a half-open validity interval
    [valid_from, valid_to) — valid_to = the NEXT version's timestamp,
    null while current — plus a version ordinal and ``is_current``
    flag. The complement of ``cdc_upsert`` (which keeps only the
    latest state): SCD2 is what an as-of join probes and what every
    warehouse dimension audit ships.

    Spark-first shape: ONE ranked window per key — lead() for the
    closing timestamp, row_number() for the ordinal, both riding the
    same (keys) hash partition and sort, so the only exchange is one
    shuffle on the key and per-partition state is bounded by versions
    per key. Determinism requires a total order within a key: pass a
    unique ``seq`` tiebreak column (event id, LSN) — relying on ``ts``
    alone silently permutes same-timestamp versions.
    """
    from pyspark.sql import Window

    order = [F.col(ts)] + ([F.col(seq)] if seq else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changelog.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("version", F.row_number().over(w).cast("int"))
        .withColumn("is_current", F.lead(ts).over(w).isNull())
    )


def q_pipe_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full version history of each (user, event type) state stream —
    the dimension-table audit face of the `pipe_cdc_upsert` compaction
    (the upsert keeps exactly the rows this query flags is_current).
    """
    ev = read_table(spark, sf_dir, "events")
    return scd2_history(
        ev.select("user_id", "event_type", "ts", "event_id", "value"),
        keys=["user_id", "event_type"],
        seq="event_id",
    )


#: Redaction patterns: regex -> replacement token. Digit runs stand in
#: for the phone/SSN/account-number patterns a production scrubber
#: ships; the regex subset used here (character classes, +) compiles
#: identically under Java regex (Spark) and RE2 (DuckDB).
PII_PATTERNS: list[tuple[str, str]] = [("[0-9]+", "<NUM>")]


def pii_scrub(
    df: DataFrame, col: str, patterns: list[tuple[str, str]] = PII_PATTERNS
) -> DataFrame:
    """Redact every match of each pattern in ``col`` and count the
    redactions per row. Pure JVM ``regexp_replace``/``regexp_count``
    expressions inside whole-stage codegen — a scan-side rewrite with
    no shuffle at any scale; the audit count rides along so a
    downstream gate can quarantine rows with excessive hits.
    """
    scrubbed = F.col(col)
    hits = F.lit(0)
    for pat, token in patterns:
        hits = hits + F.regexp_count(scrubbed, F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.withColumns(
        {f"{col}_scrubbed": scrubbed, "n_redactions": hits.cast("long")}
    )


def q_pipe_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return pii_scrub(ev.select("event_id", "props"), "props").select(
        "event_id", "props_scrubbed", "n_redactions"
    )


def dup_rate(docs: DataFrame) -> DataFrame:
    """Per-source duplication report: how much of each source is
    byte-identical duplicate content — the corpus-QA number that
    decides which crawls get a dedup pass first. Exact-dup groups come
    from the md5 groupBy (same shape as ``dedup_exact``); a document
    is a "dup" if its text hash occurs more than once GLOBALLY, and
    the rate is per-source. Two partial-aggregated shuffles (hash,
    then source), both carrying group-sized — not corpus-sized — rows.
    """
    hashed = docs.select(
        "doc_id", "source", F.md5(F.col("text")).alias("h")
    )
    counts = hashed.groupBy("h").agg(F.count("*").alias("n_copies"))
    return (
        hashed.join(counts, "h")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_copies") > 1).cast("long")).alias("n_dup_docs"),
            F.round(
                F.avg((F.col("n_copies") > 1).cast("double")), 6
            ).alias("dup_rate"),
        )
    )


def q_pipe_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_rate(read_table(spark, sf_dir, "documents"))


#: Dup gate: a source fails if more than half its docs are exact
#: duplicates of something in the corpus.
GATE_MAX_DUP_HALVES = 2  # n_dup_docs * 2 <= n_docs


def source_gate(docs: DataFrame) -> DataFrame:
    """Per-source admission gate — the crawl-level go/no-go every
    corpus refresh runs before paying for full curation: combine the
    per-source duplication rate (the ``dup_rate`` machinery) with a
    SELF-CALIBRATING quality bar — a source passes quality iff its
    mean document score is at or above the corpus-wide mean — and
    emit PASS/FAIL plus the doc count a gated corpus would retain.
    Failing a whole SOURCE is the cheap first filter: it prunes
    entire partitions before any pair-generation (near-dup) cost is
    spent on them, and the relative bar means the gate discriminates
    on ANY corpus rather than depending on a tuned constant.

    Exactness: each document's pre-rounded score enters as micro-units
    (``floor(q*1e6+0.5)``, exact on the 6-decimal grid); the
    above-corpus-mean test is the CROSS-MULTIPLIED integer form
    ``sum_q_src · n_total ≥ sum_q_total · n_src`` (the ts_anomaly
    trick — no division, no float, no rounding boundary), and the dup
    gate is ``n_dup·2 ≤ n_docs``. The emitted per-source mean is one
    truncating display division (``DIV`` ≡ ``//``). At 100 TB the
    cross-product promotes to DECIMAL(38,0); predicates unchanged.

    Scale shape: ONE corpus scan computes hash + score side by side;
    the hash-count join carries group-sized rows; the corpus totals
    collapse to a 1-row broadcast; the final frame is |sources| rows,
    broadcast-joinable against the corpus for the actual gating
    anti-join.
    """
    from covid_engineering_spark.operators.text import quality_score_col

    q_micro = F.floor(quality_score_col("text") * 1000000 + F.lit(0.5)).cast(
        "long"
    )
    hashed = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("text")).alias("h"),
        q_micro.alias("q_micro"),
    )
    counts = hashed.groupBy("h").agg(F.count("*").alias("n_copies"))
    per_source = (
        hashed.join(counts, "h")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_copies") > 1).cast("long")).alias("n_dup_docs"),
            F.sum("q_micro").alias("sum_q_micro"),
        )
        .withColumn("mean_q_micro", F.expr("sum_q_micro DIV n_docs"))
    )
    totals = per_source.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum("sum_q_micro").alias("q_total"),
    )
    pass_dup = (
        F.col("n_dup_docs") * GATE_MAX_DUP_HALVES <= F.col("n_docs")
    )
    pass_q = (
        F.col("sum_q_micro") * F.col("n_total")
        >= F.col("q_total") * F.col("n_docs")
    )
    return per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_dup_docs",
        "mean_q_micro",
        pass_dup.alias("pass_dup"),
        pass_q.alias("pass_quality"),
        (pass_dup & pass_q).alias("admitted"),
        F.when(pass_dup & pass_q, F.col("n_docs"))
        .otherwise(F.lit(0))
        .alias("retained_docs"),
    )


def q_pipe_source_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_gate(read_table(spark, sf_dir, "documents"))


#: Blocklisted terms for the density gate. Mixed on purpose: one term
#: the fixture corpus actually uses (non-degenerate blocked set) and
#: two it never does (the common case for a real blocklist — most
#: entries match nothing, and the scan must stay cheap anyway).
BLOCKLIST_TERMS = ("slow", "spam", "exploit")
#: Density threshold as an exact cross-multiplication: blocked iff
#: hits * BLOCK_DENSITY_DIV > n_tokens (i.e. share > 1/12 ≈ 8.3%).
BLOCK_DENSITY_DIV = 12


def blocklist_col():
    """The blocklist density verdict as ONE predicate Column over a
    ``text`` column (True = blocked) — the zero-join form for
    gate-first funnels, mirroring ``gopher_gate_col``: a funnel
    filters ``~blocklist_col()`` inside the scan instead of joining
    :func:`blocklist_filter`'s audit frame back on doc_id (a second
    scan + corpus-sized shuffle join)."""
    ws = F.split(F.col("text"), " ")
    hits = F.size(
        F.filter(ws, lambda w: w.isin(*BLOCKLIST_TERMS))
    ).cast("long")
    return hits * BLOCK_DENSITY_DIV > F.size(ws).cast("long")


def blocklist_filter(docs: DataFrame) -> DataFrame:
    """Term-blocklist density gate — the C4/RefinedWeb-style wordlist
    filter: a document is blocked when blocklisted terms make up more
    than ``1/BLOCK_DENSITY_DIV`` of its tokens (density, not
    any-occurrence — one stray term in a long document is noise; a
    term cluster is signal). Emits every document with its token
    count, hit count, and verdict, so the downstream gate is a
    trivial ``filter(~blocked)`` and the blocked mass is auditable
    per source.

    Exactness: counts are integers off one tokenize pass; the
    threshold is the cross-multiplied integer form ``hits * DIV >
    n_tokens`` — no float division anywhere.

    Scale shape: PURE MAP-SIDE — one scan, one `filter()` over the
    token array per blocklist bucket, no shuffle, no join (the
    blocklist is a literal; at 10⁵+ terms it would become a
    broadcast-joined token set instead — same output contract). At
    100 TB this is the cheapest gate in the stack and runs first.

    NULL ``text``: the counts are NULL and ``blocked`` is literal
    FALSE — a payload-less document has nothing to block, and the
    verdict feeds ``filter(~blocked)``, so it must be non-null. (The
    shared ``blocklist_col`` gate predicate is untouched: in a
    gate-first funnel its NULL and FALSE filter identically.)
    """
    ws = F.split(F.col("text"), " ")
    hits = F.array_size(
        F.filter(ws, lambda w: w.isin(*BLOCKLIST_TERMS))
    ).cast("long")
    n_tokens = F.array_size(ws).cast("long")
    return docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        hits.alias("block_hits"),
        # NULL only when text is NULL — coalesce IS the has-text gate.
        F.coalesce(
            hits * BLOCK_DENSITY_DIV > n_tokens, F.lit(False)
        ).alias("blocked"),
    )


def q_pipe_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blocklist_filter(read_table(spark, sf_dir, "documents"))


#: Minimum quasi-identifier group size for release (Sweeney 2002,
#: "k-Anonymity: a model for protecting privacy"). 5 is the classic
#: census-style floor; the fixture corpus's (lang, source) tail makes
#: the gate non-degenerate (both suppressed and released rows exist).
K_ANON = 5


def k_anonymize(docs: DataFrame, k: int = K_ANON) -> DataFrame:
    """k-anonymity release gate over the corpus metadata — before a
    dataset (or its datasheet) ships with per-document provenance
    columns, any quasi-identifier combination shared by fewer than
    ``k`` documents is suppressed (masked to ``'*'``), so no released
    row is metadata-unique below the k floor. Quasi-identifiers here
    are ``(lang, source)`` — the columns a release would carry;
    ``text`` content is PII-scrubbed separately (``pipe_pii``), this
    gate is about the JOINABLE attributes.

    Emits every document with its group size, the released (possibly
    masked) attributes, and the verdict — the downstream release is a
    trivial projection and the suppressed mass is auditable per
    source.

    NULL quasi-identifier values are a GROUP, not a gap: the join is
    null-safe (``<=>`` on both columns, IS NOT DISTINCT FROM in the
    oracle), so a document with NULL lang/source is counted against
    the NULL-tuple group and suppressed or released like any other —
    it can never silently vanish from the audit (a release gate that
    drops NULL-metadata docs from its own output is worse than
    suppressing them).

    Scale shape: one partial-aggregated shuffle collapses the corpus
    to |distinct quasi tuples| rows (~10²–10⁴ for metadata columns),
    which the explicit ``F.broadcast`` hint pins back onto the scan —
    the gate itself is map-side. The hint is a PIN, not a suggestion:
    AQE does not override it, so for a high-cardinality quasi set
    (e.g. user ids) remove the hint and let the size-based planner
    pick shuffle-hash instead of force-broadcasting a huge frame.
    """
    groups = docs.groupBy("lang", "source").agg(
        F.count("*").alias("qi_group_n")
    )
    ok = F.col("qi_group_n") >= k
    d, g = docs.alias("_ka_d"), groups.alias("_ka_g")
    return (
        d.join(
            F.broadcast(g),
            F.col("_ka_d.lang").eqNullSafe(F.col("_ka_g.lang"))
            & F.col("_ka_d.source").eqNullSafe(F.col("_ka_g.source")),
        )
        .select(
            "doc_id",
            F.col("qi_group_n"),
            ok.alias("released"),
            F.when(ok, F.col("_ka_d.lang")).otherwise(F.lit("*")).alias(
                "release_lang"
            ),
            F.when(ok, F.col("_ka_d.source")).otherwise(F.lit("*")).alias(
                "release_source"
            ),
        )
    )


def q_pipe_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_anonymize(read_table(spark, sf_dir, "documents"))


#: Target PPS sample size. Inclusion probability is ~k·w/W per doc
#: (docs heavier than W/k are selected with certainty, each counted
#: once, so the realized size is ≤ k).
PPS_SAMPLE_K = 100


def weighted_sample(docs: DataFrame, k: int = PPS_SAMPLE_K) -> DataFrame:
    """Systematic PPS (probability-proportional-to-size) sampling
    without replacement — the corpus-mixing draw that picks documents
    with probability ∝ length, the classic "sample by token mass, not
    by document count" step in training-data pipelines (systematic
    selection after Madow 1949; the fixed-order variant of
    Efraimidis–Spirakis weighted sampling that needs NO logarithms,
    so both engines compute it in exact integer arithmetic).

    Mechanics: order the corpus by a content-stable md5 hash (the
    random permutation), take the inclusive prefix sum W_i of the
    weights along that order (``global_prefix_sum`` — distributed,
    no single-partition pass), and select doc i iff the k evenly
    spaced pointers cross its mass interval:

        floor(W_i · k / W) > floor(W_{i-1} · k / W)

    — exact integer arithmetic across the full BIGINT mass domain:
    the cumulative mass is cast to DECIMAL(38,0) before the multiply
    (a BIGINT ``w_cum * k`` would wrap, not widen, past 2^63 — at
    char weights that bound sits near 10^17 chars ≈ 100 TB of text,
    exactly the target scale; pinned by
    test_weighted_sample_exact_past_int64_product), and the integral
    DIV of decimals is exact while W·k < 10^38. The remaining bound
    is the BIGINT prefix sum itself: W < 2^63 ≈ 9 exabytes of chars.
    The oracle computes the same crossings with HUGEINT ``//`` —
    both sides are integer-exact, no double rounding.
    Every document is emitted with its weight, cumulative mass and
    verdict, so the draw is auditable and re-weightable downstream.
    """
    h = F.md5(F.col("doc_id").cast("string"))
    w = F.coalesce(F.col("n_chars").cast("long"), F.lit(0))
    pref = global_prefix_sum(
        docs.select(
            "doc_id", "source", w.alias("weight"), h.alias("_h")
        ),
        [F.asc("_h"), F.asc("doc_id")],
        F.col("weight"),
        "w_cum",
        total_col="_w_tot",
    )
    sampled = F.expr(
        f"CAST(w_cum AS DECIMAL(38,0)) * {int(k)}"
        " DIV GREATEST(_w_tot, 1)"
    ) > F.expr(
        f"CAST(w_cum - weight AS DECIMAL(38,0)) * {int(k)}"
        " DIV GREATEST(_w_tot, 1)"
    )
    return pref.select(
        "doc_id", "source", "weight", "w_cum", sampled.alias("sampled")
    )


def q_pipe_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample(read_table(spark, sf_dir, "documents"))


#: DSIR feature-space size (hashed n-gram buckets) and selection size.
#: The paper uses 10^4 buckets at web scale; 512 keeps the fixture's
#: per-bucket counts non-degenerate while the frame stays broadcast-
#: sized at ANY corpus scale (the bucket count, not the corpus, bounds
#: it).
DSIR_BUCKETS = 512
DSIR_K = 50
DSIR_HASH_SEED = 31


def dsir_select(docs: DataFrame, target, k: int = DSIR_K) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169) — the importance-weighting step that picks raw
    documents distributed like a TARGET corpus: hash token features
    into ``DSIR_BUCKETS`` buckets, fit bag-of-words models to the
    target and raw sides with Laplace smoothing, and score every raw
    document by its log importance ratio

        w(x) = Σ_f  c_f(x) · [ log p_target(f) − log p_raw(f) ]

    ``target`` is a boolean Column naming the target distribution
    (the registered query uses the NULL-SAFE ``lang <=> 'en'`` —
    "select raw data that reads like the English target", with
    NULL-lang docs plain raw-side docs in both engines; a nullable
    predicate here silently diverges between Spark's NULL-skipping
    SUM and DuckDB's CASE ELSE); the registered selection is
    the DETERMINISTIC top-k by weight (the paper's Gumbel-noise
    resampling is one extra column on top — hash-derived noise would
    drop in the same way the split/mixture samplers draw md5 salt).

    Determinism across engines (the text_perplexity discipline): the
    per-bucket log-ratio is ONE libm op rounded to 8dp and scaled to
    integer micro-units; each document's weight is then an exact
    BIGINT dot product of its bucket counts against those micros. No
    float ever reaches a comparison, so the DuckDB twin replays the
    weights bit-for-bit. (No mean column: a truncating division of
    the possibly-NEGATIVE weight would need the ts_holt canonical-mod
    dance for nothing — consumers divide.)

    Scale shape: one partial-aggregated shuffle collapses ALL tokens
    to ≤ DSIR_BUCKETS feature rows (target and raw counted in the
    same pass) — constant-size however large the corpus — which
    broadcast back onto the per-document bucket counts (the second
    shuffle, |doc × distinct-bucket| ≤ |docs|·512 rows, partial-agg
    collapsed map-side); the top-k is TakeOrderedAndProject (never a
    global sort) and joins back as a ≤k-row broadcast flag.
    """
    w = _dsir_weights(docs, target)
    topk = (
        w.orderBy(F.desc("dsir_micros"), F.asc("doc_id"))
        .limit(int(k))
        .select("doc_id", F.lit(True).alias("_sel"))
    )
    return (
        w.join(F.broadcast(topk), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_feat_tokens",
            "dsir_micros",
            F.coalesce(F.col("_sel"), F.lit(False)).alias("selected"),
        )
    )


def _dsir_weights(docs: DataFrame, target) -> DataFrame:
    """The DSIR importance-weight frame (doc_id, source,
    n_feat_tokens, dsir_micros) both selection rules share — see
    :func:`dsir_select` for the arithmetic contract."""
    from covid_engineering_spark.functions import evicting_cache
    from covid_engineering_spark.operators.dedup import portable_hash64

    b = DSIR_BUCKETS
    toks = docs.select(
        "doc_id",
        "source",
        target.alias("_is_t"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).select(
        "doc_id",
        "source",
        "_is_t",
        F.pmod(
            portable_hash64(F.col("tok"), DSIR_HASH_SEED), F.lit(b)
        ).alias("feat"),
    )
    # Collapse the token stream ONCE to per-(doc, feature) counts and
    # cache that (r11, guide §2.3/§2.4): the raw ``toks`` frame fed
    # TWO aggregations (the bucket models and the per-doc counts) and
    # the weight frame feeds two consumer branches, so the corpus-wide
    # explode + md5 per token ran up to four times per execution.
    # ``tokfeat`` is ≤ |docs| × DSIR_BUCKETS rows at ANY corpus size
    # (bounded cache, unlike caching ``toks`` itself), carries the
    # partial-aggregated token shuffle exactly once, and both model
    # fits below become cheap re-aggregations of the cached frame.
    # ``_is_t`` is a group key, not a filter, so target- and raw-side
    # counts stay exact (a doc's _is_t is constant and non-NULL under
    # the null-safe registered predicate).
    tokfeat = evicting_cache(
        toks.groupBy("doc_id", "source", "_is_t", "feat").agg(
            F.count("*").alias("c")
        ),
        "dsir_tokfeat",
    )
    fs = tokfeat.groupBy("feat").agg(
        F.sum(F.when(F.col("_is_t"), F.col("c")).otherwise(F.lit(0))).alias("ct"),
        F.sum(F.when(~F.col("_is_t"), F.col("c")).otherwise(F.lit(0))).alias("cr"),
    )
    tot = fs.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    # one libm op per bucket, the perplexity/tfidf convention; FLOOR
    # of x+0.5 rounds half-up for negative ratios identically in both
    # engines (both floor toward -inf)
    lr_micros = F.floor(
        F.round(
            F.log(
                ((F.col("ct") + F.lit(1.0)) / (F.col("nt") + F.lit(float(b))))
                / (
                    (F.col("cr") + F.lit(1.0))
                    / (F.col("nr") + F.lit(float(b)))
                )
            ),
            8,
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    lr = fs.join(F.broadcast(tot)).select(
        "feat", lr_micros.alias("lr_micros")
    )
    docfeat = tokfeat.filter(~F.col("_is_t")).select(
        "doc_id", "source", "feat", "c"
    )
    # Cache the weight frame too (one row per raw doc): BOTH selection
    # rules consume it through two branches (the top-k draw and the
    # output join-back), and Catalyst re-derives uncached subtrees per
    # consumer — uncached, the model fit + scoring joins ran twice per
    # execution. The two registered DSIR queries share this plan, so
    # they also share the warm cache.
    return evicting_cache(
        docfeat.join(F.broadcast(lr), "feat")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("n_feat_tokens"),
            F.sum(F.col("c") * F.col("lr_micros")).alias("dsir_micros"),
        ),
        "dsir_weights",
    )


def dsir_gumbel_topk(
    docs: DataFrame,
    target,
    k: int = DSIR_K,
    temperature: float = 1.0,
    seed: int = 7,
) -> DataFrame:
    """The paper's actual resampling rule (Xie et al. 2023 §2.3;
    Gumbel-top-k, Vieira 2014): sample ``k`` raw documents WITHOUT
    replacement with P(doc) ∝ exp(w/T) by taking the top-k of
    ``w/T + G_i`` where ``G_i = −ln(−ln(u_i))`` is a standard Gumbel
    draw. The noise is HASH-derived — ``u_i`` from the md5
    ``portable_hash64(doc_id, seed)`` mapped into (0,1) — so the draw
    is deterministic and reproducible given (corpus, seed), the same
    salted-hash discipline as the split/mixture samplers; re-running
    the pipeline reproduces the sample bit-for-bit, changing ``seed``
    redraws it. ``temperature → 0`` recovers :func:`dsir_select`'s
    deterministic argmax top-k (pinned in tests).

    Library form (not a registered query): the score mixes libm
    doubles, which is fine for a sampler whose CONSUMER contract is
    the selected id set, not a hash-stable score column — the
    registered, oracle-twinned path is :func:`dsir_select`.

    Scale shape: identical to ``dsir_select`` (same weight frame; the
    noise is one map-side expression) — TakeOrderedAndProject top-k,
    ≤k-row broadcast flag.
    """
    from covid_engineering_spark.operators.dedup import portable_hash64

    w = _dsir_weights(docs, target)
    # u in (0,1): (h + 1) / (2^60 + 1), h uniform in [0, 2^60)
    u = (
        portable_hash64(F.col("doc_id").cast("string"), seed) + F.lit(1.0)
    ) / F.lit(float(2**60 + 1))
    gumbel = -F.log(-F.log(u))
    score = (
        F.col("dsir_micros").cast("double")
        / F.lit(1e6)
        / F.lit(float(temperature))
        + gumbel
    )
    scored = w.withColumn("gumbel_score", score)
    topk = (
        scored.orderBy(F.desc("gumbel_score"), F.asc("doc_id"))
        .limit(int(k))
        .select("doc_id", F.lit(True).alias("_sel"))
    )
    return scored.join(F.broadcast(topk), "doc_id", "left").select(
        "doc_id",
        "source",
        "n_feat_tokens",
        "dsir_micros",
        "gumbel_score",
        F.coalesce(F.col("_sel"), F.lit(False)).alias("selected"),
    )


def dsir_gumbel_topk_exact(
    docs: DataFrame, target, k: int = DSIR_K, seed: int = 7
) -> DataFrame:
    """:func:`dsir_gumbel_topk` in INTEGER MICRO-UNITS — the paper's
    Gumbel-top-k resampling rule with a hash-stable score column, so
    the whole selection (not just the id set) is checkable against an
    ANSI-SQL twin (:func:`dsir_gumbel_sql`; differential test in
    tests/test_round9_ops.py — VERDICT r08 next-round #6). Registered
    as ``pipe_dsir_gumbel``, overflow-pinned: the r09 window is fully
    spoken for by the NULL-hardening re-green set, so the entry sits
    at the front of the tail (``WINDOW_OVERFLOW``) and is first in
    line for the r10 window — the #6 "overflow-pinned otherwise"
    path, locally differential-checked like every oracle meanwhile.

    The draw: ``u = (h + 1) / 2^60`` from the md5-derived
    ``portable_hash64(doc_id, seed)`` — one exact int→double convert
    and one IEEE division, bit-identical in both engines. The Gumbel
    ``−ln(−ln u)`` takes the repo's 8dp-round convention after EACH
    libm call (a last-ulp ln divergence cannot move an 8dp-rounded
    value; the tfidf/perplexity/BM25 precedent), then snaps to BIGINT
    micro-units via ``floor(x·1e6 + 0.5)``. The inner ``−ln u`` is
    clamped below at 1e-8 — the rounding grid's smallest positive —
    so the u→1 tail (which 8dp rounding collapses to exactly 0, and
    ln would blow to −inf) saturates at Gumbel ≈ 18.42 instead; that
    caps draws above the 1−e^{-1e-8} quantile, statistically
    invisible and deterministic in both engines.

    Fixed temperature T = 1 (the exact-integer form: score =
    dsir_micros + gumbel_micros, associative BIGINT addition); the
    float :func:`dsir_gumbel_topk` keeps the temperature dial.

    Scale shape: identical to ``dsir_select`` — the noise is one
    map-side expression over the ≤corpus-row weight frame,
    TakeOrderedAndProject top-k, ≤k-row broadcast flag.
    """
    from covid_engineering_spark.operators.dedup import portable_hash64

    w = _dsir_weights(docs, target)
    u = (
        portable_hash64(F.col("doc_id").cast("string"), seed) + F.lit(1.0)
    ) / F.lit(float(2**60))
    neg_ln_u = -F.round(F.log(u), 8)
    gumbel_micros = (
        F.floor(
            -F.round(F.log(F.greatest(neg_ln_u, F.lit(1e-8))), 8)
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long")
    )
    scored = w.withColumn("gumbel_micros", gumbel_micros).withColumn(
        "score_micros", F.col("dsir_micros") + F.col("gumbel_micros")
    )
    topk = (
        scored.orderBy(F.desc("score_micros"), F.asc("doc_id"))
        .limit(int(k))
        .select("doc_id", F.lit(True).alias("_sel"))
    )
    return scored.join(F.broadcast(topk), "doc_id", "left").select(
        "doc_id",
        "source",
        "n_feat_tokens",
        "dsir_micros",
        "gumbel_micros",
        "score_micros",
        F.coalesce(F.col("_sel"), F.lit(False)).alias("selected"),
    )


def q_pipe_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Null-safe target predicate (the k_anonymize lesson): a plain
    # `lang = 'en'` is NULL for NULL-lang docs, and the two engines
    # disagree on NULL through their raw-side counters (Spark's SUM
    # skips the NULL boolean, DuckDB's CASE ELSE counts it) — <=>
    # makes NULL-lang docs plain raw-side docs in both.
    return dsir_select(
        read_table(spark, sf_dir, "documents", fan=True),
        F.col("lang").eqNullSafe(F.lit("en")),
    )


def q_pipe_dsir_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same null-safe target predicate as q_pipe_dsir_select — the two
    # registered DSIR forms share the weights plan; only the selection
    # rule differs (deterministic top-k vs the paper's Gumbel-top-k).
    return dsir_gumbel_topk_exact(
        read_table(spark, sf_dir, "documents", fan=True),
        F.col("lang").eqNullSafe(F.lit("en")),
    )


def curate_corpus(
    docs: DataFrame, strip_substrings: bool = False
) -> DataFrame:
    """The flagship end-to-end curation composite — the full sequence
    a pretraining corpus actually runs, as ONE lazy plan:

    0. (optional, ``strip_substrings=True``) ExactSubstr span removal
       — every merged duplicated token span excised from the text
       (``substring_strip``, Lee et al. 2022 §4.1) BEFORE any other
       stage, so cross-document boilerplate neither survives into
       training text nor glues unrelated docs into near-dup clusters.
       Costs the span frame's two gram shuffles plus one doc_id join
       back onto the corpus; off by default (the registered query
       replays the 5-stage funnel).
    1. normalize (lowercase/collapse punctuation, content hash)
    2. exact dedup on the NORMALIZED hash (byte-different rewrites of
       the same content collapse; min doc_id is the canonical copy)
    3. near-dup clustering over the normalized text (guarded 3-gram
       Jaccard pairs -> connected components)
    4. best-of-cluster retention by quality score
    5. deterministic train/val/test split of the survivors

    Scale shape (r05 rewrite — the 100x probe put this composite's
    exponent at 0.71, highest on the books, driven by Catalyst
    re-deriving the normalize→dedup subchain once per consumer and by
    corpus-wide shuffles in the dedup join and retention window):

    * normalization AND quality scoring are scan-side codegen in one
      projection — the original plan attached quality via a separate
      quality_frame scan plus a corpus×corpus doc_id join;
    * exact dedup is one window (min doc_id per content_hash, no
      orderBy) over that projection — one shuffle, replacing the
      groupBy + corpus-sized doc_id re-join (two shuffles and a
      second derivation of the normalize chain);
    * the surviving scored frame is cached (``evicting_cache``, the
      same discipline as the shingle index) because THREE downstream
      consumers read it — the pair generator and both membership
      joins of the retention split — and Catalyst does not dedupe
      shared subtrees;
    * the pair join is stop-shingle-guarded, CC is log-diameter label
      propagation (its localCheckpoints are the one deliberate extra
      materialization), retention windows only the contested subset
      (``_keep_best_scored``), and the split is a pure expression.
    """
    from pyspark.sql import Window

    from covid_engineering_spark.functions import evicting_cache
    from covid_engineering_spark.operators.text import (
        normalize,
        quality_score_col,
    )

    if strip_substrings:
        from covid_engineering_spark.operators.dedup import substring_strip

        stripped = substring_strip(docs).select(
            "doc_id", F.col("stripped_text").alias("text")
        )
        docs = docs.drop("text").join(stripped, "doc_id")

    nd = normalize(docs)
    # quality is scored on the ORIGINAL text (pre-normalization), on
    # every row — dup rows score wastefully but map-side, which is
    # cheaper than shuffling the text column twice to score after.
    min_id = F.min("doc_id").over(Window.partitionBy("content_hash"))
    surv = (
        nd.select(
            "doc_id",
            "content_hash",
            "norm_text",
            quality_score_col("text").alias("quality_score"),
        )
        .withColumn("_canon_id", min_id)
        .filter(F.col("doc_id") == F.col("_canon_id"))
        .select("doc_id", "norm_text", "quality_score")
    )
    surv = evicting_cache(surv, "curate_surv")
    pairs = ngram_jaccard_pairs(
        surv.select("doc_id", F.col("norm_text").alias("text"))
    )
    kept = _keep_best_scored(
        surv.select("doc_id", "quality_score"),
        connected_components(pairs),
    )
    out = split_assign(kept.withColumnRenamed("kept_doc_id", "doc_id"))
    return out.select(
        "doc_id", "cluster_id", "n_docs", "quality_score", "split"
    )


def q_pipe_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate_corpus(read_table(spark, sf_dir, "documents", fan=True))


#: Deterministic snapshot simulation: OLD drops doc_id % 10 == 9,
#: NEW drops doc_id % 10 == 0 and rewrites every doc_id % 7 == 0
#: (append " v2") — so the diff exercises all four statuses.
SNAP_OLD_DROP = 9
SNAP_NEW_DROP = 0
SNAP_EDIT_MOD = 7


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Corpus snapshot reconciliation: classify every doc_id across
    two corpus snapshots as added / removed / changed / unchanged by
    content-hash comparison — the validation step after any CDC merge
    or re-crawl, and the audit trail a dataset release ships with.

    Scale shape: each side collapses to (doc_id, md5) at the scan
    (projection prunes the text column immediately after hashing),
    then ONE full-outer sort-merge join on doc_id; both sides
    hash-partition on the same key, no broadcast of anything
    corpus-sized, and the join output is one row per doc_id union.
    The CASE classification is pure codegen.
    """
    o = old.select(
        "doc_id", F.md5(F.col("text")).alias("old_hash")
    )
    n = new.select(
        "doc_id", F.md5(F.col("text")).alias("new_hash")
    )
    status = (
        F.when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash").isNull(), "added")
        .when(F.col("old_hash") != F.col("new_hash"), "changed")
        .otherwise("unchanged")
    )
    return o.join(n, "doc_id", "full_outer").select(
        "doc_id", "old_hash", "new_hash", status.alias("status")
    )


def q_pipe_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != SNAP_OLD_DROP)
    new = docs.filter(F.col("doc_id") % 10 != SNAP_NEW_DROP).withColumn(
        "text",
        F.when(
            F.col("doc_id") % SNAP_EDIT_MOD == 0,
            F.concat(F.col("text"), F.lit(" v2")),
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new)


#: Gopher-style rule thresholds, tuned so every rule has live pass AND
#: fail populations on the synthetic corpus (verified in tests): char
#: length bounds, mean-word-length bounds, minimum stopword ratio,
#: minimum distinct-token fraction.
QF_LEN_MIN, QF_LEN_MAX = 100, 500
QF_WLEN_MIN, QF_WLEN_MAX = 4.0, 5.0
QF_STOP_MIN = 0.03
QF_UNIQ_MIN = 0.35
_QF_STOP = EN_STOP  # single source of truth for the English stopword list


def quality_filter(docs: DataFrame) -> DataFrame:
    """Rule-based document filtering (the Gopher/C4 pre-filter): four
    deterministic per-document rules — character-length window,
    mean-word-length window, minimum stopword ratio, minimum
    distinct-token fraction — each surfaced as its own flag plus the
    conjunction, so downstream can both filter and report per-rule
    rejection rates.

    Scale shape: pure map-side codegen — split / higher-order array
    folds / array_distinct, no shuffle, no Python; the whole filter
    rides the scan. Ratios are IEEE divisions of exact integer counts,
    so the SQL oracle agrees bit-for-bit.

    NULL ``text``: every flag — and ``keep`` — is literal FALSE. A
    payload-less document fails the filter rather than "unknown"-ing
    it; the flags feed ``filter()`` and per-rule rejection counts, so
    they must be non-null.
    """
    ws = F.split(F.col("text"), " ")
    n_words = F.size(ws)
    sum_len = F.aggregate(
        F.transform(ws, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    stop_arr = F.array(*[F.lit(s) for s in _QF_STOP])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w)))
    n_uniq = F.size(F.array_distinct(ws))
    present = F.col("text").isNotNull()
    len_ok = F.when(
        present, F.length("text").between(QF_LEN_MIN, QF_LEN_MAX)
    ).otherwise(F.lit(False))
    wlen_ok = F.when(
        present, (sum_len / n_words).between(QF_WLEN_MIN, QF_WLEN_MAX)
    ).otherwise(F.lit(False))
    stop_ok = F.when(present, (n_stop / n_words) >= QF_STOP_MIN).otherwise(
        F.lit(False)
    )
    uniq_ok = F.when(present, (n_uniq / n_words) >= QF_UNIQ_MIN).otherwise(
        F.lit(False)
    )
    return docs.select(
        "doc_id",
        len_ok.alias("len_ok"),
        wlen_ok.alias("wlen_ok"),
        stop_ok.alias("stop_ok"),
        uniq_ok.alias("uniq_ok"),
        (len_ok & wlen_ok & stop_ok & uniq_ok).alias("keep"),
    )


def q_pipe_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_filter(read_table(spark, sf_dir, "documents"))


#: Feature-hashing geometry for the linear quality classifier: the
#: weight table's row count (a fastText-default-sized bucket space,
#: scaled to the synthetic vocabulary) and the hash seeds for the
#: feature map and the stub weight init.
QC_BUCKETS = 512
QC_FEAT_SEED = 71
QC_WEIGHT_SEED = 72
#: Keep rule: mean per-token weight ≥ this (micro-units). 0 keeps the
#: positive-logit half — the fastText binary decision boundary.
QC_KEEP_MEAN_MICROS = 0


def default_quality_weights(spark: SparkSession) -> DataFrame:
    """Deterministic stand-in weight table for
    :func:`quality_classifier` — one row per hash bucket, weight
    uniform in ±1e6 micro-units derived from the bucket id via the
    portable md5 family (the LSH-hyperplane convention: the LEARNED
    values are a seam, the table geometry and join plumbing are the
    real contract). A production pipeline overwrites this frame with
    trained weights (fastText / logistic regression export) — same
    schema, same plan.
    """
    from covid_engineering_spark.operators.dedup import portable_hash64

    return spark.range(QC_BUCKETS).select(
        F.col("id").alias("bucket"),
        (
            F.pmod(
                portable_hash64(
                    F.col("id").cast("string"), QC_WEIGHT_SEED
                ),
                F.lit(2_000_001),
            )
            - F.lit(1_000_000)
        ).cast("long").alias("w_micros"),
    )


def quality_classifier(
    docs: DataFrame,
    weights: DataFrame | None = None,
    keep_mean_micros: int = QC_KEEP_MEAN_MICROS,
) -> DataFrame:
    """Linear text-quality classifier via the hashing trick (the
    fastText / CCNet-style learned gate, Joulin et al. 2017): hash
    each token into ``QC_BUCKETS`` feature buckets, score the
    document as the SUM of its buckets' weights from a broadcast
    model table, and keep when the MEAN per-token weight clears the
    threshold — the learned complement to the rule-based
    ``quality_filter`` (heuristics catch boilerplate; a trained
    linear head catches "reads like the reference corpus").

    ``weights`` is the model: any (bucket, w_micros) frame with one
    row per bucket — in production the exported trained weights,
    here defaulting to :func:`default_quality_weights` (deterministic
    stub values, real geometry). The model JOIN is the point: a
    weight table rides a broadcast hash join onto the exploded token
    stream, so swapping models never changes the plan.

    Exactness: weights are integer micro-units, the document score an
    exact BIGINT sum, and the keep rule the cross-multiplied integer
    inequality ``score ≥ thresh · n_tokens`` — no division, no float,
    so the twin replays bit-for-bit.

    Scale shape: explode → one md5 per token (map-side) → broadcast
    join against the ≤QC_BUCKETS-row model → groupBy(doc_id) with
    partial aggregation (a document's tokens are co-located after
    explode, so the shuffle carries ~one row per document). The join
    back onto the doc spine is on doc_id — same key, reusable
    partitioning.

    NULL ``text``: metric columns NULL, ``keep`` literal FALSE (the
    gate convention).
    """
    from covid_engineering_spark.operators.dedup import portable_hash64

    if weights is None:
        weights = default_quality_weights(docs.sparkSession)
    feats = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select(
        "doc_id",
        F.pmod(
            portable_hash64(F.col("tok"), QC_FEAT_SEED),
            F.lit(QC_BUCKETS),
        ).alias("bucket"),
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("w_micros").alias("score_micros"),
        )
    )
    keep = (
        F.col("score_micros")
        >= F.lit(keep_mean_micros) * F.col("n_tokens")
    )
    return docs.select("doc_id", "source").join(
        scored, "doc_id", "left"
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        "score_micros",
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


def q_pipe_quality_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return quality_classifier(read_table(spark, sf_dir, "documents"))


#: Curriculum geometry: number of difficulty stages and the
#: within-stage shuffle seed.
CURR_STAGES = 4
CURR_SHUFFLE_SEED = 73


def curriculum_order(
    docs: DataFrame, stages: int = CURR_STAGES
) -> DataFrame:
    """Curriculum training order (Bengio et al. 2009 easy→hard
    scheduling, as data pipelines materialize it): bucket the corpus
    into ``stages`` difficulty tiers — difficulty here the document
    LENGTH, the standard no-model proxy; swap in any score column for
    a learned curriculum — then assign every document its global
    serving position: tiers in order, documents WITHIN a tier in
    deterministic hash-shuffled order (a curriculum orders stages,
    not documents — serving a tier sorted by length would correlate
    adjacent batches).

    The writer turns this into the physical layout: sort-write by
    ``global_pos`` (``write_range_sorted``) and the trainer streams
    the curriculum by reading files in order. Both heavy steps are
    the proven scale primitives: ``global_ntile`` for the tier
    (exact NTILE arithmetic, no single-partition sort) and
    ``global_prefix_sum`` for the position (range repartition +
    bounded offsets window) — nothing here funnels the corpus
    through one task.

    Determinism: the tier is exact-NTILE over the total order
    (n_chars, doc_id); the shuffle key is the portable md5 hash of
    doc_id; the position is the prefix count over (stage, shuffle
    key, doc_id). All BIGINT; the twin replays with window NTILE /
    ROW_NUMBER (equality of the distributed and window forms is
    pinned by the global_ntile tests).

    NULL ``n_chars`` sorts FIRST (stage 1 — pinned explicitly: Spark
    asc defaults nulls-first, DuckDB nulls-last, so the twin says
    NULLS FIRST).
    """
    from covid_engineering_spark.operators.dedup import portable_hash64
    from covid_engineering_spark.operators.relational import global_ntile

    staged = global_ntile(
        docs.select("doc_id", "source", "n_chars"),
        [F.col("n_chars").asc_nulls_first(), F.col("doc_id").asc()],
        stages,
        "stage",
    ).withColumn(
        "shuffle_key",
        portable_hash64(
            F.col("doc_id").cast("string"), CURR_SHUFFLE_SEED
        ),
    )
    return global_prefix_sum(
        staged,
        [
            F.col("stage").asc(),
            F.col("shuffle_key").asc(),
            F.col("doc_id").asc(),
        ],
        F.lit(1).cast("long"),
        "global_pos",
    ).select(
        "doc_id", "source", "n_chars", "stage", "shuffle_key",
        "global_pos",
    )


def q_pipe_curriculum_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return curriculum_order(read_table(spark, sf_dir, "documents"))


#: Incremental-batch simulation: the standing corpus is doc_id%5 != 0;
#: the arriving batch is the %5 == 0 docs (genuinely new), plus
#: verbatim re-crawls of corpus docs with %6 == 0 (dup_of_corpus),
#: plus second copies of batch docs with %4 == 0 (dup_in_batch).
INC_RECRAWL_OFFSET = 10**9
INC_SELFDUP_OFFSET = 2 * 10**9


def dedup_incremental(corpus: DataFrame, batch: DataFrame) -> DataFrame:
    """Incremental exact dedup: classify each arriving-batch document
    against the standing corpus WITHOUT re-deduplicating the corpus —
    the shape every production ingest runs daily. A batch doc is
    ``dup_of_corpus`` if its content hash already exists in the
    corpus, else ``dup_in_batch`` if an earlier batch doc (smaller
    doc_id) has the same hash, else ``new``.

    Scale shape: the corpus side collapses to its DISTINCT hash index
    at the scan — the compact structure a real pipeline keeps
    materialized between runs, so the daily cost is
    O(batch + index-probe), never O(corpus re-scan of text). The
    index join and the first-in-batch window both key on
    content_hash, so one exchange layout serves both. The batch is
    small by definition; nothing corpus-sized is broadcast.
    """
    h = F.md5(F.lower(F.col("text")))
    idx = (
        corpus.select(h.alias("content_hash"))
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    from pyspark.sql import Window

    b = batch.select("doc_id", h.alias("content_hash"))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    b = b.withColumn("rn", F.row_number().over(w))
    status = (
        F.when(F.col("in_corpus").isNotNull(), "dup_of_corpus")
        .when(F.col("rn") > 1, "dup_in_batch")
        .otherwise("new")
    )
    return b.join(idx, "content_hash", "left").select(
        "doc_id", "content_hash", status.alias("status")
    )


def q_pipe_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    fresh = docs.filter(F.col("doc_id") % 5 == 0)
    recrawl = corpus.filter(F.col("doc_id") % 6 == 0).withColumn(
        "doc_id", F.col("doc_id") + INC_RECRAWL_OFFSET
    )
    selfdup = fresh.filter(F.col("doc_id") % 4 == 0).withColumn(
        "doc_id", F.col("doc_id") + INC_SELFDUP_OFFSET
    )
    batch = fresh.unionByName(recrawl).unionByName(selfdup)
    return dedup_incremental(corpus, batch)


def near_dup_incremental(
    corpus: DataFrame,
    batch: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_df: int | None = NGRAM_MAX_DF,
) -> DataFrame:
    """Incremental NEAR-dup detection: exact word-3-gram Jaccard of
    each arriving-batch document against the standing corpus — the
    sibling of ``dedup_incremental`` for rewrites that exact hashing
    cannot catch, and the daily form of ``ngram_jaccard_pairs`` (which
    re-pairs the whole corpus against itself).

    Scale shape: the join is batch-side × corpus-side shingles on the
    shingle key — NEVER corpus × corpus. With the stop-shingle guard
    (document frequency over corpus ∪ batch ≤ ``max_df``) each kept
    shingle contributes at most df_batch · df_corpus ≤ max_df² pair
    rows, so the candidate set is bounded by |batch shingles| · max_df
    — linear in the BATCH, which is the whole point of incremental
    operation. A production pipeline keeps the corpus shingle-df index
    materialized between runs (the same index this op derives
    in-query), making the daily cost independent of corpus re-scans.
    """
    from covid_engineering_spark.functions import evicting_cache

    # Both shingle frames feed three plan branches each (the df
    # guard, the cross join, the per-doc sizes) — cache them or
    # Catalyst clones the scan+tokenize subtree per branch.
    shc = evicting_cache(shingles_of(corpus), "inc_near_shingles_corpus")
    shb = evicting_cache(shingles_of(batch), "inc_near_shingles_batch")
    if max_df is not None:
        df_ = (
            shc.unionByName(shb)
            .groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("s")
        )
        shc = shc.join(df_, "s")
        shb = shb.join(df_, "s")
    nc = shc.groupBy("doc_id").agg(F.count("*").alias("n"))
    nb = shb.groupBy("doc_id").agg(F.count("*").alias("n"))
    common = (
        shb.alias("b")
        .join(shc.alias("c"), F.col("b.s") == F.col("c.s"))
        .groupBy(
            F.col("b.doc_id").alias("d_batch"),
            F.col("c.doc_id").alias("d_corpus"),
        )
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(
            nb.select(F.col("doc_id").alias("d_batch"), F.col("n").alias("na")),
            "d_batch",
        )
        .join(
            nc.select(
                F.col("doc_id").alias("d_corpus"), F.col("n").alias("nb")
            ),
            "d_corpus",
        )
        .select("d_batch", "d_corpus", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def q_pipe_near_dup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return near_dup_incremental(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
    )


def build_near_dup_index(
    corpus: DataFrame,
    portable: bool = False,
    cap: int | None = None,
) -> dict[str, DataFrame]:
    """The STANDING side of ``near_dup_incremental_lsh``, built once
    per corpus refresh instead of once per batch. Three frames:

    * ``bands`` — (doc_id, band, bh) capped band-bucket membership:
      the probe target. The cap (deterministic doc_id rank inside
      each (band, bh) bucket) is applied HERE, at build time — the
      row_number window over the (band, bh) shuffle is the one
      corpus-sized stage of the whole incremental path, and baking it
      into the index is what makes the per-batch job O(batch + probe)
      (PROBE_r10_x1000 measured the in-query form's exponent rising
      to 0.792 as the corpus dwarfed the batch: that was exactly this
      re-rank being recomputed per refresh).
    * ``shingles`` — (doc_id, s) distinct word-3-grams: the exact-
      Jaccard verification side.
    * ``sizes`` — (doc_id, n) per-doc shingle counts: the union-size
      term of the Jaccard denominator.

    Pass the dict to ``near_dup_incremental_lsh(index=...)``, or
    persist it with ``write_near_dup_index`` and reload with
    ``read_near_dup_index`` between pipeline runs.
    """
    from pyspark.sql import Window

    from covid_engineering_spark.operators.dedup import (
        MINHASH_K,
        SKETCH_BUCKET_CAP,
        _band_frame,
        _minhash_signatures,
        shingles_of,
    )

    cap = SKETCH_BUCKET_CAP if cap is None else cap
    shc = shingles_of(corpus)
    bands = _band_frame(
        _minhash_signatures(shc, MINHASH_K, portable=portable), portable
    )
    wr = Window.partitionBy("band", "bh").orderBy("doc_id")
    bands = (
        bands.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    sizes = shc.groupBy("doc_id").agg(F.count("*").alias("n"))
    return {"bands": bands, "shingles": shc, "sizes": sizes}


def write_near_dup_index(
    corpus: DataFrame,
    path: str,
    portable: bool = False,
    cap: int | None = None,
    n_files: int = 32,
) -> None:
    """Materialize the standing near-dup index under ``path`` (three
    parquet datasets). Layout is chosen for the probe's access paths:

    * ``bands`` range-clustered on (band, bh) — every file owns a
      disjoint (band, bh) interval, so the per-batch probe join's
      corpus side arrives pre-clustered on the join key (file-level
      min/max skipping for selective probes; no corpus-side re-sort);
    * ``shingles`` range-clustered on doc_id — the exact-verify join
      fetches candidate docs by id, and disjoint id ranges per file
      give footer-stat skipping when a batch's candidates are few;
    * ``sizes`` is ≤1 row per doc — plain parquet.

    ``n_files`` is a layout decision like ``write_bucketed``'s bucket
    count: pick it for the target cluster's parallelism.
    """
    idx = build_near_dup_index(corpus, portable=portable, cap=cap)
    (
        idx["bands"]
        .repartitionByRange(n_files, "band", "bh")
        .sortWithinPartitions("band", "bh")
        .write.mode("overwrite")
        .parquet(f"{path}/bands")
    )
    (
        idx["shingles"]
        .repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id", "s")
        .write.mode("overwrite")
        .parquet(f"{path}/shingles")
    )
    idx["sizes"].write.mode("overwrite").parquet(f"{path}/sizes")


def read_near_dup_index(
    spark: SparkSession, path: str
) -> dict[str, DataFrame]:
    """Reload a ``write_near_dup_index`` layout for probing."""
    return {
        "bands": spark.read.parquet(f"{path}/bands"),
        "shingles": spark.read.parquet(f"{path}/shingles"),
        "sizes": spark.read.parquet(f"{path}/sizes"),
    }


#: Literal-IN pushdown ceiling for :func:`probe_near_dup_index`: past
#: this many collected keys the filter list itself becomes the cost
#: and the plain probe join is the right plan.
PROBE_PUSHDOWN_MAX_KEYS = 200_000


def probe_near_dup_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    portable: bool = False,
    max_keys: int = PROBE_PUSHDOWN_MAX_KEYS,
) -> DataFrame:
    """Batch probe of a persisted ``write_near_dup_index`` layout
    with SCAN PRUNING — the missing half of the standing-index story
    PROBE_r11_x1000 measured: the prebuilt index drops the per-batch
    exponent from 0.792 to 0.659, but the residual growth is the
    index SCAN itself (the probe is a JOIN, which parquet cannot
    prune against). Here the batch's bucket keys and then its
    candidate doc ids — both bounded by the BATCH, the defining
    small side of the incremental regime — are collected and pushed
    into the scans as literal ``In`` filters, so the range-clustered
    layout's row-group min/max stats skip everything a selective
    batch never touches (manual dynamic partition pruning, the same
    move DPP makes automatically on partition columns):

    1. batch band keys (≤ |batch|·MINHASH_BANDS values) → ``In``
       filter on the ``bands`` scan, which ``write_near_dup_index``
       range-clustered on (band, bh);
    2. the probe's candidate corpus ids (≤ |batch|·BANDS·cap values)
       → ``In`` filter on the ``shingles`` and ``sizes`` scans,
       clustered on doc_id.

    Measured pushdown (Spark 4, asserted in tests): ``In(doc_id, …)``
    and ``In(band, …)`` reach parquet ``PushedFilters`` (row-group
    stat skipping on the clustered layouts); the string ``bh`` set
    stays a scan-operator ``INSET`` DataFilter — rows still drop at
    the scan, before any join or shuffle, just without IO skipping
    on that column.

    Two bounded driver-side collects per batch — the explicit
    trade: each is O(batch), never O(corpus), and each buys
    row-group skipping on a corpus-sized scan. ``max_keys`` guards
    the regime boundary: a batch so large its key list stops being
    "small" falls back to the plain standing-index probe
    (``near_dup_incremental_lsh(index=...)``), same output.

    Output is IDENTICAL to the unpruned probe (pinned in tests):
    filtering the index to the batch's own keys removes only rows
    the joins drop anyway.
    """
    from covid_engineering_spark.functions import evicting_cache
    from covid_engineering_spark.operators.dedup import (
        MINHASH_K,
        _band_frame,
        _minhash_signatures,
    )

    idx = read_near_dup_index(spark, path)
    shb = evicting_cache(shingles_of(batch), "probe_push_sh_batch")
    bands_b = evicting_cache(
        _band_frame(
            _minhash_signatures(shb, MINHASH_K, portable=portable),
            portable,
        ),
        "probe_push_bands_batch",
    )
    keys = bands_b.select("band", "bh").distinct().limit(max_keys + 1)
    key_rows = keys.collect()
    if len(key_rows) > max_keys:
        return near_dup_incremental_lsh(
            None, batch, threshold=threshold, portable=portable, index=idx
        )
    bands_pruned = idx["bands"].filter(
        F.col("band").isin([r["band"] for r in key_rows])
        & F.col("bh").isin([r["bh"] for r in key_rows])
    )
    cand_ids = [
        r["d_corpus"]
        for r in bands_b.alias("b")
        .join(bands_pruned.alias("c"), ["band", "bh"])
        .select(F.col("c.doc_id").alias("d_corpus"))
        .distinct()
        .limit(max_keys + 1)
        .collect()
    ]
    if len(cand_ids) > max_keys:
        return near_dup_incremental_lsh(
            None, batch, threshold=threshold, portable=portable, index=idx
        )
    pruned = {
        "bands": bands_pruned,
        "shingles": idx["shingles"].filter(F.col("doc_id").isin(cand_ids)),
        "sizes": idx["sizes"].filter(F.col("doc_id").isin(cand_ids)),
    }
    return near_dup_incremental_lsh(
        None, batch, threshold=threshold, portable=portable, index=pruned
    )


def near_dup_incremental_lsh(
    corpus: DataFrame | None,
    batch: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    portable: bool = False,
    cap: int | None = None,
    index: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Incremental near-dup detection through the STANDING MinHash/LSH
    index — the scale path for ``near_dup_incremental``. The exact
    form's candidate set is |batch shingles| · max_df (every kept
    shingle of every batch doc probes every corpus doc sharing it —
    its 10x probe exponent 0.529 is that product growing on both
    sides); here each batch doc probes ``MINHASH_BANDS`` band buckets
    and meets at most ``cap`` corpus members per bucket, so candidates
    are ≤ |batch| · BANDS · cap — O(batch) with a CONSTANT per-doc
    bound, independent of how common the doc's shingles are.

    Plan shape:

    * corpus index: shingles → k min-hash aggregates → band buckets —
      in production this frame IS the standing index a pipeline
      materializes between runs (``_band_frame``'s output, one row per
      (doc, band)); derived in-query here exactly like the exact
      form derives its df index;
    * corpus bucket membership capped at ``cap`` by deterministic
      doc_id rank — the row_number window rides the same (band, bh)
      shuffle the probe join needs; past the cap a bucket is a
      boilerplate mega-cluster where the first ``cap`` members
      already witness the duplication (the ``SKETCH_BUCKET_CAP``
      recall trade, bipartite flavor);
    * probe: batch bands ⋈ capped corpus bands on (band, bh) —
      batch-side × corpus-side only, NEVER corpus × corpus;
    * exact-Jaccard verification restricted to candidates, over the
      UNGUARDED shingle sets (the sketch path carries no stop-shingle
      filter, matching ``minhash_lsh_pairs``) — so a verified pair's
      ``jaccard`` is the true document similarity, not the guarded
      variant the exact form reports.

    ``portable=True`` (the registered form) uses the md5-derived hash
    family end to end, so the generated DuckDB twin replays
    signatures, buckets, the capped probe, and verification — the
    driver hash-checks the whole incremental sketch path. Recall vs
    the exact form is measured in tests (same discipline as
    ``minhash_lsh_pairs`` vs ``ngram_jaccard_pairs``).

    ``index``: a ``build_near_dup_index`` / ``read_near_dup_index``
    dict. When given, ``corpus`` may be None and NO corpus-side
    derivation runs in this job — the batch probes the standing
    capped buckets and verifies against the standing shingle frames,
    so per-batch cost is O(batch + probe) regardless of corpus size.
    This is the production shape: the in-query derivation below
    re-shingles, re-hashes, and re-caps the full corpus on every
    batch, which PROBE_r10_x1000 measured growing toward the corpus
    scan (exponent 0.792) once the corpus dwarfs the batch. Tests pin
    both paths to identical output on the same corpus.
    """
    from pyspark.sql import Window

    from covid_engineering_spark.functions import evicting_cache
    from covid_engineering_spark.operators.dedup import (
        MINHASH_K,
        SKETCH_BUCKET_CAP,
        _band_frame,
        _minhash_signatures,
    )

    cap = SKETCH_BUCKET_CAP if cap is None else cap
    if index is not None:
        shc = index["shingles"]
        bc = index["bands"]
        nc_sizes = index["sizes"]
    else:
        if corpus is None:
            raise ValueError(
                "near_dup_incremental_lsh needs a corpus or an index"
            )
        # two consumers each (band build + verification sizes/join)
        shc = evicting_cache(shingles_of(corpus), "inc_lsh_sh_corpus")
        # Signature frame cached (r12): it feeds the band/bucket build
        # AND the verification's size lookup (per-doc shingle counts
        # ride the signature groupBy as ``_n_sh`` instead of a second
        # full aggregation pass over the shingle frame); one
        # constant-width row per doc at any corpus size.
        sig_c = evicting_cache(
            _minhash_signatures(shc, MINHASH_K, portable=portable),
            "inc_lsh_sig_corpus",
        )
        bands_c = _band_frame(sig_c, portable)
        wr = Window.partitionBy("band", "bh").orderBy("doc_id")
        bc = (
            bands_c.withColumn("_rn", F.row_number().over(wr))
            .filter(F.col("_rn") <= cap)
            .drop("_rn")
        )
        nc_sizes = sig_c.select("doc_id", F.col("_n_sh").alias("n"))
    shb = evicting_cache(shingles_of(batch), "inc_lsh_sh_batch")
    sig_b = evicting_cache(
        _minhash_signatures(shb, MINHASH_K, portable=portable),
        "inc_lsh_sig_batch",
    )
    bands_b = _band_frame(sig_b, portable)
    cand = (
        bands_b.alias("b")
        .join(bc.alias("c"), ["band", "bh"])
        .select(
            F.col("b.doc_id").alias("d_batch"),
            F.col("c.doc_id").alias("d_corpus"),
        )
        .distinct()
    )
    nb = sig_b.select("doc_id", F.col("_n_sh").alias("n"))
    nc = nc_sizes
    common = (
        cand.join(shb.alias("sb"), F.col("sb.doc_id") == F.col("d_batch"))
        .join(
            shc.alias("sc"),
            (F.col("sc.doc_id") == F.col("d_corpus"))
            & (F.col("sb.s") == F.col("sc.s")),
        )
        .groupBy("d_batch", "d_corpus")
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(
            nb.select(F.col("doc_id").alias("d_batch"), F.col("n").alias("na")),
            "d_batch",
        )
        .join(
            nc.select(
                F.col("doc_id").alias("d_corpus"), F.col("n").alias("nb")
            ),
            "d_corpus",
        )
        .select("d_batch", "d_corpus", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def q_pipe_near_dup_incremental_lsh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents", fan=True)
    return near_dup_incremental_lsh(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
        portable=True,
    )


def dataset_card(docs: DataFrame) -> DataFrame:
    """Dataset-card profiling rollup: corpus composition at three
    grains in ONE pass — (source, lang), per-source subtotal, and the
    corpus total — each cell carrying doc count, token count, char
    count, and mean document length. The summary table a dataset
    release ships ("dataset card"), and the first query run against
    any new corpus drop.

    Scale shape: one ROLLUP — Spark plans a single Expand (3 rows per
    input group emitted map-side AFTER partial aggregation) feeding
    one shuffle keyed on (source, lang, grouping_id); cardinality is
    3 × |source×lang|, independent of corpus size. Token counts come
    from ``size(split())`` inline — no explode, the scan is the only
    corpus-sized stage. ``grp_level`` (0 = leaf, 1 = per-source,
    3 = grand total) disambiguates rolled-up nulls from a literal
    null group, the standard grouping_id contract.

    NULL ``text``: counted in ``n_docs`` (it IS a corpus row the card
    must disclose) but contributes nothing to the token sums —
    NULL-on-NULL ``array_size`` + NULL-skipping SUM, identical in both
    engines; ``avg_tokens`` therefore averages over ALL docs in the
    cell, payload-less included.
    """
    return (
        docs.rollup("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.array_size(F.split("text", " ")).cast("long")).alias(
                "n_tokens"
            ),
            F.sum(F.col("n_chars").cast("long")).alias("n_chars"),
            F.round(
                F.sum(F.array_size(F.split("text", " ")).cast("long"))
                / F.count("*"),
                6,
            ).alias("avg_tokens"),
            F.grouping_id().alias("grp_level"),
        )
    )


def q_pipe_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dataset_card(read_table(spark, sf_dir, "documents"))


def _near_dup_lsh_sql() -> str:
    """Generated DuckDB twin of ``q_pipe_near_dup_incremental_lsh``
    (portable family): md5-derived signatures and band buckets built
    PER SIDE (corpus index vs arriving batch), the corpus bucket
    membership capped by doc_id rank, the bipartite probe join, and
    exact-Jaccard verification over the unguarded shingle sets — the
    driver hash-checks the whole incremental sketch path. Same
    double-hashing scheme as ``_minhash_signatures``."""
    from covid_engineering_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_K,
        SKETCH_BUCKET_CAP,
    )

    rows_per_band = MINHASH_K // MINHASH_BANDS
    sig_cols = ", ".join(
        f"MIN(h1 + {i}*h2) AS m{i}" for i in range(MINHASH_K)
    )

    def band_selects(src: str) -> str:
        return "\n            UNION ALL ".join(
            "SELECT doc_id, {b} AS band, md5({concat} || ',{b}') AS bh "
            "FROM {src}".format(
                b=b,
                src=src,
                concat=" || ',' || ".join(
                    f"m{rows_per_band * b + j}::VARCHAR"
                    for j in range(rows_per_band)
                ),
            )
            for b in range(MINHASH_BANDS)
        )

    def side(name: str, pred: str) -> str:
        return f"""
        sh_{name} AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(generate_series(1, len(w) - 2),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
            FROM wsx WHERE {pred}
        ),
        h_{name} AS (
            SELECT doc_id,
                   ('0x' || substr(md5(s), 1, 14))::BIGINT AS h1,
                   ('0x' || substr(md5(s), 15, 14))::BIGINT AS h2
            FROM sh_{name}
        ),
        sig_{name} AS (
            SELECT doc_id, {sig_cols} FROM h_{name} GROUP BY doc_id
        ),
        bands_{name} AS (
            {band_selects(f"sig_{name}")}
        )"""

    return f"""
        WITH
        wsx AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
        {side("c", "doc_id % 5 != 0")},
        {side("b", "doc_id % 5 = 0")},
        bcx AS (
            SELECT doc_id, band, bh,
                   ROW_NUMBER() OVER (PARTITION BY band, bh
                                      ORDER BY doc_id) AS rn
            FROM bands_c
        ),
        bc AS (SELECT doc_id, band, bh FROM bcx
               WHERE rn <= {SKETCH_BUCKET_CAP}),
        cand AS (
            SELECT DISTINCT b.doc_id AS d_batch, c.doc_id AS d_corpus
            FROM bands_b b JOIN bc c
              ON b.band = c.band AND b.bh = c.bh
        ),
        nb AS (SELECT doc_id, COUNT(*) AS n FROM sh_b GROUP BY doc_id),
        nc AS (SELECT doc_id, COUNT(*) AS n FROM sh_c GROUP BY doc_id),
        common AS (
            SELECT cand.d_batch, cand.d_corpus, COUNT(*) AS c
            FROM cand
            JOIN sh_b sb ON sb.doc_id = cand.d_batch
            JOIN sh_c sc ON sc.doc_id = cand.d_corpus AND sc.s = sb.s
            GROUP BY 1, 2
        )
        SELECT d_batch, d_corpus,
               ROUND(c / (nb.n + nc.n - c), 6) AS jaccard
        FROM common
        JOIN nb ON nb.doc_id = d_batch
        JOIN nc ON nc.doc_id = d_corpus
        WHERE ROUND(c / (nb.n + nc.n - c), 6) >= {JACCARD_THRESHOLD}
    """


QUERIES = {
    "pipe_split_hash": q_pipe_split_hash,
    "pipe_quota_source": q_pipe_quota_source,
    "pipe_decontaminate": q_pipe_decontaminate,
    "pipe_contamination_report": q_pipe_contamination_report,
    "pipe_bloom_decontaminate": q_pipe_bloom_decontaminate,
    "pipe_tokenizer_fertility": q_pipe_tokenizer_fertility,
    "pipe_pack_chunks": q_pipe_pack_chunks,
    "pipe_mixture_sample": q_pipe_mixture_sample,
    "dedup_clusters": q_dedup_clusters,
    "pipe_keep_best": q_pipe_keep_best,
    "pipe_length_hist": q_pipe_length_hist,
    "pipe_cdc_upsert": q_pipe_cdc_upsert,
    "pipe_scd2_history": q_pipe_scd2_history,
    "pipe_pii_scrub": q_pipe_pii_scrub,
    "pipe_dup_rate": q_pipe_dup_rate,
    "pipe_source_gate": q_pipe_source_gate,
    "pipe_blocklist_filter": q_pipe_blocklist_filter,
    "pipe_k_anonymity": q_pipe_k_anonymity,
    "pipe_weighted_sample": q_pipe_weighted_sample,
    "pipe_dsir_select": q_pipe_dsir_select,
    "pipe_dsir_gumbel": q_pipe_dsir_gumbel,
    "pipe_stratified_sample": q_pipe_stratified_sample,
    "pipe_curate_corpus": q_pipe_curate_corpus,
    "pipe_snapshot_diff": q_pipe_snapshot_diff,
    "pipe_quality_filter": q_pipe_quality_filter,
    "pipe_quality_classifier": q_pipe_quality_classifier,
    "pipe_curriculum_order": q_pipe_curriculum_order,
    "pipe_dedup_incremental": q_pipe_dedup_incremental,
    "pipe_near_dup_incremental": q_pipe_near_dup_incremental,
    "pipe_near_dup_incremental_lsh": q_pipe_near_dup_incremental_lsh,
    "pipe_mixture_plan": q_pipe_mixture_plan,
    "pipe_dataset_card": q_pipe_dataset_card,
}

# 4-gram shingle CTE shared by the decontamination oracle.
_SH4_SQL = f"""
    ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(w) - {DECON_NGRAM - 1}),
                      i -> array_to_string(w[i:i+{DECON_NGRAM - 1}], ' '))) AS s
        FROM ws WHERE len(w) >= {DECON_NGRAM}
    )
"""

# The cluster oracle recomputes the guarded 3-gram pair set (same CTE
# stack as the dedup_ngram_jaccard oracle) and closes it transitively
# with a recursive CTE — min reachable id == the engine's propagated
# label. The CTE stack is shared with the keep_best oracle.
_CLUSTER_CTES = """
WITH RECURSIVE
    ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh_all AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 2),
                                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM ws
    ),
    keep AS (
        SELECT s FROM (SELECT s, COUNT(*) AS df FROM sh_all GROUP BY s)
        WHERE df <= {max_df}
    ),
    sh AS (SELECT sh_all.doc_id, sh_all.s FROM sh_all JOIN keep USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT d1, d2 FROM common
        JOIN sizes na ON na.doc_id = d1
        JOIN sizes nb ON nb.doc_id = d2
        WHERE ROUND(c / (na.n + nb.n - c), 6) >= {threshold}
    ),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    closure AS (SELECT * FROM reach UNION SELECT DISTINCT a, a FROM edges),
    labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM closure GROUP BY a)
"""

_CLUSTERS_SQL = _CLUSTER_CTES + "SELECT doc_id, cluster_id FROM labels"

_KEEP_BEST_SQL = _CLUSTER_CTES + """,
    lab AS (
        SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
               {quality} AS quality_score
        FROM documents d LEFT JOIN labels l USING (doc_id)
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY quality_score DESC, doc_id) AS rk,
               COUNT(*) OVER (PARTITION BY cluster_id) AS n_docs
        FROM lab
    )
SELECT cluster_id, doc_id AS kept_doc_id, n_docs, quality_score
FROM ranked WHERE rk = 1
"""

# The curation oracle replays the same five stages over the survivor
# set: normalization as an expression CTE, canonical-copy selection,
# the guarded 3-gram pair CTE stack on the NORMALIZED text, the
# recursive-CTE transitive closure, ranked retention, and the md5
# split. Shares its shingle/closure shape with _CLUSTER_CTES but runs
# over ``surv.ntext`` rather than raw ``documents.text``.
_CURATE_SQL = """
WITH RECURSIVE
    nd AS (
        SELECT doc_id, text AS raw,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                   AS ntext
        FROM documents
    ),
    canon AS (SELECT MIN(doc_id) AS doc_id FROM nd GROUP BY md5(ntext)),
    surv AS (SELECT nd.* FROM nd JOIN canon USING (doc_id)),
    ws AS (SELECT doc_id, string_split(ntext, ' ') AS w FROM surv),
    sh_all AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 2),
                                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM ws
    ),
    keep AS (
        SELECT s FROM (SELECT s, COUNT(*) AS df FROM sh_all GROUP BY s)
        WHERE df <= {max_df}
    ),
    sh AS (SELECT sh_all.doc_id, sh_all.s FROM sh_all JOIN keep USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT d1, d2 FROM common
        JOIN sizes na ON na.doc_id = d1
        JOIN sizes nb ON nb.doc_id = d2
        WHERE ROUND(c / (na.n + nb.n - c), 6) >= {threshold}
    ),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    closure AS (SELECT * FROM reach UNION SELECT DISTINCT a, a FROM edges),
    labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM closure GROUP BY a),
    lab AS (
        SELECT s.doc_id, COALESCE(l.cluster_id, s.doc_id) AS cluster_id,
               {quality} AS quality_score
        FROM surv s LEFT JOIN labels l USING (doc_id)
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY quality_score DESC, doc_id) AS rk,
               COUNT(*) OVER (PARTITION BY cluster_id) AS n_docs
        FROM lab
    )
SELECT doc_id, cluster_id, n_docs, quality_score,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{train}'
            THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{val}'
            THEN 'val'
            ELSE 'test' END AS split
FROM ranked WHERE rk = 1
"""

# DSIR importance-weight CTE chain (through ``w``): defined ONCE so
# the registered pipe_dsir_select oracle and the Gumbel-top-k twin
# (:func:`dsir_gumbel_sql`) derive their scores from the same weights.
_DSIR_W_CTES = f"""toks AS (
            SELECT doc_id, source,
                   lang IS NOT DISTINCT FROM 'en' AS is_t,
                   ('0x' || substr(md5(tok || ':{DSIR_HASH_SEED}'),
                        1, 15))::BIGINT % {DSIR_BUCKETS} AS feat
            FROM (
                SELECT doc_id, source, lang,
                       unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
        ),
        fs AS (
            SELECT feat,
                   CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END)
                        AS BIGINT) AS ct,
                   CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END)
                        AS BIGINT) AS cr
            FROM toks GROUP BY feat
        ),
        tot AS (
            SELECT CAST(SUM(ct) AS BIGINT) AS nt,
                   CAST(SUM(cr) AS BIGINT) AS nr
            FROM fs
        ),
        lr AS (
            SELECT feat,
                   CAST(FLOOR(ROUND(ln(
                       ((ct + 1.0) / (nt + {DSIR_BUCKETS}.0))
                       / ((cr + 1.0) / (nr + {DSIR_BUCKETS}.0))
                   ), 8) * 1000000.0 + 0.5) AS BIGINT) AS lr_micros
            FROM fs, tot
        ),
        docfeat AS (
            SELECT doc_id, source, feat, COUNT(*) AS c
            FROM toks WHERE NOT is_t GROUP BY 1, 2, 3
        ),
        w AS (
            SELECT doc_id, source,
                   CAST(SUM(c) AS BIGINT) AS n_feat_tokens,
                   CAST(SUM(c * lr_micros) AS BIGINT) AS dsir_micros
            FROM docfeat JOIN lr USING (feat) GROUP BY 1, 2
        )"""


def dsir_gumbel_sql(k: int = DSIR_K, seed: int = 7) -> str:
    """DuckDB twin of :func:`dsir_gumbel_topk_exact` — the paper's
    Gumbel-top-k resampling rule in the same integer micro-unit
    discipline as every other twinned score here (hash-derived u,
    8dp-rounded ln's, FLOOR micro snap, BIGINT addition), over the
    SAME weights CTE chain as the registered ``pipe_dsir_select``
    oracle. Hash-stable end to end; verified against the engine in
    tests/test_round9_ops.py.
    """
    from covid_engineering_spark.operators.dedup import _portable_hash_sql

    h = _portable_hash_sql("CAST(doc_id AS VARCHAR)", seed)
    return f"""
        WITH {_DSIR_W_CTES},
        g AS (
            SELECT doc_id, source, n_feat_tokens, dsir_micros,
                   CAST(FLOOR(-ROUND(ln(GREATEST(
                       -ROUND(ln((({h}) + 1.0)
                                  / 1152921504606846976.0), 8),
                       1e-8)), 8) * 1000000.0 + 0.5) AS BIGINT)
                       AS gumbel_micros
            FROM w
        ),
        s AS (
            SELECT *, dsir_micros + gumbel_micros AS score_micros FROM g
        ),
        topk AS (
            SELECT doc_id FROM s
            ORDER BY score_micros DESC, doc_id LIMIT {k}
        )
        SELECT doc_id, source, n_feat_tokens, dsir_micros, gumbel_micros,
               score_micros,
               doc_id IN (SELECT doc_id FROM topk) AS selected
        FROM s
    """


ORACLES = {
    "pipe_dataset_card": """
        SELECT source, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               ROUND(CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                     / COUNT(*), 6) AS avg_tokens,
               CAST(GROUPING(source, lang) AS BIGINT) AS grp_level
        FROM documents
        GROUP BY ROLLUP (source, lang)
    """,
    "pipe_mixture_plan": f"""
        WITH per_src AS (
            SELECT source,
                   COALESCE(TRY_CAST(regexp_extract(source, 'src(\\d+)', 1)
                                     AS INT), 3) % 4 AS cls,
                   COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY 1, 2
        ),
        win AS (
            SELECT source, n_docs, n_tokens, cls,
                   SUM(n_tokens) OVER () AS total,
                   COUNT(*) OVER (PARTITION BY cls) AS n_in_cls
            FROM per_src
        )
        SELECT source, n_docs, n_tokens, cls,
               ROUND(n_tokens / total, 6) AS token_share,
               ROUND(([{", ".join(str(t) for t in MIX_TARGETS)}])[cls + 1]
                     / n_in_cls, 6) AS target_share,
               ROUND(LEAST(1.0,
                     ([{", ".join(str(t) for t in MIX_TARGETS)}])[cls + 1]
                     / n_in_cls * total / n_tokens), 6) AS sampling_rate
        FROM win
    """,
    "pipe_near_dup_incremental": f"""
        WITH {_SHINGLES_SQL},
        common AS (
            SELECT b.doc_id AS d_batch, c.doc_id AS d_corpus, COUNT(*) AS c
            FROM sh b JOIN sh c
              ON b.s = c.s AND b.doc_id % 5 = 0 AND c.doc_id % 5 != 0
            GROUP BY 1, 2
        )
        SELECT d_batch, d_corpus,
               ROUND(c / (na.n + nb.n - c), 6) AS jaccard
        FROM common
        JOIN sizes na ON na.doc_id = d_batch
        JOIN sizes nb ON nb.doc_id = d_corpus
        WHERE ROUND(c / (na.n + nb.n - c), 6) >= {JACCARD_THRESHOLD}
    """,
    "pipe_near_dup_incremental_lsh": _near_dup_lsh_sql(),
    "pipe_dedup_incremental": f"""
        WITH corpus AS (
            SELECT doc_id, md5(lower(text)) AS content_hash
            FROM documents WHERE doc_id % 5 != 0
        ),
        idx AS (SELECT DISTINCT content_hash FROM corpus),
        batch AS (
            SELECT doc_id, md5(lower(text)) AS content_hash
            FROM documents WHERE doc_id % 5 = 0
            UNION ALL
            SELECT doc_id + {INC_RECRAWL_OFFSET}, md5(lower(text))
            FROM documents WHERE doc_id % 5 != 0 AND doc_id % 6 = 0
            UNION ALL
            SELECT doc_id + {INC_SELFDUP_OFFSET}, md5(lower(text))
            FROM documents WHERE doc_id % 5 = 0 AND doc_id % 4 = 0
        ),
        b AS (
            SELECT doc_id, content_hash,
                   ROW_NUMBER() OVER (PARTITION BY content_hash
                                      ORDER BY doc_id) AS rn
            FROM batch
        )
        SELECT b.doc_id, b.content_hash,
               CASE WHEN idx.content_hash IS NOT NULL THEN 'dup_of_corpus'
                    WHEN rn > 1 THEN 'dup_in_batch'
                    ELSE 'new' END AS status
        FROM b LEFT JOIN idx USING (content_hash)
    """,
    "pipe_snapshot_diff": """
        WITH old AS (
            SELECT doc_id, md5(text) AS old_hash FROM documents
            WHERE doc_id % 10 != 9
        ),
        new AS (
            SELECT doc_id,
                   md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                            ELSE text END) AS new_hash
            FROM documents WHERE doc_id % 10 != 0
        )
        SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
               old_hash, new_hash,
               CASE WHEN new_hash IS NULL THEN 'removed'
                    WHEN old_hash IS NULL THEN 'added'
                    WHEN old_hash != new_hash THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
    "pipe_quality_classifier": f"""
        WITH weights AS (
            SELECT range AS bucket,
                   CAST({_portable_hash_sql("CAST(range AS VARCHAR)", QC_WEIGHT_SEED)}
                        % 2000001 - 1000000 AS BIGINT) AS w_micros
            FROM range({QC_BUCKETS})
        ),
        feat AS (
            SELECT doc_id,
                   {_portable_hash_sql("tok", QC_FEAT_SEED)}
                       % {QC_BUCKETS} AS bucket
            FROM (SELECT doc_id,
                         unnest(string_split(text, ' ')) AS tok
                  FROM documents)
        ),
        scored AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(w.w_micros) AS BIGINT) AS score_micros
            FROM feat JOIN weights w USING (bucket)
            GROUP BY doc_id
        )
        SELECT d.doc_id, d.source, s.n_tokens, s.score_micros,
               COALESCE(s.score_micros
                        >= {QC_KEEP_MEAN_MICROS} * s.n_tokens,
                        FALSE) AS keep
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
    "pipe_curriculum_order": f"""
        WITH staged AS (
            SELECT doc_id, source, n_chars,
                   CAST(NTILE({CURR_STAGES}) OVER (
                       ORDER BY n_chars NULLS FIRST, doc_id
                   ) AS BIGINT) AS stage,
                   {_portable_hash_sql("CAST(doc_id AS VARCHAR)", CURR_SHUFFLE_SEED)}
                       AS shuffle_key
            FROM documents
        )
        SELECT doc_id, source, n_chars, stage, shuffle_key,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY stage, shuffle_key, doc_id
               ) AS BIGINT) AS global_pos
        FROM staged
    """,
    "pipe_quality_filter": """
        WITH base AS (
            SELECT doc_id,
                   length(text) AS n_chars_m,
                   string_split(text, ' ') AS ws
            FROM documents
        ),
        feat AS (
            SELECT doc_id, n_chars_m,
                   len(ws) AS n_words,
                   list_sum(list_transform(ws, x -> length(x))) AS sum_len,
                   len(list_filter(
                       ws,
                       x -> x IN ('the','a','of','and','to','in','is')
                   )) AS n_stop,
                   len(list_distinct(ws)) AS n_uniq
            FROM base
        )
        SELECT doc_id,
               COALESCE(n_chars_m BETWEEN 100 AND 500, FALSE) AS len_ok,
               COALESCE(sum_len / n_words BETWEEN 4.0 AND 5.0, FALSE)
                   AS wlen_ok,
               COALESCE(n_stop / n_words >= 0.03, FALSE) AS stop_ok,
               COALESCE(n_uniq / n_words >= 0.35, FALSE) AS uniq_ok,
               (COALESCE(n_chars_m BETWEEN 100 AND 500, FALSE)
                AND COALESCE(sum_len / n_words BETWEEN 4.0 AND 5.0, FALSE)
                AND COALESCE(n_stop / n_words >= 0.03, FALSE)
                AND COALESCE(n_uniq / n_words >= 0.35, FALSE)) AS keep
        FROM feat
    """,
    "pipe_split_hash": f"""
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_TRAIN_UPPER}'
                    THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_VAL_UPPER}'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "pipe_quota_source": f"""
        SELECT doc_id, source, n_chars, rk FROM (
            SELECT doc_id, source, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rk
            FROM documents
        ) WHERE rk <= {QUOTA_PER_SOURCE}
    """,
    "pipe_decontaminate": f"""
        WITH {_SH4_SQL},
        eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % {DECON_EVAL_MOD} = 0)
        SELECT doc_id, COUNT(*) AS n_shared
        FROM sh JOIN eval_sh USING (s)
        WHERE doc_id % {DECON_EVAL_MOD} <> 0
        GROUP BY doc_id
    """,
    "pipe_contamination_report": f"""
        WITH {_SH4_SQL},
        eval_sh AS (SELECT DISTINCT s FROM sh
                    WHERE doc_id % {DECON_EVAL_MOD} = 0),
        corpus_sh AS (SELECT doc_id, s FROM sh
                      WHERE doc_id % {DECON_EVAL_MOD} <> 0),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                  FROM corpus_sh GROUP BY doc_id),
        shared AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sh
                   FROM corpus_sh JOIN eval_sh USING (s)
                   GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(z.n, 0) AS n_shingles,
               COALESCE(s.sh, 0) AS n_shared,
               CASE WHEN COALESCE(z.n, 0) > 0
                    THEN ROUND(COALESCE(s.sh, 0) / z.n, 6) END
                   AS shared_frac,
               CASE WHEN COALESCE(s.sh, 0) = 0 THEN 'clean'
                    WHEN 2 * s.sh >= z.n THEN 'high'
                    ELSE 'partial' END AS band
        FROM documents d
        LEFT JOIN sizes z USING (doc_id)
        LEFT JOIN shared s USING (doc_id)
        WHERE d.doc_id % {DECON_EVAL_MOD} <> 0
    """,
    "pipe_tokenizer_fertility": """
        WITH per AS (
            SELECT lang,
                   CAST(length(text) AS BIGINT) AS c,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
                   CAST(len(regexp_extract_all(text, '[a-z0-9]+'))
                        AS BIGINT) AS t
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(c) AS BIGINT) AS sum_chars,
               CAST(SUM(w) AS BIGINT) AS sum_words,
               CAST(SUM(t) AS BIGINT) AS sum_tokens,
               CASE WHEN COALESCE(SUM(t), 0) > 0
                    THEN CAST(SUM(c) AS BIGINT) * 1000000
                         // CAST(SUM(t) AS BIGINT) END
                   AS chars_per_token_micros,
               CASE WHEN COALESCE(SUM(w), 0) > 0
                    THEN CAST(SUM(t) AS BIGINT) * 1000000
                         // CAST(SUM(w) AS BIGINT) END
                   AS tokens_per_word_micros
        FROM per GROUP BY lang
    """,
    "pipe_bloom_decontaminate": f"""
        WITH {_SH4_SQL},
        eval_s AS (SELECT DISTINCT s FROM sh
                   WHERE doc_id % {DECON_EVAL_MOD} = 0),
        corpus_sh AS (SELECT doc_id, s FROM sh
                      WHERE doc_id % {DECON_EVAL_MOD} <> 0),
        ks AS (SELECT unnest(range({BLOOM_K})) AS i),
        bits AS (SELECT DISTINCT
                   (('0x' || substr(md5(s), 1, 14))::BIGINT
                    + i * ('0x' || substr(md5(s), 15, 14))::BIGINT)
                   % {BLOOM_BITS} AS bit
                 FROM eval_s CROSS JOIN ks),
        probe AS (SELECT DISTINCT s FROM corpus_sh),
        pp AS (SELECT s,
                 (('0x' || substr(md5(s), 1, 14))::BIGINT
                  + i * ('0x' || substr(md5(s), 15, 14))::BIGINT)
                 % {BLOOM_BITS} AS bit
               FROM probe CROSS JOIN ks),
        passed AS (SELECT s FROM pp JOIN bits USING (bit)
                   GROUP BY s HAVING COUNT(*) = {BLOOM_K}),
        verdict AS (SELECT p.s, (e.s IS NOT NULL) AS is_exact
                    FROM passed p LEFT JOIN eval_s e USING (s)),
        agg AS (SELECT c.doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(COUNT(v.is_exact) AS BIGINT) AS pre,
                  CAST(COALESCE(SUM(CASE WHEN v.is_exact
                                         THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS ex
                FROM corpus_sh c LEFT JOIN verdict v USING (s)
                GROUP BY c.doc_id)
        SELECT d.doc_id,
               COALESCE(a.n, 0) AS n_shingles,
               COALESCE(a.pre, 0) AS n_prescreen,
               COALESCE(a.ex, 0) AS n_exact,
               COALESCE(a.pre, 0) - COALESCE(a.ex, 0) AS n_false_pos,
               COALESCE(a.ex, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN agg a USING (doc_id)
        WHERE d.doc_id % {DECON_EVAL_MOD} <> 0
    """,
    "pipe_pack_chunks": f"""
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(FLOOR(COALESCE(SUM(len(string_split(text, ' ')))
                        OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) / {PACK_BUDGET}) AS BIGINT) AS chunk_id
        FROM documents
    """,
    "pipe_mixture_sample": f"""
        SELECT doc_id, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 2) <
              CASE TRY_CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 4
                   WHEN 0 THEN '{MIX_THRESHOLDS[0]}' WHEN 1 THEN '{MIX_THRESHOLDS[1]}'
                   WHEN 2 THEN '{MIX_THRESHOLDS[2]}' ELSE '{MIX_THRESHOLDS[3]}' END
    """,
    "dedup_clusters": _CLUSTERS_SQL.format(
        max_df=NGRAM_MAX_DF, threshold=JACCARD_THRESHOLD
    ),
    "pipe_keep_best": _KEEP_BEST_SQL.format(
        max_df=NGRAM_MAX_DF,
        threshold=JACCARD_THRESHOLD,
        quality=_sql_quality_score("d.text"),
    ),
    "pipe_cdc_upsert": """
        SELECT user_id, event_type,
               MAX(CAST(ts AS TIMESTAMP)) AS ts,
               arg_max(value, CAST(ts AS TIMESTAMP)) AS value,
               arg_max(props, CAST(ts AS TIMESTAMP)) AS props
        FROM events
        GROUP BY user_id, event_type
    """,
    "pipe_scd2_history": """
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               event_id, value,
               CAST(ts AS TIMESTAMP) AS valid_from,
               LEAD(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
               (LEAD(ts) OVER w IS NULL) AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type
                     ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    "pipe_pii_scrub": """
        SELECT event_id,
               regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_scrubbed,
               CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT)
                   AS n_redactions
        FROM events
    """,
    "pipe_blocklist_filter": f"""
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                   w -> w IN ({", ".join(f"'{t}'" for t in BLOCKLIST_TERMS)})
               )) AS BIGINT) AS block_hits,
               COALESCE(CAST(len(list_filter(string_split(text, ' '),
                   w -> w IN ({", ".join(f"'{t}'" for t in BLOCKLIST_TERMS)})
               )) AS BIGINT) * {BLOCK_DENSITY_DIV}
                   > CAST(len(string_split(text, ' ')) AS BIGINT),
                   FALSE) AS blocked
        FROM documents
    """,
    "pipe_k_anonymity": f"""
        WITH groups AS (
            SELECT lang, source, COUNT(*) AS qi_group_n
            FROM documents GROUP BY lang, source
        )
        SELECT d.doc_id, g.qi_group_n,
               g.qi_group_n >= {K_ANON} AS released,
               CASE WHEN g.qi_group_n >= {K_ANON} THEN d.lang
                    ELSE '*' END AS release_lang,
               CASE WHEN g.qi_group_n >= {K_ANON} THEN d.source
                    ELSE '*' END AS release_source
        FROM documents d
        JOIN groups g ON d.lang IS NOT DISTINCT FROM g.lang
                     AND d.source IS NOT DISTINCT FROM g.source
    """,
    "pipe_weighted_sample": f"""
        WITH w AS (
            SELECT doc_id, source,
                   COALESCE(CAST(n_chars AS BIGINT), 0) AS weight,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ),
        pref AS (
            SELECT doc_id, source, weight,
                   CAST(SUM(weight) OVER (ORDER BY h, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS w_cum,
                   CAST(SUM(weight) OVER () AS BIGINT) AS w_tot
            FROM w
        )
        SELECT doc_id, source, weight, w_cum,
               (CAST(w_cum AS HUGEINT) * {PPS_SAMPLE_K})
                   // GREATEST(w_tot, 1)
               > (CAST(w_cum - weight AS HUGEINT) * {PPS_SAMPLE_K})
                   // GREATEST(w_tot, 1)
                   AS sampled
        FROM pref
    """,
    "pipe_dsir_select": f"""
        WITH {_DSIR_W_CTES},
        topk AS (
            SELECT doc_id FROM w
            ORDER BY dsir_micros DESC, doc_id LIMIT {DSIR_K}
        )
        SELECT doc_id, source, n_feat_tokens, dsir_micros,
               doc_id IN (SELECT doc_id FROM topk) AS selected
        FROM w
    """,
    "pipe_dsir_gumbel": dsir_gumbel_sql(),
    "pipe_source_gate": f"""
        WITH hashed AS (
            SELECT doc_id, source, md5(text) AS h,
                   CAST(FLOOR({_sql_quality_score("text")} * 1000000 + 0.5)
                        AS BIGINT) AS q_micro
            FROM documents
        ),
        counts AS (SELECT h, COUNT(*) AS n_copies FROM hashed GROUP BY h),
        per_source AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM((n_copies > 1)::INT) AS BIGINT) AS n_dup_docs,
                   CAST(SUM(q_micro) AS BIGINT) AS sum_q_micro,
                   CAST(CAST(SUM(q_micro) AS BIGINT) // COUNT(*) AS BIGINT)
                       AS mean_q_micro
            FROM hashed JOIN counts USING (h)
            GROUP BY source
        ),
        totals AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
                   CAST(SUM(sum_q_micro) AS BIGINT) AS q_total
            FROM per_source
        )
        SELECT source, n_docs, n_dup_docs, mean_q_micro,
               n_dup_docs * {GATE_MAX_DUP_HALVES} <= n_docs AS pass_dup,
               sum_q_micro * n_total >= q_total * n_docs AS pass_quality,
               (n_dup_docs * {GATE_MAX_DUP_HALVES} <= n_docs)
               AND (sum_q_micro * n_total >= q_total * n_docs) AS admitted,
               CASE WHEN (n_dup_docs * {GATE_MAX_DUP_HALVES} <= n_docs)
                     AND (sum_q_micro * n_total >= q_total * n_docs)
                    THEN n_docs ELSE 0 END AS retained_docs
        FROM per_source, totals
    """,
    "pipe_dup_rate": """
        WITH hashed AS (
            SELECT doc_id, source, md5(text) AS h FROM documents
        ),
        counts AS (SELECT h, COUNT(*) AS n_copies FROM hashed GROUP BY h)
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM((n_copies > 1)::INT) AS BIGINT) AS n_dup_docs,
               ROUND(AVG((n_copies > 1)::INT), 6) AS dup_rate
        FROM hashed JOIN counts USING (h)
        GROUP BY source
    """,
    "pipe_curate_corpus": _CURATE_SQL.format(
        max_df=NGRAM_MAX_DF,
        threshold=JACCARD_THRESHOLD,
        quality=_sql_quality_score("s.raw"),
        train=SPLIT_TRAIN_UPPER,
        val=SPLIT_VAL_UPPER,
    ),
    "pipe_stratified_sample": f"""
        SELECT doc_id, lang, source, sample_rk FROM (
            SELECT doc_id, lang, source,
                   ROW_NUMBER() OVER (PARTITION BY lang, source
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                               doc_id) AS sample_rk
            FROM documents
        ) WHERE sample_rk <= {STRATUM_N}
    """,
    "pipe_length_hist": f"""
        SELECT bucket, n_docs, sum_chars, sum_ws_tokens, min_chars,
               max_chars, bucket * {HIST_BUCKET_CHARS} AS lo_chars
        FROM (
            SELECT CAST(FLOOR(n_chars / {HIST_BUCKET_CHARS}) AS BIGINT) AS bucket,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS sum_ws_tokens,
                   MIN(n_chars) AS min_chars,
                   MAX(n_chars) AS max_chars
            FROM documents
            GROUP BY 1
        )
    """,
}
