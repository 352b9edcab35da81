"""Plain-Python golden models of the reference's wrangling semantics
(documented from /root/reference/main.py:392-498), written independently
as specs to differential-test the Spark operators against.

The key behavioral subtlety modeled here: the reference's interpolation
loop fills *in place*, so by the time row i is processed every earlier
null is already filled — the "previous non-null" is therefore always
row i-1, and a leading null run becomes a ramp anchored at (row 0,
value 0). Iterative filling telescopes to direct linear interpolation
in exact arithmetic; these models reproduce the iterative order so the
tests also bound the floating-point gap between the two formulations.
"""

from __future__ import annotations

import math

NA = None


def _isna(x) -> bool:
    return x is None or (isinstance(x, float) and math.isnan(x))


def interpolate_series(vals: list) -> list[float]:
    """Golden model of manual_interpolate_column (main.py:392-419)."""
    out = list(vals)
    n = len(out)
    for i in range(n):
        if not _isna(out[i]):
            continue
        if i == 0:
            out[i] = 0.0
            continue
        prev = out[i - 1]  # always filled already (in-place semantics)
        k = i + 1
        while k < n and _isna(out[k]):
            k += 1
        if k < n:
            out[i] = prev + (out[k] - prev) * ((i - (i - 1)) / (k - (i - 1)))
        else:
            out[i] = prev
    return out


def fill_single_missing_row(row: dict) -> dict:
    """Golden model of fill_single_missing (main.py:421-433)."""
    keys = ("confirmed", "active", "deaths", "recovered")
    row = dict(row)
    if sum(_isna(row[k]) for k in keys) == 1:
        c, a, d, r = (row[k] for k in keys)
        if _isna(a):
            row["active"] = c - d - r
        elif _isna(d):
            row["deaths"] = c - a - r
        elif _isna(r):
            row["recovered"] = c - a - d
        else:
            row["confirmed"] = a + d + r
    return row


def clean_country(rows: list[dict]) -> list[dict]:
    """Golden model of process_country_complete (main.py:449-498) for a
    single country. ``rows``: dicts with date/confirmed/active/deaths/
    recovered; duplicate dates allowed (province rows).
    """
    # dedup: per-date max (max over all-None -> None)
    by_date: dict = {}
    for r in rows:
        cur = by_date.setdefault(r["date"], dict(r))
        for k in ("confirmed", "active", "deaths", "recovered"):
            vals = [v for v in (cur.get(k), r.get(k)) if not _isna(v)]
            cur[k] = max(vals) if vals else None
    recs = [by_date[d] for d in sorted(by_date)]

    # trim rows before the first with any observation
    def any_valid(r):
        return any(
            not _isna(r[k]) for k in ("confirmed", "active", "deaths", "recovered")
        )

    while recs and not any_valid(recs[0]):
        recs.pop(0)
    if not recs:
        return []

    # special case: confirmed == active, deaths & recovered missing
    for r in recs:
        if (
            not _isna(r["confirmed"])
            and not _isna(r["active"])
            and r["confirmed"] == r["active"]
            and _isna(r["deaths"])
            and _isna(r["recovered"])
        ):
            r["deaths"] = 0
            r["recovered"] = 0

    # single-missing invariant pass
    recs = [fill_single_missing_row(r) for r in recs]

    # interpolated reference frame
    interp = {
        k: interpolate_series([r[k] for r in recs])
        for k in ("confirmed", "deaths", "recovered")
    }

    # >=2-missing rows take interpolated values, then one more
    # single-missing pass
    for i, r in enumerate(recs):
        if sum(_isna(r[k]) for k in ("confirmed", "deaths", "recovered")) >= 2:
            for k in ("confirmed", "deaths", "recovered"):
                if _isna(r[k]):
                    r[k] = interp[k][i]
            recs[i] = fill_single_missing_row(r)

    # remaining missing active from the invariant
    for r in recs:
        if _isna(r["active"]):
            if not (
                _isna(r["confirmed"]) or _isna(r["deaths"]) or _isna(r["recovered"])
            ):
                r["active"] = r["confirmed"] - r["deaths"] - r["recovered"]

    # drop incomplete
    return [
        r
        for r in recs
        if not any(
            _isna(r[k]) for k in ("confirmed", "active", "deaths", "recovered")
        )
    ]
