"""Real-data differential test of the SIRD parameter estimators: the
engine's all-countries window pipeline vs a pure-Python golden model of
estimates_country_complete (main.py:536-556), on the actual cleaned
Netherlands series from the reference's complete.csv.
"""

import math
import os

import pytest

from covid_engineering_spark import schemas
from covid_engineering_spark.operators.covid import EPS, GAMMA, estimate_params
from covid_engineering_spark.operators.wrangling import clean_complete
from covid_engineering_spark.sources import read_covid_csv

REF = "/root/reference"
N_NL = 17134872.0  # Netherlands population (worldometer is an LFS
# pointer in the snapshot; the dimension is supplied as a literal)

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/complete.csv"),
    reason="reference snapshot not mounted",
)


def golden_estimates(rows, n_pop, gamma=GAMMA, eps=EPS):
    """Pure-Python reimplementation of main.py:536-556 over a cleaned
    (date-sorted) series of dicts."""
    out = []
    prev = None
    for r in rows:
        if prev is not None:
            dD = r["deaths"] - prev["deaths"]
            dR = r["recovered"] - prev["recovered"]
            dA = r["active"] - prev["active"]
            s_t = n_pop - (r["active"] + r["recovered"] + r["deaths"])
            mu = dD / max(r["active"], eps)
            alpha = (gamma * r["active"] - dR) / max(dR, eps)
            beta = (dA / max(r["active"], 1.0) + mu + gamma) / max(s_t, eps)
            out.append(
                {
                    "date": r["date"],
                    "mu_t": mu,
                    "alpha_t": alpha,
                    "beta_t": beta,
                    "r0_t": beta / gamma,
                }
            )
        prev = r
    return out


def test_estimators_match_golden_on_real_netherlands(spark):
    complete = read_covid_csv(
        spark, f"{REF}/complete.csv", schemas.COMPLETE, schemas.COMPLETE_RENAMES
    )
    cleaned = clean_complete(complete, "Netherlands")
    pop = spark.createDataFrame(
        [("Netherlands", N_NL)], "country_region string, population double"
    )
    got = {
        str(r.date): (r.mu_t, r.alpha_t, r.beta_t, r.r0_t)
        for r in estimate_params(cleaned, pop).collect()
    }

    raw = sorted(
        (
            {
                "date": str(r.date),
                "confirmed": float(r.confirmed),
                "active": float(r.active),
                "deaths": float(r.deaths),
                "recovered": float(r.recovered),
            }
            for r in cleaned.collect()
        ),
        key=lambda d: d["date"],
    )
    want = golden_estimates(raw, N_NL)

    assert len(got) == len(want) > 100
    for g in want:
        m = got[g["date"]]
        for i, k in enumerate(("mu_t", "alpha_t", "beta_t", "r0_t")):
            assert math.isfinite(m[i])
            assert abs(m[i] - g[k]) <= 1e-9 * max(1.0, abs(g[k])), (g["date"], k)
