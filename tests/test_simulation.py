"""Simulation tier tests: kernel semantics pinned against hand-computed
Euler steps, and the grouped-map plumbing (per-key parallel integration)
checked for shape and initial conditions. The x1/x3 queries are also
differentially checked against a recursive-CTE oracle in test_oracle.
"""

import math

import pytest

from covid_engineering_spark.operators.simulation import (
    GAMMA,
    euler_sird,
    q_x1_sird_sim,
    q_x2_sird_transfer,
)
from tests.conftest import SF_SMOKE


def test_euler_kernel_hand_computed():
    # One step from (S=90, I=10, R=0, D=0), N=100,
    # alpha=0, beta=0.5, mu=0.1, gamma=0.1:
    #   dS = -0.5*90*10/100 = -4.5 ; dI = 4.5 - 0.2*10 = 2.5
    #   dR = 0.1*10 = 1 ; dD = 0.1*10 = 1
    rows = euler_sird(10.0, 0.0, 0.0, 100.0, 1, 0.0, 0.5, 0.1, 0.1)
    assert rows[0] == (0, 90.0, 10.0, 0.0, 0.0)
    t, s, i, r, d = rows[1]
    assert (t, s, i, r, d) == (1, 85.5, 12.5, 1.0, 1.0)


def test_euler_time_varying_params():
    rows = euler_sird(
        10.0, 0.0, 0.0, 100.0, 2, [0.0, 0.0], [0.5, 0.0], [0.1, 0.0], 0.1
    )
    # step 2 uses beta=0, mu=0: dI = -gamma*I = -1.25
    assert rows[2][2] == pytest.approx(12.5 - 1.25)


def test_x1_shape_and_init(spark):
    sim = q_x1_sird_sim(spark, SF_SMOKE).collect()
    by_country = {}
    for r in sim:
        by_country.setdefault(r["country"], []).append(r)
    assert len(by_country) == 7
    for country, rows in by_country.items():
        rows.sort(key=lambda r: r["t"])
        assert [r["t"] for r in rows] == list(range(len(rows)))
        assert rows[0]["r"] == 0.0 and rows[0]["d"] == 0.0
        # conservation: S+I+R+D = N at every step (Euler preserves sum)
        for r in rows:
            assert r["s"] + r["i"] + r["r"] + r["d"] == pytest.approx(1e7, rel=1e-9)


def test_x2_transfer_plumbing(spark):
    rows = sorted(q_x2_sird_transfer(spark, SF_SMOKE).collect(), key=lambda r: r["t"])
    assert rows, "empty simulation"
    assert [r["t"] for r in rows] == list(range(len(rows)))
    assert all(
        r[c] is not None and math.isfinite(r[c])
        for r in rows
        for c in ("s", "i", "r", "d")
    )
    assert rows[0]["r"] == 0.0 and rows[0]["d"] == 0.0
    assert GAMMA == pytest.approx(0.1)
