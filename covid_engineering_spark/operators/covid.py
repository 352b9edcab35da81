"""COVID-domain composite pipelines on the reference's own tables
(SURVEY.md §2.9 M3/M4): time-varying SIRD parameter estimation and the
R₀ trajectory, generalized from the reference's one-country-at-a-time
loop to every country in a single window pass.

Reference semantics reproduced exactly (estimates_country_complete,
main.py:536-556): population is a scalar per country (worldometer
lookup main.py:539 — here a broadcast equi-join, J1); Δ-series are
row-position diffs over the *cleaned* per-country frame; γ = 1/4.5;
eps = 1e-5 division guards via np.maximum ≡ GREATEST:

    S_t = N − (Active + Recovered + Deaths)
    μ_t = ΔD / max(Active, eps)
    α_t = (γ·Active − ΔR) / max(ΔR, eps)
    β_t = (ΔActive / max(Active, 1) + μ_t + γ) / max(S_t, eps)
    R0_t = β_t / γ

The first row per country (null diffs) is dropped, mirroring
``.iloc[1:]`` (main.py:550-552).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAMMA = 1 / 4.5  # main.py:546
EPS = 0.00001  # main.py:549


def estimate_params(
    cleaned: DataFrame, population: DataFrame, gamma: float = GAMMA, eps: float = EPS
) -> DataFrame:
    """Per-(country, date) μₜ/αₜ/βₜ/R₀ₜ series for every country at
    once. ``cleaned`` is clean_complete() output; ``population`` is a
    (country_region, population) dimension — tiny, so it broadcasts
    and the fact side never shuffles for the join (the only exchange
    is the per-country window sort).
    """
    w = Window.partitionBy("country_region").orderBy("date")
    df = cleaned.join(F.broadcast(population), "country_region")
    diffs = {
        c: (F.col(c) - F.lag(c).over(w)).alias(f"{c}_change")
        for c in ("confirmed", "active", "deaths", "recovered")
    }
    df = df.select("*", *diffs.values())
    s_t = F.col("population") - (
        F.col("active") + F.col("recovered") + F.col("deaths")
    )
    mu_t = F.col("deaths_change") / F.greatest(F.col("active"), F.lit(eps))
    alpha_t = (gamma * F.col("active") - F.col("recovered_change")) / F.greatest(
        F.col("recovered_change"), F.lit(eps)
    )
    beta_t = (
        F.col("active_change") / F.greatest(F.col("active"), F.lit(1.0))
        + mu_t
        + F.lit(gamma)
    ) / F.greatest(s_t, F.lit(eps))
    return (
        df.select(
            "country_region",
            "date",
            s_t.alias("s_t"),
            mu_t.alias("mu_t"),
            alpha_t.alias("alpha_t"),
            beta_t.alias("beta_t"),
            (beta_t / F.lit(gamma)).alias("r0_t"),
        )
        # mirror iloc[1:]: the diff of each country's first row is null
        .filter(F.col("mu_t").isNotNull())
    )


def r0_trajectory(
    cleaned: DataFrame, population: DataFrame, gamma: float = GAMMA
) -> DataFrame:
    """M4 (main.py:319-331 / the R₀ dashboard page): the per-country
    (date, R₀ₜ) series alone."""
    return estimate_params(cleaned, population, gamma).select(
        "country_region", "date", "r0_t"
    )


def country_fractions(
    day_wise: DataFrame,
    population: DataFrame,
    start_date: str,
    end_date: str,
) -> DataFrame:
    """plot_totals_for_country's data pipeline (main.py:248-267),
    generalized: date-range filter on the daily global series, running
    totals of active/deaths/recovered *within the filtered window*
    (the reference cumsums after slicing — semantics preserved), and
    per-country fractions via a broadcast population join instead of a
    scalar lookup. One row per (country, date); the reference's
    one-country figure is a filter away.
    """
    filtered = day_wise.filter(F.col("date").between(start_date, end_date))
    w = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totals = filtered.select(
        "date",
        *[
            F.sum(F.col(c).cast("decimal(18,6)")).over(w).cast("double").alias(f"{c}_total")
            for c in ("active", "deaths", "recovered")
        ],
    )
    return totals.crossJoin(
        F.broadcast(population.select("country_region", "population"))
    ).select(
        "country_region",
        "date",
        *[
            (F.col(f"{c}_total") / F.col("population")).alias(f"{c}_fraction")
            for c in ("active", "deaths", "recovered")
        ],
    )


TRANSFER_SCHEMA = "t int, date date, s double, i double, r double, d double"
PAIRS_SCHEMA = (
    "param_country string, sim_country string, "
    "t int, date date, s double, i double, r double, d double"
)


def transfer_simulation_pairs(
    cleaned: DataFrame,
    population: DataFrame,
    pairs: DataFrame,
    gamma: float = GAMMA,
) -> DataFrame:
    """All (param_country → sim_country) transfer simulations in ONE
    job: ``pairs`` is a (param_country, sim_country) frame — up to the
    full countries×countries cross — and each pair becomes one group
    of a single grouped-map kernel, so a 1000-executor cluster
    integrates every pair concurrently. Semantics per pair are
    identical to :func:`transfer_simulation` (verified in tests).

    Shape: per-country params are estimated once (one window pass),
    joined to the pairs dimension on the param side; actual series
    join on the sim side with the sim population attached; the union
    shuffles once on the pair key.
    """
    import pandas as pd

    from covid_engineering_spark.operators.simulation import euler_sird

    w = Window.partitionBy("country_region").orderBy("date")
    params = (
        estimate_params(cleaned, population, gamma)
        .select(
            F.col("country_region").alias("param_country"),
            (F.row_number().over(w) - 1).alias("t"),
            "alpha_t",
            "beta_t",
            "mu_t",
        )
        .join(F.broadcast(pairs), "param_country")
        .withColumn("kind", F.lit("param"))
    )
    actual = (
        cleaned.select(
            F.col("country_region").alias("sim_country"),
            "date",
            "active",
            "recovered",
            "deaths",
        )
        .join(F.broadcast(pairs), "sim_country")
        .join(
            F.broadcast(
                population.select(
                    F.col("country_region").alias("sim_country"),
                    F.col("population").alias("n_pop"),
                )
            ),
            "sim_country",
        )
        .withColumn("kind", F.lit("actual"))
    )
    tagged = params.unionByName(actual, allowMissingColumns=True)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        param_c, sim_c = key
        p = pdf[pdf["kind"] == "param"].sort_values("t")
        a = pdf[pdf["kind"] == "actual"].sort_values("date").reset_index(drop=True)
        if not len(a) or not len(p):
            return pd.DataFrame(
                columns=["param_country", "sim_country", "t", "date", "s", "i", "r", "d"]
            )
        n_pop = float(a["n_pop"].iloc[0])
        n_steps = int(min(len(p), len(a) - 1))
        a = a.iloc[-(n_steps + 1) :].reset_index(drop=True)
        init = a.iloc[0]
        rows = euler_sird(
            float(init["active"]),
            float(init["recovered"]),
            float(init["deaths"]),
            n_pop,
            n_steps,
            list(p["alpha_t"].iloc[:n_steps]),
            list(p["beta_t"].iloc[:n_steps]),
            list(p["mu_t"].iloc[:n_steps]),
            gamma,
        )
        return pd.DataFrame(
            [
                (param_c, sim_c, t, a["date"].iloc[t], s, i, r, d)
                for (t, s, i, r, d) in rows
            ],
            columns=["param_country", "sim_country", "t", "date", "s", "i", "r", "d"],
        )

    return tagged.groupBy("param_country", "sim_country").applyInPandas(
        kernel, PAIRS_SCHEMA
    )


def transfer_simulation(
    cleaned: DataFrame,
    population: DataFrame,
    param_country: str,
    sim_country: str,
    gamma: float = GAMMA,
) -> DataFrame:
    """X2 on the real data model (test_SIR_Model, main.py:629-726):
    estimate daily (αₜ, βₜ, μₜ) from ``param_country``, then integrate
    ``sim_country``'s epidemic with those parameters from its own
    initial conditions.

    Reference wiring reproduced: n_steps = min(len(params),
    len(actual) − 1); the actual series is tail-sliced to n_steps+1
    rows (main.py:649-652, the W5 slice); params are consumed by
    position from the START of the param series (``iloc[t]``,
    main.py:670-672), not date-aligned; N = sim country's population.

    Executed as ONE grouped-map kernel over the union of the tagged
    param and actual series — the sequential-in-time Euler loop runs
    executor-side; nothing is collected to the driver. With many
    (param, sim) pairs the same kernel parallelizes per pair key.
    """
    from covid_engineering_spark.operators.simulation import euler_sird

    n_sim = float(
        population.filter(F.col("country_region") == sim_country)
        .select("population")
        .head()[0]
    )
    w = Window.orderBy("date")
    params = (
        estimate_params(
            cleaned.filter(F.col("country_region") == param_country), population, gamma
        )
        .select(
            (F.row_number().over(w) - 1).alias("t"),
            "alpha_t",
            "beta_t",
            "mu_t",
        )
        .withColumn("kind", F.lit("param"))
    )
    actual = (
        cleaned.filter(F.col("country_region") == sim_country)
        .select("date", "active", "recovered", "deaths")
        .withColumn("kind", F.lit("actual"))
    )
    tagged = params.unionByName(actual, allowMissingColumns=True)

    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf[pdf["kind"] == "param"].sort_values("t")
        a = pdf[pdf["kind"] == "actual"].sort_values("date").reset_index(drop=True)
        n_steps = int(min(len(p), len(a) - 1))
        a = a.iloc[-(n_steps + 1) :].reset_index(drop=True)
        init = a.iloc[0]
        rows = euler_sird(
            float(init["active"]),
            float(init["recovered"]),
            float(init["deaths"]),
            n_sim,
            n_steps,
            list(p["alpha_t"].iloc[:n_steps]),
            list(p["beta_t"].iloc[:n_steps]),
            list(p["mu_t"].iloc[:n_steps]),
            gamma,
        )
        return pd.DataFrame(
            [(t, a["date"].iloc[t], s, i, r, d) for (t, s, i, r, d) in rows],
            columns=["t", "date", "s", "i", "r", "d"],
        )

    return (
        tagged.withColumn("_pair", F.lit(1))
        .groupBy("_pair")
        .applyInPandas(kernel, TRANSFER_SCHEMA)
    )
