"""Catalog part — A/B experiment planning (STAGED r11).

The experiment-analysis stack (ab_test_chi_square, diff_in_diff,
qini/uplift) evaluates experiments AFTER the fact; these rows do the
planning arithmetic every experimentation platform runs BEFORE one —
closed-form two-proportion power analysis (Fleiss 1981) on each
nation's observed high-value order rate as the baseline:

- ab_sample_size_plan   required n PER ARM to detect a 10% relative
                        lift over the baseline rate at alpha = 0.05
                        (two-sided), power = 0.80:
                        n = (z_a·sqrt(2·pbar·qbar) +
                             z_b·sqrt(p0·q0 + p1·q1))² / (p1-p0)²,
                        plus the runtime in "current volumes" (how
                        many times the nation's existing order count
                        covers one arm)
- mde_at_current_n      the flip side: the minimum detectable absolute
                        lift at the CURRENT per-nation n (half the
                        sample per arm), mde = (z_a + z_b) ·
                        sqrt(2·p0·q0 / (n/2)) — what the nation's
                        existing traffic can even resolve

z-quantiles are literals (1.959964, 0.841621) identical on both sides;
rates come from exact integer counts against the exact nearest-rank
global median; every output rounds 6 dp.

Scale: reuses the 25-row rate frame (keyed joins, one rank window);
everything after is constant-size arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t  # noqa: F401
from predictor_spark.plans.catalog_r18_ebayes import _RATE_SQL, _rates

_ZA = 1.959964  # Phi^-1(0.975)
_ZB = 0.841621  # Phi^-1(0.80)


@query(
    "ab_sample_size_plan",
    oracle=f"""
    WITH {_RATE_SQL},
    base AS (
        SELECT nation, n, CAST(k AS DOUBLE) / n AS p0
        FROM rates
    ),
    plan AS (
        SELECT nation, n, p0, 1.1 * p0 AS p1,
               (p0 + 1.1 * p0) / 2 AS pbar
        FROM base
    )
    SELECT nation, round(p0, 6) AS baseline_rate,
           CAST(ceil(power({_ZA} * sqrt(2 * pbar * (1 - pbar))
                           + {_ZB} * sqrt(p0 * (1 - p0)
                                          + p1 * (1 - p1)), 2)
                     / power(p1 - p0, 2)) AS BIGINT) AS n_per_arm,
           round(CAST(n AS DOUBLE)
                 / (2 * ceil(power({_ZA} * sqrt(2 * pbar * (1 - pbar))
                                   + {_ZB} * sqrt(p0 * (1 - p0)
                                                  + p1 * (1 - p1)), 2)
                             / power(p1 - p0, 2))), 6)
               AS current_volume_coverage
    FROM plan ORDER BY nation
    """,
)
def ab_sample_size_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion sample size per arm (alpha 0.05 two-sided, power
    0.80) to detect a +10% relative lift on each nation's baseline
    high-value rate, and how much of that an experiment sized to the
    nation's CURRENT order volume would cover (n / (2·n_per_arm)).

    Scale: constant-size arithmetic over the 25-row rate frame."""
    base = _rates(spark, sf_dir).select(
        "nation", "n", (F.col("k").cast("double") / F.col("n")).alias("p0"))
    p0, p1 = F.col("p0"), 1.1 * F.col("p0")
    pbar = (p0 + p1) / 2
    n_arm = F.ceil(
        F.pow(_ZA * F.sqrt(2 * pbar * (1 - pbar))
              + _ZB * F.sqrt(p0 * (1 - p0) + p1 * (1 - p1)), F.lit(2))
        / F.pow(p1 - p0, F.lit(2)))
    return (base.select(
        "nation", F.round(p0, 6).alias("baseline_rate"),
        n_arm.cast("long").alias("n_per_arm"),
        F.round(F.col("n").cast("double") / (2 * n_arm), 6)
        .alias("current_volume_coverage"))
        .orderBy("nation"))


@query(
    "mde_at_current_n",
    oracle=f"""
    WITH {_RATE_SQL}
    SELECT nation, CAST(n AS BIGINT) AS n_orders,
           round(CAST(k AS DOUBLE) / n, 6) AS baseline_rate,
           round(({_ZA} + {_ZB})
                 * sqrt(2 * (CAST(k AS DOUBLE) / n)
                          * (1 - CAST(k AS DOUBLE) / n)
                          / (n / 2.0)), 6) AS mde_abs,
           round((({_ZA} + {_ZB})
                  * sqrt(2 * (CAST(k AS DOUBLE) / n)
                           * (1 - CAST(k AS DOUBLE) / n)
                           / (n / 2.0)))
                 / (CAST(k AS DOUBLE) / n), 6) AS mde_rel
    FROM rates ORDER BY nation
    """,
)
def mde_at_current_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable absolute and relative lift if the nation's
    CURRENT order volume were split into two arms (n/2 each) at
    alpha 0.05 / power 0.80 — the resolution limit of existing traffic.

    Scale: same 25-row frame, pure arithmetic."""
    r = _rates(spark, sf_dir)
    n = F.col("n").cast("double")
    p0 = F.col("k").cast("double") / n
    mde = (_ZA + _ZB) * F.sqrt(2 * p0 * (1 - p0) / (n / 2.0))
    return (r.select(
        "nation", F.col("n").cast("long").alias("n_orders"),
        F.round(p0, 6).alias("baseline_rate"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p0, 6).alias("mde_rel"))
        .orderBy("nation"))
