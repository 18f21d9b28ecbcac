"""Catalog part — multiple-testing corrections (STAGED r11).

The catalog runs many hypothesis tests (rank tests, GoF, ARCH,
Granger, ...) but nothing corrects for running them TOGETHER — the
first question a reviewer asks of any test battery. These rows build a
10-test battery (paired sign tests over every unordered event-type
pair: "does type A out-return type B on more days than chance?") and
apply the two standard corrections:

- pairwise_sign_tests_fdr   per-pair sign test (normal approximation,
                            ties dropped) with Benjamini-Hochberg
                            (1995) step-up adjusted p-values and the
                            q = 0.10 FDR decision
- holm_adjusted_sign_tests  the same battery under Holm (1979)
                            step-down familywise control at
                            alpha = 0.05 — stricter, controls ANY
                            false rejection rather than the false
                            discovery RATE

Normal CDF: both engines lack erf, so Phi is the Abramowitz & Stegun
26.2.17 polynomial written as the IDENTICAL literal expression on both
sides (|error| < 7.5e-8, far above the 6 dp rounding). Sign counts are
exact integers; the BH/Holm step adjustments are running min/max
windows over the 10-row p-value frame.

Scale: one events scan -> the shared daily rollup; the pair frame is a
date equi-join of the ~150-row return frame with itself (type_a <
type_b), then 10-group exact counts. Every correction window runs over
10 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t  # noqa: F401
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets

#: SQL expression for Phi(|z|) upper tail -> two-sided p, A&S 26.2.17
_P_SQL = """
    2.0 * ((exp(-z * z / 2.0) / 2.5066282746310002)
           * ((((1.330274429 * tt - 1.821255978) * tt + 1.781477937) * tt
               - 0.356563782) * tt + 0.319381530) * tt)
"""

_PAIR_SQL = f"""
    WITH {_RET_BASE},
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) FILTER (a.r <> b.r) AS n,
               count(*) FILTER (a.r > b.r) AS k
        FROM rets a JOIN rets b
          ON a.ddate = b.ddate AND a.event_type < b.event_type
        GROUP BY 1, 2
    ),
    zp AS (
        SELECT type_a, type_b, n, k,
               abs(2.0 * k - n) / sqrt(CAST(n AS DOUBLE)) AS z
        FROM pairs
    ),
    praw AS (
        SELECT type_a, type_b, n, k, z,
               least(1.0, {_P_SQL}) AS p
        FROM (SELECT *, 1.0 / (1.0 + 0.2316419 * z) AS tt FROM zp)
    )"""


def _phi_two_sided(z: Column) -> Column:
    """Two-sided normal p-value from |z| — the A&S 26.2.17 polynomial,
    literal-for-literal identical to _P_SQL."""
    tt = 1.0 / (1.0 + 0.2316419 * z)
    poly = ((((1.330274429 * tt - 1.821255978) * tt + 1.781477937) * tt
             - 0.356563782) * tt + 0.319381530) * tt
    return F.least(
        F.lit(1.0),
        2.0 * ((F.exp(-z * z / 2.0) / 2.5066282746310002) * poly))


def _praw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(type_a, type_b, n, k, z, p): the 10-pair sign-test battery."""
    # cached: both legs of the date self-join reuse the ~150-row frame
    # (one events scan, not two — plan audit)
    r = _rets(spark, sf_dir).cache()
    a = r.select(F.col("event_type").alias("type_a"), "ddate",
                 F.col("r").alias("ra"))
    b = r.select(F.col("event_type").alias("type_b"), "ddate",
                 F.col("r").alias("rb"))
    pairs = (a.join(b, "ddate")
             .filter(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.sum((F.col("ra") != F.col("rb")).cast("long"))
                  .alias("n"),
                  F.sum((F.col("ra") > F.col("rb")).cast("long"))
                  .alias("k")))
    z = F.abs(2.0 * F.col("k") - F.col("n")) \
        / F.sqrt(F.col("n").cast("double"))
    return pairs.withColumn("z", z).withColumn("p", _phi_two_sided(z))


@query(
    "pairwise_sign_tests_fdr",
    oracle=f"""
    {_PAIR_SQL},
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY p, type_a, type_b) AS rnk,
               count(*) OVER () AS m
        FROM praw
    ),
    adj AS (
        SELECT *, least(1.0, min(p * m / rnk)
                             OVER (ORDER BY rnk DESC
                                   ROWS UNBOUNDED PRECEDING)) AS p_bh
        FROM ranked
    )
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
           CAST(k AS BIGINT) AS wins_a,
           round(p, 6) AS p_raw, round(p_bh, 6) AS p_bh,
           p_bh <= 0.10 AS reject_fdr10
    FROM adj ORDER BY type_a, type_b
    """,
)
def pairwise_sign_tests_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10-pair sign-test battery with Benjamini-Hochberg step-up
    adjusted p-values (p_bh(i) = min_{j>=i} p(j)·m/j, monotone by the
    reverse running min) and the q = 0.10 FDR decision.

    Scale: date-keyed self-join of the tiny return frame; corrections
    run over 10 rows."""
    praw = _praw(spark, sf_dir)
    wr = Window.orderBy("p", "type_a", "type_b")
    ranked = (praw.withColumn("rnk", F.row_number().over(wr))
              .withColumn("m", F.count(F.lit(1)).over(Window.partitionBy())))
    wrev = (Window.orderBy(F.col("rnk").desc())
            .rowsBetween(Window.unboundedPreceding, 0))
    adj = ranked.withColumn(
        "p_bh", F.least(F.lit(1.0),
                        F.min(F.col("p") * F.col("m") / F.col("rnk"))
                        .over(wrev)))
    return (adj.select(
        "type_a", "type_b",
        F.col("n").cast("long").alias("n_days"),
        F.col("k").cast("long").alias("wins_a"),
        F.round("p", 6).alias("p_raw"),
        F.round("p_bh", 6).alias("p_bh"),
        (F.col("p_bh") <= 0.10).alias("reject_fdr10"))
        .orderBy("type_a", "type_b"))


@query(
    "holm_adjusted_sign_tests",
    oracle=f"""
    {_PAIR_SQL},
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY p, type_a, type_b) AS rnk,
               count(*) OVER () AS m
        FROM praw
    ),
    adj AS (
        SELECT *, least(1.0, max(p * (m - rnk + 1))
                             OVER (ORDER BY rnk
                                   ROWS UNBOUNDED PRECEDING)) AS p_holm
        FROM ranked
    )
    SELECT type_a, type_b, round(p, 6) AS p_raw,
           round(p_holm, 6) AS p_holm,
           p_holm <= 0.05 AS reject_fwer5
    FROM adj ORDER BY type_a, type_b
    """,
)
def holm_adjusted_sign_tests(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Holm step-down familywise correction of the same battery:
    p_holm(i) = max_{j<=i} p(j)·(m-j+1), capped at 1, monotone by the
    forward running max; reject at alpha = 0.05.

    Scale: identical to the FDR row."""
    praw = _praw(spark, sf_dir)
    wr = Window.orderBy("p", "type_a", "type_b")
    ranked = (praw.withColumn("rnk", F.row_number().over(wr))
              .withColumn("m", F.count(F.lit(1)).over(Window.partitionBy())))
    wfwd = (Window.orderBy("rnk")
            .rowsBetween(Window.unboundedPreceding, 0))
    adj = ranked.withColumn(
        "p_holm", F.least(F.lit(1.0),
                          F.max(F.col("p") * (F.col("m") - F.col("rnk") + 1))
                          .over(wfwd)))
    return (adj.select(
        "type_a", "type_b",
        F.round("p", 6).alias("p_raw"),
        F.round("p_holm", 6).alias("p_holm"),
        (F.col("p_holm") <= 0.05).alias("reject_fwer5"))
        .orderBy("type_a", "type_b"))
