"""Catalog part — Engle-Granger cointegration (STAGED for r9).

The pairs-trading stack (pairs_spread_zscore: z of a FIXED unit
spread) gains the two-step Engle & Granger (1987) machinery that
decides whether a pair is worth trading at all:

- engle_granger_pairs  for every unordered event-type pair: OLS hedge
                       ratio y = a + b x over the joined daily bars,
                       then the Dickey-Fuller statistic of the
                       residual spread (no-constant DF regression
                       delta_e = gamma * e_{t-1}; stat = gamma / se) —
                       the step-2 unit-root check on the cointegrating
                       residual
- spread_half_life     AR(1)-implied mean-reversion half-life of the
                       same residual spread, -ln 2 / ln rho (NULL
                       outside 0 < rho < 1 — no reversion to trade)

Determinism: daily bars are exact integer cents, so the OLS normal-
equation moments are exact integers and (a, b) are identical doubles;
the residual e_t = y - a - b x is quantized PER ROW to hundredth-cent
integers (round(100 e), |e| <= ~1e7 so squares stay far inside BIGINT)
before any sum — every DF/AR moment is an exact integer under any
aggregation order; each statistic is one closed-form double, rounded
in-query.

Scale: one events scan -> the (type, date) rollup (~150 rows at any
SF); the pair join is |days| x C(5,2) rows; two grouped-moment passes
and one lag window over that tiny frame.  At a million series the
same plan runs per candidate pair list, never all-pairs on raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: oracle prelude: paired daily cents + OLS hedge + hundredth-cent
#: residuals with their lag/differences
_SPREAD_SQL = """
    bars AS (
        SELECT event_type, CAST(ts AS DATE) AS ddate,
               sum(CAST(round(value * 100) AS BIGINT)) AS c
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb, a.ddate,
               a.c AS x, b.c AS y
        FROM bars a JOIN bars b
          ON a.ddate = b.ddate AND a.event_type < b.event_type
    ),
    ols AS (
        SELECT ta, tb, count(*) AS n,
               (CAST(count(*) AS DOUBLE) * sum(CAST(x AS HUGEINT) * y)
                - CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE)
                  * sum(CAST(y AS HUGEINT)))
               / (CAST(count(*) AS DOUBLE) * sum(CAST(x AS HUGEINT) * x)
                  - CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE)
                    * sum(CAST(x AS HUGEINT))) AS b
        FROM pairs GROUP BY ta, tb
    ),
    ab AS (
        SELECT o.ta, o.tb, o.n, o.b,
               (CAST(sy AS DOUBLE) - o.b * sx) / o.n AS a
        FROM ols o JOIN (
            SELECT ta, tb, sum(CAST(x AS HUGEINT)) AS sx,
                   sum(CAST(y AS HUGEINT)) AS sy
            FROM pairs GROUP BY ta, tb
        ) s ON s.ta = o.ta AND s.tb = o.tb
    ),
    resid AS (
        SELECT p.ta, p.tb, p.ddate, ab.n, ab.b,
               CAST(round(100.0 * (p.y - ab.a - ab.b * p.x)) AS BIGINT)
                   AS e
        FROM pairs p JOIN ab ON ab.ta = p.ta AND ab.tb = p.tb
    ),
    lagged AS (
        SELECT ta, tb, n, b, e,
               lag(e) OVER (PARTITION BY ta, tb ORDER BY ddate) AS ep
        FROM resid
    )
"""


def _lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ta, tb, n, b, e, ep): hundredth-cent residual spread + its lag,
    mirroring the oracle prelude expression-for-expression."""
    ev = _t(spark, sf_dir, "events")
    # cached: both sides of the pair self-join read bars (~150 rows at
    # any SF) — un-cached, each side re-ran the full events scan+rollup
    bars = (ev.groupBy("event_type",
                       F.col("ts").cast("date").alias("ddate"))
            .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                 .alias("c"))
            .cache())
    a = bars.select(F.col("event_type").alias("ta"), "ddate",
                    F.col("c").alias("x"))
    b_ = bars.select(F.col("event_type").alias("tb"),
                     F.col("ddate").alias("ddate2"),
                     F.col("c").alias("y"))
    # r14 (guide §2.4/§5): mom (inside the broadcast ab subtree) AND resid
    # both re-derived pairs -> bars -> a full events scan each, and the two
    # registered rows each re-derived both: 4 events scans + 4 daily
    # rollups per invocation (plans/r14/engle_granger_pairs_before.txt).
    # pairs is |days| x C(5,2) rows (~1.5k at ANY SF — the rollup bounds
    # it), so caching it costs O(days) memory and leaves ONE events scan.
    pairs = (a.join(b_, (F.col("ddate") == F.col("ddate2"))
                    & (F.col("ta") < F.col("tb")))
             .select("ta", "tb", "ddate", "x", "y")
             .cache())
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    mom = pairs.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"), F.sum(dy).alias("sy"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(dx * F.col("y")).alias("sxy"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    beta = ((d("n") * d("sxy") - d("sx") * d("sy"))
            / (d("n") * d("sxx") - d("sx") * d("sx")))
    ab = mom.select("ta", "tb", "n", beta.alias("b"),
                    ((d("sy") - beta * d("sx")) / F.col("n")).alias("a"))
    resid = (pairs.join(F.broadcast(ab), ["ta", "tb"])
             .select("ta", "tb", "ddate", "n", "b",
                     F.round(F.lit(100.0)
                             * (F.col("y") - F.col("a")
                                - F.col("b") * F.col("x")), 0)
                     .cast("long").alias("e")))
    w = Window.partitionBy("ta", "tb").orderBy("ddate")
    return resid.withColumn("ep", F.lag("e").over(w))


@query(
    "engle_granger_pairs",
    oracle=f"""
    WITH {_SPREAD_SQL},
    moms AS (
        SELECT ta, tb, max(n) AS n, max(b) AS b,
               sum(CAST(ep AS HUGEINT) * (e - ep)) AS s1,
               sum(CAST(ep AS HUGEINT) * ep) AS s2,
               sum(CAST(e - ep AS HUGEINT) * (e - ep)) AS s3,
               count(ep) AS m
        FROM lagged WHERE ep IS NOT NULL GROUP BY ta, tb
    )
    SELECT ta AS type_a, tb AS type_b, CAST(n AS BIGINT) AS n_days,
           round(b, 6) AS hedge_beta,
           round((CAST(s1 AS DOUBLE) / s2)
                 / sqrt(((CAST(s3 AS DOUBLE)
                          - (CAST(s1 AS DOUBLE) / s2)
                            * (CAST(s1 AS DOUBLE) / s2) * s2)
                         / (m - 1)) / s2), 6) AS adf_stat
    FROM moms ORDER BY type_a, type_b
    """,
)
def engle_granger_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger step 1 + 2 per type pair: the OLS hedge ratio and
    the no-constant Dickey-Fuller statistic of the residual spread —
    gamma-hat = S1/S2, se = sqrt((S3 - gamma^2 S2)/(m-1) / S2),
    stat = gamma/se, all from exact hundredth-cent integer moments.
    (The decision thresholds are the EG critical values, e.g. -3.34 at
    5% for n~30 — reported as a statistic, like generalized_esd_stats.)"""
    lg = _lagged(spark, sf_dir).filter(F.col("ep").isNotNull())
    de = F.col("e") - F.col("ep")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    moms = lg.groupBy("ta", "tb").agg(
        F.max("n").alias("n"), F.max("b").alias("b"),
        F.sum(dec(F.col("ep")) * de).alias("s1"),
        F.sum(dec(F.col("ep")) * F.col("ep")).alias("s2"),
        F.sum(dec(de) * de).alias("s3"),
        F.count("ep").alias("m"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    gamma = d("s1") / d("s2")
    se = F.sqrt(((d("s3") - gamma * gamma * d("s2"))
                 / (F.col("m") - 1)) / d("s2"))
    return (moms.select(
        F.col("ta").alias("type_a"), F.col("tb").alias("type_b"),
        F.col("n").cast("long").alias("n_days"),
        F.round("b", 6).alias("hedge_beta"),
        F.round(gamma / se, 6).alias("adf_stat"))
        .orderBy("type_a", "type_b"))


@query(
    "spread_half_life",
    oracle=f"""
    WITH {_SPREAD_SQL},
    moms AS (
        SELECT ta, tb,
               sum(CAST(ep AS HUGEINT) * e) AS s01,
               sum(CAST(ep AS HUGEINT) * ep) AS s2
        FROM lagged WHERE ep IS NOT NULL GROUP BY ta, tb
    )
    SELECT ta AS type_a, tb AS type_b,
           round(CAST(s01 AS DOUBLE) / s2, 6) AS rho,
           CASE WHEN CAST(s01 AS DOUBLE) / s2 > 0
                 AND CAST(s01 AS DOUBLE) / s2 < 1
                THEN round(-ln(2.0) / ln(CAST(s01 AS DOUBLE) / s2), 6)
                ELSE NULL END AS half_life_days
    FROM moms ORDER BY type_a, type_b
    """,
)
def spread_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reversion half-life of each pair's residual spread from the
    no-intercept AR(1) rho = sum(e_t e_{t-1}) / sum(e_{t-1}^2):
    -ln2/ln(rho) days when 0 < rho < 1, NULL otherwise (no tradable
    reversion).  Same exact integer moments as the ADF row."""
    lg = _lagged(spark, sf_dir).filter(F.col("ep").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    moms = lg.groupBy("ta", "tb").agg(
        F.sum(dec("ep") * F.col("e")).alias("s01"),
        F.sum(dec("ep") * F.col("ep")).alias("s2"))
    rho = F.col("s01").cast("double") / F.col("s2").cast("double")
    import math

    return (moms.select(
        F.col("ta").alias("type_a"), F.col("tb").alias("type_b"),
        F.round(rho, 6).alias("rho"),
        F.when((rho > 0) & (rho < 1),
               F.round(F.lit(-math.log(2.0)) / F.log(rho), 6))
        .alias("half_life_days"))
        .orderBy("type_a", "type_b"))
