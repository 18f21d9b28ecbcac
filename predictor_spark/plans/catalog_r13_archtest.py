"""Catalog part — volatility-clustering tests (STAGED for r9).

The volatility stack (realized_vol_7d, Parkinson/Garman-Klass,
catalog_r12_gof's runs test) gains the conditional-heteroskedasticity
battery that decides whether a GARCH model is even warranted:

- arch_lm_test        Engle's (1982) ARCH LM test at lag 1 per event
                      type: regress r_t^2 on r_{t-1}^2;
                      LM = n * R^2 ~ chi^2(1) under no ARCH effects
- squared_return_acf  autocorrelation of SQUARED daily returns at lags
                      1..5 — the volatility-clustering signature plain
                      return ACF (acf_per_series) cannot see (returns
                      can be white noise while their squares correlate)

Determinism: returns are the catalog_r7_risk integer micro-unit idiom;
squared returns are exact integers (micro^2 <= ~1e12 per day), so
every lagged cross-moment is an exact HUGEINT/decimal(38) sum; each
statistic is one closed-form double, rounded in-query (6 dp).

Scale: one events scan -> the shared daily rollup; lags ride ONE
(type ordered by date) window partitioning (all five lead taps share
the sort); moments are 5-group map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets

_ACF_LAGS = 5


@query(
    "arch_lm_test",
    oracle=f"""
    WITH {_RET_BASE},
    sq AS (
        SELECT event_type, ddate, CAST(r AS HUGEINT) * r AS u
        FROM rets
    ),
    lagged AS (
        SELECT event_type, u,
               lag(u) OVER (PARTITION BY event_type ORDER BY ddate)
                   AS up
        FROM sq
    ),
    m AS (
        SELECT event_type, count(*) AS n,
               sum(u) AS su, sum(up) AS sp,
               sum(u * u) AS suu, sum(up * up) AS spp,
               sum(u * up) AS sup
        FROM lagged WHERE up IS NOT NULL
        GROUP BY event_type HAVING count(*) >= 4
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(pow(CAST(n AS DOUBLE) * sup
                     - CAST(su AS DOUBLE) * sp, 2)
                 / ((CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)
                    * (CAST(n AS DOUBLE) * suu
                       - CAST(su AS DOUBLE) * su)), 6) AS r2_aux,
           round(CAST(n AS DOUBLE)
                 * pow(CAST(n AS DOUBLE) * sup
                       - CAST(su AS DOUBLE) * sp, 2)
                 / ((CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)
                    * (CAST(n AS DOUBLE) * suu
                       - CAST(su AS DOUBLE) * su)), 4) AS arch_lm
    FROM m ORDER BY event_type
    """,
)
def arch_lm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle's ARCH LM at lag 1 per event type: R^2 of r_t^2 on
    r_{t-1}^2 (squared Pearson correlation for one regressor, exact
    integer squared-return moments) and LM = n R^2 — significant LM
    means variance clusters and a constant-vol model underprices
    tails."""
    rets = _rets(spark, sf_dir)
    u = F.col("r").cast("decimal(38,0)") * F.col("r")
    sq = rets.select("event_type", "ddate", u.alias("u"))
    w = Window.partitionBy("event_type").orderBy("ddate")
    lagged = (sq.withColumn("up", F.lag("u").over(w))
              .filter(F.col("up").isNotNull()))
    m = (lagged.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("u").alias("su"), F.sum("up").alias("sp"),
              F.sum(F.col("u") * F.col("u")).alias("suu"),
              F.sum(F.col("up") * F.col("up")).alias("spp"),
              F.sum(F.col("u") * F.col("up")).alias("sup"))
         .filter(F.col("n") >= 4))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = F.pow(d("n") * d("sup") - d("su") * d("sp"), 2)
    den = ((d("n") * d("spp") - d("sp") * d("sp"))
           * (d("n") * d("suu") - d("su") * d("su")))
    return (m.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.round(num / den, 6).alias("r2_aux"),
        F.round(d("n") * num / den, 4).alias("arch_lm"))
        .orderBy("event_type"))


@query(
    "squared_return_acf",
    oracle=f"""
    WITH {_RET_BASE},
    sq AS (
        SELECT event_type, ddate,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ddate) AS rn,
               CAST(r AS HUGEINT) * r AS u
        FROM rets
    ),
    pairs AS (
        SELECT a.event_type, l.lag, a.u AS x, b.u AS y
        FROM sq a
        JOIN (SELECT unnest(range(1, {_ACF_LAGS} + 1)) AS lag) l ON TRUE
        JOIN sq b ON b.event_type = a.event_type
                 AND b.rn = a.rn + l.lag
    ),
    m AS (
        SELECT event_type, lag, count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy,
               sum(x * y) AS sxy
        FROM pairs GROUP BY event_type, lag HAVING count(*) >= 3
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS acf_sq
    FROM m ORDER BY event_type, lag
    """,
)
def squared_return_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson autocorrelation of squared daily returns at lags 1..5
    per event type (pairwise-complete form over rank-aligned pairs) —
    the standard volatility-clustering readout next to arch_lm_test.
    All five lead taps share ONE (type ordered by date) window sort."""
    rets = _rets(spark, sf_dir)
    u = F.col("r").cast("decimal(38,0)") * F.col("r")
    w = Window.partitionBy("event_type").orderBy("ddate")
    sq = rets.select("event_type", "ddate", u.alias("u"))
    leads = sq.select(
        "event_type", F.col("u").alias("x"),
        *[F.lead("u", k).over(w).alias(f"y{k}")
          for k in range(1, _ACF_LAGS + 1)])
    stacked = leads.select(
        "event_type",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("lag"), F.col("x").alias("x"),
                     F.col(f"y{k}").alias("y"))
            for k in range(1, _ACF_LAGS + 1)])).alias("p")) \
        .select("event_type", "p.lag", "p.x", "p.y") \
        .filter(F.col("y").isNotNull())
    m = (stacked.groupBy("event_type", "lag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("y") * F.col("y")).alias("syy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"))
         .filter(F.col("n") >= 3))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt((d("n") * d("sxx") - d("sx") * d("sx"))
                 * (d("n") * d("syy") - d("sy") * d("sy")))
    return (m.select("event_type",
                     F.col("lag").cast("long").alias("lag"),
                     F.col("n").cast("long").alias("n_pairs"),
                     F.round(num / den, 6).alias("acf_sq"))
            .orderBy("event_type", "lag"))