"""Catalog part — portfolio-risk analytics on event value series.

Two risk screens the trading family (operators/trading.py,
catalog_indicators) reports to a portfolio layer:

- max_drawdown_per_type  peak-to-trough drawdown of the cumulative
                         daily value curve (the risk number quoted
                         next to every return number)
- pairs_spread_zscore    z-scored spread between two series' daily
                         bars (the stat-arb / pairs-trading signal and
                         its extreme-day count)

Determinism: equity curves are EXACT integer-cent cumulative sums, so
running max / drawdown / trough day are integer comparisons; the
spread z divides exact-cent rationals once and counts extremes on the
ROUNDED z both engines computed identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_CENTS = "CAST(round(value * 100) AS BIGINT)"


@query(
    "max_drawdown_per_type",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
               sum({_CENTS}) AS c
        FROM events GROUP BY event_type, CAST(day(ts) AS BIGINT)
    ),
    eq AS (
        SELECT event_type, day,
               sum(c) OVER (PARTITION BY event_type ORDER BY day) AS cum
        FROM daily
    ),
    dd AS (
        SELECT event_type, day, cum,
               max(cum) OVER (PARTITION BY event_type ORDER BY day) - cum
                   AS drawdown
        FROM eq
    )
    SELECT event_type,
           round(CAST(max(drawdown) AS DOUBLE) / 100, 2) AS max_drawdown,
           min(CASE WHEN drawdown = (SELECT max(d2.drawdown) FROM dd d2
                                     WHERE d2.event_type = dd.event_type)
               THEN day END) AS trough_day,
           round(CAST(max(cum) AS DOUBLE) / 100, 2) AS peak_value
    FROM dd GROUP BY event_type
    """,
)
def max_drawdown_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each series' cumulative daily value curve:
    running peak minus current equity, maximized — with the (first)
    trough day and the curve's peak.  The standard downside-risk
    number reported beside the trading family's P&L rows
    (reference strategy metrics, optimization fitness law).

    Scale: two cumulative windows partitioned BY SERIES (each series'
    days sort within its own partition — no global sort); everything
    is exact integer cents until the final /100 display division."""
    daily = (_t(spark, sf_dir, "events")
             .groupBy("event_type",
                      F.dayofmonth("ts").cast("long").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                  .alias("c")))
    w = Window.partitionBy("event_type").orderBy("day") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd = (daily.withColumn("cum", F.sum("c").over(w))
          .withColumn("drawdown", F.max("cum").over(w) - F.col("cum"))
          # bar-sized frame read by the max AND the trough lookup
          .cache())
    mx = (dd.groupBy("event_type")
          .agg(F.max("drawdown").alias("mdd"),
               F.max("cum").alias("peak")))
    trough = (dd.join(F.broadcast(mx), "event_type")
              .filter(F.col("drawdown") == F.col("mdd"))
              .groupBy("event_type")
              .agg(F.min("day").alias("trough_day")))
    return (mx.join(F.broadcast(trough), "event_type")
            .select("event_type",
                    F.round(F.col("mdd").cast("double") / 100, 2)
                    .alias("max_drawdown"),
                    "trough_day",
                    F.round(F.col("peak").cast("double") / 100, 2)
                    .alias("peak_value")))


@query(
    "pairs_spread_zscore",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
               CAST(sum({_CENTS}) AS DOUBLE) / count(*) / 100 AS m
        FROM events WHERE event_type IN ('purchase', 'view')
        GROUP BY event_type, CAST(day(ts) AS BIGINT)
    ),
    spread AS (
        SELECT a.day, a.m - b.m AS s
        FROM daily a JOIN daily b ON a.day = b.day
        WHERE a.event_type = 'purchase' AND b.event_type = 'view'
    ),
    st AS (
        SELECT count(*) AS n, sum(s) / count(*) AS mu,
               sqrt(sum(s * s) / count(*)
                    - (sum(s) / count(*)) * (sum(s) / count(*))) AS sigma
        FROM spread
    )
    SELECT CAST(st.n AS BIGINT) AS n_days,
           round(st.mu, 4) AS mean_spread,
           round(st.sigma, 4) AS sd_spread,
           CAST(sum(CASE WHEN abs(round((s - mu) / sigma, 6)) > 2
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme_days,
           round(max(abs(round((s - mu) / sigma, 6))), 4) AS max_abs_z
    FROM spread, st
    GROUP BY st.n, st.mu, st.sigma
    """,
)
def pairs_spread_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs-trading spread monitor: the daily-bar spread between the
    purchase and view series, z-scored against its own month, with the
    count of |z| > 2 days (entry signals in a mean-reversion book) and
    the worst excursion.

    Scale: the spread is a self-join of the daily-bar frame on day
    (31 rows/series after reduction); moments are one aggregate;
    the extreme-day compare uses the ROUNDED z (6 dp) so both engines
    threshold the identical number."""
    daily = (_t(spark, sf_dir, "events")
             .filter(F.col("event_type").isin("purchase", "view"))
             .groupBy("event_type",
                      F.dayofmonth("ts").cast("long").alias("day"))
             .agg((F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                   .cast("double") / F.count(F.lit(1)) / 100).alias("m"))
             # read by both legs of the spread self-join
             .cache())
    a = daily.filter(F.col("event_type") == "purchase") \
        .select("day", F.col("m").alias("ma"))
    b = daily.filter(F.col("event_type") == "view") \
        .select("day", F.col("m").alias("mb"))
    spread = a.join(b, "day").select(
        "day", (F.col("ma") - F.col("mb")).alias("s")).cache()
    st = spread.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("s") / F.count(F.lit(1))).alias("mu"),
        F.sqrt(F.sum(F.col("s") * F.col("s")) / F.count(F.lit(1))
               - (F.sum("s") / F.count(F.lit(1)))
               * (F.sum("s") / F.count(F.lit(1)))).alias("sigma"))
    z = F.round((F.col("s") - F.col("mu")) / F.col("sigma"), 6)
    return (spread.crossJoin(F.broadcast(st))
            .groupBy("n", "mu", "sigma")
            .agg(F.sum(F.when(F.abs(z) > 2, 1).otherwise(0))
                 .cast("long").alias("n_extreme_days"),
                 F.round(F.max(F.abs(z)), 4).alias("max_abs_z"))
            .select(F.col("n").cast("long").alias("n_days"),
                    F.round(F.col("mu"), 4).alias("mean_spread"),
                    F.round(F.col("sigma"), 4).alias("sd_spread"),
                    "n_extreme_days", "max_abs_z"))
