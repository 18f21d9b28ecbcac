"""Catalog part — Hjorth descriptors + waveform shape stats (STAGED r10).

The time-series feature stack (catalog_tsa: ACF/PACF; catalog_r11_longmemory:
Hurst; catalog_r12_ordinal: permutation entropy; catalog_r13_archtest:
volatility clustering) gains the classic EEG-era signal descriptors that
quantify a series' SHAPE in the time domain, per event type over the daily
integer micro-return frame (the catalog_r7_risk idiom — reference trading
surface predictor_plugins/common/trading.py consumes the same return
series):

- hjorth_params_by_type  Hjorth (1970) Activity / Mobility / Complexity:
                         population variance of the signal, of its first
                         difference, and the normalized second-order
                         ratio — the time-domain proxies for power,
                         mean frequency, and bandwidth
- crest_zcr_by_type      crest factor max|r|/RMS (peakiness) and the
                         zero-crossing rate (sign alternation share) —
                         the two one-pass waveform stats every feature
                         extractor ships

Determinism: returns are exact integer micro-units; first/second
differences stay exact integers; every moment sum runs in
decimal(38,0)/HUGEINT, so variances are identical rationals on both
engines — only the final sqrt/ratio math is double, rounded 6 dp.

Scale: one events scan -> the shared (type, date) daily rollup (~150
rows at ANY SF — days don't grow with volume); both diffs ride ONE
(type ORDER BY date) window partitioning; the moment aggregates are
5-group map-side partials. Nothing here scales with row count except
the first scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t  # noqa: F401
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets


def _diffed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return frame + exact integer first/second differences."""
    w = Window.partitionBy("event_type").orderBy("ddate")
    r = _rets(spark, sf_dir)
    return (r.withColumn("dr", F.col("r") - F.lag("r").over(w))
            .withColumn("ddr", F.col("dr") - F.lag("dr").over(w)))


_DIFF_SQL = f"""
    WITH {_RET_BASE},
    d1 AS (
        SELECT event_type, ddate, r,
               r - lag(r) OVER (PARTITION BY event_type
                                ORDER BY ddate) AS dr
        FROM rets
    ),
    diffed AS (
        SELECT event_type, ddate, r, dr,
               dr - lag(dr) OVER (PARTITION BY event_type
                                  ORDER BY ddate) AS ddr
        FROM d1
    )"""


@query(
    "hjorth_params_by_type",
    oracle=f"""
    {_DIFF_SQL},
    m AS (
        SELECT event_type,
               count(r)   AS n0, sum(CAST(r AS HUGEINT))   AS s0,
                                 sum(CAST(r AS HUGEINT) * r)     AS q0,
               count(dr)  AS n1, sum(CAST(dr AS HUGEINT))  AS s1,
                                 sum(CAST(dr AS HUGEINT) * dr)   AS q1,
               count(ddr) AS n2, sum(CAST(ddr AS HUGEINT)) AS s2,
                                 sum(CAST(ddr AS HUGEINT) * ddr) AS q2
        FROM diffed GROUP BY event_type
    )
    SELECT event_type, CAST(n0 AS BIGINT) AS n_days,
           round((CAST(q0 AS DOUBLE) * n0 - CAST(s0 AS DOUBLE) * s0)
                 / (CAST(n0 AS DOUBLE) * n0) / 1e12, 6) AS activity,
           round(sqrt(((CAST(q1 AS DOUBLE) * n1 - CAST(s1 AS DOUBLE) * s1)
                       / (CAST(n1 AS DOUBLE) * n1))
                      / ((CAST(q0 AS DOUBLE) * n0 - CAST(s0 AS DOUBLE) * s0)
                         / (CAST(n0 AS DOUBLE) * n0))), 6) AS mobility,
           round(sqrt(((CAST(q2 AS DOUBLE) * n2 - CAST(s2 AS DOUBLE) * s2)
                       / (CAST(n2 AS DOUBLE) * n2))
                      / ((CAST(q1 AS DOUBLE) * n1 - CAST(s1 AS DOUBLE) * s1)
                         / (CAST(n1 AS DOUBLE) * n1)))
                 / sqrt(((CAST(q1 AS DOUBLE) * n1 - CAST(s1 AS DOUBLE) * s1)
                         / (CAST(n1 AS DOUBLE) * n1))
                        / ((CAST(q0 AS DOUBLE) * n0 - CAST(s0 AS DOUBLE) * s0)
                           / (CAST(n0 AS DOUBLE) * n0))), 6) AS complexity
    FROM m ORDER BY event_type
    """,
)
def hjorth_params_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hjorth (1970) parameters per event type over daily micro-returns:
    activity = popvar(r) (in return units squared), mobility =
    sqrt(popvar(Δr)/popvar(r)), complexity = mobility(Δr)/mobility(r).
    All moment sums exact; population (not sample) variances, as in the
    original definition.

    Scale: shared daily rollup; one window partitioning for both diffs;
    5-group moment aggregate."""
    d = _diffed(spark, sf_dir)

    def ssq(col):
        c = F.col(col).cast("decimal(38,0)")
        return [F.count(col).alias(f"n_{col}"), F.sum(c).alias(f"s_{col}"),
                F.sum(c * F.col(col)).alias(f"q_{col}")]

    m = d.groupBy("event_type").agg(*ssq("r"), *ssq("dr"), *ssq("ddr"))

    def popvar(col):
        n = F.col(f"n_{col}").cast("double")
        s = F.col(f"s_{col}").cast("double")
        q = F.col(f"q_{col}").cast("double")
        return (q * F.col(f"n_{col}") - s * s) / (n * n)

    mob = F.sqrt(popvar("dr") / popvar("r"))
    return (m.select(
        "event_type", F.col("n_r").cast("long").alias("n_days"),
        F.round(popvar("r") / F.lit(1e12), 6).alias("activity"),
        F.round(mob, 6).alias("mobility"),
        F.round(F.sqrt(popvar("ddr") / popvar("dr")) / mob, 6)
        .alias("complexity"))
        .orderBy("event_type"))


@query(
    "crest_zcr_by_type",
    oracle=f"""
    WITH {_RET_BASE},
    seq AS (
        SELECT event_type, r,
               lag(r) OVER (PARTITION BY event_type ORDER BY ddate) AS pr
        FROM rets
    ),
    m AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(r AS HUGEINT) * r) AS q,
               max(abs(r)) AS peak,
               sum(CASE WHEN CAST(r AS HUGEINT) * pr < 0
                        THEN 1 ELSE 0 END) AS flips,
               count(pr) AS npairs
        FROM seq GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(peak / sqrt(CAST(q AS DOUBLE) / n), 6) AS crest_factor,
           round(CAST(flips AS DOUBLE) / npairs, 6) AS zcr
    FROM m ORDER BY event_type
    """,
)
def crest_zcr_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crest factor (max|r| over RMS — how peaky the return series is;
    sqrt(2) for a sinusoid, higher for impulsive series) and
    zero-crossing rate (share of consecutive-day return pairs with a
    strict sign flip) per event type, from exact integer moments.

    Scale: shared daily rollup; one lag window; 5-group aggregate."""
    w = Window.partitionBy("event_type").orderBy("ddate")
    seq = _rets(spark, sf_dir).withColumn("pr", F.lag("r").over(w))
    dec = F.col("r").cast("decimal(38,0)")
    m = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec * F.col("r")).alias("q"),
        F.max(F.abs("r")).alias("peak"),
        F.sum(F.when(dec * F.col("pr") < 0, 1).otherwise(0)).alias("flips"),
        F.count("pr").alias("npairs"))
    return (m.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.round(F.col("peak")
                / F.sqrt(F.col("q").cast("double") / F.col("n")), 6)
        .alias("crest_factor"),
        F.round(F.col("flips").cast("double") / F.col("npairs"), 6)
        .alias("zcr"))
        .orderBy("event_type"))
