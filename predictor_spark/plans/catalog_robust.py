"""Catalog part — robust trend statistics on daily bars.

The retrain gates in catalog_drift ask "did the distribution move";
these ask "is there a MONOTONIC TREND", with estimators that a few
outlier days cannot drag around (the reason production monitoring
prefers them to OLS slopes):

- theil_sen_trend    Theil-Sen slope (Theil 1950 / Sen 1968): the
                     median of all pairwise slopes — 29.3% breakdown
- mann_kendall_trend Mann-Kendall S statistic + tie-corrected variance
                     and continuity-corrected z (Mann 1945 / Kendall):
                     the standard nonparametric trend significance

Both operate on the (type, day) daily-mean bars — the pairwise O(n²)
step runs on <=31 bars per series, never on events.  Every input is a
ratio of exact integer cents, signs and tie groups are integer-exact,
and the median is the DISCRETE (data-value) definition, so both
engines agree to the bit before display rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_CENTS = "CAST(round(value * 100) AS BIGINT)"

_DAILY = f"""
    daily AS (
        SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
               CAST(sum({_CENTS}) AS DOUBLE) / count(*) / 100 AS m
        FROM events GROUP BY event_type, CAST(day(ts) AS BIGINT)
    )"""


@query(
    "theil_sen_trend",
    oracle=f"""
    WITH {_DAILY},
    slopes AS (
        SELECT a.event_type, (b.m - a.m) / (b.day - a.day) AS s
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    ),
    sup AS (
        SELECT event_type, s, count(*) AS c FROM slopes GROUP BY event_type, s
    ),
    cum AS (
        SELECT event_type, s,
               sum(c) OVER (PARTITION BY event_type ORDER BY s) * 1.0
                 / sum(c) OVER (PARTITION BY event_type) AS cd
        FROM sup
    )
    SELECT event_type,
           CAST((SELECT count(*) FROM daily d
                 WHERE d.event_type = cum.event_type) AS BIGINT) AS n_days,
           round(min(CASE WHEN cd >= 0.5 THEN s END), 6) AS sen_slope
    FROM cum GROUP BY event_type
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope per event type: the DISCRETE median (smallest
    value with cumulative share >= 0.5) of all pairwise daily-bar
    slopes — the robust trend estimate (29.3% breakdown point) a
    monitoring pass uses where one bad ingestion day would wreck an
    OLS fit.

    Scale: the stream reduces to <=31 bars/type before the pairwise
    join, so the O(n²) slope set is ~465 rows per series; the median
    is the support-aggregate + cumulative-window discrete quantile
    (the _qdisc idiom), engine-exact because the result IS a slope
    value.  Slopes are ratios of exact cent-derived doubles.
    """
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = (ev.groupBy("event_type", F.dayofmonth("ts").cast("long")
                        .alias("day"))
             .agg((F.sum(cents).cast("double") / F.count(F.lit(1)) / 100)
                  .alias("m"))
             # both pair-join sides and the n_days count read the bars
             .cache())
    a = daily.select("event_type", F.col("day").alias("da"),
                     F.col("m").alias("ma"))
    b = daily.select("event_type", F.col("day").alias("db"),
                     F.col("m").alias("mb"))
    slopes = (a.join(F.broadcast(b), "event_type")
              .filter(F.col("da") < F.col("db"))
              .select("event_type", ((F.col("mb") - F.col("ma"))
                                     / (F.col("db") - F.col("da")))
                      .alias("s")))
    sup = slopes.groupBy("event_type", "s").agg(F.count(F.lit(1)).alias("c"))
    wc = (Window.partitionBy("event_type").orderBy("s")
          .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("event_type")
    cum = sup.select("event_type", "s",
                     (F.sum("c").over(wc) * 1.0 / F.sum("c").over(wt))
                     .alias("cd"))
    med = (cum.groupBy("event_type")
           .agg(F.round(F.min(F.when(F.col("cd") >= 0.5, F.col("s"))), 6)
                .alias("sen_slope")))
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"))
    return (nd.join(F.broadcast(med), "event_type")
            .select("event_type", "n_days", "sen_slope"))


@query(
    "mann_kendall_trend",
    oracle=f"""
    WITH {_DAILY},
    s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.m > a.m THEN 1
                             WHEN b.m < a.m THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY a.event_type
    ),
    ties AS (
        SELECT event_type,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT event_type, count(*) AS t
              FROM daily GROUP BY event_type, m)
        GROUP BY event_type
    ),
    nn AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily
        GROUP BY event_type
    )
    SELECT s.event_type, s_stat, nn.n AS n_days,
           round((nn.n * (nn.n - 1) * (2 * nn.n + 5) - tie_term)
                 / 18.0, 6) AS var_s,
           round(CASE WHEN s_stat > 0 THEN (s_stat - 1)
                      WHEN s_stat < 0 THEN (s_stat + 1)
                      ELSE 0 END
                 / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5) - tie_term)
                        / 18.0), 6) + 0.0 AS z
    FROM s JOIN ties USING (event_type) JOIN nn USING (event_type)
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type: S = Σ sign(m_j − m_i)
    over day pairs, variance with the exact tie correction
    (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18, and the continuity-corrected
    z = (S ∓ 1)/√Var — the standard nonparametric "is this series
    trending" significance (|z| > 1.96 at 5%).

    Scale: same daily-bar reduction as theil_sen_trend; S and the tie
    term are INTEGER sums (no float order anywhere), the variance and
    z are single expressions over them.
    """
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = (ev.groupBy("event_type", F.dayofmonth("ts").cast("long")
                        .alias("day"))
             .agg((F.sum(cents).cast("double") / F.count(F.lit(1)) / 100)
                  .alias("m"))
             .cache())
    a = daily.select("event_type", F.col("day").alias("da"),
                     F.col("m").alias("ma"))
    b = daily.select("event_type", F.col("day").alias("db"),
                     F.col("m").alias("mb"))
    s = (a.join(F.broadcast(b), "event_type")
         .filter(F.col("da") < F.col("db"))
         .groupBy("event_type")
         .agg(F.sum(F.when(F.col("mb") > F.col("ma"), 1)
                    .when(F.col("mb") < F.col("ma"), -1)
                    .otherwise(0)).cast("long").alias("s_stat")))
    ties = (daily.groupBy("event_type", "m")
            .agg(F.count(F.lit(1)).alias("t"))
            .groupBy("event_type")
            .agg(F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
                 .cast("long").alias("tie_term")))
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    j = (s.join(F.broadcast(ties), "event_type")
         .join(F.broadcast(nn), "event_type"))
    var_s = ((F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
              - F.col("tie_term")) / 18.0)
    corrected = (F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
                 .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
                 .otherwise(0))
    return j.select("event_type", "s_stat",
                    F.col("n").alias("n_days"),
                    F.round(var_s, 6).alias("var_s"),
                    (F.round(corrected / F.sqrt(var_s), 6) + F.lit(0.0))
                    .alias("z"))
