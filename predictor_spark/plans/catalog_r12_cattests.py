"""Catalog part — paired & ordered categorical tests (STAGED for r9).

The hypothesis-testing stack (ab_test_chi_square, kruskal/spearman in
catalog_r7_nonparam, sprt_purchase_rate) gains the two classical
categorical designs it lacked:

- mcnemar_purchase_weeks    McNemar's (1947) test for PAIRED binary
                            outcomes: per user, "purchased in the first
                            week" vs "purchased in the final week" —
                            the discordant-pair counts b
                            (yes->no) and c (no->yes) and the
                            continuity-corrected statistic
                            (|b-c|-1)^2/(b+c); the marginal-homogeneity
                            question a plain chi-square gets WRONG on
                            paired data
- cochran_armitage_trend    Cochran (1954) / Armitage (1955) trend test
                            for a dose-response in conversion across
                            ordered activity-quintile groups (scores
                            0..4; outcome = purchased in the final
                            week — "ever purchased" is saturated at
                            pbar = 1 here, a 0-variance degeneracy):
                            Z = sum s_i (y_i - w_i pbar) /
                            sqrt(pbar (1-pbar) (sum w_i s_i^2 -
                            (sum w_i s_i)^2 / N))

Determinism: every input to both statistics is an exact integer count
(users, converters, discordant pairs, score sums); each statistic is
one closed-form double expression over those integers, rounded
in-query (6 dp).  Quintile thresholds are exact interpolated quantiles
(Spark `percentile` == DuckDB `quantile_cont`).

Scale: one events scan -> the per-user aggregate (the shuffle any user
rollup pays); both tests then collapse to one row / five rows of
integer counts before any arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

_EARLY_END = "2024-01-08"   # "early" = the first calendar week
_LATE_START = "2024-01-25"  # "late"  = the final week of the month
# (full-month halves are DEGENERATE here: every user purchases in both
# 15-day halves at every SF, so b = c = 0 and the statistic is 0/0 —
# the one-week windows give non-zero discordant counts at all SFs)
_NGROUPS = 5
_QS = [i / _NGROUPS for i in range(1, _NGROUPS)]


@query(
    "mcnemar_purchase_weeks",
    oracle=f"""
    WITH pairs AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase'
                        AND ts < TIMESTAMP '{_EARLY_END}'
                        THEN 1 ELSE 0 END) AS early,
               max(CASE WHEN event_type = 'purchase'
                        AND ts >= TIMESTAMP '{_LATE_START}'
                        THEN 1 ELSE 0 END) AS late
        FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(early * (1 - late)) AS BIGINT) AS b_yes_no,
           CAST(sum((1 - early) * late) AS BIGINT) AS c_no_yes,
           round(pow(abs(CAST(sum(early * (1 - late)) AS DOUBLE)
                         - sum((1 - early) * late)) - 1.0, 2)
                 / nullif(sum(early * (1 - late))
                          + sum((1 - early) * late), 0),
                 6) AS mcnemar_chi2
    FROM pairs
    """,
)
def mcnemar_purchase_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test of 'did each user's purchasing status change
    between the first and the final week of the month': discordant-pair
    counts and the continuity-corrected chi-square (1 df).  Only b and
    c carry information — concordant users cancel out of the statistic,
    which is the whole point of the paired design.  NULL statistic when
    no user changed (b + c = 0)."""
    ev = _t(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    pairs = (ev.groupBy("user_id")
             .agg(F.max(F.when(is_p & (F.col("ts")
                                       < F.lit(_EARLY_END)
                                       .cast("timestamp")), 1)
                        .otherwise(0)).alias("early"),
                  F.max(F.when(is_p & (F.col("ts")
                                       >= F.lit(_LATE_START)
                                       .cast("timestamp")), 1)
                        .otherwise(0)).alias("late")))
    b = F.sum(F.col("early") * (1 - F.col("late")))
    c = F.sum((1 - F.col("early")) * F.col("late"))
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        b.cast("long").alias("b_yes_no"),
        c.cast("long").alias("c_no_yes"),
        F.round(F.pow(F.abs(b.cast("double") - c) - 1.0, 2)
                / F.nullif((b + c).cast("double"), F.lit(0.0)), 6)
        .alias("mcnemar_chi2"))


@query(
    "cochran_armitage_trend",
    oracle=f"""
    WITH users AS (
        SELECT user_id, count(*) AS n_events,
               max(CASE WHEN event_type = 'purchase'
                        AND ts >= TIMESTAMP '2024-01-25'
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    thr AS (SELECT quantile_cont(n_events, {_QS!r}) AS ts FROM users),
    groups AS (
        SELECT ({" + ".join(f"(CASE WHEN u.n_events > thr.ts[{i + 1}] "
                            "THEN 1 ELSE 0 END)"
                            for i in range(_NGROUPS - 1))}) AS s,
               u.converted
        FROM users u, thr
    ),
    g AS (SELECT s, count(*) AS w, sum(converted) AS y
          FROM groups GROUP BY s),
    tot AS (
        SELECT sum(w) AS n, sum(y) AS ytot,
               sum(CAST(s AS HUGEINT) * y) AS sy,
               sum(CAST(s AS HUGEINT) * w) AS sw,
               sum(CAST(s AS HUGEINT) * s * w) AS ssw
        FROM g
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(CAST(ytot AS DOUBLE) / n, 6) AS pbar,
           round((CAST(sy AS DOUBLE) - CAST(ytot AS DOUBLE) * sw / n)
                 / sqrt((CAST(ytot AS DOUBLE) / n)
                        * (1.0 - CAST(ytot AS DOUBLE) / n)
                        * (CAST(ssw AS DOUBLE)
                           - CAST(sw AS DOUBLE) * sw / n)), 6) AS z_trend
    FROM tot
    """,
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: is final-week conversion
    monotonically related to activity across the five ordered
    activity-quintile groups (scores 0..4)?  Z > 0 means conversion rises with activity; Z^2 is
    chi-square(1) under no trend.  All moments are exact integer sums
    over the five group rows."""
    ev = _t(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.max(F.when((F.col("event_type") == "purchase")
                               & (F.col("ts") >= F.lit(_LATE_START)
                                  .cast("timestamp")), 1)
                        .otherwise(0)).alias("converted")))
    thr = users.agg(F.expr(
        f"percentile(n_events, array({', '.join(map(str, _QS))}))")
        .alias("ts"))
    s_expr = None
    for i in range(_NGROUPS - 1):
        t = F.when(F.col("n_events") > F.element_at("ts", i + 1), 1) \
            .otherwise(0)
        s_expr = t if s_expr is None else s_expr + t
    g = (users.crossJoin(F.broadcast(thr))
         .select(s_expr.alias("s"), "converted")
         .groupBy("s")
         .agg(F.count(F.lit(1)).alias("w"),
              F.sum("converted").alias("y")))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = g.agg(F.sum("w").alias("n"), F.sum("y").alias("ytot"),
                F.sum(dec("s") * F.col("y")).alias("sy"),
                F.sum(dec("s") * F.col("w")).alias("sw"),
                F.sum(dec("s") * F.col("s") * F.col("w")).alias("ssw"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pbar = d("ytot") / F.col("n")
    num = d("sy") - d("ytot") * d("sw") / F.col("n")
    den = F.sqrt(pbar * (F.lit(1.0) - pbar)
                 * (d("ssw") - d("sw") * d("sw") / F.col("n")))
    return tot.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(pbar, 6).alias("pbar"),
        F.round(num / den, 6).alias("z_trend"))
