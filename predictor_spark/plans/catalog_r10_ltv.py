"""Catalog part — customer-lifetime-value economics (STAGED r10).

The cohort-economics readouts a growth/finance team derives from the
purchase log (the layer above cohort_weekly_retention,
catalog_behavior.py — retention says WHO comes back, LTV says what
they are WORTH):

- ltv_cohort_curves   cumulative revenue per cohort user by cohort
                      age (the classic LTV curve table)
- arpu_daily          daily revenue per active user + paying share
- cohort_payback_week the first cohort age at which cumulative LTV
                      covers a $30 acquisition cost — decided by an
                      exact integer cross-multiplication

Cohorts: the calendar week (0-based, 7-day blocks of January) of the
user's FIRST purchase; age = purchase week − cohort week.

Determinism: revenue rides exact integer cents; cohort sizes, ages
and payback comparisons are pure integer arithmetic (payback:
cum_cents ≥ 3000·n_users — no float ever decides the week); the only
doubles are final display divisions, rounded in-query.

Scale: one user-keyed min finds each user's cohort, one
co-partitioned join tags purchases, then everything collapses to
|cohorts|×|ages| ≤ 25 rows before the cumulative windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: oracle prelude: purchases tagged with cohort week and age week
_COHORT = """
    pur AS (
        SELECT user_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents,
               (day(ts) - 1) // 7 AS wk
        FROM events WHERE event_type = 'purchase'
    ),
    first_wk AS (
        SELECT user_id, min(wk) AS cohort_week FROM pur GROUP BY user_id
    ),
    tagged AS (
        SELECT p.user_id, p.cents, f.cohort_week,
               p.wk - f.cohort_week AS age_week
        FROM pur p JOIN first_wk f ON p.user_id = f.user_id
    ),
    sizes AS (
        SELECT cohort_week, count(*) AS n_users
        FROM first_wk GROUP BY cohort_week
    )
"""


def _tagged(spark: SparkSession, sf_dir: str):
    """Spark twin of the oracle's tagged purchases + cohort sizes."""
    ev = _t(spark, sf_dir, "events")
    pur = (ev.where(F.col("event_type") == "purchase")
           .select("user_id",
                   F.round(F.col("value") * 100).cast("long")
                   .alias("cents"),
                   F.expr("(day(ts) - 1) div 7").alias("wk")))
    # cached (r14, guide §2.4): first_wk feeds BOTH the tagged join and
    # the cohort-size aggregate — un-cached each re-ran the purchase
    # scan + per-user min, 3 events scans per consumer row (plan
    # census); cached it is 2 (the tagged pur side + one cache build).
    # One row per purchasing user — the smallest frame in the query.
    first_wk = pur.groupBy("user_id").agg(F.min("wk").alias("cohort_week")) \
        .cache()
    tagged = (pur.join(first_wk, "user_id")
              .select("user_id", "cents", "cohort_week",
                      (F.col("wk") - F.col("cohort_week"))
                      .alias("age_week")))
    sizes = first_wk.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users"))
    return tagged, sizes


@query(
    "ltv_cohort_curves",
    oracle=f"""
    WITH {_COHORT},
    cells AS (
        SELECT cohort_week, age_week, sum(cents) AS rev
        FROM tagged GROUP BY cohort_week, age_week
    ),
    cum AS (
        SELECT cohort_week, age_week,
               CAST(sum(rev) OVER (PARTITION BY cohort_week
                                   ORDER BY age_week
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_cents
        FROM cells
    )
    SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
           CAST(c.age_week AS BIGINT) AS age_week,
           CAST(s.n_users AS BIGINT) AS n_users,
           c.cum_cents,
           round(CAST(c.cum_cents AS DOUBLE) / s.n_users / 100, 4)
               AS ltv_per_user
    FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week
    ORDER BY cohort_week, age_week
    """,
)
def ltv_cohort_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LTV curve table: cumulative purchase revenue per cohort
    user, by first-purchase-week cohort and cohort age — the triangle
    a growth model extrapolates payback and long-run value from.

    Scale: revenue cells collapse to |cohorts|×|ages| rows before the
    per-cohort cumulative window; cohort sizes broadcast."""
    tagged, sizes = _tagged(spark, sf_dir)
    cells = (tagged.groupBy("cohort_week", "age_week")
             .agg(F.sum("cents").alias("rev")))
    w = (Window.partitionBy("cohort_week").orderBy("age_week")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = cells.select("cohort_week", "age_week",
                       F.sum("rev").over(w).cast("long")
                       .alias("cum_cents"))
    return (cum.join(F.broadcast(sizes), "cohort_week")
            .select(F.col("cohort_week").cast("long").alias("cohort_week"),
                    F.col("age_week").cast("long").alias("age_week"),
                    F.col("n_users").cast("long").alias("n_users"),
                    "cum_cents",
                    F.round(F.col("cum_cents").cast("double")
                            / F.col("n_users") / 100, 4)
                    .alias("ltv_per_user"))
            .orderBy("cohort_week", "age_week"))


@query(
    "arpu_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(day(ts) AS BIGINT) AS day,
               count(DISTINCT user_id) AS active_users,
               count(DISTINCT user_id)
                   FILTER (WHERE event_type = 'purchase') AS payers,
               COALESCE(sum(CAST(round(value * 100) AS BIGINT))
                        FILTER (WHERE event_type = 'purchase'), 0) AS rev
        FROM events GROUP BY day(ts)
    )
    SELECT day, CAST(active_users AS BIGINT) AS active_users,
           CAST(payers AS BIGINT) AS paying_users,
           CAST(rev AS BIGINT) AS revenue_cents,
           round(CAST(rev AS DOUBLE) / active_users / 100, 4) AS arpu,
           round(CAST(payers AS DOUBLE) / active_users, 6) AS paying_share
    FROM daily ORDER BY day
    """,
)
def arpu_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily ARPU: purchase revenue over distinct active users, with
    the paying-user share — the top-line monetization trend.

    Scale: one aggregation by day with two distinct-count legs (Spark
    expands them into one shuffle); revenue is an exact cents sum."""
    ev = _t(spark, sf_dir, "events")
    is_pur = F.col("event_type") == "purchase"
    daily = (ev.groupBy(F.dayofmonth("ts").cast("long").alias("day"))
             .agg(F.countDistinct("user_id").alias("active_users"),
                  F.countDistinct(F.when(is_pur, F.col("user_id")))
                  .alias("payers"),
                  F.coalesce(
                      F.sum(F.when(is_pur, F.round(F.col("value") * 100)
                                   .cast("long"))), F.lit(0))
                  .alias("rev")))
    return daily.select(
        "day", F.col("active_users").cast("long").alias("active_users"),
        F.col("payers").cast("long").alias("paying_users"),
        F.col("rev").cast("long").alias("revenue_cents"),
        F.round(F.col("rev").cast("double") / F.col("active_users") / 100,
                4).alias("arpu"),
        F.round(F.col("payers").cast("double") / F.col("active_users"), 6)
        .alias("paying_share")).orderBy("day")


@query(
    "cohort_payback_week",
    oracle=f"""
    WITH {_COHORT},
    cells AS (
        SELECT cohort_week, age_week, sum(cents) AS rev
        FROM tagged GROUP BY cohort_week, age_week
    ),
    cum AS (
        SELECT cohort_week, age_week,
               CAST(sum(rev) OVER (PARTITION BY cohort_week
                                   ORDER BY age_week
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_cents
        FROM cells
    ),
    final AS (
        SELECT cohort_week, max(cum_cents) AS total_cents
        FROM cum GROUP BY cohort_week
    )
    SELECT CAST(s.cohort_week AS BIGINT) AS cohort_week,
           CAST(s.n_users AS BIGINT) AS n_users,
           COALESCE((SELECT CAST(min(c.age_week) AS BIGINT) FROM cum c
                     WHERE c.cohort_week = s.cohort_week
                       AND c.cum_cents >= 3000 * s.n_users), -1)
               AS payback_week,
           round(CAST(f.total_cents AS DOUBLE) / s.n_users / 100, 4)
               AS final_ltv
    FROM sizes s JOIN final f ON s.cohort_week = f.cohort_week
    ORDER BY cohort_week
    """,
)
def cohort_payback_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAC payback by cohort: the first cohort age (weeks) at which
    cumulative revenue per user covers a $30 acquisition cost, decided
    by the EXACT integer test cum_cents ≥ 3000·n_users (−1 = not yet
    paid back inside the observed window), next to the cohort's final
    observed LTV.

    Scale: same tiny cumulative frame as the LTV curve; the payback
    pick is a conditional min."""
    tagged, sizes = _tagged(spark, sf_dir)
    cells = (tagged.groupBy("cohort_week", "age_week")
             .agg(F.sum("cents").alias("rev")))
    w = (Window.partitionBy("cohort_week").orderBy("age_week")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = cells.select("cohort_week", "age_week",
                       F.sum("rev").over(w).cast("long")
                       .alias("cum_cents"))
    per = (cum.join(F.broadcast(sizes), "cohort_week")
           .groupBy("cohort_week", "n_users")
           .agg(F.min(F.when(F.col("cum_cents")
                             >= 3000 * F.col("n_users"),
                             F.col("age_week"))).alias("pw"),
                F.max("cum_cents").alias("total_cents")))
    return per.select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        F.col("n_users").cast("long").alias("n_users"),
        F.coalesce(F.col("pw").cast("long"), F.lit(-1).cast("long"))
        .alias("payback_week"),
        F.round(F.col("total_cents").cast("double")
                / F.col("n_users") / 100, 4).alias("final_ltv")
    ).orderBy("cohort_week")
