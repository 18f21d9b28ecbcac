"""Catalog part — survival analysis beyond Kaplan-Meier (STAGED r10).

Extends the signup→first-purchase survival framing of
survival_km_conversion (catalog_behavior.py:157 — hours to convert,
administratively right-censored at 72 h) with the three classical
companions every survival report carries (the Nelson-Aalen hazard
itself already ships as nelson_aalen_hazard,
catalog_r7_metrics2.py:157 — this family adds the TESTS on top of
the curves):

- logrank_signup_cohorts the two-sample log-rank test (Mantel 1966)
                         between even/odd user cohorts: O−E, variance,
                         z and χ² on one row
- rmst_signup_72h        restricted mean survival time up to τ = 72 h:
                         the area under the KM step curve (Royston &
                         Parmar 2013) — "expected hours not yet
                         converted within 3 days"

Determinism: deaths and risk sets are exact integers; every float
(d/n hazard terms, log-rank E/V terms, KM segment areas) is summed in
EXPLICIT event-time order via cumulative windows — never a
partition-order-dependent blind SUM — and the single final row/curve
is rounded in-query. The KM survival factor uses the same
exp(Σ ln(1−d/n)) ordered form survival_km_conversion has kept green
since r1.

Scale: two user-keyed shuffles build the per-user observation, then
everything collapses to ≤73 distinct duration rows; the estimator
windows run over that tiny frame. Nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: oracle prelude: per-user duration/censor observation + per-time counts,
#: the survival_km_conversion construction with an even/odd cohort tag
_OBS = """
    su AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT su.user_id, su.t0, min(e.ts) AS t1
        FROM su LEFT JOIN events e
          ON e.user_id = su.user_id AND e.event_type = 'purchase'
         AND e.ts > su.t0
        GROUP BY su.user_id, su.t0
    ),
    obs AS (
        SELECT user_id, user_id % 2 = 0 AS g1,
               CASE WHEN t1 IS NULL THEN CAST(72 AS BIGINT)
                    ELSE least(CAST(floor((epoch_us(t1) - epoch_us(t0))
                                          / 3600e6) AS BIGINT), 72) END AS t,
               t1 IS NOT NULL
                   AND floor((epoch_us(t1) - epoch_us(t0)) / 3600e6) <= 72
                   AS died
        FROM conv
    ),
    per_t AS (
        SELECT t, count(*) AS ucnt,
               CAST(count(*) FILTER (died) AS BIGINT) AS d,
               CAST(count(*) FILTER (g1) AS BIGINT) AS ucnt1,
               CAST(count(*) FILTER (died AND g1) AS BIGINT) AS d1
        FROM obs GROUP BY t
    ),
    risk AS (
        SELECT t, d, d1,
               CAST(sum(ucnt) OVER (ORDER BY t DESC ROWS UNBOUNDED
                                    PRECEDING) AS BIGINT) AS n_risk,
               CAST(sum(ucnt1) OVER (ORDER BY t DESC ROWS UNBOUNDED
                                     PRECEDING) AS BIGINT) AS n_risk1
        FROM per_t
    )
"""


def _risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the oracle's `risk`: one row per distinct duration
    with deaths and risk sets, overall and for the even-user cohort."""
    ev = _t(spark, sf_dir, "events")
    su = (ev.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t0")))
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("pts"))
    conv = (su.join(pur, (F.col("user_id") == F.col("p_uid"))
                    & (F.col("pts") > F.col("t0")), "left")
            .groupBy("user_id", "t0").agg(F.min("pts").alias("t1")))
    dur = F.floor((F.unix_micros("t1") - F.unix_micros("t0"))
                  / F.lit(3600e6))
    obs = conv.select(
        "user_id", (F.col("user_id") % 2 == 0).alias("g1"),
        F.when(F.col("t1").isNull(), F.lit(72).cast("long"))
        .otherwise(F.least(dur.cast("long"), F.lit(72).cast("long")))
        .alias("t"),
        (F.col("t1").isNotNull() & (dur <= 72)).alias("died"))
    per_t = obs.groupBy("t").agg(
        F.count(F.lit(1)).alias("ucnt"),
        F.sum(F.when(F.col("died"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("ucnt1"),
        F.sum(F.when(F.col("died") & F.col("g1"), 1).otherwise(0))
        .cast("long").alias("d1"))
    wdesc = Window.orderBy(F.col("t").desc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    return per_t.select(
        "t", "d", "d1",
        F.sum("ucnt").over(wdesc).cast("long").alias("n_risk"),
        F.sum("ucnt1").over(wdesc).cast("long").alias("n_risk1"))


@query(
    "logrank_signup_cohorts",
    oracle=f"""
    WITH {_OBS},
    terms AS (
        SELECT t, d1,
               CAST(n_risk1 AS DOUBLE) * d / n_risk AS e1,
               CASE WHEN n_risk > 1 THEN
                   CAST(d AS DOUBLE) * (CAST(n_risk1 AS DOUBLE) / n_risk)
                   * (1 - CAST(n_risk1 AS DOUBLE) / n_risk)
                   * (n_risk - d) / (n_risk - 1)
               ELSE 0.0 END AS v
        FROM risk WHERE d > 0
    ),
    cum AS (
        SELECT sum(d1) OVER w AS o1, sum(e1) OVER w AS e1,
               sum(v) OVER w AS v,
               row_number() OVER (ORDER BY t DESC) AS rn
        FROM terms
        WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(o1 AS BIGINT) AS observed_g1,
           round(e1, 6) AS expected_g1,
           round(v, 6) AS variance,
           round((o1 - e1) / sqrt(v), 6) AS logrank_z,
           round((o1 - e1) * (o1 - e1) / v, 6) AS logrank_chi2
    FROM cum WHERE rn = 1
    """,
)
def logrank_signup_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test of conversion-time equality between the
    even-user and odd-user cohorts: at each death time the even cohort's
    observed deaths are compared to the hypergeometric expectation
    n1·d/n with variance d·(n1/n)(1−n1/n)(n−d)/(n−1); the O−E, V sums
    run as ordered cumulative windows (float determinism) and the last
    row yields z and χ².

    Scale: the whole test is three window sums over the ≤73-row risk
    frame above the same two user-keyed shuffles KM already pays."""
    risk = _risk(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    terms = (risk.where(F.col("d") > 0)
             .select("t", "d1",
                     (d("n_risk1") * F.col("d") / F.col("n_risk"))
                     .alias("e1"),
                     F.when(F.col("n_risk") > 1,
                            d("d") * (d("n_risk1") / F.col("n_risk"))
                            * (1 - d("n_risk1") / F.col("n_risk"))
                            * (F.col("n_risk") - F.col("d"))
                            / (F.col("n_risk") - 1))
                     .otherwise(0.0).alias("v")))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    cum = terms.select(
        F.sum("d1").over(w).alias("o1"),
        F.sum("e1").over(w).alias("e1"),
        F.sum("v").over(w).alias("v"),
        F.row_number().over(Window.orderBy(F.col("t").desc())).alias("rn"))
    z = (F.col("o1") - F.col("e1")) / F.sqrt(F.col("v"))
    return (cum.where(F.col("rn") == 1)
            .select(F.col("o1").cast("long").alias("observed_g1"),
                    F.round("e1", 6).alias("expected_g1"),
                    F.round("v", 6).alias("variance"),
                    F.round(z, 6).alias("logrank_z"),
                    F.round((F.col("o1") - F.col("e1"))
                            * (F.col("o1") - F.col("e1")) / F.col("v"), 6)
                    .alias("logrank_chi2")))


@query(
    "rmst_signup_72h",
    oracle=f"""
    WITH {_OBS},
    km AS (
        SELECT t,
               exp(sum(ln(1.0 - CAST(d AS DOUBLE) / n_risk))
                   OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) AS surv
        FROM risk WHERE d > 0
    ),
    seg AS (
        SELECT t, surv,
               surv * (coalesce(lead(t) OVER (ORDER BY t), 72) - t) AS area,
               row_number() OVER (ORDER BY t DESC) AS rn
        FROM km
    ),
    cum AS (
        SELECT (SELECT min(t) FROM km)
                   + sum(area) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   AS rmst,
               (SELECT CAST(count(*) AS BIGINT) FROM km) AS k,
               (SELECT CAST(min(t) AS BIGINT) FROM km) AS first_death_h,
               rn
        FROM seg
    )
    SELECT k AS n_death_times, first_death_h,
           round(rmst, 4) AS rmst_h
    FROM cum WHERE rn = 1
    """,
)
def rmst_signup_72h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time to τ = 72 h: the area under the
    KM step curve — S = 1 from 0 to the first death time, then each
    S(t_i)·(t_{i+1}−t_i) segment, closing at τ. Answers "on average,
    how many of the first 72 hours does a signup spend unconverted?".
    Segment areas accumulate in explicit time order.

    Scale: same ≤73-row risk frame; the KM product and the area sum
    are two ordered windows over it. risk is cached (r14, guide §2.4):
    km feeds BOTH the segment-area path and the (min, count) aggregate,
    and un-cached each re-derived the whole signup/purchase
    observation build — 4 events scans per invocation (plan census);
    cached it is the two pushed-predicate scans, once."""
    risk = _risk(spark, sf_dir).cache()
    wasc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    km = (risk.where(F.col("d") > 0)
          .select("t", F.exp(F.sum(F.log(1.0 - F.col("d").cast("double")
                                         / F.col("n_risk"))).over(wasc))
                  .alias("surv")))
    seg = km.select(
        "t", "surv",
        (F.col("surv") * (F.coalesce(F.lead("t").over(Window.orderBy("t")),
                                     F.lit(72)) - F.col("t"))).alias("area"),
        F.row_number().over(Window.orderBy(F.col("t").desc())).alias("rn"))
    firsts = km.agg(F.min("t").alias("first_death_h"),
                    F.count(F.lit(1)).alias("k"))
    cum = (seg.select(
        F.sum("area").over(wasc).alias("area_cum"), "rn")
        .where(F.col("rn") == 1))
    return (cum.crossJoin(F.broadcast(firsts))
            .select(F.col("k").cast("long").alias("n_death_times"),
                    F.col("first_death_h").cast("long")
                    .alias("first_death_h"),
                    F.round(F.col("first_death_h") + F.col("area_cum"), 4)
                    .alias("rmst_h")))