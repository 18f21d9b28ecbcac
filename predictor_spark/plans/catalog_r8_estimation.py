"""Catalog part — statistical estimation classics (STAGED for r8).

Three estimators every analytics platform eventually reaches for,
each a pure closed form over exact integer sufficient statistics:

- gumbel_return_level     extreme-value analysis (Gumbel 1958):
                          method-of-moments Gumbel fit over daily
                          maxima + the 100-day return level — the
                          capacity-planning / tail-risk readout
- horvitz_thompson_total  Horvitz & Thompson (1952) unequal-
                          probability estimator: a deterministic
                          two-rate Poisson sample of users, the
                          unbiased total + its variance estimate,
                          next to the true total
- lincoln_petersen_users  capture-recapture population estimate
                          (Chapman's 1951 correction): week-1 and
                          week-3 actives as the two capture occasions

Determinism: all moments are exact integer sums; constants (Euler-
Mascheroni, sqrt(6)/pi) ride as shared literals; each output is one
closed-form expression, rationals rounded at integer scale.

Scale: each estimator is one map-side aggregation (daily maxima /
per-user flags reduce the stream before anything shuffles); the
estimation math is O(|groups|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

_EULER = 0.5772156649015329
_SQRT6_PI = 0.779696801233676    # sqrt(6)/pi, shared literal
_SPLIT1 = "DATE '2024-01-08'"    # capture occasion 1: first week
_SPLIT2A = "DATE '2024-01-15'"   # capture occasion 2: third week
_SPLIT2B = "DATE '2024-01-22'"


@query(
    "gumbel_return_level",
    oracle=f"""
    WITH maxima AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               max(CAST(round(value * 100) AS BIGINT)) AS mx
        FROM events GROUP BY 1, 2
    ),
    mom AS (
        SELECT event_type, count(*) AS n,
               sum(mx) AS s1, sum(CAST(mx AS HUGEINT) * mx) AS s2
        FROM maxima GROUP BY 1
    ),
    fit AS (
        SELECT event_type, n,
               CAST(s1 AS DOUBLE) / n / 100.0 AS xbar,
               sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                    / (n - 1)) / 100.0 AS s
        FROM mom
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(s * {_SQRT6_PI}, 6) AS gumbel_beta,
           round(xbar - {_EULER} * (s * {_SQRT6_PI}), 6) AS gumbel_mu,
           round(xbar - {_EULER} * (s * {_SQRT6_PI})
                 - (s * {_SQRT6_PI}) * ln(-ln(0.99)), 6)
               AS return_level_100d
    FROM fit ORDER BY event_type
    """,
)
def gumbel_return_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments Gumbel fit over each series' daily maxima
    (block-maxima EVT): beta = s·sqrt(6)/pi, mu = x̄ − gamma·beta; the
    T-day return level is mu − beta·ln(−ln(1 − 1/T)), T = 100 — the
    value exceeded on average once per 100 days if tails are Gumbel.

    Scale: daily maxima are a map-side rollup; the fit is a 5-number
    aggregate per series."""
    ev = _t(spark, sf_dir, "events")
    maxima = (ev.select("event_type", F.col("ts").cast("date").alias("day"),
                        F.round(F.col("value") * 100).cast("long")
                        .alias("cents"))
              .groupBy("event_type", "day")
              .agg(F.max("cents").alias("mx")))
    mom = (maxima.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("mx").alias("s1"),
                F.sum(F.col("mx").cast("decimal(38,0)") * F.col("mx"))
                .alias("s2")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    xbar = d("s1") / F.col("n") / 100.0
    s = F.sqrt((d("s2") - d("s1") * F.col("s1") / F.col("n"))
               / (F.col("n") - 1)) / 100.0
    beta = s * _SQRT6_PI
    mu = xbar - _EULER * beta
    return (mom.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(mu - beta * F.log(-F.log(F.lit(0.99))), 6)
        .alias("return_level_100d"))
        .orderBy("event_type"))


_U28 = ("(CAST(('0x' || substr(md5('ht|' || CAST(user_id AS VARCHAR)), 1, 7))"
        " AS BIGINT) + 0.5) / 268435456.0")


@query(
    "horvitz_thompson_total",
    oracle=f"""
    WITH users AS (
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'purchase') AS y,
               CASE WHEN user_id % 2 = 0 THEN 0.1 ELSE 0.3 END AS pi,
               {_U28} AS u
        FROM events GROUP BY user_id
    ),
    agg AS (
        SELECT count(*) FILTER (WHERE u < pi) AS n_sampled,
               COALESCE(sum(y) FILTER (WHERE u < pi AND user_id % 2 = 0),
                        0) AS sy_even,
               COALESCE(sum(y) FILTER (WHERE u < pi AND user_id % 2 <> 0),
                        0) AS sy_odd,
               COALESCE(sum(y * y) FILTER (WHERE u < pi AND user_id % 2 = 0),
                        0) AS syy_even,
               COALESCE(sum(y * y) FILTER (WHERE u < pi AND user_id % 2 <> 0),
                        0) AS syy_odd,
               sum(y) AS truth
        FROM users
    )
    SELECT CAST(n_sampled AS BIGINT) AS n_sampled,
           round((CAST(sy_even AS DOUBLE) * 10.0
                  + CAST(sy_odd AS DOUBLE) / 0.3) * 10000.0) / 10000.0
               AS ht_total,
           round((CAST(syy_even AS DOUBLE) * 0.9 / 0.01
                  + CAST(syy_odd AS DOUBLE) * 0.7 / 0.09) * 100.0) / 100.0
               AS ht_variance,
           CAST(truth AS BIGINT) AS true_total
    FROM agg
    """,
)
def horvitz_thompson_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HT estimator of the total purchase count under deterministic
    two-rate Poisson sampling (pi = 0.1 even users / 0.3 odd users,
    content-stable md5 coin): total̂ = Σ y_i/pi_i over the sample, with
    the Poisson-sampling variance estimate Σ (1−pi)/pi²·y_i² — the
    design-unbiased answer a platform computes when it can only afford
    to scan a user sample, reported next to the full-scan truth.

    Scale: the sample membership is a per-row expression inside the
    same per-user aggregation — the estimator costs one pass over the
    SAMPLE at 100 TB (here both legs run for the truth column).

    Determinism: pi takes only two values, so the sufficient statistics
    are EXACT integer sums per pi-stratum (Σy and Σy² over the sampled
    even/odd users); the 1/pi and (1−pi)/pi² factors are applied once to
    the two exact totals, making the result independent of partition
    order (a distributed float Σ y/pi is not)."""
    ev = _t(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("y")))
    even = F.col("user_id") % 2 == 0
    pi = F.when(even, 0.1).otherwise(0.3)
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit("ht|"), F.col("user_id").cast("string"))),
        1, 7), 16, 10).cast("long") + 0.5) / 268435456.0)
    tagged = users.select("y", even.alias("even"), pi.alias("pi"),
                          u.alias("u"))
    samp = F.col("u") < F.col("pi")
    agg = tagged.agg(
        F.sum(F.when(samp, 1).otherwise(0)).alias("n_sampled"),
        F.coalesce(F.sum(F.when(samp & F.col("even"), F.col("y"))),
                   F.lit(0)).alias("sy_even"),
        F.coalesce(F.sum(F.when(samp & ~F.col("even"), F.col("y"))),
                   F.lit(0)).alias("sy_odd"),
        F.coalesce(F.sum(F.when(samp & F.col("even"),
                                F.col("y") * F.col("y"))),
                   F.lit(0)).alias("syy_even"),
        F.coalesce(F.sum(F.when(samp & ~F.col("even"),
                                F.col("y") * F.col("y"))),
                   F.lit(0)).alias("syy_odd"),
        F.sum("y").alias("truth"))
    ht = (F.col("sy_even").cast("double") * 10.0
          + F.col("sy_odd").cast("double") / 0.3)
    vhat = (F.col("syy_even").cast("double") * 0.9 / 0.01
            + F.col("syy_odd").cast("double") * 0.7 / 0.09)
    return agg.select(
        F.col("n_sampled").cast("long").alias("n_sampled"),
        (F.round(ht * 10000.0) / 10000.0).alias("ht_total"),
        (F.round(vhat * 100.0) / 100.0).alias("ht_variance"),
        F.col("truth").cast("long").alias("true_total"))


@query(
    "lincoln_petersen_users",
    oracle=f"""
    WITH occ AS (
        SELECT user_id,
               max(CASE WHEN ts < {_SPLIT1} THEN 1 ELSE 0 END) AS c1,
               max(CASE WHEN ts >= {_SPLIT2A} AND ts < {_SPLIT2B}
                        THEN 1 ELSE 0 END) AS c2
        FROM events GROUP BY user_id
    ),
    agg AS (
        SELECT sum(c1) AS n1, sum(c2) AS n2,
               sum(c1 * c2) AS m, count(*) AS truth
        FROM occ
    )
    SELECT CAST(n1 AS BIGINT) AS n_capture1,
           CAST(n2 AS BIGINT) AS n_capture2,
           CAST(m AS BIGINT) AS n_recaptured,
           round(CAST((n1 + 1) * (n2 + 1) AS DOUBLE) * 10000.0 / (m + 1))
               / 10000.0 - 1 AS chapman_estimate,
           CAST(truth AS BIGINT) AS true_users
    FROM agg
    """,
)
def lincoln_petersen_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture estimate of the active-user population from
    two capture occasions (week 1 and week 3 actives), Chapman's
    bias-corrected form (n1+1)(n2+1)/(m+1) − 1, next to the true
    distinct-user count the estimator is trying to recover.

    Scale: per-user capture flags fold into one aggregation; the
    estimate is a 1-row formula — the pattern for estimating
    population sizes two logs can see but no log scans fully."""
    ev = _t(spark, sf_dir, "events")
    s1 = F.lit("2024-01-08").cast("date")
    s2a = F.lit("2024-01-15").cast("date")
    s2b = F.lit("2024-01-22").cast("date")
    occ = (ev.groupBy("user_id")
           .agg(F.max(F.when(F.col("ts") < s1, 1).otherwise(0)).alias("c1"),
                F.max(F.when((F.col("ts") >= s2a) & (F.col("ts") < s2b), 1)
                      .otherwise(0)).alias("c2")))
    agg = occ.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"),
                  F.sum(F.col("c1") * F.col("c2")).alias("m"),
                  F.count(F.lit(1)).alias("truth"))
    return agg.select(
        F.col("n1").cast("long").alias("n_capture1"),
        F.col("n2").cast("long").alias("n_capture2"),
        F.col("m").cast("long").alias("n_recaptured"),
        (F.round(((F.col("n1") + 1) * (F.col("n2") + 1)).cast("double")
                 * 10000.0 / (F.col("m") + 1)) / 10000.0 - 1)
        .alias("chapman_estimate"),
        F.col("truth").cast("long").alias("true_users"))
