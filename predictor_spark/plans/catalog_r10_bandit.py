"""Catalog part — multi-armed-bandit readouts (STAGED r10).

The deterministic decision-layer readouts an experimentation platform
computes from logged arm pulls (arms = event types, a pull's binary
reward = "high-value event", value > $50):

- ucb1_arm_scores     UCB1 upper confidence bounds (Auer, Cesa-Bianchi
                      & Fischer 2002): mean + sqrt(2 ln N / n) per arm
                      — which arm a UCB policy would pull NEXT given
                      the logged history
- beta_posterior_arms Beta-Bernoulli posterior per arm (the Thompson-
                      sampling state): Beta(1+s, 1+f) mean, sd and
                      normal-approximation 95% interval

No randomness anywhere: these are the *posterior/bound computations*
(the deterministic half of a bandit loop), not simulated draws.

Determinism: pulls and successes are exact integer counts; each
score is a fixed expression tree over the two integers per arm (ln
and sqrt are the libm calls the KM family has kept green since r1),
rounded 6 dp in-query.

Scale: one map-side-combinable count/sum aggregation over the event
log; N broadcasts as a 1-row scalar frame. The readout costs one scan
no matter how many pulls are logged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

#: binary reward: the event's value exceeds $50 (exact integer cents)
_REWARD_SQL = "CAST(round(value * 100) AS BIGINT) > 5000"


def _arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm pull and success counts (exact integers)."""
    ev = _t(spark, sf_dir, "events")
    reward = F.round(F.col("value") * 100).cast("long") > 5000
    return (ev.groupBy(F.col("event_type").alias("arm"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(reward, 1).otherwise(0)).alias("s")))


@query(
    "ucb1_arm_scores",
    oracle=f"""
    WITH arms AS (
        SELECT event_type AS arm, count(*) AS n,
               count(*) FILTER (WHERE {_REWARD_SQL}) AS s
        FROM events GROUP BY event_type
    ),
    tot AS (SELECT sum(n) AS big_n FROM arms)
    SELECT arm, CAST(n AS BIGINT) AS n_pulls, CAST(s AS BIGINT) AS n_rewards,
           round(CAST(s AS DOUBLE) / n, 6) AS mean_reward,
           round(CAST(s AS DOUBLE) / n
                 + sqrt(2 * ln(CAST(big_n AS DOUBLE)) / n), 6)
               AS ucb1_score
    FROM arms, tot ORDER BY arm
    """,
)
def ucb1_arm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 score per arm over the logged pull history: empirical mean
    reward plus the sqrt(2 ln N / n) exploration bonus — the arm with
    the highest score is the one a UCB1 policy pulls next, and the
    bonus column shows how much of each score is uncertainty.

    Scale: one aggregation; the total-pulls scalar is a window sum
    over the ≤|arms|-row frame (a second scan of events just to total
    the per-arm counts would double the IO)."""
    from pyspark.sql import Window

    arms = _arms(spark, sf_dir)
    arms = arms.withColumn(
        "big_n", F.sum("n").over(Window.partitionBy(F.lit(1))))
    mean = F.col("s").cast("double") / F.col("n")
    bonus = F.sqrt(2 * F.log(F.col("big_n").cast("double")) / F.col("n"))
    return (arms
            .select("arm", F.col("n").cast("long").alias("n_pulls"),
                    F.col("s").cast("long").alias("n_rewards"),
                    F.round(mean, 6).alias("mean_reward"),
                    F.round(mean + bonus, 6).alias("ucb1_score"))
            .orderBy("arm"))


@query(
    "beta_posterior_arms",
    oracle=f"""
    WITH arms AS (
        SELECT event_type AS arm, count(*) AS n,
               count(*) FILTER (WHERE {_REWARD_SQL}) AS s
        FROM events GROUP BY event_type
    )
    SELECT arm,
           CAST(1 + s AS BIGINT) AS alpha,
           CAST(1 + n - s AS BIGINT) AS beta,
           round(CAST(1 + s AS DOUBLE) / (2 + n), 6) AS post_mean,
           round(sqrt(CAST(1 + s AS DOUBLE) * (1 + n - s)
                      / ((2.0 + n) * (2.0 + n) * (3.0 + n))), 6) AS post_sd,
           round(CAST(1 + s AS DOUBLE) / (2 + n)
                 - 1.96 * sqrt(CAST(1 + s AS DOUBLE) * (1 + n - s)
                               / ((2.0 + n) * (2.0 + n) * (3.0 + n))), 6)
               AS ci_lo,
           round(CAST(1 + s AS DOUBLE) / (2 + n)
                 + 1.96 * sqrt(CAST(1 + s AS DOUBLE) * (1 + n - s)
                               / ((2.0 + n) * (2.0 + n) * (3.0 + n))), 6)
               AS ci_hi
    FROM arms ORDER BY arm
    """,
)
def beta_posterior_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta-Bernoulli posterior per arm under a uniform Beta(1,1)
    prior — the sufficient state a Thompson sampler keeps: Beta(1+s,
    1+f) with mean α/(α+β), sd sqrt(αβ/((α+β)²(α+β+1))), and the
    normal-approximation 95% credible interval. The variance rides
    doubles (the exact integer αβ product would overflow int64 at
    warehouse scale) through the SAME expression tree on both engines.

    Scale: one aggregation pass; every arm's posterior is a
    constant-time formula over its two counters."""
    arms = _arms(spark, sf_dir)
    a = (1 + F.col("s")).cast("double")
    b = (1 + F.col("n") - F.col("s")).cast("double")
    mean = a / (2.0 + F.col("n"))
    sd = F.sqrt(a * b / ((2.0 + F.col("n")) * (2.0 + F.col("n"))
                         * (3.0 + F.col("n"))))
    return arms.select(
        "arm", (1 + F.col("s")).cast("long").alias("alpha"),
        (1 + F.col("n") - F.col("s")).cast("long").alias("beta"),
        F.round(mean, 6).alias("post_mean"),
        F.round(sd, 6).alias("post_sd"),
        F.round(mean - 1.96 * sd, 6).alias("ci_lo"),
        F.round(mean + 1.96 * sd, 6).alias("ci_hi")).orderBy("arm")
