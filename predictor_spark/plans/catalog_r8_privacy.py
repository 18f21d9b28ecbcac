"""Catalog part — privacy mechanisms (STAGED for r8).

Completes the governance surface (catalog_r7_governance.py:
k-anonymity, l-diversity, re-identification risk — the DIAGNOSTIC
half) with the two canonical RELEASE mechanisms a 100 TB platform
publishes aggregates through:

- dp_histogram_laplace      ε-differentially-private histogram via
                            the Laplace mechanism (Dwork, McSherry,
                            Nissim & Smith, TCC 2006), ε = 1,
                            sensitivity 1
- randomized_response_share Warner's randomized response (Warner,
                            JASA 1965): per-user plausible-deniability
                            bit flips + the unbiased share estimator

Determinism: "randomness" is the engine's content-stable md5-prefix
uniform (the dataset_split / weighted-sample idiom — same 28-bit
integer on both engines); the Laplace draw is the exact inverse-CDF
transform of that uniform, one closed-form expression.  Counts are
exact integers; ln/sign run once per output row.

Scale: both are one map-side aggregation over the fact stream (the
noise is per-GROUP, O(|groups|) draws; the response flips are per-row
expressions folded into the same pass) — the mechanism costs nothing
over the non-private rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

_EPS = 1.0      # privacy budget for the histogram release
_P_TRUTH = 0.75  # Warner's truth probability (3/4 via a 2-bit coin)

#: 28-bit md5-prefix uniform in (0,1), oracle side
_U28 = ("(CAST(('0x' || substr(md5({key}), 1, 7)) AS BIGINT) + 0.5)"
        " / 268435456.0")


@query(
    "dp_histogram_laplace",
    oracle=f"""
    WITH hist AS (
        SELECT event_type, count(*) AS true_count
        FROM events GROUP BY 1
    ),
    noised AS (
        SELECT event_type, true_count,
               {_U28.format(key="'dp|' || event_type")} - 0.5 AS v
        FROM hist
    )
    SELECT event_type, CAST(true_count AS BIGINT) AS true_count,
           round(-sign(v) * ln(1.0 - 2.0 * abs(v)) / {_EPS}, 6)
               AS laplace_noise,
           round(true_count
                 - sign(v) * ln(1.0 - 2.0 * abs(v)) / {_EPS}, 6)
               AS dp_count
    FROM noised ORDER BY event_type
    """,
)
def dp_histogram_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP histogram of event counts: each cell gets Laplace(1/ε)
    noise drawn by inverse CDF — noise = −sign(v)·ln(1−2|v|)/ε with
    v = u − ½ and u the cell's content-stable md5 uniform (a SEEDED
    release: same table, same noise — the reproducible-pipeline
    variant of the mechanism; swap the key for a salt per release).

    Scale: the histogram is one map-side aggregation; the draw is one
    expression per GROUP (5 rows here), zero extra passes."""
    ev = _t(spark, sf_dir, "events")
    hist = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_count"))
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit("dp|"), F.col("event_type"))), 1, 7), 16, 10)
        .cast("long") + 0.5) / 268435456.0)
    v = u - 0.5
    noise = -F.signum(v) * F.log(1.0 - 2.0 * F.abs(v)) / _EPS
    return (hist.select(
        "event_type",
        F.col("true_count").cast("long").alias("true_count"),
        F.round(noise, 6).alias("laplace_noise"),
        F.round(F.col("true_count") + noise, 6).alias("dp_count"))
        .orderBy("event_type"))


@query(
    "randomized_response_share",
    oracle=f"""
    WITH users AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS truth
        FROM events GROUP BY 1
    ),
    flipped AS (
        SELECT truth,
               CASE WHEN {_U28.format(key="'rr|' || CAST(user_id AS VARCHAR)")}
                         < {_P_TRUTH}
                    THEN truth ELSE 1 - truth END AS reported
        FROM users
    ),
    agg AS (
        SELECT count(*) AS n, sum(truth) AS t, sum(reported) AS r
        FROM flipped
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(CAST(t AS DOUBLE) / n, 6) AS true_share,
           round(CAST(r AS DOUBLE) / n, 6) AS reported_share,
           round((CAST(r AS DOUBLE) / n - {1 - _P_TRUTH})
                 / {2 * _P_TRUTH - 1}, 6) AS estimated_share
    FROM agg
    """,
)
def randomized_response_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner's randomized response over the per-user purchase bit:
    each user reports the truth with p = 3/4 (content-stable md5
    coin), else the opposite; the collector publishes the unbiased
    estimator π̂ = (λ̂ − (1−p)) / (2p − 1) next to the (normally
    unobservable) true share — the mechanism's calibration readout.

    Scale: one events scan to per-user bits, the flip is a per-row
    expression in the same pass, a 3-number aggregate leaves."""
    ev = _t(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("truth")))
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit("rr|"), F.col("user_id").cast("string"))),
        1, 7), 16, 10).cast("long") + 0.5) / 268435456.0)
    reported = F.when(u < _P_TRUTH, F.col("truth")).otherwise(
        1 - F.col("truth"))
    agg = users.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("truth").alias("t"),
        F.sum(reported).alias("r"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(d("t") / F.col("n"), 6).alias("true_share"),
        F.round(d("r") / F.col("n"), 6).alias("reported_share"),
        F.round((d("r") / F.col("n") - (1 - _P_TRUTH))
                / (2 * _P_TRUTH - 1), 6).alias("estimated_share"))
