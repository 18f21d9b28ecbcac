"""Catalog part — distribution goodness-of-fit tests (STAGED for r9).

The test battery (kruskal_wallis, spearman, cents_digit_uniformity,
energy/CvM drift) gains the two classical whole-sample checks it
lacked:

- jarque_bera_by_type  Jarque & Bera (1980) normality test of daily
                       returns: JB = n/6 (S^2 + K^2/4) from exact
                       integer moment sums (S = skewness, K = excess
                       kurtosis) — the test every returns dashboard
                       quotes
- runs_test_by_type    Wald-Wolfowitz (1940) runs test of randomness
                       on the above/below-median daily-return sequence:
                       z = (R - mu_R) / sigma_R with mu_R = 2 n1 n2 /
                       (n1 + n2) + 1 — detects serial dependence a
                       moment test can't see

Determinism: returns are the catalog_r7_risk integer micro-unit idiom,
so all four central-moment sums are exact integers (HUGEINT/decimal38);
the runs count R and the above/below counts are pure integer window
arithmetic over the median split (exact interpolated median, Spark
`percentile` == DuckDB `quantile_cont`; ties-at-median rows are
EXCLUDED, the standard convention).  Each statistic is one closed-form
double, rounded in-query.

Scale: one events scan -> the shared (type, date) rollup; moments are
5-group partial aggregates; the runs count is one lag window over the
tiny return frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets


@query(
    "jarque_bera_by_type",
    oracle=f"""
    WITH {_RET_BASE},
    m AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(r AS HUGEINT)) AS s1,
               sum(CAST(r AS HUGEINT) * r) AS s2,
               sum(CAST(r AS HUGEINT) * r * r) AS s3,
               sum(CAST(r AS HUGEINT) * r * r * r) AS s4
        FROM rets GROUP BY event_type HAVING count(*) >= 4
    ),
    c AS (
        SELECT event_type, n,
               CAST(s1 AS DOUBLE) / n AS mu,
               CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                   AS m2,
               CAST(s3 AS DOUBLE) / n
                   - 3.0 * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s2 AS DOUBLE) / n)
                   + 2.0 * pow(CAST(s1 AS DOUBLE) / n, 3) AS m3,
               CAST(s4 AS DOUBLE) / n
                   - 4.0 * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s3 AS DOUBLE) / n)
                   + 6.0 * pow(CAST(s1 AS DOUBLE) / n, 2)
                     * (CAST(s2 AS DOUBLE) / n)
                   - 3.0 * pow(CAST(s1 AS DOUBLE) / n, 4) AS m4
        FROM m
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(m3 / pow(m2, 1.5), 6) AS skewness,
           round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis,
           round(CAST(n AS DOUBLE) / 6.0
                 * (pow(m3 / pow(m2, 1.5), 2)
                    + pow(m4 / (m2 * m2) - 3.0, 2) / 4.0), 6) AS jb_stat
    FROM c ORDER BY event_type
    """,
)
def jarque_bera_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per event type over daily micro-unit
    returns: sample skewness, excess kurtosis (population central
    moments from exact integer power sums) and JB = n/6 (S^2 + K^2/4),
    chi-square(2) under normality."""
    r = F.col("r").cast("decimal(38,0)")
    m = (_rets(spark, sf_dir)
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(r).alias("s1"),
              F.sum(r * F.col("r")).alias("s2"),
              F.sum(r * F.col("r") * F.col("r")).alias("s3"),
              F.sum(r * F.col("r") * F.col("r") * F.col("r")).alias("s4"))
         .filter(F.col("n") >= 4))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mu = d("s1") / F.col("n")
    m2 = d("s2") / F.col("n") - mu * mu
    m3 = (d("s3") / F.col("n") - F.lit(3.0) * mu * (d("s2") / F.col("n"))
          + F.lit(2.0) * F.pow(mu, 3))
    m4 = (d("s4") / F.col("n")
          - F.lit(4.0) * mu * (d("s3") / F.col("n"))
          + F.lit(6.0) * F.pow(mu, 2) * (d("s2") / F.col("n"))
          - F.lit(3.0) * F.pow(mu, 4))
    skew = m3 / F.pow(m2, 1.5)
    kurt = m4 / (m2 * m2) - F.lit(3.0)
    return (m.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
        F.round(d("n") / F.lit(6.0)
                * (F.pow(skew, 2) + F.pow(kurt, 2) / F.lit(4.0)), 6)
        .alias("jb_stat"))
        .orderBy("event_type"))


@query(
    "runs_test_by_type",
    oracle=f"""
    WITH {_RET_BASE},
    med AS (
        SELECT event_type, quantile_cont(r, 0.5) AS med
        FROM rets GROUP BY event_type
    ),
    signs AS (
        SELECT r.event_type, r.ddate,
               CASE WHEN r.r > m.med THEN 1 ELSE 0 END AS s
        FROM rets r JOIN med m USING (event_type)
        WHERE r.r <> m.med
    ),
    runs AS (
        SELECT event_type, s,
               CASE WHEN lag(s) OVER (PARTITION BY event_type
                                      ORDER BY ddate) IS DISTINCT FROM s
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    ),
    agg AS (
        SELECT event_type,
               sum(new_run) AS r_runs,
               sum(s) AS n1, sum(1 - s) AS n2
        FROM runs GROUP BY event_type
        HAVING sum(s) > 0 AND sum(1 - s) > 0
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(r_runs AS BIGINT) AS n_runs,
           round((CAST(r_runs AS DOUBLE)
                  - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE))
                           * (n1 + n2) * (n1 + n2 - 1))), 6) AS z_runs
    FROM agg ORDER BY event_type
    """,
)
def runs_test_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event type: the daily returns are
    split above/below their exact median (ties dropped), runs of equal
    sign are counted with a lag window, and z compares the observed run
    count to mu_R = 2 n1 n2/(n1+n2) + 1.  |z| >> 0 means the sequence
    clusters or alternates — serial structure."""
    # the ~|days|x|types| return frame feeds the median AND the sign
    # stream — cache so the rollup + lag window runs once
    rets = _rets(spark, sf_dir).cache()
    med = rets.groupBy("event_type").agg(
        F.expr("percentile(r, 0.5)").alias("med"))
    signs = (rets.join(F.broadcast(med), "event_type")
             .filter(F.col("r") != F.col("med"))
             .select("event_type", "ddate",
                     F.when(F.col("r") > F.col("med"), 1).otherwise(0)
                     .alias("s")))
    w = Window.partitionBy("event_type").orderBy("ddate")
    runs = signs.withColumn(
        "new_run",
        F.when(~F.lag("s").over(w).eqNullSafe(F.col("s")), 1).otherwise(0))
    agg = (runs.groupBy("event_type")
           .agg(F.sum("new_run").alias("r_runs"),
                F.sum("s").alias("n1"),
                F.sum(F.lit(1) - F.col("s")).alias("n2"))
           .filter((F.col("n1") > 0) & (F.col("n2") > 0)))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n1, n2 = d("n1"), d("n2")
    mu = F.lit(2.0) * n1 * n2 / (n1 + n2) + F.lit(1.0)
    sig = F.sqrt(F.lit(2.0) * n1 * n2
                 * (F.lit(2.0) * n1 * n2 - n1 - n2)
                 / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)))
    return (agg.select(
        "event_type",
        F.col("n1").cast("long").alias("n_above"),
        F.col("n2").cast("long").alias("n_below"),
        F.col("r_runs").cast("long").alias("n_runs"),
        F.round((d("r_runs") - mu) / sig, 6).alias("z_runs"))
        .orderBy("event_type"))
