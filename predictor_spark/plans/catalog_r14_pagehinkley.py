"""Catalog part — Page-Hinkley drift detection (STAGED for r9).

The drift stack (cusum_changepoint: known-target CUSUM; psi / KS /
wasserstein: two-window distribution drift; kalman innovations) gains
the SEQUENTIAL mean-drift detector streaming monitors actually run
(Page 1954; Hinkley 1971; the form in Gama et al. 2014's concept-drift
survey):

- page_hinkley_drift  per event type over the daily cents bars:
                      m_t = sum_{i<=t} (x_i - xbar_i), where xbar_i is
                      the RUNNING mean; the PH statistic is
                      max_t (m_t - min_{s<=t} m_s) — how far the
                      cumulative deviation climbed off its floor — plus
                      the date where the climb peaked (the drift
                      onset-to-peak window's right edge)

Determinism: bars are exact integer cents; the running mean is the
exact rational cum_x / t, and each deviation term is quantized to
integer nano-cents BEFORE the cumulative sum, so m_t, its running min
and the final max are exact integer arithmetic; only the displayed
statistic divides back to value units (6 dp).  Peak ties break on the
earliest date.

Scale: one events scan -> the daily rollup; all three cumulative
passes (running mean, cumsum, running min) ride ONE (type ordered by
date) window partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t


@query(
    "page_hinkley_drift",
    oracle="""
    WITH bars AS (
        SELECT event_type, CAST(ts AS DATE) AS ddate,
               sum(CAST(round(value * 100) AS BIGINT)) AS x
        FROM events GROUP BY 1, 2
    ),
    terms AS (
        SELECT event_type, ddate,
               CAST(round(1e9 * (x - CAST(sum(x) OVER w AS DOUBLE)
                                     / (row_number() OVER w)))
                    AS BIGINT) AS t_nano
        FROM bars
        WINDOW w AS (PARTITION BY event_type ORDER BY ddate)
    ),
    cum AS (
        SELECT event_type, ddate,
               sum(t_nano) OVER (PARTITION BY event_type
                                 ORDER BY ddate) AS m
        FROM terms
    ),
    walk AS (
        SELECT event_type, ddate, m,
               min(m) OVER (PARTITION BY event_type
                            ORDER BY ddate) AS floor_m
        FROM cum
    ),
    scored AS (
        SELECT event_type, ddate, m - floor_m AS climb,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY m - floor_m DESC, ddate)
                   AS rn
        FROM walk
    )
    SELECT event_type,
           round(climb / (1e9 * 100.0), 6) AS ph_stat,
           strftime(ddate, '%Y-%m-%d') AS peak_date
    FROM scored WHERE rn = 1 ORDER BY event_type
    """,
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-drift statistic per event type (delta = 0):
    the maximum climb of the cumulative running-mean deviation off its
    running minimum, in value units, with the peak date.  A large
    ph_stat marks a sustained upward mean shift; the symmetric
    downward test is the same walk on -x."""
    bars = (_t(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("ddate"))
            .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                 .alias("x")))
    w = Window.partitionBy("event_type").orderBy("ddate")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    run_mean = (F.sum("x").over(wcum).cast("double")
                / F.row_number().over(w))
    terms = bars.select(
        "event_type", "ddate",
        F.round(F.lit(1e9) * (F.col("x") - run_mean), 0).cast("long")
        .alias("t_nano"))
    walk = (terms
            .withColumn("m", F.sum("t_nano").over(wcum))
            .withColumn("floor_m", F.min("m").over(wcum)))
    climb = F.col("m") - F.col("floor_m")
    rank_w = Window.partitionBy("event_type").orderBy(
        climb.desc(), F.col("ddate"))
    return (walk.withColumn("rn", F.row_number().over(rank_w))
            .filter(F.col("rn") == 1)
            .select("event_type",
                    F.round(climb / (1e9 * 100.0), 6).alias("ph_stat"),
                    F.date_format("ddate", "yyyy-MM-dd")
                    .alias("peak_date"))
            .orderBy("event_type"))
