"""Catalog part — ordinal-pattern complexity (STAGED for r9).

The time-series feature stack (catalog_tsfeat: strength/ACF features;
catalog_r11_longmemory: Hurst; catalog_r8_matrixprofile: motifs) gains
the complexity measure built from ORDER relations alone (Bandt & Pompe
2002, "Permutation entropy: a natural complexity measure for time
series"):

- ordinal_pattern_histogram   order-3 ordinal patterns (stable-tie
                              argsort ranks) of consecutive hourly bars
                              per event type, with counts and shares
- permutation_entropy_by_type normalized permutation entropy
                              H = -sum p ln p / ln(3!) — 0 for a
                              monotone series, 1 for i.i.d. noise

Pattern encoding: window (x0, x1, x2) maps to the rank string r0r1r2
where r_i = #{j: x_j < x_i} + #{j < i: x_j = x_i} (stable argsort —
the convention Bandt-Pompe implementations use for ties, which integer
cents bars do produce).  Pure integer comparisons, engine-agnostic.

Determinism: pattern counts are exact integers; each entropy term
-p ln p is computed from the SAME double p = c/n on both engines and
quantized to integer nano-units before the (<= 6-term) sum, so
aggregation order cannot move the result; the normalized entropy is
one rounded division.

Scale: one events scan -> (type, hour) rollup; two lead() taps on ONE
(type ordered by hour) window partitioning; the histogram is a
<= 6-rows-per-type aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: shared oracle prelude: order-3 ordinal patterns of hourly bars
_PATTERNS_SQL = """
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               sum(CAST(round(value * 100) AS BIGINT)) AS c
        FROM events GROUP BY 1, 2
    ),
    wins AS (
        SELECT event_type, c AS x0,
               lead(c, 1) OVER w AS x1,
               lead(c, 2) OVER w AS x2
        FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    ),
    pats AS (
        SELECT event_type,
               CAST((CASE WHEN x1 < x0 THEN 1 ELSE 0 END)
                    + (CASE WHEN x2 < x0 THEN 1 ELSE 0 END) AS VARCHAR)
               || CAST((CASE WHEN x0 < x1 THEN 1 ELSE 0 END)
                       + (CASE WHEN x2 < x1 THEN 1 ELSE 0 END)
                       + (CASE WHEN x0 = x1 THEN 1 ELSE 0 END) AS VARCHAR)
               || CAST((CASE WHEN x0 < x2 THEN 1 ELSE 0 END)
                       + (CASE WHEN x1 < x2 THEN 1 ELSE 0 END)
                       + (CASE WHEN x0 = x2 THEN 1 ELSE 0 END)
                       + (CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS VARCHAR)
               AS pattern
        FROM wins WHERE x2 IS NOT NULL
    ),
    hist AS (
        SELECT event_type, pattern, count(*) AS cnt
        FROM pats GROUP BY event_type, pattern
    )
"""


def _patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, pattern, cnt): the order-3 ordinal histogram —
    identical rank expressions to the oracle prelude."""
    hourly = (_t(spark, sf_dir, "events")
              .groupBy("event_type",
                       F.date_trunc("hour", F.col("ts")).alias("hr"))
              .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                   .alias("c")))
    w = Window.partitionBy("event_type").orderBy("hr")
    wins = (hourly.select(
        "event_type", F.col("c").alias("x0"),
        F.lead("c", 1).over(w).alias("x1"),
        F.lead("c", 2).over(w).alias("x2"))
        .filter(F.col("x2").isNotNull()))
    b = lambda cond: F.when(cond, 1).otherwise(0)  # noqa: E731
    x0, x1, x2 = F.col("x0"), F.col("x1"), F.col("x2")
    r0 = b(x1 < x0) + b(x2 < x0)
    r1 = b(x0 < x1) + b(x2 < x1) + b(x0 == x1)
    r2 = b(x0 < x2) + b(x1 < x2) + b(x0 == x2) + b(x1 == x2)
    pat = F.concat(r0.cast("string"), r1.cast("string"),
                   r2.cast("string"))
    return (wins.select("event_type", pat.alias("pattern"))
            .groupBy("event_type", "pattern")
            .agg(F.count(F.lit(1)).alias("cnt")))


@query(
    "ordinal_pattern_histogram",
    oracle=f"""
    WITH {_PATTERNS_SQL},
    tot AS (SELECT event_type, sum(cnt) AS n FROM hist GROUP BY event_type)
    SELECT h.event_type, h.pattern,
           CAST(h.cnt AS BIGINT) AS n_windows,
           round(CAST(h.cnt AS DOUBLE) / t.n, 6) AS share
    FROM hist h JOIN tot t USING (event_type)
    ORDER BY event_type, pattern
    """,
)
def ordinal_pattern_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-3 ordinal pattern histogram per event type: which of the
    six rank motifs (rise-rise "012", fall-fall "210", peaks, valleys,
    ...) dominates the hourly bar stream, as counts and shares."""
    hist = _patterns(spark, sf_dir)
    w = Window.partitionBy("event_type")
    return (hist
            .withColumn("n", F.sum("cnt").over(w))
            .select("event_type", "pattern",
                    F.col("cnt").cast("long").alias("n_windows"),
                    F.round(F.col("cnt").cast("double") / F.col("n"), 6)
                    .alias("share"))
            .orderBy("event_type", "pattern"))


@query(
    "permutation_entropy_by_type",
    oracle=f"""
    WITH {_PATTERNS_SQL},
    terms AS (
        SELECT event_type, cnt,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM hist
    ),
    q AS (
        SELECT event_type, n,
               CAST(round(-1e9 * (CAST(cnt AS DOUBLE) / n)
                          * ln(CAST(cnt AS DOUBLE) / n)) AS BIGINT)
                   AS t_nano
        FROM terms
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_windows,
           round(CAST(sum(t_nano) AS DOUBLE)
                 / (1e9 * ln(6.0)), 6) AS perm_entropy
    FROM q GROUP BY event_type ORDER BY event_type
    """,
)
def permutation_entropy_by_type(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Normalized order-3 permutation entropy per event type:
    -sum p ln p over the pattern shares, divided by ln(6).  Each term
    is quantized to integer nano-units before summing so partial-
    aggregation order cannot move the result."""
    hist = _patterns(spark, sf_dir)
    w = Window.partitionBy("event_type")
    p = F.col("cnt").cast("double") / F.col("n")
    t_nano = F.round(F.lit(-1e9) * p * F.log(p), 0).cast("long")
    return (hist
            .withColumn("n", F.sum("cnt").over(w))
            .select("event_type", "n", t_nano.alias("t_nano"))
            .groupBy("event_type")
            .agg(F.max("n").cast("long").alias("n_windows"),
                 F.round(F.sum("t_nano").cast("double")
                         / (F.lit(1e9) * math.log(6.0)), 6)
                 .alias("perm_entropy"))
            .orderBy("event_type"))
