"""Catalog part — series complexity: SampEn + fractal dims (STAGED r10).

Completes the irregularity stack (catalog_r12_ordinal: permutation
entropy — a RANK-pattern entropy; catalog_r11_longmemory: Hurst — a
long-range scaling exponent) with the amplitude-domain complexity
measures, per event type:

- sample_entropy_by_type  SampEn(m=2, tol=0.2·σ) (Richman & Moorman
                          2000): -ln(A/B) where B counts template pairs
                          of length 2 within Chebyshev tolerance and A
                          those still matching at length 3 — lower =
                          more self-similar. Both counts restricted to
                          indices where the length-3 template exists
                          (the standard equal-template-count
                          convention), pairs i<j only.
- katz_petrosian_fd       Katz (1988) fractal dimension
                          log10(n)/(log10(n)+log10(d/L)) from exact
                          integer path length L and max excursion d of
                          the daily cents bars, and Petrosian (1995) FD
                          from the count of first-difference sign flips.

Determinism: returns/bars are exact integers; the SampEn tolerance is
floor(0.2·popstd) in integer micro-units, where popstd comes from exact
HUGEINT/decimal moments — every pair comparison is integer-vs-integer.
The fractal L, d and flip counts are exact integers; only the final
log ratios are double, rounded 6 dp.

Scale: the daily rollup is ~tens of rows per type at ANY SF (days don't
grow with volume), so the SampEn within-type self-join is O(days²) per
type over a frame of hundreds of rows — bounded, broadcast-sized, and
keyed on event_type (equi-join, never a cartesian across types). The
events scan is the only volume-proportional stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets


@query(
    "sample_entropy_by_type",
    oracle=f"""
    WITH {_RET_BASE},
    seq AS (
        SELECT event_type, r,
               row_number() OVER w AS i,
               lead(r, 1) OVER w AS x1,
               lead(r, 2) OVER w AS x2
        FROM rets
        WINDOW w AS (PARTITION BY event_type ORDER BY ddate)
    ),
    tol AS (
        SELECT event_type,
               CAST(floor(0.2 * sqrt(
                   (CAST(sum(CAST(r AS HUGEINT) * r) AS DOUBLE) * count(*)
                    - CAST(sum(CAST(r AS HUGEINT)) AS DOUBLE)
                      * CAST(sum(CAST(r AS HUGEINT)) AS DOUBLE))
                   / (CAST(count(*) AS DOUBLE) * count(*))))
                    AS BIGINT) AS tol
        FROM rets GROUP BY event_type
    ),
    tmpl AS (
        SELECT s.event_type, s.i, s.r, s.x1, s.x2, t.tol
        FROM seq s JOIN tol t USING (event_type)
        WHERE s.x2 IS NOT NULL
    ),
    pairs AS (
        SELECT a.event_type,
               CASE WHEN greatest(abs(a.r - b.r), abs(a.x1 - b.x1))
                         <= a.tol THEN 1 ELSE 0 END AS m2,
               CASE WHEN greatest(abs(a.r - b.r), abs(a.x1 - b.x1),
                                  abs(a.x2 - b.x2))
                         <= a.tol THEN 1 ELSE 0 END AS m3
        FROM tmpl a JOIN tmpl b
          ON a.event_type = b.event_type AND a.i < b.i
    )
    SELECT event_type,
           CAST(sum(m2) AS BIGINT) AS b_count,
           CAST(sum(m3) AS BIGINT) AS a_count,
           round(CASE WHEN sum(m3) > 0 AND sum(m2) > 0
                 THEN -ln(CAST(sum(m3) AS DOUBLE) / sum(m2)) END, 6)
               AS sampen
    FROM pairs GROUP BY event_type ORDER BY event_type
    """,
)
def sample_entropy_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SampEn(m=2, tol=0.2·popstd) per event type over daily integer
    micro-returns: B = length-2 template pairs within Chebyshev
    tolerance, A = those also matching at length 3; sampen = -ln(A/B)
    (NULL when either count is 0). Template indices restricted to rows
    with a full length-3 template, pairs i<j.

    Scale: days² pairs per type over a broadcast-sized frame; the
    self-join is keyed on event_type."""
    w = Window.partitionBy("event_type").orderBy("ddate")
    # cache the window-decorated return frame (~150 rows): the tolerance
    # aggregate and both self-join legs reuse it — without the cache the
    # events scan runs 4x (plan-audit pinned to 1 InMemoryTableScan fan-out)
    seq = _rets(spark, sf_dir).select(
        "event_type", "r",
        F.row_number().over(w).alias("i"),
        F.lead("r", 1).over(w).alias("x1"),
        F.lead("r", 2).over(w).alias("x2")).cache()
    dec = F.col("r").cast("decimal(38,0)")
    n = F.count(F.lit(1))
    s1 = F.sum(dec).cast("double")
    q1 = F.sum(dec * F.col("r")).cast("double")
    tol = seq.groupBy("event_type").agg(
        F.floor(0.2 * F.sqrt((q1 * n - s1 * s1)
                             / (n.cast("double") * n))).cast("long")
        .alias("tol"))
    tmpl = (seq.filter(F.col("x2").isNotNull())
            .join(F.broadcast(tol), "event_type"))
    a, b = tmpl.alias("a"), tmpl.alias("b")
    ch2 = F.greatest(F.abs(F.col("a.r") - F.col("b.r")),
                     F.abs(F.col("a.x1") - F.col("b.x1")))
    ch3 = F.greatest(ch2, F.abs(F.col("a.x2") - F.col("b.x2")))
    pairs = (a.join(b, (F.col("a.event_type") == F.col("b.event_type"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.event_type").alias("event_type"),
                     F.when(ch2 <= F.col("a.tol"), 1).otherwise(0)
                     .alias("m2"),
                     F.when(ch3 <= F.col("a.tol"), 1).otherwise(0)
                     .alias("m3")))
    g = pairs.groupBy("event_type").agg(
        F.sum("m2").cast("long").alias("b_count"),
        F.sum("m3").cast("long").alias("a_count"))
    return (g.select(
        "event_type", "b_count", "a_count",
        F.round(F.when((F.col("a_count") > 0) & (F.col("b_count") > 0),
                       -F.log(F.col("a_count").cast("double")
                              / F.col("b_count"))), 6).alias("sampen"))
        .orderBy("event_type"))


@query(
    "katz_petrosian_fd",
    oracle="""
    WITH bars AS (
        SELECT event_type, CAST(ts AS DATE) AS ddate,
               sum(CAST(round(value * 100) AS BIGINT)) AS x
        FROM events GROUP BY 1, 2
    ),
    d1 AS (
        SELECT event_type, ddate, x,
               x - lag(x) OVER w AS dx,
               first_value(x) OVER w AS x0
        FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY ddate)
    ),
    seq AS (
        SELECT event_type, x, dx, x0,
               lag(dx) OVER (PARTITION BY event_type
                             ORDER BY ddate) AS pdx
        FROM d1
    ),
    m AS (
        SELECT event_type, count(*) AS n,
               sum(abs(CAST(dx AS HUGEINT))) AS pathlen,
               max(abs(CAST(x AS HUGEINT) - x0)) AS excursion,
               sum(CASE WHEN CAST(dx AS HUGEINT) * pdx < 0
                        THEN 1 ELSE 0 END) AS flips
        FROM seq GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(log10(CAST(n AS DOUBLE) - 1)
                 / (log10(CAST(n AS DOUBLE) - 1)
                    + log10(CAST(excursion AS DOUBLE) / pathlen)), 6)
               AS katz_fd,
           round(log10(CAST(n AS DOUBLE))
                 / (log10(CAST(n AS DOUBLE))
                    + log10(CAST(n AS DOUBLE)
                            / (n + 0.4 * flips))), 6) AS petrosian_fd
    FROM m ORDER BY event_type
    """,
)
def katz_petrosian_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz (1988) and Petrosian (1995) fractal dimensions of the daily
    cents-bar curve per event type. Katz: log10(n-1) /
    (log10(n-1) + log10(d/L)) with L = exact integer path length and
    d = max excursion from the first bar (note Katz's n is the segment
    count, n_days - 1). Petrosian: log10(n)/(log10(n) +
    log10(n/(n + 0.4·N_Δ))) with N_Δ = strict sign flips of the first
    difference.

    Scale: one events scan -> daily rollup; one window partitioning for
    diff + first-value + lagged diff; 5-group aggregate."""
    bars = (_t(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("ddate"))
            .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                 .alias("x")))
    w = Window.partitionBy("event_type").orderBy("ddate")
    dx = F.col("x") - F.lag("x").over(w)
    seq = (bars.withColumn("dx", dx)
           .withColumn("x0", F.first("x").over(
               w.rowsBetween(Window.unboundedPreceding, 0)))
           .withColumn("pdx", F.lag("dx").over(w)))
    dec_dx = F.col("dx").cast("decimal(38,0)")
    m = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(dec_dx)).alias("pathlen"),
        F.max(F.abs(F.col("x").cast("decimal(38,0)") - F.col("x0")))
        .alias("excursion"),
        F.sum(F.when(dec_dx * F.col("pdx") < 0, 1).otherwise(0))
        .alias("flips"))
    n = F.col("n").cast("double")
    return (m.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.round(F.log10(n - 1)
                / (F.log10(n - 1)
                   + F.log10(F.col("excursion").cast("double")
                             / F.col("pathlen").cast("double"))), 6)
        .alias("katz_fd"),
        F.round(F.log10(n)
                / (F.log10(n)
                   + F.log10(n / (n + 0.4 * F.col("flips")))), 6)
        .alias("petrosian_fd"))
        .orderBy("event_type"))
