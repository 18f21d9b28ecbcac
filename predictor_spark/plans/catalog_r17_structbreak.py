"""Catalog part — structural-break tests (STAGED r10).

The changepoint stack (catalog_r12_statefilter's binary segmentation on
the MEAN; catalog_r14_pagehinkley's sequential drift) gains the two
classic REGRESSION-stability tests:

- chow_test_price_qty   Chow (1960) F test: does the price-on-quantity
                        OLS relation differ between the first and
                        second half of order history? F = ((SSR_pooled
                        - SSR_1 - SSR_2)/k) / ((SSR_1+SSR_2)/(n-2k)),
                        k = 2 (intercept + slope); halves split at the
                        midpoint of the order-date range
- cusum_squares_break   Brown-Durbin-Evans CUSUM-of-squares per event
                        type on daily returns: S_t = Σ_{i<=t} r_i² /
                        Σ r_i², statistic max_t |S_t - t/N| with the
                        date where the variance budget ran furthest
                        ahead/behind schedule (a VARIANCE-regime break
                        detector, orthogonal to the mean tests)

Determinism: all OLS moments are exact integer cents/quantity sums
(decimal(38,0)/HUGEINT); SSR = Syy - Sxy²/Sxx evaluated once per half
as a double of exact inputs. The CUSUM ratios are exact-integer
rationals; ties on the max deviation break on the earliest date.

Scale: the Chow moments are ONE lineitem⋈orders keyed pass (the date
comes from the co-partitioned order join) reduced to two half-rows;
the CUSUM is one cumulative window per type over the daily frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets

#: per-half exact OLS moments of (x=quantity, y=extendedprice cents)
_CHOW_MOMENTS = """
    span AS (
        SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
    ),
    obs AS (
        SELECT CASE WHEN o.o_orderdate <= span.lo
                         + CAST(floor(date_diff('day', span.lo, span.hi)
                                      / 2) AS INTEGER) * INTERVAL 1 DAY
                    THEN 1 ELSE 2 END AS half,
               CAST(l.l_quantity AS BIGINT) AS x,
               CAST(round(l.l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey,
             span
    ),
    hm AS (
        SELECT half, count(*) AS n,
               sum(CAST(x AS HUGEINT)) AS sx,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM obs GROUP BY half
    )"""


def _ssr(n, sx, sy, sxx, sxy, syy):
    """SSR of y ~ a + b·x from raw moments (both engines, same algebra):
    Syy_c - Sxy_c²/Sxx_c with centered moments."""
    sxx_c = sxx - sx * sx / n
    sxy_c = sxy - sx * sy / n
    syy_c = syy - sy * sy / n
    return syy_c - sxy_c * sxy_c / sxx_c


@query(
    "chow_test_price_qty",
    oracle=f"""
    WITH {_CHOW_MOMENTS},
    halves AS (
        SELECT
            sum(n) AS n,
            min(CASE WHEN half = 1 THEN n END) AS n1,
            min(CASE WHEN half = 2 THEN n END) AS n2,
            min(CASE WHEN half = 1 THEN
                (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                - power(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n, 2)
                  / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                END) AS ssr1,
            min(CASE WHEN half = 2 THEN
                (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                - power(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n, 2)
                  / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                END) AS ssr2,
            (CAST(sum(syy) AS DOUBLE)
             - CAST(sum(sy) AS DOUBLE) * sum(sy) / sum(n))
            - power(CAST(sum(sxy) AS DOUBLE)
                    - CAST(sum(sx) AS DOUBLE) * sum(sy) / sum(n), 2)
              / (CAST(sum(sxx) AS DOUBLE)
                 - CAST(sum(sx) AS DOUBLE) * sum(sx) / sum(n)) AS ssrp
        FROM hm
    )
    SELECT CAST(n1 AS BIGINT) AS n_first,
           CAST(n2 AS BIGINT) AS n_second,
           round(((ssrp - ssr1 - ssr2) / 2)
                 / ((ssr1 + ssr2) / (n - 4)), 6) AS chow_f
    FROM halves
    """,
)
def chow_test_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow F statistic for a break in the extendedprice-on-quantity OLS
    between the first and second half of the order-date span (k=2
    restrictions; under H0 ~ F(2, n-4)). All moments exact integers;
    pooled SSR derives from the SUM of the two halves' moments — the
    fact is scanned once.

    Scale: one co-partitioned lineitem⋈orders pass -> 2 moment rows."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    span = o.agg(F.min("o_orderdate").alias("lo"),
                 F.max("o_orderdate").alias("hi"))
    mid_off = F.floor(F.datediff("hi", "lo") / 2).cast("int")
    obs = (li.join(o, li.l_orderkey == o.o_orderkey)
           .crossJoin(F.broadcast(span))
           .select(F.when(F.col("o_orderdate")
                          <= F.date_add("lo", mid_off), 1)
                   .otherwise(2).alias("half"),
                   F.col("l_quantity").cast("long").alias("x"),
                   F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                   .alias("y")))
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    hm = obs.groupBy("half").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"), F.sum(dy).alias("sy"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(dx * F.col("y")).alias("sxy"),
        F.sum(dy * F.col("y")).alias("syy"))

    def half(col, h):
        return F.min(F.when(F.col("half") == h, F.col(col)))

    def ssr_half(h):
        n = half("n", h).cast("double")
        return _ssr(n, half("sx", h).cast("double"),
                    half("sy", h).cast("double"),
                    half("sxx", h).cast("double"),
                    half("sxy", h).cast("double"),
                    half("syy", h).cast("double"))

    np_ = F.sum("n").cast("double")
    ssrp = _ssr(np_, F.sum("sx").cast("double"), F.sum("sy").cast("double"),
                F.sum("sxx").cast("double"), F.sum("sxy").cast("double"),
                F.sum("syy").cast("double"))
    ssr1, ssr2 = ssr_half(1), ssr_half(2)
    return hm.agg(
        half("n", 1).cast("long").alias("n_first"),
        half("n", 2).cast("long").alias("n_second"),
        F.round(((ssrp - ssr1 - ssr2) / 2)
                / ((ssr1 + ssr2) / (np_ - 4)), 6).alias("chow_f"))


@query(
    "cusum_squares_break",
    oracle=f"""
    WITH {_RET_BASE},
    tot AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(r AS HUGEINT) * r) AS q
        FROM rets GROUP BY event_type
    ),
    walk AS (
        SELECT r.event_type, r.ddate,
               sum(CAST(r.r AS HUGEINT) * r.r)
                   OVER (PARTITION BY r.event_type ORDER BY r.ddate) AS cq,
               row_number() OVER (PARTITION BY r.event_type
                                  ORDER BY r.ddate) AS t,
               tot.n, tot.q
        FROM rets r JOIN tot ON tot.event_type = r.event_type
    ),
    dev AS (
        SELECT event_type, ddate,
               abs(CAST(cq AS DOUBLE) / CAST(q AS DOUBLE)
                   - CAST(t AS DOUBLE) / n) AS d,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY abs(CAST(cq AS DOUBLE) / CAST(q AS DOUBLE)
                                - CAST(t AS DOUBLE) / n) DESC, ddate)
                   AS rnk,
               n
        FROM walk
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(d, 6) AS max_deviation,
           strftime(ddate, '%Y-%m-%d') AS break_date
    FROM dev WHERE rnk = 1 ORDER BY event_type
    """,
)
def cusum_squares_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Durbin-Evans CUSUM-of-squares per event type: the maximum
    deviation of the cumulative squared-return share from the uniform
    t/N schedule, with its date (earliest on ties). Large = the
    variance arrives in a burst (a volatility-regime break), even when
    the mean never moves.

    Scale: one cumulative window per type over the daily frame; the
    total attaches by key."""
    # cached: the ~150-row return frame feeds the total AND the walk
    # (one events scan, not two — plan audit)
    r = _rets(spark, sf_dir).cache()
    dec = F.col("r").cast("decimal(38,0)")
    tot = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec * F.col("r")).alias("q"))
    w = Window.partitionBy("event_type").orderBy("ddate")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    walk = (r.join(F.broadcast(tot), "event_type")
            .withColumn("cq", F.sum(dec * F.col("r")).over(wc))
            .withColumn("t", F.row_number().over(w)))
    d = F.abs(F.col("cq").cast("double") / F.col("q").cast("double")
              - F.col("t").cast("double") / F.col("n"))
    wr = Window.partitionBy("event_type").orderBy(d.desc(), F.col("ddate"))
    return (walk.withColumn("d", d)
            .withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") == 1)
            .select("event_type", F.col("n").cast("long").alias("n_days"),
                    F.round("d", 6).alias("max_deviation"),
                    F.date_format("ddate", "yyyy-MM-dd")
                    .alias("break_date"))
            .orderBy("event_type"))
