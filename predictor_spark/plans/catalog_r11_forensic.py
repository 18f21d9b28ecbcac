"""Catalog part — forensic accounting screens (STAGED r11).

The digit-distribution tests an audit/data-forensics team runs over a
monetary column before trusting it (Nigrini, "Benford's Law", 2012 —
the standard fraud/synthetic-data screens):

- cents_digit_uniformity  last-digit distribution of exact cents vs
                          uniform — entry errors and fabricated values
                          favor round digits (the Benford FIRST-digit
                          screen already ships as benford_first_digit,
                          catalog_drift.py:319 — this family adds the
                          χ²-carrying last-digit and price-ending legs)
- round_price_bias        the share of prices ending .00 / .50 / .99 —
                          psychological-pricing vs organic-value mix

Determinism: digits come from exact integer cents (modulo
arithmetic — no float log decides a digit); observed counts are exact
integers; expected shares are fixed constants; the χ² terms accumulate
in explicit digit order via a cumulative window (the ordered-sum
discipline), so the 10-term float sum is engine-identical.

Scale: each screen is one map-side-combinable count-by-digit over the
scan, collapsing to ≤10 rows before the window. The digit extraction
is pure JVM expression — at 100 TB these screens ride along any
existing pass over the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t


@query(
    "cents_digit_uniformity",
    oracle="""
    WITH counts AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 10 AS digit,
               count(*) AS n_obs
        FROM orders GROUP BY digit
    ),
    tot AS (SELECT sum(n_obs) AS n FROM counts)
    SELECT CAST(digit AS BIGINT) AS digit, CAST(n_obs AS BIGINT) AS n_obs,
           round(CAST(n_obs AS DOUBLE) / n, 6) AS observed_share,
           round(sum((n_obs - n / 10.0) * (n_obs - n / 10.0) / (n / 10.0))
                     OVER (ORDER BY digit ROWS UNBOUNDED PRECEDING), 6)
               AS cum_chi2
    FROM counts, tot ORDER BY digit
    """,
)
def cents_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit uniformity screen: the final digit of exact cents
    should be ~uniform for organic values; χ² against 1/10 accumulates
    digit by digit (the digit-9 row is the full statistic). Digit
    preference (0/5 spikes) flags rounding or hand-entered data.

    Scale: one modulo + count-by-digit aggregation; a 10-row window."""
    od = _t(spark, sf_dir, "orders")
    counts = (od.select((F.round(F.col("o_totalprice") * 100)
                         .cast("long") % 10).alias("digit"))
              .groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs")))
    tot = Window.partitionBy(F.lit(1))
    wasc = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, 0)
    n = F.sum("n_obs").over(tot)
    withn = counts.select("digit", "n_obs", n.alias("n"))
    e = F.col("n") / 10.0
    term = (F.col("n_obs") - e) * (F.col("n_obs") - e) / e
    return (withn.select(
        F.col("digit").cast("long").alias("digit"),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(F.col("n_obs").cast("double") / F.col("n"), 6)
        .alias("observed_share"),
        F.round(F.sum(term).over(wasc), 6).alias("cum_chi2"))
        .orderBy("digit"))


@query(
    "round_price_bias",
    oracle="""
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS cc
        FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE cc = 0) AS BIGINT) AS n_even_dollar,
           round(CAST(count(*) FILTER (WHERE cc = 0) AS DOUBLE)
                 / count(*), 6) AS share_00,
           CAST(count(*) FILTER (WHERE cc = 50) AS BIGINT) AS n_half_dollar,
           round(CAST(count(*) FILTER (WHERE cc = 50) AS DOUBLE)
                 / count(*), 6) AS share_50,
           CAST(count(*) FILTER (WHERE cc = 99) AS BIGINT) AS n_charm,
           round(CAST(count(*) FILTER (WHERE cc = 99) AS DOUBLE)
                 / count(*), 6) AS share_99
    FROM c
    """,
)
def round_price_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Psychological-pricing mix: the share of order values ending in
    .00 (even dollar), .50 (half dollar) and .99 (charm price) — far
    above the ~1%% uniform baseline means administered prices, far
    below means computed/organic totals.

    Scale: one modulo + one 1-row conditional-count aggregate."""
    od = _t(spark, sf_dir, "orders")
    cc = F.round(F.col("o_totalprice") * 100).cast("long") % 100
    cnt = lambda v: F.sum(F.when(cc == v, 1).otherwise(0))  # noqa: E731
    return od.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        cnt(0).cast("long").alias("n_even_dollar"),
        F.round(cnt(0).cast("double") / F.count(F.lit(1)), 6)
        .alias("share_00"),
        cnt(50).cast("long").alias("n_half_dollar"),
        F.round(cnt(50).cast("double") / F.count(F.lit(1)), 6)
        .alias("share_50"),
        cnt(99).cast("long").alias("n_charm"),
        F.round(cnt(99).cast("double") / F.count(F.lit(1)), 6)
        .alias("share_99"))
