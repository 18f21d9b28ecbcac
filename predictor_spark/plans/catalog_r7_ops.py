"""Catalog part — fulfillment / SLA operations metrics (STAGED for r7).

The order-to-ship lead-time readouts an operations dashboard runs over
the order fact (complementing the TPC-H shipping-mode and delay-bucket
shapes q12/q21 cover at the mode grain):

- lead_time_percentiles   exact p50/p90/p99 order statistics of the
                          order->ship lead time per order priority
- sla_on_time_rate        share of lines shipped within 30/60/90 days
                          per priority, plus the backdated-line count
                          (ship before order — a data-quality signal
                          this synthetic fact genuinely contains)
- lead_time_yearly_trend  mean lead time per (order year, priority)

Determinism: lead times are exact integer day differences; the
percentiles are pure rank selections ((n-1)*q//100 + 1, never
interpolated); rates and means are one-shot divisions of exact
integer sums, rounded in-query.

Scale: ONE orders |x| lineitem join per query, shuffled on the shared
order key (the co-partitioned SMJ every fact-to-fact plan wants);
ranks ride a per-priority window; every output is <= |priorities| x
|years| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

# per-line lead time in exact integer days (oracle CTE)
_LEAD_SQL = """
    lead AS (
        SELECT o.o_orderpriority AS priority,
               CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
               CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                    AS BIGINT) AS days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )"""


def _lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, order_year, days): one fact-to-fact join on the
    order key, lead time as an exact integer day difference."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.col("o_orderdate"))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .select("priority", "order_year",
                    F.datediff("l_shipdate", "o_orderdate").cast("long")
                    .alias("days")))


@query(
    "lead_time_percentiles",
    oracle=f"""
    WITH {_LEAD_SQL},
    ranked AS (
        SELECT priority, days,
               row_number() OVER (PARTITION BY priority
                                  ORDER BY days) AS rn,
               count(*) OVER (PARTITION BY priority) AS n
        FROM lead
    )
    SELECT priority, CAST(max(n) AS BIGINT) AS n_lines,
           max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN days END)
               AS p50_days,
           max(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN days END)
               AS p90_days,
           max(CASE WHEN rn = (n - 1) * 99 // 100 + 1 THEN days END)
               AS p99_days
    FROM ranked GROUP BY priority
    """,
)
def lead_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 lead-time order statistics per priority: rank
    once within each priority, pick the three (n-1)*q//100 + 1 ranks in
    the same pass — discrete order statistics (the VaR idiom), never an
    interpolated percentile, so the values are exact integers on both
    engines.

    Note: ties on `days` make row_number's choice within a tie run
    arbitrary, but every row in the tie carries the SAME days value,
    so the selected statistic is unique regardless — which is exactly
    why the rank-r row can be read off the (priority, days) COUNT
    frame: the block with cum-cnt < r <= cum holds every row of rank
    r, all carrying the same days value.

    Scale: one fact-to-fact join reduced by a map-side-combinable
    (priority, days) count rollup; the cumulative window then runs
    over the BOUNDED |priorities| x |distinct days| frame (~5 x 200
    rows at any SF).  r14 (guide §2.2/§2.5): the previous form ranked
    every joined row in a partitionBy(priority) window — an SF-linear
    sort capped at 5 tasks at any cluster size; same selected order
    statistics, stream-sized work now ends at the count rollup."""
    lead = _lead(spark, sf_dir)
    cnts = (lead.groupBy("priority", "days")
            .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("priority")
    ranked = cnts.select(
        "priority", "days", "cnt",
        F.sum("cnt").over(w.orderBy("days")
                          .rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(w).alias("n"))
    pick = lambda q: F.max(F.when(  # noqa: E731
        (F.col("cum") - F.col("cnt")
         < F.expr(f"((n - 1) * {q}) div 100 + 1"))
        & (F.expr(f"((n - 1) * {q}) div 100 + 1") <= F.col("cum")),
        F.col("days")))
    return (ranked.groupBy("priority")
            .agg(F.max("n").cast("long").alias("n_lines"),
                 pick(50).alias("p50_days"),
                 pick(90).alias("p90_days"),
                 pick(99).alias("p99_days")))


@query(
    "sla_on_time_rate",
    oracle=f"""
    WITH {_LEAD_SQL}
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(CASE WHEN days <= 30 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS within_30d,
           round(CAST(sum(CASE WHEN days <= 60 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS within_60d,
           round(CAST(sum(CASE WHEN days <= 90 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS within_90d,
           CAST(sum(CASE WHEN days < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_backdated
    FROM lead GROUP BY priority
    """,
)
def sla_on_time_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA attainment per priority: the share of lines shipped within
    30/60/90 days of the order date, plus the count of backdated lines
    (ship before order) the 30-day rate silently absorbs — the
    cumulative-SLA readout next to q12's delay buckets.

    Scale: the same single join reduced by one 5-group conditional
    aggregate — all counters map-side partials."""
    lead = _lead(spark, sf_dir)
    rate = lambda days: F.round(  # noqa: E731
        F.sum(F.when(F.col("days") <= days, 1).otherwise(0))
        .cast("double") / F.count(F.lit(1)), 6)
    return (lead.groupBy("priority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_lines"),
                 rate(30).alias("within_30d"),
                 rate(60).alias("within_60d"),
                 rate(90).alias("within_90d"),
                 F.sum(F.when(F.col("days") < 0, 1).otherwise(0))
                 .cast("long").alias("n_backdated")))


@query(
    "lead_time_yearly_trend",
    oracle=f"""
    WITH {_LEAD_SQL}
    SELECT order_year, priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(days) AS DOUBLE) / count(*), 4)
               AS avg_lead_days
    FROM lead GROUP BY order_year, priority
    """,
)
def lead_time_yearly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean lead time per (order year, priority) — the drift readout
    that shows whether fulfillment is degrading cohort over cohort;
    exact integer day sums divided once.

    Scale: same join, one |years| x |priorities| groupBy."""
    lead = _lead(spark, sf_dir)
    return (lead.groupBy("order_year", "priority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_lines"),
                 F.round(F.sum("days").cast("double")
                         / F.count(F.lit(1)), 4).alias("avg_lead_days")))
