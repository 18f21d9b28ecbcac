"""Catalog part — behavioral sequence analytics (round 6, session 2).

Extends the behavior family (catalog_behavior: sessionization, funnels,
cohorts, transitions — the reference's event-log summaries) with four
sequence shapes those rows don't cover:

- streak_longest_updays   gaps-and-islands longest run of consecutive
                          up-days per series (the momentum-persistence
                          stat next to the indicator family)
- peak_concurrency        sweep-line maximum of concurrently-open
                          event intervals (capacity planning's
                          headline number)
- rfm_segments            Recency/Frequency/Monetary quintile
                          segmentation of customers (Hughes 1994),
                          scored within market segment
- interpurchase_intervals days-between-consecutive-orders distribution
                          per market segment (the repeat-purchase
                          cadence behind CLV models)

Determinism: streak ids, concurrency deltas, RFM quintiles and order
gaps are ALL integer arithmetic — quintiles use the explicit
1 + (rn-1)*5 DIV n formula (never ntile(), whose bucket split would be
an engine implementation detail), the sweep line runs on whole epoch
seconds with (+1 before -1 at ties ruled out by delta-ascending
order), and row_number tie-breaks are total orders on unique keys.

Scale: every window partitions on a bounded key (event series /
market segment / customer); the sweep line's 2x row expansion is a
projection, not a join; the one global scalar (fleet max order date)
is a broadcast single-row cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t


@query(
    "streak_longest_updays",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
               CAST(round(value * 100) AS BIGINT) AS close
        FROM (
            SELECT event_type, ts, value,
                   row_number() OVER (PARTITION BY event_type, day(ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    flagged AS (
        SELECT event_type, day,
               CASE WHEN close > lag(close) OVER w THEN 1 ELSE 0 END AS up,
               row_number() OVER w AS rn
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    islands AS (
        SELECT event_type, up,
               sum(CASE WHEN up = 1 THEN 0 ELSE 1 END)
                   OVER (PARTITION BY event_type ORDER BY day) AS sid
        FROM flagged
    ),
    runs AS (
        SELECT event_type, sid, count(*) AS run_len
        FROM islands WHERE up = 1 GROUP BY event_type, sid
    ),
    base AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(up) AS BIGINT) AS n_up_days
        FROM flagged GROUP BY event_type
    )
    SELECT base.event_type, n_days, n_up_days,
           CAST(coalesce(max(run_len), 0) AS BIGINT) AS longest_up_streak
    FROM base LEFT JOIN runs ON base.event_type = runs.event_type
    GROUP BY base.event_type, n_days, n_up_days
    """,
)
def streak_longest_updays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive up-days per series, by the classic
    gaps-and-islands construction: flag close > prev_close, give every
    non-up day a new island id via a running count, then take the max
    island length among up-days.  The momentum-persistence statistic a
    strategy layer reads beside RSI/MACD.

    The first bar (no prev close) flags 0 in both engines (NULL compare
    is false under the CASE).  Everything is integer: cents compares,
    island ids, run lengths.

    Scale: one shuffle to daily bars, two per-series windows sharing
    one sort, then a ~days-sized island aggregation."""
    ev = _t(spark, sf_dir, "events")
    wday = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    daily = (ev.select("event_type",
                       F.dayofmonth("ts").cast("long").alias("day"),
                       "ts", "event_id",
                       F.round(F.col("value") * 100, 0).cast("long")
                       .alias("close"))
             .withColumn("rn", F.row_number().over(wday))
             .filter(F.col("rn") == 1)
             .drop("rn", "ts", "event_id"))
    w = Window.partitionBy("event_type").orderBy("day")
    # bar-sized frame (days x series) read by BOTH the island pass and
    # the per-type totals — cache so the stream scan runs once
    flagged = daily.withColumn(
        "up", F.when(F.col("close") > F.lag("close").over(w), 1)
        .otherwise(0)).cache()
    islands = flagged.withColumn(
        "sid", F.sum(F.when(F.col("up") == 1, 0).otherwise(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs = (islands.filter(F.col("up") == 1)
            .groupBy("event_type", "sid")
            .agg(F.count(F.lit(1)).alias("run_len")))
    base = (flagged.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                 F.sum("up").cast("long").alias("n_up_days")))
    longest = (runs.groupBy("event_type")
               .agg(F.max("run_len").alias("mx")))
    return (base.join(F.broadcast(longest), "event_type", "left")
            .select("event_type", "n_days", "n_up_days",
                    F.coalesce(F.col("mx"), F.lit(0)).cast("long")
                    .alias("longest_up_streak")))


@query(
    "peak_concurrency",
    oracle="""
    WITH iv AS (
        SELECT event_type, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS s,
               CAST(floor(epoch(ts)) AS BIGINT)
                   + 1 + CAST(round(value * 100) AS BIGINT) % 3600 AS e
        FROM events
    ),
    pts AS (
        SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
        UNION ALL
        SELECT event_type, e AS t, -1 AS delta, event_id FROM iv
    ),
    sweep AS (
        SELECT event_type, t,
               sum(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta, event_id) AS open_now
        FROM pts
    ),
    peak AS (
        SELECT event_type, CAST(max(open_now) AS BIGINT) AS peak_concurrency
        FROM sweep GROUP BY event_type
    )
    SELECT p.event_type, p.peak_concurrency,
           (SELECT CAST(count(*) AS BIGINT) FROM iv
            WHERE iv.event_type = p.event_type) AS n_intervals,
           (SELECT min(t) FROM sweep
            WHERE sweep.event_type = p.event_type
              AND sweep.open_now = p.peak_concurrency) AS first_peak_s
    FROM peak p
    """,
)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum number of concurrently-open event intervals per type —
    the sweep-line algorithm: each interval contributes (+1 at start,
    -1 at end), a running sum ordered by (time, delta, id) counts the
    open set, and its max is the capacity peak (with the earliest
    second it was reached).  Interval length is derived
    deterministically from the value column (1 + cents mod 3600
    seconds), and the whole sweep runs on integer epoch seconds.

    Ordering ties: delta ascends, so an interval ending at second t
    closes BEFORE one opening at t — touching intervals never double-
    count; event_id totalizes the remaining ties identically in both
    engines.

    Scale: the 2x point expansion is a projection (no join); the sweep
    window partitions per series; at 100 TB this is the textbook
    distributed sweep — partition by series, sort within."""
    iv = (_t(spark, sf_dir, "events")
          .select("event_type", "event_id",
                  F.floor(F.unix_timestamp("ts")).cast("long").alias("s"),
                  (F.floor(F.unix_timestamp("ts")).cast("long")
                   + 1 + F.round(F.col("value") * 100, 0).cast("long") % 3600)
                  .alias("e")))
    # both sweep points via ONE generator over iv — the unionAll of two
    # iv projections re-derived the events scan per branch (3 scans for
    # the row; r14 plan census — guide §2.4, the graph2 _edges idiom)
    pts = (iv.select(
        "event_type",
        F.explode(F.array(
            F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
            F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta"))))
        .alias("pt"), "event_id")
        .select("event_type", "pt.t", "pt.delta", "event_id"))
    w = Window.partitionBy("event_type").orderBy("t", "delta", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sweep = pts.withColumn("open_now", F.sum("delta").over(w)) \
        .select("event_type", "t", "open_now").cache()
    peak = (sweep.groupBy("event_type")
            .agg(F.max("open_now").cast("long").alias("peak_concurrency")))
    n_iv = (iv.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_intervals")))
    first = (sweep.join(F.broadcast(peak), "event_type")
             .filter(F.col("open_now") == F.col("peak_concurrency"))
             .groupBy("event_type")
             .agg(F.min("t").alias("first_peak_s")))
    return (peak.join(F.broadcast(n_iv), "event_type")
            .join(F.broadcast(first), "event_type")
            .select("event_type", "peak_concurrency", "n_intervals",
                    "first_peak_s"))


@query(
    "rfm_segments",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS fleet_max FROM orders),
    cust AS (
        SELECT c_mktsegment, o_custkey,
               CAST(date_diff('day', max(o_orderdate), fleet_max)
                    AS BIGINT) AS recency_days,
               count(*) AS frequency,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary
        FROM orders JOIN customer ON o_custkey = c_custkey, mx
        GROUP BY c_mktsegment, o_custkey, fleet_max
    ),
    scored AS (
        SELECT c_mktsegment, monetary, frequency,
               1 + ((row_number() OVER (PARTITION BY c_mktsegment
                        ORDER BY recency_days DESC, o_custkey) - 1) * 5)
                   // (count(*) OVER (PARTITION BY c_mktsegment)) AS r_score,
               1 + ((row_number() OVER (PARTITION BY c_mktsegment
                        ORDER BY frequency, o_custkey) - 1) * 5)
                   // (count(*) OVER (PARTITION BY c_mktsegment)) AS f_score,
               1 + ((row_number() OVER (PARTITION BY c_mktsegment
                        ORDER BY monetary, o_custkey) - 1) * 5)
                   // (count(*) OVER (PARTITION BY c_mktsegment)) AS m_score
        FROM cust
    )
    SELECT c_mktsegment, CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(monetary) AS DOUBLE) / count(*) / 100, 4)
               AS avg_monetary,
           round(CAST(sum(frequency) AS DOUBLE) / count(*), 4)
               AS avg_frequency
    FROM scored GROUP BY c_mktsegment, r_score, f_score, m_score
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (Hughes 1994): customers scored 1-5 on Recency
    (5 = ordered most recently), Frequency and Monetary within their
    market segment, then segment cells summarized.  Quintiles come from
    the explicit 1 + (rn-1)*5 DIV n integer formula over totally-
    ordered ranks — never ntile(), whose split of non-divisible groups
    is an engine implementation detail.

    Scale: one shuffle reduces orders to per-customer rows; the three
    rank windows partition by market segment (global ranking is
    deliberately avoided); the fleet-max date is a broadcast scalar."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    mx = orders.agg(F.max("o_orderdate").alias("fleet_max"))
    per_cust = (orders.join(F.broadcast(cust),
                            orders.o_custkey == cust.c_custkey)
                .crossJoin(F.broadcast(mx))
                .groupBy("c_mktsegment", "o_custkey", "fleet_max")
                .agg(F.datediff(F.max(F.col("fleet_max")),
                                F.max("o_orderdate")).cast("long")
                     .alias("recency_days"),
                     F.count(F.lit(1)).alias("frequency"),
                     F.sum("cents").alias("monetary"))
                .drop("fleet_max"))
    w = Window.partitionBy("c_mktsegment")
    n = F.count(F.lit(1)).over(w)
    scored = (per_cust
              .withColumn("rn", F.row_number().over(
                  w.orderBy(F.desc("recency_days"), "o_custkey")))
              .withColumn("n", n)
              .withColumn("r_score", F.expr(
                  "CAST(1 + ((rn - 1) * 5) DIV n AS BIGINT)"))
              .withColumn("rn", F.row_number().over(
                  w.orderBy("frequency", "o_custkey")))
              .withColumn("f_score", F.expr(
                  "CAST(1 + ((rn - 1) * 5) DIV n AS BIGINT)"))
              .withColumn("rn", F.row_number().over(
                  w.orderBy("monetary", "o_custkey")))
              .withColumn("m_score", F.expr(
                  "CAST(1 + ((rn - 1) * 5) DIV n AS BIGINT)")))
    return (scored.groupBy("c_mktsegment", "r_score", "f_score", "m_score")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                 F.round(F.sum("monetary").cast("double")
                         / F.count(F.lit(1)) / 100, 4).alias("avg_monetary"),
                 F.round(F.sum("frequency").cast("double")
                         / F.count(F.lit(1)), 4).alias("avg_frequency")))


@query(
    "interpurchase_intervals",
    oracle="""
    WITH gaps AS (
        SELECT c_mktsegment, o_custkey,
               CAST(date_diff('day',
                              lag(o_orderdate) OVER (
                                  PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey),
                              o_orderdate) AS BIGINT) AS gap_days
        FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT c_mktsegment,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_repeat_customers,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(CAST(sum(gap_days) AS DOUBLE) / count(*), 4)
               AS avg_gap_days,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days,
           round(CAST(sum(CASE WHEN gap_days <= 30 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS share_within_30d
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY c_mktsegment
    """,
)
def interpurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer (lag over the
    per-customer order sequence), summarized per market segment: repeat
    customer count, gap count, mean/min/max gap, and the share of
    reorders within 30 days — the repeat-purchase cadence CLV models
    start from.

    Gaps are integer day differences; each customer's first order
    (lag NULL) is excluded identically in both engines; ties on the
    same order date are totally ordered by order key.

    Scale: one window partitioned per customer (the natural
    distribution key), then a map-side-combinable segment rollup."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (orders
            .withColumn("gap_days",
                        F.datediff(F.col("o_orderdate"),
                                   F.lag("o_orderdate").over(w))
                        .cast("long"))
            .filter(F.col("gap_days").isNotNull())
            .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey))
    return (gaps.groupBy("c_mktsegment")
            .agg(F.countDistinct("o_custkey").cast("long")
                 .alias("n_repeat_customers"),
                 F.count(F.lit(1)).cast("long").alias("n_gaps"),
                 F.round(F.sum("gap_days").cast("double")
                         / F.count(F.lit(1)), 4).alias("avg_gap_days"),
                 F.min("gap_days").cast("long").alias("min_gap_days"),
                 F.max("gap_days").cast("long").alias("max_gap_days"),
                 F.round(F.sum(F.when(F.col("gap_days") <= 30, 1)
                               .otherwise(0)).cast("double")
                         / F.count(F.lit(1)), 4).alias("share_within_30d")))
