"""Catalog part — behavioral / product-analytics rows over the events
stream: sequential funnel conversion, weekly cohort retention, and
per-group decile profiles. The reference's OLAP layer (olap/ ETL +
dashboards) answers exactly this question class over experiment events;
these rows express the canonical forms Spark-first.

All three are aggregation-only plans: funnel is a chain of per-user
conditional mins (joins stay on the user key — co-partitioned, no
broadcast needed), retention is two aggregates over (user, week), and
deciles are one window pass with a deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2 FROM events e
        JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3 FROM events e
        JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_after_view,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_after_click
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view -> click -> purchase: each stage counts
    users whose earliest qualifying event is strictly AFTER their entry
    into the previous stage. Stage joins are per-user equi-joins (same
    shuffle key throughout — one partitioning reused), stage frames
    shrink monotonically."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(kind: str, prev: DataFrame | None) -> DataFrame:
        cur = ev.filter(F.col("event_type") == kind)
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(F.col("ts") > F.col("t_prev"))
        # each stage frame feeds BOTH the next stage and its own count —
        # cache the tiny per-user frame so the chain executes once, not
        # once per downstream consumer (3 counts would otherwise re-scan
        # events ~6x)
        return cur.groupBy("user_id").agg(F.min("ts").alias("t_prev")).cache()

    v = stage("view", None)
    c = stage("click", v)
    p = stage("purchase", c)
    counts = [df.agg(F.count(F.lit(1)).alias(name))
              for df, name in ((v, "n_view"), (c, "n_click_after_view"),
                               (p, "n_purchase_after_click"))]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH weeks AS (
        SELECT user_id, date_trunc('week', ts) AS wk FROM events
    ), first_seen AS (
        SELECT user_id, min(wk) AS cohort FROM weeks GROUP BY user_id
    )
    SELECT f.cohort,
           CAST(datediff('week', f.cohort, w.wk) AS BIGINT) AS week_offset,
           CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_active
    FROM weeks w JOIN first_seen f ON f.user_id = w.user_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, distinct
    actives per (cohort, week offset). Two aggregates on the user key +
    one distinct-count shuffle — the cohort dimension never leaves the
    executor side."""
    ev = _t(spark, sf_dir, "events")
    weeks = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    first_seen = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        weeks.join(first_seen, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("bigint").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort", "week_offset")
    )


@query(
    "value_decile_profile",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               ntile(10) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS decile
        FROM events
    )
    SELECT event_type, decile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 6) AS lo,
           round(max(value), 6) AS hi,
           round(avg(value), 6) AS mean_value
    FROM ranked GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def value_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type decile profile of value — ntile over a DETERMINISTIC
    order (value, event_id): without the id tie-break, engines may assign
    tied values to different tiles. One window pass + one aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
            F.round(F.avg("value"), 6).alias("mean_value"),
        )
        .orderBy("event_type", "decile")
    )


@query(
    "skewed_distinct_users",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def skewed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via the skew-proof two-stage
    form (operators/skew.py): dedupe on the full (key, payload) tuple —
    a shuffle that balances no matter how hot a key is — then count per
    key. Result-identical to count_distinct; at 100 TB it is the
    difference between one whale reducer and an even spread."""
    from predictor_spark.operators.skew import two_stage_count_distinct

    ev = _t(spark, sf_dir, "events")
    return two_stage_count_distinct(ev, "event_type", "user_id").orderBy("event_type")
