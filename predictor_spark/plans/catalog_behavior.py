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
    SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ddate,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def skewed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per (event type, day) via the skew-proof
    two-stage form (operators/skew.py): dedupe on the full (key, payload)
    tuple — a shuffle that balances no matter how hot a key is — then
    count per key. Result-identical to count_distinct; at 100 TB it is
    the difference between one whale reducer and an even spread. Keyed
    per-day (not per-type alone) so the graded output VARIES — at the
    sweep SF every type sees every user, and a constant output is a
    degenerate grade (tools/check_correctness.degenerate_numeric)."""
    from predictor_spark.operators.skew import two_stage_count_distinct

    ev = _t(spark, sf_dir, "events").withColumn(
        "ddate", F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd"))
    return (two_stage_count_distinct(ev, ["event_type", "ddate"], "user_id")
            .orderBy("event_type", "ddate"))


@query(
    "survival_km_conversion",
    oracle="""
    WITH su AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT su.user_id, su.t0, min(e.ts) AS t1
        FROM su LEFT JOIN events e
          ON e.user_id = su.user_id AND e.event_type = 'purchase'
         AND e.ts > su.t0
        GROUP BY su.user_id, su.t0
    ),
    obs AS (
        SELECT user_id,
               CASE WHEN t1 IS NULL THEN CAST(72 AS BIGINT)
                    ELSE least(CAST(floor((epoch_us(t1) - epoch_us(t0))
                                          / 3600e6) AS BIGINT), 72) END AS t,
               t1 IS NOT NULL
                   AND floor((epoch_us(t1) - epoch_us(t0)) / 3600e6) <= 72
                   AS died
        FROM conv
    ),
    per_t AS (
        SELECT t, count(*) AS ucnt,
               CAST(count(*) FILTER (died) AS BIGINT) AS d
        FROM obs GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               CAST(sum(ucnt) OVER (ORDER BY t DESC ROWS UNBOUNDED
                                    PRECEDING) AS BIGINT) AS n_risk
        FROM per_t
    )
    SELECT t AS dur_h, d AS n_died, n_risk,
           round(exp(sum(ln(1.0 - CAST(d AS DOUBLE) / n_risk))
                     OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6) + 0.0
               AS survival
    FROM risk WHERE d > 0
    """,
)
def survival_km_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of signup→first-purchase conversion
    time (hours), right-censored administratively at 72 h: users who have
    not purchased within the horizon stay in the risk set until 72 then
    leave censored — the standard churn/conversion survival curve the
    OLAP dashboards plot.  S(t) = Π_{t_i≤t} (1 − d_i/n_i); deaths and
    risk sets are exact integers, the product runs as exp(Σ ln(·)) over
    the 6-dp-rounded output.

    Scale: two shuffles on user_id (signup min, conditional purchase
    min), then everything aggregates to |distinct durations| ≤ horizon
    rows — the KM windows run over that tiny frame.  The risk set is a
    reverse cumulative sum, not a correlated subquery.
    """
    ev = _t(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t0"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("pts"))
    # qualification INSIDE the left join: a user whose purchases all
    # precede signup must stay (censored), not vanish via a post-filter
    conv = (
        su.join(pur, (F.col("user_id") == F.col("p_uid"))
                & (F.col("pts") > F.col("t0")), "left")
        .groupBy("user_id", "t0")
        .agg(F.min("pts").alias("t1"))
    )
    dur = F.floor((F.unix_micros("t1") - F.unix_micros("t0")) / F.lit(3600e6))
    obs = conv.select(
        "user_id",
        F.when(F.col("t1").isNull(), F.lit(72).cast("long"))
         .otherwise(F.least(dur.cast("long"), F.lit(72).cast("long"))).alias("t"),
        (F.col("t1").isNotNull() & (dur <= 72)).alias("died"),
    )
    per_t = obs.groupBy("t").agg(
        F.count(F.lit(1)).alias("ucnt"),
        F.sum(F.when(F.col("died"), 1).otherwise(0)).cast("long").alias("d"),
    )
    wdesc = Window.orderBy(F.col("t").desc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    wasc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.withColumn("n_risk", F.sum("ucnt").over(wdesc))
    return (
        risk.withColumn(
            "survival",
            F.round(F.exp(F.sum(
                F.log(1.0 - F.col("d").cast("double") / F.col("n_risk"))
            ).over(wasc)), 6) + F.lit(0.0),
        )
        .filter(F.col("d") > 0)
        .select(F.col("t").alias("dur_h"), F.col("d").alias("n_died"),
                "n_risk", "survival")
    )


@query(
    "session_top_paths",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id, event_type,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess
        FROM marked
    ),
    paths AS (
        SELECT array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:3], '>') AS path
        FROM sessions GROUP BY user_id, sess
    )
    SELECT path, count(*) AS n FROM paths
    GROUP BY path ORDER BY n DESC, path LIMIT 10
    """,
)
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey openings: sessionize (30-min gap), take each
    session's first three event types as a `a>b>c` path, rank the ten
    most common (lexicographic tie-break).  The product-analytics "path
    analysis" view over the same sessionization law as
    sessionize_counts / streaming_session_windows.

    Scale: one shuffle on user_id for the gap/cumsum windows, then the
    per-session head is a slice of an ordered collect bounded at 3 via
    the aggregation — path cardinality is |types|³ at most, so the final
    count + top-k is tiny (TakeOrderedAndProject).
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
               / 1e6 > 1800.0),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sess", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    paths = (
        sess.groupBy("user_id", "sess")
        .agg(F.expr(
            "array_join(slice(array_sort(collect_list(struct(ts, event_id,"
            " event_type))).event_type, 1, 3), '>')").alias("path"))
    )
    return (
        paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path").limit(10)
    )


@query(
    "scd2_user_segment_history",
    oracle="""
    WITH weekly AS (
        SELECT user_id, date_trunc('week', ts) AS wk, count(*) AS n
        FROM events GROUP BY user_id, date_trunc('week', ts)
    ),
    seg AS (
        SELECT user_id, wk,
               CAST(floor(epoch(wk) / 604800.0) AS BIGINT) AS wk_idx,
               CASE WHEN n < 5 THEN 'low'
                    WHEN n < 15 THEN 'mid'
                    ELSE 'high' END AS segment
        FROM weekly
    ),
    isl AS (
        SELECT user_id, segment, wk, wk_idx,
               wk_idx - row_number() OVER (PARTITION BY user_id, segment
                                           ORDER BY wk_idx) AS grp
        FROM seg
    )
    SELECT user_id, segment,
           strftime(min(wk), '%Y-%m-%d') AS valid_from,
           strftime(max(wk), '%Y-%m-%d') AS valid_to,
           count(*) AS n_weeks
    FROM isl GROUP BY user_id, segment, grp
    """,
)
def scd2_user_segment_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history: each user's weekly
    activity segment (low/mid/high by event count) collapsed into
    validity ranges — consecutive weeks in the same segment become one
    (valid_from, valid_to) row, an inactive or changed week closes the
    range (gaps-and-islands on the epoch-week index).  This is the
    history-tracking half of the OLAP upsert family: `olap_fact_upsert`
    maintains current state, this row materializes the change history a
    dashboard time-travels over.

    Scale: one shuffle to (user, week) aggregates, one window pass on
    the tiny weekly frame, one final aggregate — the events fact is
    touched once.
    """
    ev = _t(spark, sf_dir, "events")
    weekly = (
        ev.groupBy("user_id", F.date_trunc("week", "ts").alias("wk"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    seg = weekly.select(
        "user_id", "wk",
        F.floor(F.unix_timestamp("wk") / 604800.0).cast("long").alias("wk_idx"),
        F.when(F.col("n") < 5, "low").when(F.col("n") < 15, "mid")
         .otherwise("high").alias("segment"),
    )
    w = Window.partitionBy("user_id", "segment").orderBy("wk_idx")
    return (
        seg.withColumn("grp", F.col("wk_idx") - F.row_number().over(w))
        .groupBy("user_id", "segment", "grp")
        .agg(
            F.date_format(F.min("wk"), "yyyy-MM-dd").alias("valid_from"),
            F.date_format(F.max("wk"), "yyyy-MM-dd").alias("valid_to"),
            F.count(F.lit(1)).alias("n_weeks"),
        )
        .drop("grp")
    )


@query(
    "basket_association_rules",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS sess, event_type
        FROM events
    ),
    n AS (SELECT count(DISTINCT (user_id, sess)) AS n_baskets FROM baskets),
    item AS (
        SELECT event_type, count(*) AS cnt FROM baskets GROUP BY event_type
    ),
    pair AS (
        SELECT a.event_type AS lhs, b.event_type AS rhs, count(*) AS cnt
        FROM baskets a JOIN baskets b
          ON a.user_id = b.user_id AND a.sess = b.sess
         AND a.event_type <> b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.lhs, p.rhs,
           round(CAST(p.cnt AS DOUBLE) / n.n_baskets, 6) AS support,
           round(CAST(p.cnt AS DOUBLE) / la.cnt, 6) AS confidence,
           round(CAST(p.cnt AS DOUBLE) * n.n_baskets
                 / (CAST(la.cnt AS DOUBLE) * lb.cnt), 6) AS lift
    FROM pair p
    JOIN item la ON la.event_type = p.lhs
    JOIN item lb ON lb.event_type = p.rhs
    CROSS JOIN n
    WHERE CAST(p.cnt AS DOUBLE) / n.n_baskets >= 0.01
    """,
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules over per-(user, day) baskets (Apriori
    k=2, Agrawal-Srikant): a basket is the distinct event types a user
    produced that day (30-min sessions here average ~1 event, so the
    day is the natural basket), rules LHS→RHS reported with support,
    confidence, and lift above 1% support — the frequent-itemset layer
    of the behavior family.

    Scale: baskets collapse to DISTINCT (user, day, item) rows before
    any pairing, and the pair join is per-basket (baskets are ≤|item
    types| long, so the fan-out is bounded by |types|² per basket, not
    by events).  Item and basket totals are broadcast scalars.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    # cache: the distinct basket frame feeds the item totals, the basket
    # count, and BOTH sides of the pair join — without it four events
    # scans run per execution; and the basket total rides in the plan as
    # a broadcast 1-row aggregate (the oracle's CROSS JOIN n), so
    # building this DataFrame stays lazy (review finding: an eager
    # .count() here ran a Spark job at plan-construction time)
    baskets = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("sess"), "event_type"
    ).distinct().cache()
    nb = baskets.select("user_id", "sess").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets"))
    item = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    b2 = baskets.select(
        F.col("user_id").alias("u2"), F.col("sess").alias("s2"),
        F.col("event_type").alias("rhs"))
    pair = (
        baskets.join(
            b2,
            (F.col("user_id") == F.col("u2")) & (F.col("sess") == F.col("s2"))
            & (F.col("event_type") != F.col("rhs")))
        .groupBy(F.col("event_type").alias("lhs"), "rhs")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    la = item.select(F.col("event_type").alias("lhs"), F.col("cnt").alias("lcnt"))
    lb = item.select(F.col("event_type").alias("rhs"), F.col("cnt").alias("rcnt"))
    n_b = F.col("n_baskets")
    return (
        pair.join(F.broadcast(la), "lhs").join(F.broadcast(lb), "rhs")
        .crossJoin(F.broadcast(nb))  # 1-row scalar
        .filter(F.col("cnt").cast("double") / n_b >= 0.01)
        .select(
            "lhs", "rhs",
            F.round(F.col("cnt").cast("double") / n_b, 6).alias("support"),
            F.round(F.col("cnt").cast("double") / F.col("lcnt"), 6)
            .alias("confidence"),
            F.round(F.col("cnt").cast("double") * n_b
                    / (F.col("lcnt").cast("double") * F.col("rcnt")), 6)
            .alias("lift"),
        )
    )


@query(
    "ab_test_chi_square",
    oracle="""
    WITH assign AS (
        SELECT user_id,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))
                    AS BIGINT) % 2 AS grp
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    conv AS (
        SELECT a.user_id, a.grp,
               CASE WHEN sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
                         > sum(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS converted
        FROM assign a LEFT JOIN events e ON e.user_id = a.user_id
        GROUP BY a.user_id, a.grp
    ),
    cells AS (
        SELECT
            CAST(sum(CASE WHEN grp = 0 AND converted = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS a,
            CAST(sum(CASE WHEN grp = 0 AND converted = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS b,
            CAST(sum(CASE WHEN grp = 1 AND converted = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS c,
            CAST(sum(CASE WHEN grp = 1 AND converted = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS d
        FROM conv
    )
    SELECT CAST(a AS BIGINT) AS conv_a, CAST(b AS BIGINT) AS noconv_a,
           CAST(c AS BIGINT) AS conv_b, CAST(d AS BIGINT) AS noconv_b,
           round(a / (a + b), 6) AS rate_a,
           round(c / (c + d), 6) AS rate_b,
           round((a + b + c + d) * (a * d - b * c) * (a * d - b * c)
                 / ((a + b) * (c + d) * (a + c) * (b + d)), 6) AS chi2
    FROM cells
    """,
)
def ab_test_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 χ² test of a per-user outcome (more purchases than errors —
    a predicate that splits users non-degenerately at every SF, where
    "any purchase" saturates) between two deterministic hash-assigned
    user groups — the experimentation
    primitive the reference's OLAP dashboards exist to feed.  The md5
    assignment is the same engine-independent splitter as
    dataset_split_assignment, so both engines build identical cells;
    χ² = n(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) is pure arithmetic (compare to
    the 1-dof critical value 3.84 downstream).

    Scale: one distinct-users pass, one per-user conversion aggregate,
    then four counters in a single final row — partial aggregation all
    the way; nothing is user-count-sized on the driver.
    """
    ev = _t(spark, sf_dir, "events")
    grp = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 2
    )
    conv = (
        ev.groupBy("user_id")
        .agg(
            (F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
             > F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)))
            .cast("int").alias("converted"))
        .select(grp.alias("grp"), "converted")
    )
    cells = conv.agg(
        F.sum(F.when((F.col("grp") == 0) & (F.col("converted") == 1), 1)
              .otherwise(0)).cast("double").alias("a"),
        F.sum(F.when((F.col("grp") == 0) & (F.col("converted") == 0), 1)
              .otherwise(0)).cast("double").alias("b"),
        F.sum(F.when((F.col("grp") == 1) & (F.col("converted") == 1), 1)
              .otherwise(0)).cast("double").alias("c"),
        F.sum(F.when((F.col("grp") == 1) & (F.col("converted") == 0), 1)
              .otherwise(0)).cast("double").alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    n = a + b + c + d
    chi2 = n * (a * d - b * c) * (a * d - b * c) \
        / ((a + b) * (c + d) * (a + c) * (b + d))
    return cells.select(
        a.cast("bigint").alias("conv_a"), b.cast("bigint").alias("noconv_a"),
        c.cast("bigint").alias("conv_b"), d.cast("bigint").alias("noconv_b"),
        F.round(a / (a + b), 6).alias("rate_a"),
        F.round(c / (c + d), 6).alias("rate_b"),
        F.round(chi2, 6).alias("chi2"),
    )
