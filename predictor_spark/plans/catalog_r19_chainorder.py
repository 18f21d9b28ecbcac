"""Catalog part — Markov-chain structure tests (STAGED r11).

The journey-model rows (event_transition_matrix, markov_entropy_rate,
next-event prediction) all ASSUME the user-event stream is a
first-order chain over a stable transition matrix. These rows test
both assumptions:

- markov_order_lr_test   likelihood-ratio G² test of order 0 vs order
                         1 (independence of consecutive events):
                         G² = 2·Σ c_ij·ln(c_ij·N / (r_i·s_j)),
                         df = (k-1)² — large G² rejects memorylessness,
                         justifying the first-order model (Anderson &
                         Goodman 1957)
- chain_halves_drift     stationarity check: the L1 distance between
                         each source state's conditional next-event
                         distribution estimated on the first vs second
                         half of the time range — per-src drift of the
                         transition matrix over time

Determinism: transition counts are exact integers under the (ts,
event_id) ordering idiom; the half split is the midpoint of the global
[min, max] event-ts range (the chow idiom); G² terms and L1 distances
are doubles of exact integer ratios, rounded 6 dp.

Scale: one user-key window pass each -> |types|² count frames;
everything after is constant-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_PAIRS_SQL = """
    p AS (
        SELECT ts, event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ),
    c AS (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM p
        WHERE dst IS NOT NULL GROUP BY src, dst
    )"""


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type",
                                            "ts", "event_id")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.select("ts", F.col("event_type").alias("src"),
                      F.lead("event_type").over(wu).alias("dst"))
            .filter(F.col("dst").isNotNull()))


@query(
    "markov_order_lr_test",
    oracle=f"""
    WITH {_PAIRS_SQL},
    tot AS (
        SELECT sum(n) AS total FROM c
    ),
    marg AS (
        SELECT c.src, c.dst, c.n, r.rn, s.sn, tot.total
        FROM c
        JOIN (SELECT src, sum(n) AS rn FROM c GROUP BY src) r
          ON r.src = c.src
        JOIN (SELECT dst, sum(n) AS sn FROM c GROUP BY dst) s
          ON s.dst = c.dst, tot
    )
    SELECT CAST(max(total) AS BIGINT) AS n_transitions,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT src) - 1)
                * (count(DISTINCT dst) - 1) AS BIGINT) AS df,
           round(2.0 * sum(n * ln(CAST(n AS DOUBLE) * total
                                  / (CAST(rn AS DOUBLE) * sn))), 6)
               AS g2_stat
    FROM marg
    """,
)
def markov_order_lr_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G² likelihood-ratio test of zeroth- vs first-order dependence in
    the user event chain: under memorylessness G² ~ chi²((k-1)²); a
    large statistic is the license for every first-order journey model
    downstream. Exact counts in, one log expression out.

    Scale: one user-key window pass -> |types|² cells."""
    # cached: the |types|² count frame feeds the total and both margins
    # (one events scan, not four — plan audit)
    c = (_pairs(spark, sf_dir)
         .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
         .cache())
    tot = c.agg(F.sum("n").alias("total"))
    r = c.groupBy("src").agg(F.sum("n").alias("rn"))
    s = c.groupBy("dst").agg(F.sum("n").alias("sn"))
    marg = (c.join(F.broadcast(r), "src").join(F.broadcast(s), "dst")
            .crossJoin(F.broadcast(tot)))
    term = F.col("n") * F.log(
        F.col("n").cast("double") * F.col("total")
        / (F.col("rn").cast("double") * F.col("sn")))
    return marg.agg(
        F.max("total").cast("long").alias("n_transitions"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        ((F.count_distinct(F.col("src")) - 1)
         * (F.count_distinct(F.col("dst")) - 1)).cast("long").alias("df"),
        F.round(2.0 * F.sum(term), 6).alias("g2_stat"))


@query(
    "chain_halves_drift",
    oracle=f"""
    WITH span AS (
        SELECT min(ts) AS lo, max(ts) AS hi FROM events
    ),
    p AS (
        SELECT e.ts, e.event_type AS src,
               lead(e.event_type) OVER (PARTITION BY e.user_id
                                        ORDER BY e.ts, e.event_id) AS dst
        FROM events e
    ),
    halves AS (
        -- integer-microsecond midpoint on BOTH engines (floor division),
        -- so a boundary event can never split differently
        SELECT CASE WHEN epoch_us(p.ts) <= epoch_us(span.lo)
                         + (epoch_us(span.hi) - epoch_us(span.lo)) // 2
                    THEN 1 ELSE 2 END AS half,
               src, dst, CAST(count(*) AS BIGINT) AS n
        FROM p, span WHERE dst IS NOT NULL GROUP BY 1, 2, 3
    ),
    probs AS (
        SELECT half, src, dst,
               CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY half, src) AS pr
        FROM halves
    ),
    joined AS (
        SELECT coalesce(a.src, b.src) AS src,
               coalesce(a.dst, b.dst) AS dst,
               coalesce(a.pr, 0.0) AS p1, coalesce(b.pr, 0.0) AS p2
        FROM (SELECT * FROM probs WHERE half = 1) a
        FULL OUTER JOIN (SELECT * FROM probs WHERE half = 2) b
          ON a.src = b.src AND a.dst = b.dst
    ),
    counts AS (
        SELECT half, src, sum(n) AS n FROM halves GROUP BY half, src
    )
    SELECT j.src,
           CAST(max(CASE WHEN c1.half = 1 THEN c1.n END) AS BIGINT)
               AS n_first,
           CAST(max(CASE WHEN c2.half = 2 THEN c2.n END) AS BIGINT)
               AS n_second,
           round(sum(abs(j.p1 - j.p2)), 6) AS l1_drift
    FROM joined j
    JOIN counts c1 ON c1.src = j.src AND c1.half = 1
    JOIN counts c2 ON c2.src = j.src AND c2.half = 2
    GROUP BY j.src ORDER BY j.src
    """,
)
def chain_halves_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source L1 distance between the conditional next-event
    distributions of the first and second half of the time range
    (midpoint split) — 0 for a stationary chain, 2 for disjoint
    supports. Missing cells count as probability 0 via the full outer
    join.

    Scale: one window pass; the drift math runs on 2·|types|² cells."""
    ev = _t(spark, sf_dir, "events")
    span = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    pairs = _pairs(spark, sf_dir)
    # integer-microsecond midpoint (floor), mirroring the oracle exactly
    mid_us = (F.unix_micros("lo")
              + F.floor((F.unix_micros("hi") - F.unix_micros("lo")) / 2)
              .cast("long"))
    halves = (pairs.crossJoin(F.broadcast(span))
              .select(F.when(F.unix_micros("ts") <= mid_us, 1)
                      .otherwise(2).alias("half"), "src", "dst")
              .groupBy("half", "src", "dst")
              .agg(F.count(F.lit(1)).alias("n"))
              .cache())
    wsrc = Window.partitionBy("half", "src")
    probs = halves.withColumn(
        "pr", F.col("n").cast("double") / F.sum("n").over(wsrc))
    a = (probs.filter(F.col("half") == 1)
         .select("src", "dst", F.col("pr").alias("p1")))
    b = (probs.filter(F.col("half") == 2)
         .select("src", "dst", F.col("pr").alias("p2")))
    joined = (a.join(b, ["src", "dst"], "full_outer")
              .select("src", "dst",
                      F.coalesce("p1", F.lit(0.0)).alias("p1"),
                      F.coalesce("p2", F.lit(0.0)).alias("p2")))
    counts = halves.groupBy("half", "src").agg(F.sum("n").alias("n"))
    c1 = (counts.filter(F.col("half") == 1)
          .select("src", F.col("n").alias("n_first")))
    c2 = (counts.filter(F.col("half") == 2)
          .select("src", F.col("n").alias("n_second")))
    return (joined.groupBy("src")
            .agg(F.round(F.sum(F.abs(F.col("p1") - F.col("p2"))), 6)
                 .alias("l1_drift"))
            .join(F.broadcast(c1), "src").join(F.broadcast(c2), "src")
            .select("src", F.col("n_first").cast("long").alias("n_first"),
                    F.col("n_second").cast("long").alias("n_second"),
                    "l1_drift")
            .orderBy("src"))
