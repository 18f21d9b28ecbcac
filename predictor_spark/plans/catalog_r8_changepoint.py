"""Catalog part — change-point detection by binary segmentation
(STAGED for r8).

Completes the structural-break surface (cusum_changepoint finds the
max cumulative deviation; the EWMA chart flags drifts) with the
segmentation view (Scott & Knott 1974; the building block of binseg /
wild binseg and the greedy step of PELT):

- binseg_mean_split    the best single mean break per series: the
                       split maximizing the SSE reduction
                       gain(k) = SSE_total − SSE_left − SSE_right
- binseg_second_split  one recursion step: the best split WITHIN
                       each side of the first break, the winner
                       reported — the actual binary-segmentation
                       iteration
- level_shift_t_stat   the two-sample t statistic of the level shift
                       at the chosen break (the "is it real" readout)

Series grain: daily total CENTS per event type (exact integers, the
bar grain of the EWMA/Bollinger rows); minimum segment length 3.

Determinism: prefix sums S1/S2 are exact DECIMAL integers; each
gain is one closed-form double expression over them (identical tree
both engines), ranked by its 6-dp rounding with the index tie-break —
a knife-edge rounding can reorder nothing.

Scale: NO UDF anywhere — prefix sums are one window pass per series,
candidates are the same rows, the argmax is a rank window.  O(n) per
series for the exact best split (the textbook O(n²) scan collapses
because mean-SSE is prefix-decomposable); series are the parallel
axis; the recursion step re-runs the same window math once per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_MINSEG = 3

#: oracle prelude: per-series indexed daily-cents bars with prefix
#: sums and series totals (all exact integers)
_PREFIX = """
    base AS (
        SELECT event_type AS sid, CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS bar
        FROM events GROUP BY 1, 2
    ),
    pre AS MATERIALIZED (
        SELECT sid,
               row_number() OVER w AS k,
               count(*) OVER (PARTITION BY sid) AS n,
               sum(CAST(bar AS HUGEINT)) OVER
                   (w ROWS UNBOUNDED PRECEDING) AS s1,
               sum(CAST(bar AS HUGEINT) * bar) OVER
                   (w ROWS UNBOUNDED PRECEDING) AS s2,
               sum(CAST(bar AS HUGEINT)) OVER (PARTITION BY sid) AS t1,
               sum(CAST(bar AS HUGEINT) * bar) OVER (PARTITION BY sid) AS t2
        FROM base WINDOW w AS (PARTITION BY sid ORDER BY day)
    )
"""

#: gain(k) = SSE_total − SSE_left(k) − SSE_right(k), one double tree
_GAIN = ("(CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * t1 / n)"
         " - (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)"
         " - (CAST(t2 - s2 AS DOUBLE)"
         "    - CAST(t1 - s1 AS DOUBLE) * (t1 - s1) / (n - k))")


def _prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the oracle `pre` frame."""
    ev = _t(spark, sf_dir, "events")
    bars = (ev.select(F.col("event_type").alias("sid"),
                      F.col("ts").cast("date").alias("day"),
                      F.round(F.col("value") * 100).cast("long")
                      .alias("cents"))
            .groupBy("sid", "day").agg(F.sum("cents").alias("bar")))
    w = Window.partitionBy("sid").orderBy("day")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy("sid")
    b = F.col("bar").cast("decimal(38,0)")
    return bars.select(
        "sid",
        F.row_number().over(w).alias("k"),
        F.count(F.lit(1)).over(wa).alias("n"),
        F.sum(b).over(wc).alias("s1"),
        F.sum(b * F.col("bar")).over(wc).alias("s2"),
        F.sum(b).over(wa).alias("t1"),
        F.sum(b * F.col("bar")).over(wa).alias("t2"))


def _gain_col() -> "F.Column":
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    sse_tot = d("t2") - d("t1") * F.col("t1") / F.col("n")
    sse_l = d("s2") - d("s1") * F.col("s1") / F.col("k")
    sse_r = ((F.col("t2") - F.col("s2")).cast("double")
             - (F.col("t1") - F.col("s1")).cast("double")
             * (F.col("t1") - F.col("s1")) / (F.col("n") - F.col("k")))
    return sse_tot - sse_l - sse_r


def _best_split(spark: SparkSession, sf_dir: str,
                pre: DataFrame | None = None) -> DataFrame:
    """(sid, n, k, gain, s1, s2, t1, t2) of the winning split.

    ``pre`` lets a caller that ALSO consumes the prefix frame share one
    (cached) copy instead of re-deriving the events scan + bar
    aggregate + window chain inside this helper (r14, guide §2.4)."""
    if pre is None:
        pre = _prefix(spark, sf_dir)
    cand = (pre.where((F.col("k") >= _MINSEG)
                      & (F.col("k") <= F.col("n") - _MINSEG))
            .withColumn("gain", _gain_col()))
    w = Window.partitionBy("sid").orderBy(
        F.desc(F.round(F.col("gain"), 6)), "k")
    return (cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn"))


_BEST_SQL = f"""
    cand AS (
        SELECT sid, n, k, s1, s2, t1, t2, {_GAIN} AS gain
        FROM pre WHERE k >= {_MINSEG} AND k <= n - {_MINSEG}
    ),
    best AS (
        SELECT * FROM (
            SELECT cand.*,
                   row_number() OVER (PARTITION BY sid
                                      ORDER BY round(gain, 6) DESC, k) AS rn
            FROM cand
        ) WHERE rn = 1
    )
"""


@query(
    "binseg_mean_split",
    oracle=f"""
    WITH {_PREFIX},
    {_BEST_SQL}
    SELECT sid AS event_type, CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS split_idx,
           round(gain) / 10000.0 AS gain,
           round(CAST(s1 AS DOUBLE) * 100 / k) / 10000.0 AS mean_left,
           round(CAST(t1 - s1 AS DOUBLE) * 100 / (n - k)) / 10000.0
               AS mean_right
    FROM best ORDER BY event_type
    """,
)
def binseg_mean_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The best single mean break per series (gain reported in value²
    units, means in value units).  split_idx = the last bar of the
    left segment.

    Display rounding rides the INTEGER-SCALE idiom round(x·10^d)/10^d:
    these outputs are small-denominator rationals, and a value that
    terminates exactly at digit d+1 with a 5 makes Spark (rounds the
    shortest decimal repr) and DuckDB (rounds the binary value)
    disagree by one ulp of the last digit — at integer scale the only
    boundary cases are exact dyadic halves, which both engines round
    identically (half away from zero).

    Scale: module docstring — one window pass + one rank window, no
    UDF, series-parallel."""
    best = _best_split(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (best.select(
        F.col("sid").alias("event_type"),
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("split_idx"),
        (F.round(F.col("gain")) / 10000.0).alias("gain"),
        (F.round(d("s1") * 100 / F.col("k")) / 10000.0).alias("mean_left"),
        (F.round((F.col("t1") - F.col("s1")).cast("double") * 100
                 / (F.col("n") - F.col("k"))) / 10000.0)
        .alias("mean_right"))
        .orderBy("event_type"))


@query(
    "binseg_second_split",
    oracle=f"""
    WITH {_PREFIX},
    {_BEST_SQL},
    seg AS MATERIALIZED (
        SELECT p.sid, p.k AS i, b.k AS k1, p.n AS n_full,
               CASE WHEN p.k <= b.k THEN 0 ELSE 1 END AS side,
               p.s1 AS ps1, p.s2 AS ps2
        FROM pre p JOIN best b USING (sid)
    ),
    segpre AS (
        -- re-express each side's prefix sums relative to its start
        SELECT sid, side, k1, n_full,
               i - CASE WHEN side = 1 THEN k1 ELSE 0 END AS k,
               max(i) OVER (PARTITION BY sid, side)
                   - CASE WHEN side = 1 THEN k1 ELSE 0 END AS n,
               ps1 - CASE WHEN side = 1
                          THEN max(CASE WHEN i = k1 THEN ps1 END)
                               OVER (PARTITION BY sid)
                          ELSE 0 END AS s1,
               ps2 - CASE WHEN side = 1
                          THEN max(CASE WHEN i = k1 THEN ps2 END)
                               OVER (PARTITION BY sid)
                          ELSE 0 END AS s2,
               max(ps1) OVER (PARTITION BY sid, side)
                   - CASE WHEN side = 1
                          THEN max(CASE WHEN i = k1 THEN ps1 END)
                               OVER (PARTITION BY sid)
                          ELSE 0 END AS t1,
               max(ps2) OVER (PARTITION BY sid, side)
                   - CASE WHEN side = 1
                          THEN max(CASE WHEN i = k1 THEN ps2 END)
                               OVER (PARTITION BY sid)
                          ELSE 0 END AS t2
        FROM seg
    ),
    cand2 AS (
        SELECT sid, side, k1, k, n, {_GAIN} AS gain
        FROM segpre WHERE k >= {_MINSEG} AND k <= n - {_MINSEG}
    ),
    best2 AS (
        SELECT * FROM (
            SELECT cand2.*,
                   row_number() OVER (PARTITION BY sid
                                      ORDER BY round(gain, 6) DESC,
                                               side, k) AS rn
            FROM cand2
        ) WHERE rn = 1
    )
    SELECT sid AS event_type, CAST(k1 AS BIGINT) AS split1_idx,
           CAST(k + CASE WHEN side = 1 THEN k1 ELSE 0 END AS BIGINT)
               AS split2_idx,
           round(gain) / 10000.0 AS gain2
    FROM best2 ORDER BY event_type
    """,
)
def binseg_second_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One recursion step of binary segmentation: within each side of
    the first break, the same O(n) best-split scan runs on prefix sums
    RE-BASED to the segment start (pure algebra on the already-computed
    global prefixes — the bars are never re-scanned); the higher-gain
    side wins (tie: left side, then smaller index).  split2_idx is
    reported on the global index axis.

    Scale: the recursion costs one more window pass over the same
    aggregate-sized frame per level — log-depth segmentation keeps the
    fact scan count at ONE."""
    # cached (r14, guide §2.4): pre is bounded (|event_types| x |days|
    # bars) and was derived TWICE in this plan — once directly and once
    # inside _best_split — so the events scan and the bar aggregate ran
    # twice for the same ~150-row frame
    pre = _prefix(spark, sf_dir).cache()
    best = (_best_split(spark, sf_dir, pre=pre)
            .select("sid", F.col("k").alias("k1")))
    seg = (pre.join(best, "sid")
           .withColumn("side", (F.col("k") > F.col("k1")).cast("int")))
    # prefix values at the split row, broadcast down each series
    at_split = F.max(F.when(F.col("k") == F.col("k1"), F.col("s1"))) \
        .over(Window.partitionBy("sid"))
    at_split2 = F.max(F.when(F.col("k") == F.col("k1"), F.col("s2"))) \
        .over(Window.partitionBy("sid"))
    wside = Window.partitionBy("sid", "side")
    off = F.when(F.col("side") == 1, F.col("k1")).otherwise(F.lit(0))
    off1 = F.when(F.col("side") == 1, at_split).otherwise(
        F.lit(0).cast("decimal(38,0)"))
    off2 = F.when(F.col("side") == 1, at_split2).otherwise(
        F.lit(0).cast("decimal(38,0)"))
    segpre = seg.select(
        "sid", "side", "k1",
        (F.col("k") - off).alias("k"),
        (F.max("k").over(wside) - off).alias("n"),
        (F.col("s1") - off1).alias("s1"),
        (F.col("s2") - off2).alias("s2"),
        (F.max("s1").over(wside) - off1).alias("t1"),
        (F.max("s2").over(wside) - off2).alias("t2"))
    cand2 = (segpre.where((F.col("k") >= _MINSEG)
                          & (F.col("k") <= F.col("n") - _MINSEG))
             .withColumn("gain", _gain_col()))
    w = Window.partitionBy("sid").orderBy(
        F.desc(F.round(F.col("gain"), 6)), "side", "k")
    best2 = (cand2.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1))
    return (best2.select(
        F.col("sid").alias("event_type"),
        F.col("k1").cast("long").alias("split1_idx"),
        (F.col("k") + F.when(F.col("side") == 1, F.col("k1"))
         .otherwise(F.lit(0))).cast("long").alias("split2_idx"),
        (F.round(F.col("gain")) / 10000.0).alias("gain2"))
        .orderBy("event_type"))


@query(
    "level_shift_t_stat",
    oracle=f"""
    WITH {_PREFIX},
    {_BEST_SQL}
    SELECT sid AS event_type, CAST(k AS BIGINT) AS split_idx,
           round(CAST(t1 - s1 AS DOUBLE) * 100 / (n - k)
                 - CAST(s1 AS DOUBLE) * 100 / k) / 10000.0 AS level_shift,
           round((CAST(t1 - s1 AS DOUBLE) / (n - k)
                  - CAST(s1 AS DOUBLE) / k)
                 / sqrt(((CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * s1 / k)
                         + (CAST(t2 - s2 AS DOUBLE)
                            - CAST(t1 - s1 AS DOUBLE) * (t1 - s1) / (n - k)))
                        / (n - 2))
                 / sqrt(1.0 / k + 1.0 / (n - k)), 4) AS t_stat
    FROM best ORDER BY event_type
    """,
)
def level_shift_t_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pooled two-sample t statistic of the mean shift at the
    chosen break — the standard 'is the break real' screen quoted
    next to a detected changepoint (a maximally-selected statistic;
    compare against max-selection critical values, not plain t).

    Scale: pure arithmetic over the best-split row — free once
    binseg_mean_split's frame exists."""
    best = _best_split(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean_l = d("s1") / F.col("k")
    mean_r = (F.col("t1") - F.col("s1")).cast("double") \
        / (F.col("n") - F.col("k"))
    sse_l = d("s2") - d("s1") * F.col("s1") / F.col("k")
    sse_r = ((F.col("t2") - F.col("s2")).cast("double")
             - (F.col("t1") - F.col("s1")).cast("double")
             * (F.col("t1") - F.col("s1")) / (F.col("n") - F.col("k")))
    shift = mean_r - mean_l
    pooled = F.sqrt((sse_l + sse_r) / (F.col("n") - 2))
    shift_scaled = ((F.col("t1") - F.col("s1")).cast("double") * 100
                    / (F.col("n") - F.col("k"))
                    - d("s1") * 100 / F.col("k"))
    return (best.select(
        F.col("sid").alias("event_type"),
        F.col("k").cast("long").alias("split_idx"),
        (F.round(shift_scaled) / 10000.0).alias("level_shift"),
        F.round(shift / pooled / F.sqrt(
            1.0 / F.col("k") + 1.0 / (F.col("n") - F.col("k"))), 4)
        .alias("t_stat"))
        .orderBy("event_type"))
