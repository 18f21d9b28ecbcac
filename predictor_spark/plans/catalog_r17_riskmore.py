"""Catalog part — drawdown/benchmark risk ratios, set 4 (STAGED r10).

Closes the remaining gaps in the returns dashboard after
catalog_r7_risk (Sharpe/Sortino/VaR), catalog_r12_risk3
(Omega/Kelly/Ulcer) and catalog_r16_perfratios (IR/Treynor/M2):

- updown_capture_by_type  up-capture and down-capture ratios vs the
                          pooled benchmark: mean(r | rb>0)/mean(rb |
                          rb>0) and the same on rb<0 days — "do you
                          keep the upside and dodge the downside"
                          (Morningstar's headline pair)
- pain_martin_by_type     Pain index (mean percentage drawdown over
                          the whole sample — depth x time, linear
                          where Ulcer is RMS) and the Martin ratio
                          mean_return/ulcer (Martin & McCann 1989)
- tail_ratio_by_type      |p95|/|p5| of daily returns via exact
                          discrete order statistics (nearest-rank,
                          the value_quantiles convention) — >1 means
                          the right tail outweighs the left

Determinism: the capture/Martin moments are exact integer micro-unit
sums; drawdown percentages quantize to integer nano-units per day
before summation (the r12_risk3 Ulcer idiom); tail quantiles are exact
order statistics of integers. Doubles appear only in final ratios,
rounded 6 dp.

Scale: one events scan -> the shared daily rollup; the benchmark
attach is a ~30-row broadcast; running peaks are one cumulative window
per type; quantiles are rank windows over the tiny frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t  # noqa: F401
from predictor_spark.plans.catalog_r16_perfratios import (_ACTIVE_BASE,
                                                          _joined)
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets


@query(
    "updown_capture_by_type",
    oracle=f"""
    WITH {_ACTIVE_BASE},
    m AS (
        SELECT event_type,
               count(*) FILTER (rb > 0) AS n_up,
               count(*) FILTER (rb < 0) AS n_down,
               sum(CAST(r AS HUGEINT)) FILTER (rb > 0) AS sr_up,
               sum(CAST(rb AS HUGEINT)) FILTER (rb > 0) AS sb_up,
               sum(CAST(r AS HUGEINT)) FILTER (rb < 0) AS sr_down,
               sum(CAST(rb AS HUGEINT)) FILTER (rb < 0) AS sb_down
        FROM joined GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_up AS BIGINT) AS n_up,
           CAST(n_down AS BIGINT) AS n_down,
           round((CAST(sr_up AS DOUBLE) / n_up)
                 / (CAST(sb_up AS DOUBLE) / n_up), 6) AS up_capture,
           round((CAST(sr_down AS DOUBLE) / n_down)
                 / (CAST(sb_down AS DOUBLE) / n_down), 6) AS down_capture
    FROM m ORDER BY event_type
    """,
)
def updown_capture_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Up/down capture vs the pooled benchmark: mean series return on
    benchmark-up days over mean benchmark return those days, and the
    mirror on benchmark-down days. up > 1 and down < 1 is the ideal
    asymmetry. Exact integer conditional sums.

    Scale: the shared perfratios join + one conditional aggregate."""
    j = _joined(spark, sf_dir)
    dr = F.col("r").cast("decimal(38,0)")
    db = F.col("rb").cast("decimal(38,0)")
    up, down = F.col("rb") > 0, F.col("rb") < 0

    def csum(col, cond):
        return F.sum(F.when(cond, col).otherwise(F.lit(0)))

    m = j.groupBy("event_type").agg(
        F.sum(up.cast("long")).alias("n_up"),
        F.sum(down.cast("long")).alias("n_down"),
        csum(dr, up).alias("sr_up"), csum(db, up).alias("sb_up"),
        csum(dr, down).alias("sr_down"), csum(db, down).alias("sb_down"))
    return (m.select(
        "event_type",
        F.col("n_up").cast("long").alias("n_up"),
        F.col("n_down").cast("long").alias("n_down"),
        F.round(F.col("sr_up").cast("double")
                / F.col("sb_up").cast("double"), 6).alias("up_capture"),
        F.round(F.col("sr_down").cast("double")
                / F.col("sb_down").cast("double"), 6).alias("down_capture"))
        .orderBy("event_type"))


@query(
    "pain_martin_by_type",
    oracle=f"""
    WITH {_RET_BASE},
    curve AS (
        SELECT event_type, ddate, bar,
               max(bar) OVER (PARTITION BY event_type
                              ORDER BY ddate) AS peak
        FROM bars
    ),
    dd AS (
        SELECT event_type,
               CAST(round(1e9 * 100.0 * (peak - bar) / peak) AS BIGINT)
                   AS pd_nano,
               CAST(round(1e9 * power(100.0 * (peak - bar) / peak, 2))
                    AS BIGINT) AS pd2_nano
        FROM curve
    ),
    r AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(r AS HUGEINT)) AS sr
        FROM rets GROUP BY event_type
    ),
    d AS (
        SELECT event_type, count(*) AS nd,
               sum(CAST(pd_nano AS HUGEINT)) AS s1,
               sum(CAST(pd2_nano AS HUGEINT)) AS s2
        FROM dd GROUP BY event_type
    )
    SELECT r.event_type, CAST(r.n AS BIGINT) AS n_days,
           round(CAST(d.s1 AS DOUBLE) / d.nd / 1e9, 6) AS pain_index,
           round(sqrt(CAST(d.s2 AS DOUBLE) / d.nd / 1e9), 6) AS ulcer,
           round((CAST(r.sr AS DOUBLE) / r.n / 1e6 * 100.0)
                 / sqrt(CAST(d.s2 AS DOUBLE) / d.nd / 1e9), 6)
               AS martin_ratio
    FROM r JOIN d ON d.event_type = r.event_type
    ORDER BY r.event_type
    """,
)
def pain_martin_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pain index (mean percentage drawdown off the running peak of the
    daily value curve — the linear sibling of the RMS Ulcer) and the
    Martin ratio (mean daily return in percent over the Ulcer index),
    per event type. Drawdown percentages quantize to integer nano-units
    per day before the exact sums.

    Scale: one running-max window per type + two 5-group aggregates."""
    bars = (_t(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("ddate"))
            .agg(F.round(F.sum("value"), 6).alias("bar"))
            .cache())
    w = (Window.partitionBy("event_type").orderBy("ddate")
         .rowsBetween(Window.unboundedPreceding, 0))
    pd_pct = 100.0 * (F.max("bar").over(w) - F.col("bar")) \
        / F.max("bar").over(w)
    dd = bars.select(
        "event_type",
        F.round(1e9 * pd_pct, 0).cast("decimal(38,0)").alias("pd_nano"),
        F.round(1e9 * F.pow(pd_pct, 2), 0).cast("decimal(38,0)")
        .alias("pd2_nano"))
    wt = Window.partitionBy("event_type").orderBy("ddate")
    rets = (bars.withColumn("prev", F.lag("bar").over(wt))
            .filter(F.col("prev").isNotNull() & (F.col("prev") > 0))
            .select("event_type",
                    F.round(1000000.0 * (F.col("bar") / F.col("prev") - 1.0),
                            0).cast("decimal(38,0)").alias("r")))
    r = rets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("r").alias("sr"))
    d = dd.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("pd_nano").alias("s1"), F.sum("pd2_nano").alias("s2"))
    ulcer = F.sqrt(F.col("s2").cast("double") / F.col("nd") / 1e9)
    return (r.join(d, "event_type")
            .select("event_type", F.col("n").cast("long").alias("n_days"),
                    F.round(F.col("s1").cast("double")
                            / F.col("nd") / 1e9, 6).alias("pain_index"),
                    F.round(ulcer, 6).alias("ulcer"),
                    F.round((F.col("sr").cast("double")
                             / F.col("n") / 1e6 * 100.0) / ulcer, 6)
                    .alias("martin_ratio"))
            .orderBy("event_type"))


@query(
    "tail_ratio_by_type",
    oracle=f"""
    WITH {_RET_BASE},
    ranked AS (
        SELECT event_type, r,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY r, ddate) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM rets
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
           round(max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                     THEN r END) / 1e6, 6) AS p95,
           round(max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                     THEN r END) / 1e6, 6) AS p05,
           round(abs(max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                         THEN r END))
                 / abs(max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                           THEN r END)), 6) AS tail_ratio
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
)
def tail_ratio_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail ratio |p95|/|p5| of daily returns per type from exact
    nearest-rank order statistics (ceil(q·n), ties broken by date in
    the rank order — integer-exact on both engines). >1: upside tail
    dominates.

    Scale: one rank window over the tiny return frame."""
    r = _rets(spark, sf_dir)
    wr = Window.partitionBy("event_type").orderBy("r", "ddate")
    wt = Window.partitionBy("event_type")
    ranked = (r.withColumn("rn", F.row_number().over(wr))
              .withColumn("n", F.count(F.lit(1)).over(wt)))
    p95 = F.max(F.when(
        F.col("rn") == F.ceil(0.95 * F.col("n")).cast("long"), F.col("r")))
    p05 = F.max(F.when(
        F.col("rn") == F.ceil(0.05 * F.col("n")).cast("long"), F.col("r")))
    return (ranked.groupBy("event_type")
            .agg(F.max("n").cast("long").alias("n_days"),
                 F.round(p95 / 1e6, 6).alias("p95"),
                 F.round(p05 / 1e6, 6).alias("p05"),
                 F.round(F.abs(p95) / F.abs(p05), 6).alias("tail_ratio"))
            .orderBy("event_type"))
