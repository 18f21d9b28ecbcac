"""Catalog part — range-based volatility estimators (STAGED for r7).

Completes the finance stack (indicators: catalog_indicators{,2}; risk
ratios: catalog_r7_risk) with the estimators a volatility desk derives
from OHLC bars rather than close-to-close returns:

- parkinson_volatility    Parkinson (1980) high-low range estimator:
                          sigma^2 = (1 / (4 n ln 2)) * sum ln(H/L)^2 —
                          ~5x more efficient than close-to-close
- garman_klass_volatility Garman & Klass (1980): per-bar
                          0.5*ln(H/L)^2 - (2 ln 2 - 1)*ln(C/O)^2
- realized_vol_7d         rolling 7-bar realized volatility of daily
                          log returns (the RV estimator of Andersen &
                          Bollerslev 1998), per (type, day)

Bars are the proven integer-cent OHLC idiom from catalog_indicators2
(high/low as plain aggregates, open/close from rank-1 rows under a
total (ts, event_id) order), extended with the open leg: the two
row_numbers share one (type, day) partitioning — one shuffle, two
in-partition sort orders.

Determinism: bar fields are exact integer cents, so every log ratio
ln(H/L), ln(C/O) is computed from the SAME IEEE double on both
engines; each per-bar term is immediately quantized to an integer
nano-unit (round(1e9 * term)) so the cross-bar sums are exact
integers regardless of partial-aggregation order; each estimator is
then one closed-form double expression rounded in-query.

Scale: one events scan -> one shuffle to (type, day) bars (~150 rows
at any SF); everything after is windows/aggregates over the tiny bar
frame.  The 100 TB cost is the daily rollup every bar pipeline
already pays.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

# integer-cent OHLC bars with BOTH open and close legs (oracle CTE);
# zero-price bars are excluded so every log ratio is defined
_OHLC_SQL = """
    bars AS (
        SELECT event_type, day,
               max(c) AS high, min(c) AS low,
               max(CASE WHEN rn_desc = 1 THEN c END) AS close,
               max(CASE WHEN rn_asc = 1 THEN c END) AS open
        FROM (
            SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   row_number() OVER (PARTITION BY event_type, day(ts)
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn_desc,
                   row_number() OVER (PARTITION BY event_type, day(ts)
                                      ORDER BY ts ASC, event_id ASC)
                       AS rn_asc
            FROM events
        )
        GROUP BY event_type, day
        HAVING min(c) > 0
    )
"""


def _ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type in exact integer cents — the
    catalog_indicators2 bar idiom plus the open leg (rank-1 ascending),
    both ranks over ONE (type, day) partitioning."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "day")
    rows = (ev.select("event_type",
                      F.dayofmonth("ts").cast("long").alias("day"),
                      "ts", "event_id",
                      F.round(F.col("value") * 100, 0).cast("long")
                      .alias("c"))
            .withColumn("rn_desc", F.row_number().over(
                w.orderBy(F.col("ts").desc(), F.col("event_id").desc())))
            .withColumn("rn_asc", F.row_number().over(
                w.orderBy(F.col("ts").asc(), F.col("event_id").asc()))))
    return (rows.groupBy("event_type", "day")
            .agg(F.max("c").alias("high"), F.min("c").alias("low"),
                 F.max(F.when(F.col("rn_desc") == 1, F.col("c")))
                 .alias("close"),
                 F.max(F.when(F.col("rn_asc") == 1, F.col("c")))
                 .alias("open"))
            .filter(F.col("low") > 0))


# ln(high/low)^2 in integer nano-units — quantized per bar so sums are
# exact under any aggregation order
_HL_NANO = "CAST(round(1e9 * ln(CAST(high AS DOUBLE) / low) ** 2) AS BIGINT)"
_CO_NANO = "CAST(round(1e9 * ln(CAST(close AS DOUBLE) / open) ** 2) AS BIGINT)"


def _hl_nano() -> F.Column:
    t = F.log(F.col("high").cast("double") / F.col("low"))
    return F.round(F.lit(1e9) * t * t, 0).cast("long")


def _co_nano() -> F.Column:
    t = F.log(F.col("close").cast("double") / F.col("open"))
    return F.round(F.lit(1e9) * t * t, 0).cast("long")


@query(
    "parkinson_volatility",
    oracle=f"""
    WITH {_OHLC_SQL}
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(sqrt(CAST(sum({_HL_NANO}) AS DOUBLE)
                      / (1e9 * 4 * ln(2) * count(*))), 6) AS parkinson_vol
    FROM bars GROUP BY event_type
    """,
)
def parkinson_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson (1980) range volatility per event type: the high-low
    estimator sqrt(sum ln(H/L)^2 / (4 n ln 2)) over daily bars, from
    exact nano-quantized per-bar terms.

    Scale: the only heavy stage is the (type, day) bar rollup; the
    estimator is a 5-group partial aggregate over ~150 bar rows."""
    bars = _ohlc(spark, sf_dir)
    s = bars.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_hl_nano()).alias("hl2"))
    return s.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.round(F.sqrt(F.col("hl2").cast("double")
                       / (1e9 * 4 * math.log(2) * F.col("n"))), 6)
        .alias("parkinson_vol"))


@query(
    "garman_klass_volatility",
    oracle=f"""
    WITH {_OHLC_SQL}
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(sqrt(greatest(
               CAST(sum(CAST(round(0.5 * {_HL_NANO}
                                   - (2 * ln(2) - 1) * {_CO_NANO})
                             AS BIGINT)) AS DOUBLE)
               / (1e9 * count(*)), 0.0)), 6) AS gk_vol
    FROM bars WHERE open > 0 GROUP BY event_type
    """,
)
def garman_klass_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garman-Klass (1980) OHLC volatility per event type: per-bar term
    0.5*ln(H/L)^2 - (2 ln 2 - 1)*ln(C/O)^2, nano-quantized, averaged,
    floored at zero before the square root (the estimator's standard
    negativity guard).

    Scale: same single bar rollup as parkinson_volatility; the term is
    computed bar-side so the group aggregate sums exact integers."""
    bars = _ohlc(spark, sf_dir).filter(F.col("open") > 0)
    term = F.round(0.5 * _hl_nano()
                   - (2 * math.log(2) - 1) * _co_nano(), 0).cast("long")
    s = bars.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(term).alias("t"))
    return s.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.round(F.sqrt(F.greatest(
            F.col("t").cast("double") / (1e9 * F.col("n")),
            F.lit(0.0))), 6).alias("gk_vol"))


@query(
    "realized_vol_7d",
    oracle=f"""
    WITH {_OHLC_SQL},
    rets AS (
        SELECT event_type, day,
               CAST(round(1e6 * ln(CAST(close AS DOUBLE)
                                   / lag(close) OVER (
                                         PARTITION BY event_type
                                         ORDER BY day))) AS BIGINT) AS r
        FROM bars
    ),
    win AS (
        SELECT event_type, day,
               sum(r * r) OVER (PARTITION BY event_type ORDER BY day
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS ss,
               count(r) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS cnt
        FROM rets WHERE r IS NOT NULL
    )
    SELECT event_type, day,
           round(sqrt(CAST(ss AS DOUBLE)) / 1e6, 6) AS realized_vol
    FROM win WHERE cnt = 7
    """,
)
def realized_vol_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-bar realized volatility per (type, day): the square
    root of the trailing sum of squared daily log close returns
    (micro-quantized so the rolling sum is exact); emitted only for
    complete windows.

    Scale: the lag and the rolling sum both ride the (type ordered by
    day) partitioning of the ~150-row bar frame — one tiny shuffle
    after the bar rollup."""
    bars = _ohlc(spark, sf_dir)
    wlag = Window.partitionBy("event_type").orderBy("day")
    rets = (bars.select(
        "event_type", "day",
        F.round(F.lit(1e6) * F.log(F.col("close").cast("double")
                                   / F.lag("close").over(wlag)), 0)
        .cast("long").alias("r"))
        .filter(F.col("r").isNotNull()))
    wroll = (Window.partitionBy("event_type").orderBy("day")
             .rowsBetween(-6, 0))
    win = rets.select(
        "event_type", "day",
        F.sum(F.col("r") * F.col("r")).over(wroll).alias("ss"),
        F.count("r").over(wroll).alias("cnt"))
    return (win.filter(F.col("cnt") == 7)
            .select("event_type", "day",
                    F.round(F.sqrt(F.col("ss").cast("double")) / 1e6, 6)
                    .alias("realized_vol")))
