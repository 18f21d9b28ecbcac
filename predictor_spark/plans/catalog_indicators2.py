"""Catalog part — price/volume indicators over OHLC daily bars (round 6,
session 2).

Completes the technical-analysis family (catalog_indicators: MACD/RSI/
Bollinger — the reference strategy layer's momentum inputs,
heuristic_strategy.py) with the four volume/range indicators that need
full OHLC bars rather than a close series:

- vwap_brand_year            volume-weighted average price (the
                             execution-quality benchmark)
- atr_14_daily               Average True Range, SMA(14) variant
                             (Wilder 1978's range-volatility number)
- obv_daily                  On-Balance Volume (Granville 1963's
                             volume-flow accumulator)
- stochastic_oscillator_14_3 %K(14) / %D(3) (Lane's range-position
                             momentum)

Bars are built once per query from the events stream with the SAME
row_number-desc close idiom bollinger_bands_daily proved engine-
portable: high/low/volume are plain aggregates, close is the max over
the rn=1 row, and ties inside a day are totally ordered by
(ts, event_id).

Determinism: every bar field is an exact integer (cents / counts);
true range uses greatest() over integer differences; OBV is an integer
cumulative sum; %K divides exact integers once and %D averages the
ROUNDED %K both engines computed identically.

Scale: one shuffle reduces the stream to (type, day) bars; every
window after that partitions by series over ~30 bar rows. VWAP's part
dim is broadcast. The raw stream is scanned exactly once per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: daily OHLC bars in exact integer cents, shared by the oracle CTEs
_BARS_SQL = """
    bars AS (
        SELECT event_type, day,
               max(c) AS high, min(c) AS low,
               max(CASE WHEN rn = 1 THEN c END) AS close,
               count(*) AS volume
        FROM (
            SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   row_number() OVER (PARTITION BY event_type, day(ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        GROUP BY event_type, day
    )
"""


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type: high/low/volume aggregates plus
    the row_number-desc close (bollinger_bands_daily's proven idiom)."""
    ev = _t(spark, sf_dir, "events")
    wday = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    rows = (ev.select("event_type",
                      F.dayofmonth("ts").cast("long").alias("day"),
                      "ts", "event_id",
                      F.round(F.col("value") * 100, 0).cast("long")
                      .alias("c"))
            .withColumn("rn", F.row_number().over(wday)))
    return (rows.groupBy("event_type", "day")
            .agg(F.max("c").alias("high"), F.min("c").alias("low"),
                 F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("close"),
                 F.count(F.lit(1)).alias("volume")))


@query(
    "vwap_brand_year",
    oracle="""
    SELECT p_brand, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS DOUBLE)
                 / sum(CAST(round(l_quantity) AS BIGINT)) / 100, 4) AS vwap
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand, CAST(year(l_shipdate) AS BIGINT)
    """,
)
def vwap_brand_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per brand and ship year:
    sum(extended price) / sum(quantity) — the execution benchmark a
    trading desk quotes fills against (l_extendedprice is already
    price*qty, so the ratio IS the quantity-weighted unit price).

    Scale: part dim broadcasts; one map-side-combinable aggregation on
    (brand, year); price rides integer cents and TPC-H quantities are
    integral, so both sums are exact until the single final division."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", F.year("l_shipdate").cast("long").alias("ship_year"),
        F.round("l_quantity", 0).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        .alias("cents"))
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand", "ship_year")
            .agg(F.sum("qty").alias("total_qty"),
                 F.round(F.sum("cents").cast("double") / F.sum("qty") / 100,
                         4).alias("vwap")))


@query(
    "atr_14_daily",
    oracle=f"""
    WITH {_BARS_SQL},
    tr AS (
        SELECT event_type, day,
               greatest(high - low,
                        abs(high - lag(close) OVER w),
                        abs(low - lag(close) OVER w)) AS tr_c,
               row_number() OVER w AS rn
        FROM bars
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    atr AS (
        SELECT event_type, day, rn,
               round(tr_c / 100.0, 2) AS true_range,
               round(CAST(sum(tr_c) OVER w14 AS DOUBLE) / 14 / 100, 4)
                   AS atr
        FROM tr
        WINDOW w14 AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, true_range, atr FROM atr WHERE rn > 14
    """,
)
def atr_14_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average True Range over 14 daily bars (SMA variant of Wilder
    1978): TR = max(high-low, |high-prev_close|, |low-prev_close|),
    ATR = its 14-bar mean.  The range-volatility number position sizing
    divides by in the reference's strategy layer.

    The first bar's TR is null (no prev close) and the first 14 TR rows
    are warm-up, so output starts at bar 15 — both engines filter on
    the same row_number.  TR is an exact integer-cent greatest(); the
    ATR division happens once on an exact 14-term integer sum.

    Scale: stream → bars is one shuffle; both windows partition by
    series and share the (event_type, day) sort order."""
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("close").over(w)
    tr = (_bars(spark, sf_dir)
          .withColumn("tr_c", F.greatest(
              F.col("high") - F.col("low"),
              F.abs(F.col("high") - prev),
              F.abs(F.col("low") - prev)))
          .withColumn("rn", F.row_number().over(w)))
    w14 = w.rowsBetween(-13, 0)
    return (tr
            .withColumn("atr",
                        F.round(F.sum("tr_c").over(w14).cast("double")
                                / 14 / 100, 4))
            .filter(F.col("rn") > 14)
            .select("event_type", "day",
                    F.round(F.col("tr_c") / 100.0, 2).alias("true_range"),
                    "atr"))


@query(
    "obv_daily",
    oracle=f"""
    WITH {_BARS_SQL},
    signed AS (
        SELECT event_type, day, close, volume,
               CASE WHEN close > lag(close) OVER w THEN volume
                    WHEN close < lag(close) OVER w THEN -volume
                    ELSE 0 END AS sv
        FROM bars
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day,
           round(close / 100.0, 2) AS close,
           CAST(sum(sv) OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS obv
    FROM signed
    """,
)
def obv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-Balance Volume (Granville 1963): cumulative event volume
    signed by the day-over-day close direction — the volume-flow
    divergence indicator.  The first bar (no prev close) contributes 0,
    matching the CASE's ELSE in both engines; OBV stays an exact
    integer cumulative sum end-to-end.

    Scale: one shuffle to bars, then two per-series windows sharing one
    sort (lag + running sum over ~30 bar rows per series)."""
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("close").over(w)
    signed = _bars(spark, sf_dir).withColumn(
        "sv",
        F.when(F.col("close") > prev, F.col("volume"))
        .when(F.col("close") < prev, -F.col("volume"))
        .otherwise(F.lit(0)))
    return signed.select(
        "event_type", "day",
        F.round(F.col("close") / 100.0, 2).alias("close"),
        F.sum("sv").over(w.rowsBetween(Window.unboundedPreceding,
                                       Window.currentRow))
        .cast("long").alias("obv"))


@query(
    "stochastic_oscillator_14_3",
    oracle=f"""
    WITH {_BARS_SQL},
    k AS (
        SELECT event_type, day,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS rn,
               CASE WHEN max(high) OVER w14 = min(low) OVER w14 THEN 50.0
                    ELSE round(100.0 * (close - min(low) OVER w14)
                               / (max(high) OVER w14 - min(low) OVER w14),
                               4) END AS pct_k
        FROM bars
        WINDOW w14 AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    d AS (
        SELECT event_type, day, rn, pct_k,
               round(avg(pct_k) OVER (PARTITION BY event_type ORDER BY day
                                      ROWS BETWEEN 2 PRECEDING
                                      AND CURRENT ROW), 4) AS pct_d
        FROM k
    )
    SELECT event_type, day, pct_k, pct_d FROM d WHERE rn >= 16
    """,
)
def stochastic_oscillator_14_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator (Lane): %K = 100 * (close - L14)/(H14 -
    L14) over 14-bar channel extremes, %D = 3-bar mean of %K — the
    range-position momentum the strategy layer pairs with RSI.

    Warm-up: %K needs 14 bars and %D three %K values, so output starts
    at bar 16 (both engines filter the same row_number).  A flat
    channel (H14 = L14, an exact integer compare) pins %K to 50.  %D
    averages the ROUNDED %K, so both engines fold identical doubles.

    Scale: one shuffle to bars; the channel, rank, and %D windows all
    partition by series and share one (event_type, day) sort."""
    w = Window.partitionBy("event_type").orderBy("day")
    w14 = w.rowsBetween(-13, 0)
    h14, l14 = F.max("high").over(w14), F.min("low").over(w14)
    k = (_bars(spark, sf_dir)
         .withColumn("rn", F.row_number().over(w))
         .withColumn("pct_k",
                     F.when(h14 == l14, F.lit(50.0))
                     .otherwise(F.round(100.0 * (F.col("close") - l14)
                                        / (h14 - l14), 4))))
    return (k.withColumn("pct_d",
                         F.round(F.avg("pct_k").over(w.rowsBetween(-2, 0)),
                                 4))
            .filter(F.col("rn") >= 16)
            .select("event_type", "day", "pct_k", "pct_d"))
