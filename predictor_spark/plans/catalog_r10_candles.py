"""Catalog part — candlestick pattern screens (STAGED r10).

Classical Japanese-candlestick readouts (Nison, "Japanese
Candlestick Charting Techniques", 1991) over the engine's daily OHLC
bars in exact integer cents — the forex-flavoured pattern screens the
reference's trading strategies consume (its tick simulator and
indicator stack: catalog_trading.py / catalog_indicators2.py):

- candlestick_patterns_daily  per-type counts of doji, hammer and
                              bullish/bearish engulfing days
- gap_days_analysis           overnight gaps (open vs prior close):
                              up/down day counts and extreme gaps
- pivot_point_levels          floor-trader pivot levels (P, R1/S1,
                              R2/S2) off each type's LAST bar

OHLC bars: open = first tick by (ts, event_id) asc, close = last by
desc — the bollinger_bands_daily row_number idiom
(catalog_indicators2.py:41) extended with the open leg.

Determinism: every pattern rule is an integer-cent comparison
(|close−open|·10 ≤ high−low etc. — cross-multiplied so no float ever
decides a flag); gaps are integer differences; pivots are one /3.0
expression rounded 4 dp.

Scale: one groupBy(event_type, day) over the tick stream builds the
bars; the pattern windows run on ≤ |types|·|days| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: daily OHLC bars in exact integer cents (open AND close legs)
_OHLC_SQL = """
    bars AS (
        SELECT event_type, day,
               max(c) AS high, min(c) AS low,
               max(CASE WHEN rn_a = 1 THEN c END) AS open,
               max(CASE WHEN rn_d = 1 THEN c END) AS close
        FROM (
            SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   row_number() OVER (PARTITION BY event_type, day(ts)
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY event_type, day(ts)
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn_d
            FROM events
        )
        GROUP BY event_type, day
    )
"""


def _ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the oracle's `bars`: daily open/high/low/close."""
    ev = _t(spark, sf_dir, "events")
    wa = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    rows = (ev.select("event_type",
                      F.dayofmonth("ts").cast("long").alias("day"),
                      "ts", "event_id",
                      F.round(F.col("value") * 100).cast("long").alias("c"))
            .withColumn("rn_a", F.row_number().over(wa))
            .withColumn("rn_d", F.row_number().over(wd)))
    return (rows.groupBy("event_type", "day")
            .agg(F.max("c").alias("high"), F.min("c").alias("low"),
                 F.max(F.when(F.col("rn_a") == 1, F.col("c")))
                 .alias("open"),
                 F.max(F.when(F.col("rn_d") == 1, F.col("c")))
                 .alias("close")))


@query(
    "candlestick_patterns_daily",
    oracle=f"""
    WITH {_OHLC_SQL},
    flagged AS (
        SELECT event_type, day,
               abs(close - open) * 10 <= high - low AS doji,
               (least(open, close) - low) >= 2 * abs(close - open)
                   AND (high - greatest(open, close)) <= abs(close - open)
                   AS hammer,
               lag(open) OVER w > lag(close) OVER w
                   AND close > open
                   AND open <= lag(close) OVER w
                   AND close >= lag(open) OVER w AS bull_engulf,
               lag(close) OVER w > lag(open) OVER w
                   AND open > close
                   AND open >= lag(close) OVER w
                   AND close <= lag(open) OVER w AS bear_engulf
        FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(*) FILTER (doji) AS BIGINT) AS n_doji,
           CAST(count(*) FILTER (hammer) AS BIGINT) AS n_hammer,
           CAST(count(*) FILTER (bull_engulf) AS BIGINT) AS n_bull_engulf,
           CAST(count(*) FILTER (bear_engulf) AS BIGINT) AS n_bear_engulf
    FROM flagged GROUP BY event_type ORDER BY event_type
    """,
)
def candlestick_patterns_daily(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Candlestick pattern counts per event type: doji (body ≤ 10% of
    range, cross-multiplied to stay integer), hammer (lower shadow ≥
    2×body, upper shadow ≤ body) and bullish/bearish engulfing (body
    swallows the prior day's opposite-direction body).

    Scale: bars collapse the tick stream; one lag window per type over
    ≤|days| rows, then a count rollup."""
    bars = _ohlc(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    body = F.abs(F.col("close") - F.col("open"))
    po, pc = F.lag("open").over(w), F.lag("close").over(w)
    flagged = bars.select(
        "event_type",
        (body * 10 <= F.col("high") - F.col("low")).alias("doji"),
        (((F.least("open", "close") - F.col("low")) >= 2 * body)
         & ((F.col("high") - F.greatest("open", "close")) <= body))
        .alias("hammer"),
        ((po > pc) & (F.col("close") > F.col("open"))
         & (F.col("open") <= pc) & (F.col("close") >= po))
        .alias("bull_engulf"),
        ((pc > po) & (F.col("open") > F.col("close"))
         & (F.col("open") >= pc) & (F.col("close") <= po))
        .alias("bear_engulf"))
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0))  # noqa: E731
    return (flagged.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                 cnt("doji").cast("long").alias("n_doji"),
                 cnt("hammer").cast("long").alias("n_hammer"),
                 cnt("bull_engulf").cast("long").alias("n_bull_engulf"),
                 cnt("bear_engulf").cast("long").alias("n_bear_engulf"))
            .orderBy("event_type"))


@query(
    "gap_days_analysis",
    oracle=f"""
    WITH {_OHLC_SQL},
    gaps AS (
        SELECT event_type,
               open - lag(close) OVER (PARTITION BY event_type
                                       ORDER BY day) AS gap
        FROM bars
    )
    SELECT event_type,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           CAST(count(*) FILTER (WHERE gap > 0) AS BIGINT) AS n_gap_up,
           CAST(count(*) FILTER (WHERE gap < 0) AS BIGINT) AS n_gap_down,
           CAST(max(gap) AS BIGINT) AS max_gap_up_cents,
           CAST(min(gap) AS BIGINT) AS max_gap_down_cents,
           round(CAST(sum(abs(gap)) AS DOUBLE) / count(gap), 4)
               AS avg_abs_gap_cents
    FROM gaps WHERE gap IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def gap_days_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overnight gap statistics per event type: how often the day
    opens above/below the prior close, the extreme gaps, and the mean
    absolute gap — all integer cents until the single final average.

    Scale: one lag window over the bar frame; the aggregate is
    map-side combinable."""
    bars = _ohlc(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    gaps = (bars.select(
        "event_type",
        (F.col("open") - F.lag("close").over(w)).alias("gap"))
        .where(F.col("gap").isNotNull()))
    return (gaps.groupBy("event_type")
            .agg(F.count("gap").cast("long").alias("n_gaps"),
                 F.sum(F.when(F.col("gap") > 0, 1).otherwise(0))
                 .cast("long").alias("n_gap_up"),
                 F.sum(F.when(F.col("gap") < 0, 1).otherwise(0))
                 .cast("long").alias("n_gap_down"),
                 F.max("gap").cast("long").alias("max_gap_up_cents"),
                 F.min("gap").cast("long").alias("max_gap_down_cents"),
                 F.round(F.sum(F.abs(F.col("gap"))).cast("double")
                         / F.count("gap"), 4).alias("avg_abs_gap_cents"))
            .orderBy("event_type"))


@query(
    "pivot_point_levels",
    oracle=f"""
    WITH {_OHLC_SQL},
    last_bar AS (
        SELECT event_type, day, high, low, close,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day DESC) AS rn
        FROM bars
    )
    SELECT event_type, CAST(day AS BIGINT) AS day,
           round((high + low + close) / 3.0 / 100, 4) AS pivot,
           round((2 * (high + low + close) / 3.0 - low) / 100, 4) AS r1,
           round((2 * (high + low + close) / 3.0 - high) / 100, 4) AS s1,
           round(((high + low + close) / 3.0 + (high - low)) / 100, 4)
               AS r2,
           round(((high + low + close) / 3.0 - (high - low)) / 100, 4)
               AS s2
    FROM last_bar WHERE rn = 1 ORDER BY event_type
    """,
)
def pivot_point_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-trader pivot levels off each type's last completed bar:
    P = (H+L+C)/3, R1 = 2P−L, S1 = 2P−H, R2 = P+(H−L), S2 = P−(H−L) —
    the next-session support/resistance ladder a trading desk pins
    before the open. One /3.0 per level over exact cents, 4 dp.

    Scale: the bar frame is tiny; one rank window picks the last bar
    per type."""
    bars = _ohlc(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("day").desc())
    lb = (bars.withColumn("rn", F.row_number().over(w))
          .where(F.col("rn") == 1))
    p = (F.col("high") + F.col("low") + F.col("close")) / 3.0
    return lb.select(
        "event_type", F.col("day").cast("long").alias("day"),
        F.round(p / 100, 4).alias("pivot"),
        F.round((2 * p - F.col("low")) / 100, 4).alias("r1"),
        F.round((2 * p - F.col("high")) / 100, 4).alias("s1"),
        F.round((p + (F.col("high") - F.col("low"))) / 100, 4).alias("r2"),
        F.round((p - (F.col("high") - F.col("low"))) / 100, 4).alias("s2")
    ).orderBy("event_type")
