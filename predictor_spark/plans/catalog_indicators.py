"""Catalog part — technical-analysis indicators (round 5).

The reference is a financial forecaster whose strategy layer consumes
exactly these series features (heuristic_strategy.py's EMA/threshold
logic; daily_* feature CSVs carry MACD/RSI-style columns).  Both rows
are per-series window pipelines over the events stream:

- macd_signal   MACD(12, 26) + signal EMA(9) + histogram (Appel)
- rsi_indicator RSI(14) with Wilder-decay averages (Wilder 1978)

All EMAs are the adjust=True closed form already proven engine-portable
by w20_rolling_ema (finite geometric weights over a collect_list
window, truncated at 12n lags where the dropped weight is < 1e-10) —
JVM expressions only, no Python UDF.  Windows order by (ts, event_id):
unlike the per-user w20 series, per-TYPE series have timestamp
collisions, and an unordered tie would make the list layout — and so
the EMA — nondeterministic across engines AND across executions.

Scale: one shuffle per row (the event_type series partitioning); every
frame evaluation chains after the same sort.  State per row is the
truncated lag list (≤312 doubles) — bounded, no unbounded-preceding
running state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t


def _ema_expr(col, n: int):
    """adjust=True EMA closed form over a truncated lag window: returns
    (window_frame, expression-builder) — see w20_rolling_ema."""
    a = 1.0 - 2.0 / (n + 1.0)
    w = (Window.partitionBy("event_type").orderBy("ts", "event_id")
         .rowsBetween(-(12 * n - 1), 0))
    rev = F.reverse(F.collect_list(col).over(w))
    num = F.aggregate(
        F.zip_with(rev, F.sequence(F.lit(0), F.size(rev) - 1),
                   lambda x, i: x * F.pow(F.lit(a), i.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)
    den = F.aggregate(
        F.transform(F.sequence(F.lit(0), F.size(rev) - 1),
                    lambda i: F.pow(F.lit(a), i.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)
    return num / den


def _ema_sql(src: str, n: int, alias: str) -> str:
    """DuckDB replay of _ema_expr: list window + geometric weights."""
    a = repr(1.0 - 2.0 / (n + 1.0))
    lags = 12 * n - 1
    return f"""
        list_sum(list_transform(range(0, len(l_{alias})),
                 k -> l_{alias}[len(l_{alias}) - k] * power({a}, k)))
        / list_sum(list_transform(range(0, len(l_{alias})),
                   k -> power({a}, k)))"""


def _lwin(src: str, lags: int, alias: str) -> str:
    return (f"list({src}) OVER (PARTITION BY event_type ORDER BY ts, event_id "
            f"ROWS BETWEEN {lags} PRECEDING AND CURRENT ROW) AS l_{alias}")


@query(
    "macd_signal",
    oracle=f"""
    WITH lists AS (
        SELECT event_type, event_id, ts,
               {_lwin('value', 12 * 12 - 1, 'e12')},
               {_lwin('value', 12 * 26 - 1, 'e26')}
        FROM events
    ),
    macd AS (
        SELECT event_type, event_id, ts,
               ({_ema_sql('value', 12, 'e12')})
               - ({_ema_sql('value', 26, 'e26')}) AS m
        FROM lists
    ),
    sig AS (
        SELECT event_type, event_id, m,
               {_lwin('m', 12 * 9 - 1, 's')}
        FROM macd
    )
    SELECT event_id,
           round(m, 6) + 0.0 AS macd,
           round({_ema_sql('m', 9, 's')}, 6) + 0.0 AS signal_line,
           round(m - ({_ema_sql('m', 9, 's')}), 6) + 0.0 AS histogram
    FROM sig
    """,
)
def macd_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(12, 26, 9) per event-type series: fast/slow EMA difference,
    its EMA(9) signal line, and the histogram the strategy layer
    thresholds on (reference heuristic_strategy.py consumes exactly this
    momentum feature family).

    Scale: both MACD frames share one sort; the signal EMA chains a
    second frame pass over the projected macd column with NO new
    exchange (same partitioning + ordering).  `+ 0.0` canonicalizes the
    signed zero the subtraction can produce.
    """
    ev = _t(spark, sf_dir, "events")
    macd = ev.select(
        "event_type", "event_id", "ts",
        (_ema_expr(F.col("value"), 12) - _ema_expr(F.col("value"), 26))
        .alias("m"))
    sig = _ema_expr(F.col("m"), 9)
    return macd.select(
        "event_id",
        (F.round("m", 6) + F.lit(0.0)).alias("macd"),
        (F.round(sig, 6) + F.lit(0.0)).alias("signal_line"),
        (F.round(F.col("m") - sig, 6) + F.lit(0.0)).alias("histogram"))


@query(
    "rsi_indicator",
    oracle=f"""
    WITH diffs AS (
        SELECT event_type, event_id, ts,
               greatest(coalesce(value - lag(value) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id), 0.0),
                   0.0) AS gain,
               greatest(-coalesce(value - lag(value) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id), 0.0),
                   0.0) AS loss
        FROM events
    ),
    lists AS (
        SELECT event_type, event_id,
               {_lwin('gain', 12 * 27 - 1, 'g')},
               {_lwin('loss', 12 * 27 - 1, 'lo')}
        FROM diffs
    ),
    avgs AS (
        SELECT event_id,
               ({_ema_sql('gain', 27, 'g')}) AS ag,
               ({_ema_sql('loss', 27, 'lo')}) AS al
        FROM lists
    )
    SELECT event_id,
           CASE WHEN ag + al = 0.0 THEN 50.0
                ELSE round(100.0 * ag / (ag + al), 4) + 0.0 END AS rsi
    FROM avgs
    """,
)
def rsi_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI(14) per event-type series with Wilder's smoothing: the
    adjust=True EMA with a = 13/14 (span 27) over clipped up/down moves,
    RSI = 100·ag/(ag+al).  First-row diffs coalesce to 0 so the lag
    windows stay null-free — Spark's collect_list DROPS nulls while
    DuckDB's list() keeps them, and a null in the frame would silently
    misalign the two engines' weight vectors.

    Scale: the lag diff and both EMA frames share one (event_type) sort;
    flat 0/0 stretches define RSI = 50 (neutral) instead of NaN.
    """
    ev = _t(spark, sf_dir, "events")
    wlag = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = F.coalesce(F.col("value") - F.lag("value").over(wlag), F.lit(0.0))
    diffs = ev.select(
        "event_type", "event_id", "ts",
        F.greatest(d, F.lit(0.0)).alias("gain"),
        F.greatest(-d, F.lit(0.0)).alias("loss"))
    ag = _ema_expr(F.col("gain"), 27)
    al = _ema_expr(F.col("loss"), 27)
    return diffs.select(
        "event_id",
        F.when(ag + al == 0.0, F.lit(50.0))
        .otherwise(F.round(100.0 * ag / (ag + al), 4) + F.lit(0.0))
        .alias("rsi"))
