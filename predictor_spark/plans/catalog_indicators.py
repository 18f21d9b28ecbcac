"""Catalog part — technical-analysis indicators (round 5).

The reference is a financial forecaster whose strategy layer consumes
exactly these series features (heuristic_strategy.py's EMA/threshold
logic; daily_* feature CSVs carry MACD/RSI-style columns).  Both rows
are per-series window pipelines over the events stream:

- macd_signal   MACD(12, 26) + signal EMA(9) + histogram (Appel)
- rsi_indicator RSI(14) with Wilder-decay averages (Wilder 1978)

All EMAs are the adjust=True closed form already proven engine-portable
by w20_rolling_ema (finite geometric weights truncated at 12n lags
where the dropped weight is < 1e-10).  Unlike w20's single span-8 EMA,
these rows need three 312-lag EMAs per row — interpreted higher-order
window expressions measured 43.7 s at sf0.1 — so the SAME truncated
math runs as NumPy convolutions inside one Arrow-batched applyInPandas
pass per series (the build brief's sanctioned fallback: vectorized
Pandas UDF where built-ins can't express the semantics efficiently).
Series order is (ts, event_id): per-TYPE series have timestamp
collisions, and an unordered tie would make the fold — and so the EMA —
nondeterministic across engines AND across executions.

Scale: one shuffle onto the series key; per-series state is a length-n
vector inside a C convolution; parallelism is across series — the same
100 TB axis as per-series model training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t


def _ema_np(x, n: int):
    """adjust=True EMA closed form over the SAME truncated 12n-lag
    weights the oracle folds — evaluated as two C-speed convolutions.

    Why not window expressions: the w20 collect_list + higher-order-
    function idiom is fine for one span-8 EMA, but MACD needs three EMAs
    with 312-lag windows and HOFs evaluate interpreted (outside
    whole-stage codegen) — measured 43.7 s at sf0.1, still 21.7 s with
    plan-time literal weight arrays.  The identical truncated math as a
    NumPy convolution inside one Arrow-batched applyInPandas pass is the
    documented escape hatch for semantics built-ins can't express
    efficiently (build brief: vectorized Pandas UDF, never per-row)."""
    import numpy as np

    a = 1.0 - 2.0 / (n + 1.0)
    w = a ** np.arange(12 * n, dtype="float64")
    num = np.convolve(x, w)[: len(x)]
    den = np.convolve(np.ones(len(x)), w)[: len(x)]
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

    Scale: one shuffle on the series key, then all three EMAs evaluate
    in a single Arrow-batched applyInPandas pass per series (C-speed
    convolutions over the same truncated weights the oracle folds — see
    _ema_np for why the pure-window form was retired: 21.7 s -> sub-
    second at sf0.1).  Parallelism is across series — the 100 TB axis,
    same as model training.  `+ 0.0` canonicalizes the signed zero the
    subtraction can produce.
    """
    import pandas as pd

    from predictor_spark.shiplib import ensure_workers_can_import

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        x = pdf["value"].to_numpy(dtype="float64")
        m = _ema_np(x, 12) - _ema_np(x, 26)
        return pd.DataFrame({"event_id": pdf["event_id"].to_numpy(),
                             "m": m, "s": _ema_np(m, 9)})

    ev = _t(spark, sf_dir, "events")
    ensure_workers_can_import(spark)
    raw = (ev.select("event_type", "event_id", "ts", "value")
           .groupBy("event_type")
           .applyInPandas(per_series, "event_id bigint, m double, s double"))
    # rounding stays Spark-side (HALF_UP, matching the oracle's round)
    return raw.select(
        "event_id",
        (F.round("m", 6) + F.lit(0.0)).alias("macd"),
        (F.round("s", 6) + F.lit(0.0)).alias("signal_line"),
        (F.round(F.col("m") - F.col("s"), 6) + F.lit(0.0)).alias("histogram"))


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
    RSI = 100·ag/(ag+al).  First-row diffs coalesce to 0 so the weight
    vectors of the two engines stay aligned (a null in the oracle's
    list() frame would shift them).

    Scale: one shuffle on the series key; diff, clip, and both EMAs run
    in a single Arrow-batched applyInPandas pass per series (see
    _ema_np).  Flat 0/0 stretches define RSI = 50 (neutral), not NaN.
    """
    import numpy as np
    import pandas as pd

    from predictor_spark.shiplib import ensure_workers_can_import

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        x = pdf["value"].to_numpy(dtype="float64")
        d = np.diff(x, prepend=x[:1]) if len(x) else x
        return pd.DataFrame({
            "event_id": pdf["event_id"].to_numpy(),
            "ag": _ema_np(np.clip(d, 0.0, None), 27),
            "al": _ema_np(np.clip(-d, 0.0, None), 27)})

    ev = _t(spark, sf_dir, "events")
    ensure_workers_can_import(spark)
    raw = (ev.select("event_type", "event_id", "ts", "value")
           .groupBy("event_type")
           .applyInPandas(per_series, "event_id bigint, ag double, al double"))
    s = F.col("ag") + F.col("al")
    return raw.select(
        "event_id",
        F.when(s == 0.0, F.lit(50.0))
        .otherwise(F.round(100.0 * F.col("ag") / s, 4) + F.lit(0.0))
        .alias("rsi"))


@query(
    "bollinger_bands_daily",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
               CAST(round(value * 100) AS BIGINT) AS close_c
        FROM (
            SELECT event_type, ts, value,
                   row_number() OVER (PARTITION BY event_type, day(ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    roll AS (
        SELECT event_type, day, close_c,
               count(*)        OVER w AS n,
               sum(close_c)    OVER w AS s,
               sum(close_c * close_c) OVER w AS sq
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day,
           round(close_c / 100.0, 2) AS close,
           round(s / 7.0 / 100.0, 6) AS mid,
           round(s / 7.0 / 100.0
                 + 2 * sqrt(sq / 7.0 - (s / 7.0) * (s / 7.0)) / 100.0, 6)
               AS upper,
           round(s / 7.0 / 100.0
                 - 2 * sqrt(sq / 7.0 - (s / 7.0) * (s / 7.0)) / 100.0, 6)
               AS lower
    FROM roll WHERE n = 7
    """,
)
def bollinger_bands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (Bollinger 1980s; SMA(7) ± 2σ) over each event
    type's daily-close series — the volatility-envelope indicator the
    reference's strategy layer consumes alongside MACD/RSI.

    Unlike MACD/RSI (infinite-impulse EMAs → applyInPandas), a Bollinger
    window is FINITE — 7 daily closes — so it stays pure JVM window
    math: the daily close is one row_number pass, the band moments come
    from integer-cent sum and sum-of-squares over a 7-row frame, and
    σ = sqrt(E[x²] − E[x]²) is derived from EXACT integer sums, so both
    engines compute identical doubles before the display rounding.

    Scale: one shuffle to (type, day) bars, one per-type window over
    ~30 bar rows per series; the stream itself is touched once.
    """
    ev = _t(spark, sf_dir, "events")
    wday = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    daily = (ev.select("event_type", F.dayofmonth("ts").cast("long").alias("day"),
                       "ts", "event_id",
                       F.round(F.col("value") * 100, 0).cast("long")
                       .alias("close_c"))
             .withColumn("rn", F.row_number().over(wday))
             .filter(F.col("rn") == 1))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    n = F.count(F.lit(1)).over(w)
    s = F.sum("close_c").over(w)
    sq = F.sum(F.col("close_c") * F.col("close_c")).over(w)
    mid = s / 7.0 / 100.0
    sigma = F.sqrt(sq / 7.0 - (s / 7.0) * (s / 7.0)) / 100.0
    return (daily.select("event_type", "day",
                         F.round(F.col("close_c") / 100.0, 2).alias("close"),
                         F.round(mid, 6).alias("mid"),
                         F.round(mid + 2 * sigma, 6).alias("upper"),
                         F.round(mid - 2 * sigma, 6).alias("lower"),
                         n.alias("n"))
            .filter(F.col("n") == 7).drop("n"))
