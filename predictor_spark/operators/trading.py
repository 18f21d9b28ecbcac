"""Trading-strategy simulation — the reference's heuristic backtest
(app/heuristic_strategy.py:109-299 next() entry/exit rules, :301-387
summary) re-expressed as a per-series stateful fold.

A backtest is inherently sequential per instrument (position state feeds
the next tick's decision), so the Spark shape is: ONE applyInPandas task
per series runs the sequential fold, and the parallelism is ACROSS
series/instruments — the same N-series = N-tasks topology as the model
Estimators. At 100 TB (millions of instruments x years of ticks) this is
one shuffle on the instrument key; no state ever crosses series.

Decision rules (clean-room from the reference's semantics):
- "perfect foresight" predictions: at tick i the strategy sees the next
  ``horizon`` actual prices (the reference reads precomputed ideal
  predictions from CSV; deriving them from the future slice keeps the sim
  self-contained and exactly replayable by a pandas oracle).
- entry (no position): ideal long profit = (max(preds) - p) / pip_cost,
  long drawdown = (p - min(preds)) / pip_cost when positive else
  ``min_drawdown_pips`` (short side mirrored); risk-reward = profit /
  drawdown; enter the side whose profit >= profit_threshold, preferring
  the higher RR (ties -> long, the reference's `rr_buy >= rr_sell`);
  TP = p +/- tp_multiplier * profit, SL = p -/+ sl_multiplier * drawdown.
- sizing: linear RR interpolation between min/max volume, capped by
  balance * rel_volume * leverage.
- frequency: at most ``max_trades_per_window`` entries per rolling
  ``freq_window_days`` (floor-days comparison, like the reference).
- exit (position open): track intra-trade extreme; close when price
  touches TP, or when the predicted extreme would breach SL.
- fills at the deciding tick's price (the reference fills at the next
  bar's open through backtrader; documented simplification).

Emitted trades carry entry/exit/size/pnl/pips/duration/max_dd/balance —
the fields of the reference's closed-trade record.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

TRADE_SCHEMA = (
    "user_id long, entry_ts timestamp, exit_ts timestamp, direction string, "
    "entry double, exit double, size double, pnl double, pips double, "
    "duration int, max_dd double, balance double"
)


def simulate_series(
    ts: np.ndarray,
    price: np.ndarray,
    horizon: int = 6,
    pip_cost: float = 0.01,
    profit_threshold: float = 5.0,
    min_drawdown_pips: float = 10.0,
    tp_multiplier: float = 0.9,
    sl_multiplier: float = 2.0,
    lower_rr: float = 0.5,
    upper_rr: float = 2.0,
    min_order_volume: float = 1.0,
    max_order_volume: float = 100.0,
    rel_volume: float = 0.05,
    leverage: float = 100.0,
    initial_balance: float = 10_000.0,
    max_trades_per_window: int = 3,
    freq_window_days: int = 5,
    pred_matrix: np.ndarray | None = None,
) -> list[dict]:
    """Sequential fold over one series; returns closed-trade dicts.
    Pure numpy/python — the unit the pandas oracle replays.

    ``pred_matrix``: optional (n, horizon) array of MODEL-predicted
    prices for ticks t+1..t+horizon — the reference's production loop
    feeds the strategy its predictor's output CSV
    (app/main.py predictions -> heuristic_strategy.py), not the future
    slice; NaN entries (windows without forecasts) are dropped, which
    disables entries at those ticks exactly like a short future slice.
    None keeps the self-contained perfect-foresight path bit-identical.
    """
    n = len(price)
    balance = initial_balance
    pos = None  # dict(direction, entry, entry_ts, entry_i, size, tp, sl, extreme)
    entry_times: list[pd.Timestamp] = []
    trades: list[dict] = []
    for i in range(n):
        p = float(price[i])
        t = pd.Timestamp(ts[i])
        if pred_matrix is not None:
            row = pred_matrix[i]
            preds = row[np.isfinite(row)]
        else:
            preds = price[i + 1: i + 1 + horizon]
        if pos is not None:
            if pos["direction"] == "long":
                pos["extreme"] = min(pos["extreme"], p)
                pred_min = float(preds.min()) if len(preds) else p
                hit = p >= pos["tp"] or pred_min < pos["sl"]
            else:
                pos["extreme"] = max(pos["extreme"], p)
                pred_max = float(preds.max()) if len(preds) else p
                hit = p <= pos["tp"] or pred_max > pos["sl"]
            if hit:
                sign = 1.0 if pos["direction"] == "long" else -1.0
                pnl = sign * (p - pos["entry"]) * pos["size"]
                balance += pnl
                trades.append({
                    "entry_ts": pos["entry_ts"], "exit_ts": t,
                    "direction": pos["direction"], "entry": pos["entry"],
                    "exit": p, "size": pos["size"], "pnl": pnl,
                    "pips": sign * (p - pos["entry"]) / pip_cost,
                    "duration": i - pos["entry_i"],
                    "max_dd": sign * (pos["entry"] - pos["extreme"]) / pip_cost,
                    "balance": balance,
                })
                pos = None
            continue
        # --- entry logic ---
        if len(preds) < horizon:
            continue
        recent = [d for d in entry_times if (t - d).days < freq_window_days]
        if len(recent) >= max_trades_per_window:
            continue
        mx, mn = float(preds.max()), float(preds.min())
        profit_buy = (mx - p) / pip_cost
        dd_buy = (p - mn) / pip_cost if p > mn else min_drawdown_pips
        rr_buy = profit_buy / dd_buy if dd_buy > 0 else 0.0
        profit_sell = (p - mn) / pip_cost
        dd_sell = (mx - p) / pip_cost if p < mx else min_drawdown_pips
        rr_sell = profit_sell / dd_sell if dd_sell > 0 else 0.0
        long_ok = profit_buy >= profit_threshold
        short_ok = profit_sell >= profit_threshold
        if long_ok and rr_buy >= rr_sell:
            direction, rr = "long", rr_buy
            tp = p + tp_multiplier * profit_buy * pip_cost
            sl = p - sl_multiplier * dd_buy * pip_cost
        elif short_ok and rr_sell > rr_buy:
            direction, rr = "short", rr_sell
            tp = p - tp_multiplier * profit_sell * pip_cost
            sl = p + sl_multiplier * dd_sell * pip_cost
        else:
            continue
        # RR-interpolated size, capped by available risk budget
        if rr >= upper_rr:
            size = max_order_volume
        elif rr <= lower_rr:
            size = min_order_volume
        else:
            size = min_order_volume + (rr - lower_rr) / (upper_rr - lower_rr) \
                * (max_order_volume - min_order_volume)
        size = min(size, balance * rel_volume * leverage)
        if size <= 0:
            continue
        entry_times.append(t)
        pos = {"direction": direction, "entry": p, "entry_ts": t, "entry_i": i,
               "size": size, "tp": tp, "sl": sl, "extreme": p}
    if pos is not None and n > 0:
        # force-close a position still open at the last tick so the
        # summary's final_balance marks open P&L to market (the reference's
        # stop() reports account VALUE, heuristic_strategy.py:301-387;
        # silently dropping the open trade understates it)
        p = float(price[n - 1])
        sign = 1.0 if pos["direction"] == "long" else -1.0
        pnl = sign * (p - pos["entry"]) * pos["size"]
        balance += pnl
        trades.append({
            "entry_ts": pos["entry_ts"], "exit_ts": pd.Timestamp(ts[n - 1]),
            "direction": pos["direction"], "entry": pos["entry"],
            "exit": p, "size": pos["size"], "pnl": pnl,
            "pips": sign * (p - pos["entry"]) / pip_cost,
            "duration": (n - 1) - pos["entry_i"],
            "max_dd": sign * (pos["entry"] - pos["extreme"]) / pip_cost,
            "balance": balance,
        })
    return trades


def simulate_heuristic_strategy(
    df: DataFrame,
    price_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    **params,
) -> DataFrame:
    """Distributed backtest: one sequential fold per series inside
    applyInPandas; output is the trades table (TRADE_SCHEMA). The explicit
    numbered repartition prevents AQE from coalescing the small shuffle
    and serializing the CPU-bound folds (see models/estimator.py)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        sid = int(pdf[series_col].iloc[0])
        trades = simulate_series(
            pdf[ts_col].to_numpy(), pdf[price_col].to_numpy(np.float64), **params,
        )
        cols = ["entry_ts", "exit_ts", "direction", "entry", "exit", "size",
                "pnl", "pips", "duration", "max_dd", "balance"]
        out = pd.DataFrame(trades, columns=cols)
        out.insert(0, "user_id", sid)
        return out

    # ship the package zip: the closure references this module, which a
    # vanilla driver session's workers cannot import otherwise
    from predictor_spark.shiplib import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    n_part = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(series_col, ts_col, price_col)
        .repartition(n_part, series_col)
        .groupBy(series_col).applyInPandas(run, TRADE_SCHEMA)
    )


def simulate_model_strategy(
    scored: DataFrame,
    horizons: tuple[int, ...],
    price_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    **params,
) -> DataFrame:
    """The reference's PRODUCTION composition: per-series model
    predictions drive the heuristic strategy (app/main.py writes the
    predictor's multi-horizon output, heuristic_strategy.py trades on
    it). ``scored`` is the estimator/registry output — one row per
    (series, tick) carrying ``pred_h{h}`` predicted prices — and each
    series' fold reads its (n, |horizons|) prediction matrix instead of
    the future slice. Ticks without forecasts (NaN rows from the window
    warm-up or series edges) cannot open trades, exactly like the
    reference skipping rows absent from the predictions CSV.

    Same topology as simulate_heuristic_strategy: one fold per series,
    one shuffle on the series key."""
    hs = tuple(int(h) for h in horizons)
    pred_cols = [f"pred_h{h}" for h in hs]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        sid = int(pdf[series_col].iloc[0])
        m = pdf[pred_cols].to_numpy(np.float64)
        trades = simulate_series(
            pdf[ts_col].to_numpy(), pdf[price_col].to_numpy(np.float64),
            horizon=len(hs), pred_matrix=m, **params,
        )
        cols = ["entry_ts", "exit_ts", "direction", "entry", "exit", "size",
                "pnl", "pips", "duration", "max_dd", "balance"]
        out = pd.DataFrame(trades, columns=cols)
        out.insert(0, "user_id", sid)
        return out

    from predictor_spark.shiplib import ensure_workers_can_import

    ensure_workers_can_import(scored.sparkSession)
    n_part = scored.sparkSession.sparkContext.defaultParallelism
    return (
        scored.select(series_col, ts_col, price_col, *pred_cols)
        .repartition(n_part, series_col)
        .groupBy(series_col).applyInPandas(run, TRADE_SCHEMA)
    )


def trading_summary(trades: DataFrame, initial_balance: float = 10_000.0) -> DataFrame:
    """Per-series closed-trade summary — the reference's stop() printout
    (heuristic_strategy.py:301-387) as a DataFrame: trade count, average
    pnl/pips/|pips|/duration/max-drawdown, min and final balance. Pure
    aggregate over the trades table; at scale this is one groupBy on the
    instrument key."""
    from pyspark.sql import functions as F

    return trades.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.round(F.avg("pnl"), 4).alias("avg_pnl"),
        F.round(F.avg("pips"), 4).alias("avg_pips"),
        F.round(F.avg(F.abs(F.col("pips"))), 4).alias("avg_abs_pips"),
        F.round(F.avg("duration"), 4).alias("avg_duration"),
        F.round(F.avg("max_dd"), 4).alias("avg_max_dd"),
        F.round(F.least(F.min("balance"), F.lit(initial_balance)), 4).alias("min_balance"),
        # struct ordering breaks exit_ts ties by balance — deterministic on
        # both engine and oracle sides (ADVICE r3)
        F.round(F.max_by("balance", F.struct("exit_ts", "balance")), 4)
        .alias("final_balance"),
    )
