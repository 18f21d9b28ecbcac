"""Trading simulation: scenario unit tests for the decision rules plus
the pandas-oracle parity check (distributed applyInPandas run == local
sequential fold, per series)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from predictor_spark.operators.trading import (
    simulate_heuristic_strategy,
    simulate_series,
    trading_summary,
)


def _ts(n, freq="1h"):
    return pd.date_range("2024-01-01", periods=n, freq=freq).to_numpy()


def test_long_entry_and_tp_exit():
    # steady rise: long entered at t0, TP (90% of ideal profit) hit later
    price = np.array([100.0, 101.0, 102.0, 103.0, 104.0, 105.0, 106.0, 107.0])
    trades = simulate_series(_ts(8), price, horizon=3, pip_cost=0.01,
                             profit_threshold=5.0)
    assert len(trades) >= 1
    t = trades[0]
    assert t["direction"] == "long"
    assert t["exit"] >= t["entry"]
    assert t["pnl"] > 0 and t["pips"] > 0


def test_short_entry_on_falling_prices():
    price = np.array([107.0, 106.0, 105.0, 104.0, 103.0, 102.0, 101.0, 100.0])
    trades = simulate_series(_ts(8), price, horizon=3, pip_cost=0.01)
    assert trades and trades[0]["direction"] == "short"
    assert trades[0]["pnl"] > 0


def test_no_entry_below_profit_threshold():
    price = np.full(10, 100.0)  # flat: ideal profit 0 pips
    assert simulate_series(_ts(10), price, horizon=3) == []


def test_frequency_cap_limits_entries():
    # sawtooth generating many signals; cap = 1 trade per rolling day
    price = np.array([100.0, 110.0, 100.0, 110.0] * 6)
    trades = simulate_series(_ts(24, freq="1h"), price, horizon=2,
                             max_trades_per_window=1, freq_window_days=1)
    # all 24 ticks fit in one rolling day -> a single entry allowed
    assert len(trades) <= 1


def test_open_position_force_closed_at_series_end():
    # strong rise with a high TP that is never touched: the long stays
    # open to the last tick and must be force-closed there, marking the
    # open P&L to market (ADVICE r2: final_balance excluded open trades)
    price = np.array([100.0, 101.0, 102.0, 103.0, 104.0, 105.0, 106.0])
    trades = simulate_series(_ts(7), price, horizon=3, tp_multiplier=50.0,
                             sl_multiplier=50.0)
    assert len(trades) == 1
    t = trades[0]
    assert t["exit"] == price[-1]
    assert t["exit_ts"] == pd.Timestamp(_ts(7)[-1])
    assert t["duration"] == 6 - 0
    assert t["balance"] == 10_000.0 + t["pnl"]


def test_sl_exit_records_drawdown():
    # long at 100 (preds promise 140 with small dip), then crash: the
    # predicted minimum breaches SL -> early close with negative pnl
    price = np.array([100.0, 99.0, 140.0, 60.0, 55.0, 50.0, 45.0, 40.0, 35.0])
    trades = simulate_series(_ts(9), price, horizon=2, sl_multiplier=0.5)
    assert trades
    assert trades[0]["pnl"] < 0
    assert trades[0]["max_dd"] >= 0


def test_spark_matches_pandas_oracle(spark):
    """Parity: the distributed backtest must equal the local sequential
    fold for every series of the sf0.001 events table."""
    from tests.conftest import SF_DIR
    from predictor_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    got = (
        simulate_heuristic_strategy(ev, horizon=6)
        .toPandas().sort_values(["user_id", "entry_ts"]).reset_index(drop=True)
    )
    assert len(got) > 0, "fixture feed should generate trades"

    pdf = ev.select("user_id", "ts", "value").toPandas()
    frames = []
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        tr = simulate_series(g["ts"].to_numpy(), g["value"].to_numpy(np.float64),
                             horizon=6)
        f = pd.DataFrame(tr)
        if len(f):
            f.insert(0, "user_id", uid)
            frames.append(f)
    want = (
        pd.concat(frames).sort_values(["user_id", "entry_ts"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("user_id", "direction", "duration"):
        assert got[c].tolist() == want[c].tolist()
    for c in ("entry", "exit", "size", "pnl", "pips", "max_dd", "balance"):
        assert np.allclose(got[c].to_numpy(), want[c].to_numpy(), atol=1e-9), c
    # summary aggregates run and cover every trading series
    summ = trading_summary(simulate_heuristic_strategy(ev, horizon=6)).toPandas()
    assert set(summ["user_id"]) == set(want["user_id"])
    assert (summ["n_trades"] > 0).all()
