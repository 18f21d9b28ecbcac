from __future__ import annotations

import math

import pytest

from predictor_spark.plans.pipeline import run_forecast_pipeline
from predictor_spark.plans.search import ar_lag_search, candidate_fitness, grid_search
from predictor_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pipeline_persistence_end_to_end(spark):
    ev = load_table(spark, SF, "events")
    out = run_forecast_pipeline(
        spark, ev,
        {"target_column": "value", "series_column": "user_id",
         "predicted_horizons": [1, 3], "train_end": "2024-01-22 00:00:00"},
    )
    results = out["results"].toPandas().set_index("Metric")
    # persistence: MAE == Naive MAE for every split/horizon label
    for label in results.index:
        if "MAE" in label and "Naive" not in label:
            naive = label.replace("MAE", "Naive MAE")
            assert results.loc[label, "Average"] == pytest.approx(results.loc[naive, "Average"])
    assert {"Train MAE H1", "Test MAE H3"} <= set(results.index)


def test_pipeline_ar1_beats_persistence(spark):
    ev = load_table(spark, SF, "events")
    cfg = {"target_column": "value", "series_column": "user_id",
           "predicted_horizons": [1], "predictor": "ar1",
           "train_end": "2024-01-22 00:00:00"}
    out = run_forecast_pipeline(spark, ev, cfg)
    res = out["results"].toPandas().set_index("Metric")
    assert res.loc["Test MAE H1", "Average"] < res.loc["Test Naive MAE H1", "Average"]


def test_pipeline_ar1_requires_cutoff(spark):
    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="train_end"):
        run_forecast_pipeline(spark, ev, {"predictor": "ar1", "series_column": "user_id"})


def test_candidate_fitness_reference_formula():
    # beats naive on both splits: plain weighted deltas, negative
    assert candidate_fitness(0.9, 1.0, 0.8, 1.0) == pytest.approx(0.4 * -0.1 + 0.6 * -0.2)
    # worse than naive on val: + 2x val penalty
    f = candidate_fitness(0.9, 1.0, 1.2, 1.0)
    assert f == pytest.approx(0.4 * -0.1 + 0.6 * 0.2 + 2 * 0.2)


def test_grid_search_crash_isolation():
    def evaluate(params):
        if params["x"] == 2:
            raise RuntimeError("candidate crashed")
        return params["x"] ** 2

    res = grid_search([{"x": x} for x in (-3, 2, 1)], evaluate, max_parallel=3)
    assert res.best_params == {"x": 1}
    crashed = [h for h in res.history if h["params"]["x"] == 2][0]
    assert math.isinf(crashed["fitness"])  # crash -> inf, like the reference


def test_ar_lag_search_runs(spark):
    ev = load_table(spark, SF, "events")
    res = ar_lag_search(spark, ev, lags=(1, 3), max_parallel=2)
    assert res.best_params["lag"] in (1, 3)
    assert len(res.history) == 2
    assert all(math.isfinite(h["fitness"]) for h in res.history)


def test_grid_search_checkpoint_resume(tmp_path):
    from predictor_spark.plans.search import grid_search, load_search_checkpoint

    grid = [{"x": i} for i in range(8)]
    calls: list[int] = []

    def flaky(params):
        calls.append(params["x"])
        if params["x"] == 5 and len(calls) <= 6:
            raise RuntimeError("simulated crash mid-search")
        return abs(params["x"] - 6)

    ckpt = str(tmp_path / "resume.json")
    # first run: candidate 5 crashes -> inf fitness recorded, state saved
    r1 = grid_search(grid, flaky, max_parallel=2, checkpoint_path=ckpt)
    state = load_search_checkpoint(ckpt)
    assert state is not None and state["generation"] == 8
    n_first = len(calls)
    # resume: nothing left to do — no candidate re-evaluated
    r2 = grid_search(grid, flaky, max_parallel=2, checkpoint_path=ckpt)
    assert len(calls) == n_first
    assert r2.best_params == r1.best_params == {"x": 6}
    assert r2.best_fitness == 0

    # partial checkpoint: drop the last 3 evals, resume re-runs ONLY those
    import json
    state["history"] = state["history"][:5]
    with open(ckpt, "w") as f:
        json.dump(state, f)
    calls.clear()
    r3 = grid_search(grid, flaky, max_parallel=2, checkpoint_path=ckpt)
    assert sorted(calls) == [5, 6, 7]
    assert r3.best_params == {"x": 6}


def test_ar2_yule_walker_recovers_coefficients(spark):
    import numpy as np
    from predictor_spark.plans.ar_model import ar2_yule_walker

    rng = np.random.default_rng(7)
    rows = []
    for uid, (p1, p2) in enumerate([(0.6, -0.3), (0.2, 0.5)]):
        x = [0.0, 0.0]
        for _ in range(4000):
            x.append(p1 * x[-1] + p2 * x[-2] + rng.normal())
        base = np.datetime64("2024-01-01T00:00:00")
        rows += [
            {"user_id": uid, "ts": (base + np.timedelta64(i, "m")).item(),
             "value": float(v)}
            for i, v in enumerate(x[2:])
        ]
    df = spark.createDataFrame(rows)
    got = {r["user_id"]: r for r in ar2_yule_walker(df, train_end="2024-01-22 00:00:00").collect()}
    for uid, (p1, p2) in enumerate([(0.6, -0.3), (0.2, 0.5)]):
        assert abs(got[uid]["phi1"] - p1) < 0.05, (uid, got[uid]["phi1"])
        assert abs(got[uid]["phi2"] - p2) < 0.05, (uid, got[uid]["phi2"])


def test_ar_order_select_prefers_true_order(spark):
    import numpy as np
    from predictor_spark.plans.ar_model import ar_order_select

    rng = np.random.default_rng(11)
    rows = []
    specs = {0: (0.0, 0.0), 1: (0.7, 0.0), 2: (0.3, 0.45)}  # white, AR(1), AR(2)
    for uid, (p1, p2) in specs.items():
        x = [0.0, 0.0]
        for _ in range(3000):
            x.append(p1 * x[-1] + p2 * x[-2] + rng.normal())
        base = np.datetime64("2024-01-01T00:00:00")
        rows += [
            {"user_id": uid, "ts": (base + np.timedelta64(i, "m")).item(), "value": float(v)}
            for i, v in enumerate(x[2:])
        ]
    df = spark.createDataFrame(rows)
    got = {r["user_id"]: r["best_p"] for r in ar_order_select(df).collect()}
    assert got[1] == 1, got
    assert got[2] == 2, got
    # white noise: no lag helps, the 2p penalty picks the smallest order
    assert got[0] == 1, got


def test_meta_log_appends_candidates(tmp_path):
    import csv
    from predictor_spark.plans.search import grid_search

    path = str(tmp_path / "meta.csv")
    grid_search([{"x": i} for i in range(5)], lambda p: p["x"] * 1.0,
                max_parallel=2, meta_log_path=path)
    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["x", "fitness"]
    assert len(rows) == 6
    assert {r[0] for r in rows[1:]} == {"0", "1", "2", "3", "4"}


def test_arima_order_select_recovers_generating_models(spark):
    """Hannan-Rissanen grid (plans/arima.py): series generated by AR(2),
    MA(1), integrated AR(2) and white noise should select models of the
    matching family. The integrated AR(2) is the d-identification case:
    its levels are AR(3) with a unit root — outside the p<=2 grid — so
    only d=1 can capture it (a pure random walk would tie with AR(1)
    phi~1 on levels and is NOT a discriminating test)."""
    import numpy as np
    import pandas as pd
    from predictor_spark.plans.arima import arima_order_select

    rng = np.random.default_rng(2)
    n = 800
    ts = pd.date_range("2024-01-01", periods=n, freq="1h")
    # AR(2): x_t = 0.6 x_{t-1} - 0.3 x_{t-2} + eps
    ar2 = np.zeros(n)
    eps = rng.normal(size=n)
    for t in range(2, n):
        ar2[t] = 0.6 * ar2[t - 1] - 0.3 * ar2[t - 2] + eps[t]
    # MA(1): x_t = eps_t + 0.7 eps_{t-1}
    eps2 = rng.normal(size=n)
    ma1 = eps2 + 0.7 * np.roll(eps2, 1)
    # integrated AR(2): first difference follows the AR(2) above
    eps3 = rng.normal(size=n)
    iar = np.zeros(n)
    for t in range(2, n):
        iar[t] = 0.6 * iar[t - 1] - 0.3 * iar[t - 2] + eps3[t]
    iar2 = np.cumsum(iar)
    wn = rng.normal(size=n)
    pdf = pd.concat([
        pd.DataFrame({"user_id": uid, "ts": ts, "value": v})
        for uid, v in [(1, ar2), (2, ma1), (3, iar2), (4, wn)]
    ])
    out = {r["user_id"]: r for r in
           arima_order_select(spark.createDataFrame(pdf)).collect()}
    assert (out[1]["best_p"], out[1]["best_d"], out[1]["best_q"]) == (2, 0, 0)
    assert out[2]["best_d"] == 0 and out[2]["best_q"] >= 1        # MA flavor
    assert (out[3]["best_p"], out[3]["best_d"], out[3]["best_q"]) == (2, 1, 0)
    assert (out[4]["best_p"], out[4]["best_d"], out[4]["best_q"]) == (0, 0, 0)
