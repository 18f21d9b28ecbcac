"""Differential + property tests for temporal operators (SURVEY §5: the
reference's runtime leakage assertions become pytest properties here).

Oracles are hand-computed pandas/NumPy on tiny synthetic series — the same
strategy the reference applies via its golden example runs.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest

from predictor_spark.operators import temporal


def _series_df(spark, values, user=1, start="2024-01-01"):
    t0 = dt.datetime.fromisoformat(start)
    rows = [
        (user, t0 + dt.timedelta(hours=i), float(v), i)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, value double, idx int")


def test_log_returns_guards(spark):
    # reference guard (anti_naive_lock.py:157-179): first value 0; zero
    # unless prev>0 AND cur>0
    vals = [1.0, 2.0, 0.0, 3.0, -1.0, 4.0]
    out = (
        temporal.log_returns(_series_df(spark, vals), ["value"], series_col="user_id")
        .orderBy("idx").select("value_logret").toPandas()["value_logret"].tolist()
    )
    exp = [0.0, math.log(2.0), 0.0, 0.0, 0.0, 0.0]
    assert out == pytest.approx(exp)


def test_first_diff(spark):
    vals = [5.0, 7.0, 4.0]
    out = (
        temporal.first_diff(_series_df(spark, vals), ["value"], series_col="user_id")
        .orderBy("idx").select("value_diff").toPandas()["value_diff"].tolist()
    )
    assert out == pytest.approx([0.0, 2.0, -3.0])


def test_lead_targets_trim_and_values(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    out = (
        temporal.lead_targets(_series_df(spark, vals), "value", [1, 2], series_col="user_id")
        .orderBy("idx").toPandas()
    )
    # trim: rows where t+max_h missing are dropped -> 3 rows
    assert len(out) == 3
    assert out["target_h1"].tolist() == pytest.approx([2.0, 3.0, 4.0])
    assert out["target_h2"].tolist() == pytest.approx([3.0, 4.0, 5.0])


def test_lead_targets_returns_mode(spark):
    vals = [1.0, 4.0, 9.0]
    out = (
        temporal.lead_targets(_series_df(spark, vals), "value", [1], series_col="user_id", returns=True)
        .orderBy("idx").toPandas()
    )
    assert out["target_h1"].tolist() == pytest.approx([3.0, 5.0])


def test_window_tensorize_inclusive_w1(spark):
    # W1 (sliding_windows.py:99-115): window data[t-w+1 : t+1]; first full
    # window ends at index w-1; baseline == last element == row t
    vals = [10.0, 11.0, 12.0, 13.0]
    out = (
        temporal.window_tensorize(_series_df(spark, vals), ["value"], 2,
                                  series_col="user_id", inclusive=True)
        .orderBy("idx").toPandas()
    )
    assert len(out) == 3  # n - w + 1
    assert [w_[-1][0] for w_ in out["window"]] == pytest.approx([11.0, 12.0, 13.0])
    assert [w_[0][0] for w_ in out["window"]] == pytest.approx([10.0, 11.0, 12.0])


def test_window_tensorize_exclusive_w2_no_leakage(spark):
    # W2 (phase2_6_preprocessor.py:154-161): window data[t-w : t] strictly
    # before t; tail guard drops rows without t+max_h
    vals = [10.0, 11.0, 12.0, 13.0, 14.0]
    out = (
        temporal.window_tensorize(_series_df(spark, vals), ["value"], 2,
                                  series_col="user_id", inclusive=False, max_horizon=1)
        .orderBy("idx").toPandas()
    )
    # windows exist for t=2,3 (t=4 killed by horizon guard)
    assert len(out) == 2
    # leakage property: current value NEVER inside its own window
    for _, row in out.iterrows():
        flat = [x for sub in row["window"] for x in sub]
        assert row["value"] not in flat
    assert [w_[-1][0] for w_ in out["window"]] == pytest.approx([11.0, 12.0])


def test_window_baseline(spark):
    vals = [1.0, 2.0, 3.0]
    df = temporal.window_tensorize(_series_df(spark, vals), ["idx", "value"], 2,
                                   series_col="user_id", inclusive=True)
    out = temporal.window_baseline(df, "window", target_idx=1).orderBy("idx").toPandas()
    # baseline = windows[:, -1, target_idx] == value at row t
    assert out["baseline"].tolist() == pytest.approx(out["value"].tolist())


def test_overlap_add_reconstructs_series(spark):
    # W17 property: overlap-add over W1 windows of a flat feature returns
    # the original series values (average of identical diagonal entries)
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    df = temporal.window_tensorize(_series_df(spark, vals), ["value"], 3,
                                   series_col="user_id", inclusive=True)
    df = df.withColumn("w1d", __import__("pyspark.sql.functions", fromlist=["F"]).transform(
        "window", lambda r: r[0]))
    rec = temporal.overlap_add(df, "w1d", series_col="user_id").orderBy("tick").toPandas()
    # tick is the 1-based ORIGINAL series position; reconstruction covers
    # every original row and returns its value exactly
    assert rec["tick"].tolist() == list(range(1, len(vals) + 1))
    for _, row in rec.iterrows():
        assert row["value"] == pytest.approx(vals[int(row["tick"]) - 1])


def test_rolling_ema_matches_pandas(spark):
    rng = np.random.default_rng(7)
    vals = rng.normal(10, 2, 80).tolist()
    out = (
        temporal.rolling_ema(_series_df(spark, vals), "value", n=5, series_col="user_id")
        .orderBy("idx").toPandas()["ema_5"].to_numpy()
    )
    exp = pd.Series(vals).ewm(span=5, adjust=True).mean().to_numpy()
    # truncation at 6n lags: early values exact, later within tiny tolerance
    np.testing.assert_allclose(out, exp, rtol=1e-6)


def test_sessionize(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 0.0), (1, t0 + dt.timedelta(minutes=10), 0.0),
        (1, t0 + dt.timedelta(minutes=50), 0.0),  # 40-min gap -> new session
        (2, t0, 0.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = temporal.sessionize(df, series_col="user_id", gap_minutes=30.0).toPandas()
    sess = out.groupby("user_id")["session_id"].max().to_dict()
    assert sess == {1: 2, 2: 1}


def test_cyclic_encode_period_inference(spark):
    df = spark.createDataFrame([(0,), (6,), (12,)], "hour int")
    out = temporal.cyclic_encode(df, "hour").orderBy("hour").toPandas()
    assert out["hour_sin"].tolist() == pytest.approx([0.0, 1.0, 0.0], abs=1e-12)
    assert out["hour_cos"].tolist() == pytest.approx([1.0, 0.0, -1.0], abs=1e-12)
