from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from predictor_spark.operators import spectral, stl, transforms


def _series_df(spark, values, user=1):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(user, t0 + dt.timedelta(hours=i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_infer_roles():
    roles = transforms.infer_roles(
        ["CLOSE", "ema_24", "hod", "hod_sin", "CUSTOM"], target_col=None, excluded=["CUSTOM"]
    )
    assert roles == {
        "CLOSE": "log_returns", "ema_24": "first_diff", "hod": "cyclic",
        "hod_sin": "preserve", "CUSTOM": "preserve",
    }


def test_anti_naive_lock_in_place(spark):
    df = _series_df(spark, [1.0, 2.0, 4.0]).withColumn("trend_x", F.col("value") * 2)
    roles = {"value": "log_returns", "trend_x": "first_diff"}
    out = transforms.anti_naive_lock(df, roles, series_col="user_id").orderBy("ts").toPandas()
    assert out["value"].tolist() == pytest.approx([0.0, np.log(2.0), np.log(2.0)])
    assert out["trend_x"].tolist() == pytest.approx([0.0, 2.0, 4.0])


def test_exact_stl_log_return_feature(spark):
    df = _series_df(spark, [1.0, 2.0, 3.0, 4.0]).withColumn(
        "split", F.when(F.col("value") <= 3.0, "train").otherwise("test")
    )
    out = transforms.exact_stl_log_return_feature(
        df, "value", series_col="user_id"
    ).orderBy("ts").toPandas()
    # raw feature: [log1p(1), log1p(2)-log1p(1), ...] then z-scored on train
    lp = np.log1p([1.0, 2.0, 3.0, 4.0])
    raw = np.concatenate([[lp[0]], np.diff(lp)])
    tr = raw[:3]
    z = (raw - tr.mean()) / tr.std(ddof=1)
    assert out["log_return"].tolist() == pytest.approx(z.tolist())


def test_fft_features_match_numpy(spark):
    rng = np.random.default_rng(11)
    vals = rng.normal(0, 1, 60)
    w, nc = 16, 4
    out = (
        spectral.fft_window_features(_series_df(spark, vals), window_size=w, n_components=nc)
        .orderBy("ts").toPandas()
    )
    assert len(out) == 60 - w
    # oracle for the first emitted tick t=w: window vals[0:w]
    d = np.diff(vals[:w])
    mags = np.abs(np.fft.rfft(d))[:nc]
    mags = mags / mags.sum()
    got = out.iloc[0][[f"fft_{k}" for k in range(nc)]].to_numpy(dtype=float)
    np.testing.assert_allclose(got, mags, rtol=1e-10)


def test_stl_decompose_identity_and_seasonality(spark):
    # synthetic: trend + strong period-8 seasonality
    n, period = 120, 8
    t = np.arange(n)
    vals = 0.05 * t + 3.0 * np.sin(2 * np.pi * t / period)
    out = (
        stl.stl_decompose(_series_df(spark, vals), period=period)
        .orderBy("ts").toPandas()
    )
    # W8 identity: value == trend + seasonal + resid (exact by construction)
    recomposed = out["trend"] + out["seasonal"] + out["resid"]
    np.testing.assert_allclose(recomposed, out["value"], rtol=1e-12)
    # seasonal captures most of the oscillation away from the edges
    mid = out.iloc[period:-period]
    assert mid["seasonal"].std() > 1.5
    assert mid["resid"].abs().mean() < 0.8


def test_stl_recompose_uncertainty(spark):
    df = spark.createDataFrame([(3.0, 4.0)], "u1 double, u2 double")
    out = stl.recompose_uncertainty(df, ["u1", "u2"]).collect()[0]
    assert out["uncertainty"] == pytest.approx(5.0)


def test_fft_short_series_empty(spark):
    out = spectral.fft_window_features(_series_df(spark, [1.0, 2.0]), window_size=16)
    assert out.count() == 0


def test_fft_chunked_equals_per_series(spark):
    """Halo-chunked single-series W15 must reproduce the per-series path
    exactly — chunk boundaries (incl. a short final chunk) are invisible."""
    rng = np.random.RandomState(7)
    vals = np.cumsum(rng.randn(250))
    df = _series_df(spark, vals)
    base = (
        spectral.fft_window_features(df, window_size=16, n_components=4)
        .orderBy("ts").toPandas()
    )
    chunked = (
        spectral.fft_window_features_chunked(df, window_size=16, n_components=4, chunk_size=64)
        .orderBy("ts").toPandas()
    )
    assert len(chunked) == len(base) == 250 - 16
    np.testing.assert_allclose(
        chunked[[f"fft_{k}" for k in range(4)]].to_numpy(),
        base[[f"fft_{k}" for k in range(4)]].to_numpy(),
        rtol=1e-12,
    )


def test_fft_chunked_rejects_small_chunks(spark):
    with pytest.raises(ValueError, match="must exceed"):
        spectral.fft_window_features_chunked(_series_df(spark, [1.0]), chunk_size=8, window_size=16)


def test_prophet_like_matches_numpy_and_recovers_structure(spark):
    import numpy as np
    import pandas as pd
    from predictor_spark.operators.prophet_like import (
        fit_predict_series, prophet_like_fit_predict)
    from predictor_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    # 1) cluster output == driver-side numpy replay, bit for bit
    ev = load_table(spark, SF_DIR, "events")
    got = prophet_like_fit_predict(ev).toPandas()
    got = got.sort_values(["user_id", "ts"]).reset_index(drop=True)
    pdf = ev.select("user_id", "ts", "value").toPandas()
    cutoff = np.datetime64("2024-01-22T00:00:00", "us")
    import pandas as pd

    want = (
        pd.concat([fit_predict_series(g, "value", "ts", cutoff, 3, 2)
                   for _, g in pdf.groupby("user_id")])
        .sort_values(["user_id", "ts"]).reset_index(drop=True)
    )
    assert np.array_equal(got["yhat"].to_numpy(), want["yhat"].to_numpy())

    # 2) recovers a known trend + daily cycle far better than persistence
    base = np.datetime64("2024-01-01T00:00:00")
    ts = np.array([base + np.timedelta64(15 * i, "m") for i in range(2500)])
    sec = ts.astype("datetime64[us]").astype("int64") / 1e6
    y = 0.001 * (sec - sec[0]) / 900 + 5 * np.sin(2 * np.pi * (sec % 86400) / 86400)
    df = spark.createDataFrame(pd.DataFrame({
        "user_id": 1, "ts": ts.astype("datetime64[us]"), "value": y}))
    out = prophet_like_fit_predict(df, train_end="2024-01-20 00:00:00").toPandas()
    test = out[out["ts"] >= pd.Timestamp("2024-01-20")]
    mae = float(np.abs(test["value"] - test["yhat"]).mean())
    assert mae < 0.1, mae
