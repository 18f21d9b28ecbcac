"""Deterministic Prophet-style per-series model — the Spark-native
stand-in for the reference's `prophet` predictor plugin
(predictor_plugins/predictor_plugin_prophet.py:84-285: per-horizon
Prophet fit on (ds, y) with trend + seasonality + interval width).

Model: ordinary least squares on the design matrix

    [1, t, relu(t - cp_1..cp_C), sin/cos(2 pi k d)_k=1..K]

with t = time scaled to [0, 1] over the TRAIN span, changepoints at
fixed train-span fractions (piecewise-linear trend, Prophet's
`n_changepoints` idea made deterministic), and day-fraction Fourier
terms for daily seasonality. No MCMC, no random init — pure linear
algebra, so results are reproducible to the bit and differential-testable
against a driver-side numpy replay.

Scale: one series = one `applyInPandas` group (Arrow-batched); 10^6
series saturate a cluster. Train-only fitting discipline as everywhere
in the engine: the design matrix solve uses rows before ``train_end``
only; all rows get scored.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F  # noqa: F401 (F used by callers)


def _design(ts_sec: np.ndarray, t0: float, span: float,
             changepoints: np.ndarray, fourier_k: int) -> np.ndarray:
    t = (ts_sec - t0) / span
    cols = [np.ones_like(t), t]
    for cp in changepoints:
        cols.append(np.maximum(t - cp, 0.0))
    day = (ts_sec % 86400.0) / 86400.0
    for k in range(1, fourier_k + 1):
        cols.append(np.sin(2 * np.pi * k * day))
        cols.append(np.cos(2 * np.pi * k * day))
    return np.stack(cols, axis=1)


def fit_predict_series(pdf: pd.DataFrame, value_col: str, ts_col: str,
                       train_end: np.datetime64, n_changepoints: int,
                       fourier_k: int) -> pd.DataFrame:
    """numpy core, shared verbatim by the Spark operator and the
    differential test (tests compare cluster output to this exact code
    run driver-side)."""
    pdf = pdf.sort_values(ts_col).reset_index(drop=True)
    ts = pdf[ts_col].to_numpy("datetime64[us]")
    sec = ts.astype("int64") / 1e6
    y = pdf[value_col].to_numpy(dtype=np.float64)
    train = ts < train_end
    n_train = int(train.sum())
    min_rows = 2 + n_changepoints + 2 * fourier_k + 1
    if n_train < min_rows:
        yhat = np.full(len(y), y[train].mean() if n_train else 0.0)
        return pdf.assign(yhat=yhat, trend=yhat, seasonal=0.0)
    t0, t1 = sec[train].min(), sec[train].max()
    span = max(t1 - t0, 1.0)
    cps = np.array([(i + 1) / (n_changepoints + 1) for i in range(n_changepoints)])
    X = _design(sec, t0, span, cps, fourier_k)
    theta, *_ = np.linalg.lstsq(X[train], y[train], rcond=None)
    yhat = X @ theta
    n_trend = 2 + n_changepoints
    trend = X[:, :n_trend] @ theta[:n_trend]
    return pdf.assign(yhat=yhat, trend=trend, seasonal=yhat - trend)


def prophet_like_fit_predict(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    train_end: str = "2024-01-22 00:00:00",
    n_changepoints: int = 3,
    fourier_k: int = 2,
) -> DataFrame:
    """Fit per series on train rows, score every row. Returns
    (series, ts, value, yhat, trend, seasonal)."""
    from predictor_spark.shiplib import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    cutoff = np.datetime64(train_end.replace(" ", "T"), "us")
    schema = (f"{series_col} bigint, {ts_col} timestamp, {value_col} double, "
              "yhat double, trend double, seasonal double")

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        return fit_predict_series(pdf, value_col, ts_col, cutoff,
                                  n_changepoints, fourier_k)

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(series_col, ts_col, value_col)
        .repartition(n_parts, series_col)
        .groupBy(series_col)
        .applyInPandas(per_series, schema)
    )
