"""Distributed per-series AR(1) model — the M2 "train + predict" slice
(SURVEY §7) expressed as pure aggregates.

The reference trains one Keras model on one series
(predictor_plugins/common/base.py:260-322). The engine's distributed
analog fits an independent least-squares AR(1) PER SERIES in a single
groupBy pass (regr_slope/regr_intercept are one-pass aggregates), then
broadcasts the tiny coefficient table back onto the test rows. N series =
N models, one shuffle, no driver-side loops — the same topology scales to
10^8 series. (Deep models plug into the identical split/fit/score frame
via mapInPandas — see plans/search.py.)

Train/test discipline matches the reference: coefficients are fit on the
TRAIN slice only (phase2_6_preprocessor.py:346-349 fits scalers on train
only) and evaluated on held-out rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from predictor_spark.operators.temporal import lead_targets


def ar1_fit_predict(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    train_end: str = "2024-01-22 00:00:00",
    horizon: int = 1,
    eval_on: str = "test",
) -> DataFrame:
    """Fit y[t+h] = a + b*y[t] per series on train rows; emit scored rows
    for ``eval_on`` ('test' = held-out ts >= cutoff, 'train' = in-sample).
    Returns (series, ts, value, target, pred, baseline)."""
    base = lead_targets(df, value_col, [horizon], ts_col=ts_col, series_col=series_col, trim=True)
    target = f"target_h{horizon}"
    cutoff = F.lit(train_end).cast("timestamp")
    train = base.filter(F.col(ts_col) < cutoff)
    coeffs = train.groupBy(series_col).agg(
        F.regr_slope(F.col(target), F.col(value_col)).alias("slope"),
        F.regr_intercept(F.col(target), F.col(value_col)).alias("intercept"),
    )
    scored = train if eval_on == "train" else base.filter(F.col(ts_col) >= cutoff)
    return (
        scored.join(F.broadcast(coeffs), series_col)
        .filter(F.col("slope").isNotNull())
        .withColumn("pred", F.col("intercept") + F.col("slope") * F.col(value_col))
        .withColumn("baseline", F.col(value_col))
    )
