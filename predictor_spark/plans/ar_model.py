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
    from pyspark.sql import Window

    base = lead_targets(df, value_col, [horizon], ts_col=ts_col, series_col=series_col, trim=True)
    target = f"target_h{horizon}"
    cutoff = F.lit(train_end).cast("timestamp")
    # The target y[t+h] must ALSO lie before the cutoff, or test-period
    # values leak into the fit. lead(ts) shares the window spec lead_targets
    # used, so Catalyst plans one WindowExec for both.
    w = Window.partitionBy(series_col).orderBy(ts_col)
    base = base.withColumn("__tgt_ts", F.lead(ts_col, horizon).over(w))
    train = base.filter((F.col(ts_col) < cutoff) & (F.col("__tgt_ts") < cutoff))
    coeffs = train.groupBy(series_col).agg(
        F.regr_slope(F.col(target), F.col(value_col)).alias("slope"),
        F.regr_intercept(F.col(target), F.col(value_col)).alias("intercept"),
    )
    scored = train if eval_on == "train" else base.filter(F.col(ts_col) >= cutoff)
    return (
        scored.drop("__tgt_ts")
        .join(F.broadcast(coeffs), series_col)
        .filter(F.col("slope").isNotNull())
        .withColumn("pred", F.col("intercept") + F.col("slope") * F.col(value_col))
        .withColumn("baseline", F.col(value_col))
    )


def ar1_fit_predict_split(
    train_df: DataFrame,
    eval_df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    horizon: int = 1,
) -> DataFrame:
    """Scan-pruned variant of :func:`ar1_fit_predict`: the caller passes
    train and eval slices produced by range-limited scans
    (sources.tables.load_events_range), so the time predicate reaches
    parquet row-group pruning instead of filtering in-plan — at 100 TB an
    unpruned events scan IS the query cost. Leads are computed within each
    slice and cannot cross the boundary, which enforces the no-leakage
    guard structurally: train rows whose target would fall in the eval
    period are trimmed by lead_targets itself."""
    target = f"target_h{horizon}"
    train = lead_targets(train_df, value_col, [horizon], ts_col=ts_col,
                         series_col=series_col, trim=True)
    coeffs = train.groupBy(series_col).agg(
        F.regr_slope(F.col(target), F.col(value_col)).alias("slope"),
        F.regr_intercept(F.col(target), F.col(value_col)).alias("intercept"),
    )
    scored = lead_targets(eval_df, value_col, [horizon], ts_col=ts_col,
                          series_col=series_col, trim=True)
    return (
        scored.join(F.broadcast(coeffs), series_col)
        .filter(F.col("slope").isNotNull())
        .withColumn("pred", F.col("intercept") + F.col("slope") * F.col(value_col))
        .withColumn("baseline", F.col(value_col))
    )


def ar2_yule_walker(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    train_end: str = "2024-01-22 00:00:00",
) -> DataFrame:
    """Per-series AR(2) via Yule-Walker, one shuffle for ALL series.

    Sample autocovariances c_k = sum(x_t * x_{t-k}) / n over the demeaned
    train slice (n = train row count), then the 2x2 Yule-Walker system by
    Cramer's rule:

        phi1 = r1 * (1 - r2) / (1 - r1^2)
        phi2 = (r2 - r1^2)  / (1 - r1^2)        with r_k = c_k / c_0.

    Everything is window lags + one groupBy aggregate — closed-form
    "training" that needs no iteration, so 10^8 series cost one shuffle
    (the reference's per-series Keras loop is the sequential analog,
    predictor_plugins/common/base.py:260-322). Degenerate series
    (constant, or fewer than 3 train rows) are dropped rather than
    emitting NaN coefficients."""
    from pyspark.sql import Window

    cutoff = F.lit(train_end).cast("timestamp")
    w = Window.partitionBy(series_col).orderBy(ts_col)
    train = df.filter(F.col(ts_col) < cutoff).select(
        series_col, ts_col, F.col(value_col).alias("y")
    )
    # demean with a single partition-wide window avg (no second pass/join)
    wall = Window.partitionBy(series_col)
    x = (
        train.withColumn("m", F.avg("y").over(wall))
        .withColumn("x", F.col("y") - F.col("m"))
        .withColumn("x1", F.lag("x", 1).over(w))
        .withColumn("x2", F.lag("x", 2).over(w))
    )
    agg = x.groupBy(series_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.first("m").alias("mean"),
        F.sum(F.col("x") * F.col("x")).alias("s0"),
        F.sum(F.col("x") * F.col("x1")).alias("s1"),
        F.sum(F.col("x") * F.col("x2")).alias("s2"),
    )
    r1 = F.col("s1") / F.col("s0")
    r2 = F.col("s2") / F.col("s0")
    det = 1 - r1 * r1
    return (
        agg.filter((F.col("n") >= 3) & (F.col("s0") > 0))
        .withColumn("phi1", r1 * (1 - r2) / det)
        .withColumn("phi2", (r2 - r1 * r1) / det)
        .select(series_col, "n", "mean", "phi1", "phi2")
    )


def ar_order_select(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    train_end: str = "2024-01-22 00:00:00",
) -> DataFrame:
    """Per-series AR order selection (p in 1..3) by AIC — the engine's
    analog of the reference's ARIMA-GA (app/arima_optimizer.py:12-22,
    DEAP minimizing AIC over (p,d,q)): instead of a driver-side GA, the
    Levinson-Durbin recursion is closed-form column algebra over lagged
    autocovariances, so ALL series select their order in one window pass
    + one aggregate — no iteration, no candidate fan-out needed for pure
    AR. (The GA fan-out in plans/search.py remains the path for models
    without closed forms.)

    Levinson-Durbin on normalized autocorrelations r_k = s_k/s0:
        k1 = r1                E1 = 1 - k1^2
        k2 = (r2-k1*r1)/E1     E2 = E1*(1-k2^2)   a21 = k1*(1-k2)
        k3 = (r3-a21*r2-k2*r1)/E2                 E3 = E2*(1-k3^2)
    sigma2_p = (s0/n)*E_p, AIC_p = n*ln(sigma2_p) + 2p. best_p = argmin
    over the ROUNDED AICs (4 dp), ties to the smaller p — both rounding
    and tie-break mirrored in the oracle."""
    from pyspark.sql import Window

    cutoff = F.lit(train_end).cast("timestamp")
    w = Window.partitionBy(series_col).orderBy(ts_col)
    wall = Window.partitionBy(series_col)
    x = (
        df.filter(F.col(ts_col) < cutoff)
        .select(series_col, ts_col, F.col(value_col).alias("y"))
        .withColumn("x", F.col("y") - F.avg("y").over(wall))
    )
    for k in (1, 2, 3):
        x = x.withColumn(f"x{k}", F.lag("x", k).over(w))
    agg = x.groupBy(series_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col("x") * F.col(c)).alias(s)
          for c, s in [("x", "s0"), ("x1", "s1"), ("x2", "s2"), ("x3", "s3")]],
    ).filter((F.col("n") >= 8) & (F.col("s0") > 0))
    r1, r2, r3 = [F.col(f"s{k}") / F.col("s0") for k in (1, 2, 3)]
    k1 = r1
    e1 = 1 - k1 * k1
    k2 = (r2 - k1 * r1) / e1
    e2 = e1 * (1 - k2 * k2)
    a21 = k1 * (1 - k2)
    k3 = (r3 - a21 * r2 - k2 * r1) / e2
    e3 = e2 * (1 - k3 * k3)
    n = F.col("n").cast("double")
    sig = F.col("s0") / n
    aics = {p: F.round(n * F.log(sig * e) + 2 * p, 4)
            for p, e in [(1, e1), (2, e2), (3, e3)]}
    best = (
        F.when((aics[1] <= aics[2]) & (aics[1] <= aics[3]), 1)
        .when(aics[2] <= aics[3], 2)
        .otherwise(3)
    )
    return agg.select(
        series_col, "n",
        aics[1].alias("aic1"), aics[2].alias("aic2"), aics[3].alias("aic3"),
        best.alias("best_p"),
    )
