"""MLlib Pipeline integration — the Estimator/Transformer composition
surface (SURVEY §2.10: the reference's predictor plugins map to MLlib
Pipeline stages; BASELINE.json: "MLlib pipelines + distributed training").

`fit_linear_forecaster` assembles window features -> LinearRegression
(solver='normal' = exact OLS) inside a single MLlib Pipeline, fit on the
train slice, and returns a PipelineModel whose transform() scores any
slice. With one feature and no regularization this is algebraically the
global AR(1) of plans/ar_model.py — which gives the catalog query an
exact SQL oracle (regr_slope/regr_intercept): the MLlib path is checked
against closed-form least squares, not against itself.

Deep predictors (the reference's ann/cnn/lstm/... plugins) slot into the
same frame: Estimator.fit = mapInPandas training loop per shard +
parameter averaging or a single-node fit on collected windows at
reference scale; predict_with_uncertainty = mapInPandas with broadcast
weights (SURVEY §2.10 mapping). TF is not in this image, so the Keras
estimator is left as the registry extension point.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame, functions as F

from predictor_spark.operators.temporal import lead_targets


def fit_linear_forecaster(
    df: DataFrame,
    feature_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str | None = "user_id",
    train_end: str = "2024-01-22 00:00:00",
    horizon: int = 1,
) -> tuple[PipelineModel, DataFrame]:
    """Fit VectorAssembler -> LinearRegression(normal solver) on train
    rows; return (model, scored test frame with `pred`)."""
    # cached (r14, guide §2.4): the eager Pipeline.fit consumes the train
    # slice and the lazy transform the test slice, but BOTH slices filter
    # the SAME windowed frame — un-cached, the events scan + lead window
    # ran once inside fit's normal-equation aggregate and again when the
    # scored frame materializes
    base = lead_targets(df, value_col, [horizon], ts_col=ts_col, series_col=series_col, trim=True).cache()
    target = f"target_h{horizon}"
    cutoff = F.lit(train_end).cast("timestamp")
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=feature_cols, outputCol="features"),
        LinearRegression(featuresCol="features", labelCol=target,
                         predictionCol="pred", regParam=0.0, solver="normal"),
    ])
    model = pipe.fit(base.filter(F.col(ts_col) < cutoff))
    scored = model.transform(base.filter(F.col(ts_col) >= cutoff))
    return model, scored
