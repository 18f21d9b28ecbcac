"""Catalog part 7 — MLlib Pipeline model with a closed-form SQL oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.plans.mllib_model import fit_linear_forecaster

_CUTOFF = "2024-01-22 00:00:00"


@query(
    "mllib_linear_forecaster",
    oracle=f"""
    WITH base AS (
        SELECT user_id, ts, event_type, value,
               lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS target
        FROM events
    ), trimmed AS (SELECT * FROM base WHERE target IS NOT NULL),
    coeff AS (
        SELECT regr_slope(target, value) AS slope,
               regr_intercept(target, value) AS intercept
        FROM trimmed WHERE ts < TIMESTAMP '{_CUTOFF}'
    )
    SELECT event_type, count(*) AS n,
           round(avg(abs(intercept + slope * value - target)), 6) AS mae
    FROM trimmed, coeff
    WHERE ts >= TIMESTAMP '{_CUTOFF}'
    GROUP BY event_type
    """,
)
def mllib_linear_forecaster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib Pipeline (VectorAssembler -> LinearRegression, exact-OLS
    normal solver) fit on the train slice, scored held-out — checked
    against closed-form least squares in SQL. The Estimator/Transformer
    composition surface of §2.10."""
    ev = _t(spark, sf_dir, "events")
    _, scored = fit_linear_forecaster(ev, ["value"], train_end=_CUTOFF, horizon=1)
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.abs(F.col("pred") - F.col("target_h1"))), 6).alias("mae"),
    )
