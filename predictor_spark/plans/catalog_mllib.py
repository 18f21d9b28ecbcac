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


@query(
    "als_rank1_half_step",
    oracle="""
    WITH r AS (
        SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS cnt
        FROM events GROUP BY user_id, event_type
    ),
    v AS (  -- deterministic item-factor init from the md5 prefix
        SELECT event_type,
               CAST(('0x' || substr(md5(event_type), 1, 7)) AS BIGINT)
                   / 268435456.0 AS vf
        FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT r.user_id,
           round(sum(r.cnt * v.vf) / (sum(v.vf * v.vf) + 0.1), 6) AS uf,
           count(*) AS n_items
    FROM r JOIN v USING (event_type)
    GROUP BY r.user_id
    """,
)
def als_rank1_half_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact ALS half-step at rank 1 over the implicit user×item
    (event_type) count matrix: item factors fixed to a deterministic
    hash init, user factors solved in closed form
    u_i = Σ_j r_ij v_j / (Σ_j v_j² + λ), λ=0.1 — the per-iteration
    building block of MLlib's ALS recommender, exposed as an
    oracle-checkable aggregate (full ALS alternates this step;
    kmeans_one_step plays the same role for the IVF quantizer).

    Scale: ratings reduce map-side to |users|×|items| rows; the item
    factor table is |items| rows broadcast; each user's solve is one
    grouped sum — at real rank k it becomes a k×k normal-equation solve
    per user inside the same aggregation (pandas UDAF), never a shuffle
    of factors.
    """
    ev = _t(spark, sf_dir, "events")
    r = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"))
    v = (
        ev.select("event_type").distinct()
        .select(
            "event_type",
            (F.conv(F.substring(F.md5("event_type"), 1, 7), 16, 10)
             .cast("double") / 268435456.0).alias("vf"),
        )
    )
    return (
        r.join(F.broadcast(v), "event_type")
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("cnt") * F.col("vf"))
                / (F.sum(F.col("vf") * F.col("vf")) + 0.1), 6).alias("uf"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
