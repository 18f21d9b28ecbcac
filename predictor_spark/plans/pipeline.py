"""End-to-end forecast pipeline — the engine's equivalent of the
reference's main query (`predictor --load_config cfg.json`, SURVEY §3.1).

Stages mirror stl_pipeline.py:196-377 / stl_preprocessor.py:59-120 but are
one lazy DataFrame program (Catalyst sees the whole plan; no intermediate
materialization):

  1. load splits (CSV compat or parquet) -> stacked frame with `split`
  2. denormalize via sidecar stats (N1/N2) when inputs are normalized
  3. anti-naive-lock feature transforms (W12 dispatcher)
  4. multi-horizon targets (W5/W6) + baseline (W4)
  5. model: persistence | ar1  (deep models plug in via mapInPandas)
  6. per-(split, horizon) metrics (A1-A5) -> long format
  7. results frame (S8) + optional star-schema upsert (S10)

Config is a flat dict like the reference's (app/config.py:3-84); only the
keys used here are read, unknown keys are ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.operators.metrics import multi_horizon_metrics
from predictor_spark.operators.normalize import denormalize
from predictor_spark.operators.temporal import lead_targets
from predictor_spark.operators.transforms import anti_naive_lock, infer_roles
from predictor_spark.plans.ar_model import ar1_fit_predict
from predictor_spark.sources.sinks import results_frame

DEFAULTS = {
    "target_column": "value",
    "ts_column": "ts",
    "series_column": None,
    "predicted_horizons": [1, 3, 6],
    "use_returns": False,
    "predictor": "persistence",  # persistence | ar1
    "use_anti_naive_lock": False,
    "train_end": None,  # ts cutoff for ar1 fitting / split derivation
    "iterations": 1,
}


def run_forecast_pipeline(
    spark: SparkSession,
    df: DataFrame,
    config: dict,
    normalization_stats: dict | None = None,
) -> dict[str, DataFrame]:
    """Run the full train->predict->metrics program; returns the named
    DataFrame bundle (the engine's §3.1b inter-stage IR): predictions,
    metrics_long, results."""
    cfg = {**DEFAULTS, **config}
    target = cfg["target_column"]
    ts_col = cfg["ts_column"]
    series = cfg["series_column"]
    horizons = [int(h) for h in cfg["predicted_horizons"]]

    # 2. denormalize (explicit flag, not the reference's N3 heuristics)
    if normalization_stats:
        df = denormalize(df, normalization_stats)

    # 3. feature transforms
    if cfg["use_anti_naive_lock"]:
        feature_cols = [c for c in df.columns if c not in (ts_col, series, target, "split")]
        roles = infer_roles(feature_cols, target_col=target)
        df = anti_naive_lock(df, roles, ts_col=ts_col, series_col=series)

    # 4. targets + baseline
    tgt = lead_targets(df, target, horizons, ts_col=ts_col, series_col=series,
                       trim=True, returns=bool(cfg["use_returns"]))
    tgt = tgt.withColumn("baseline", F.col(target))

    # 5. model
    if cfg["predictor"] == "persistence":
        preds = tgt.withColumns({f"pred_h{h}": F.col("baseline") for h in horizons})
    elif cfg["predictor"] == "ar1":
        if not cfg["train_end"]:
            raise ValueError("ar1 predictor requires config['train_end']")
        frames = []
        for h in horizons:
            # score held-out AND in-sample rows so train metrics exist,
            # like the reference's train/val/test metric tables
            parts = [
                ar1_fit_predict(df, value_col=target, ts_col=ts_col,
                                series_col=series or "user_id",
                                train_end=cfg["train_end"], horizon=h, eval_on=on)
                for on in ("train", "test")
            ]
            scored = parts[0].unionByName(parts[1])
            frames.append(scored.select(
                *( [series or "user_id"] ), ts_col,
                F.col("pred").alias(f"pred_h{h}"),
            ))
        keys = [series or "user_id", ts_col]
        preds = tgt
        for fr in frames:
            preds = preds.join(fr, keys, "inner")
    else:
        raise ValueError(f"unknown predictor {cfg['predictor']!r}")

    # derive split column if absent (train/test by cutoff; val unused here)
    if "split" not in preds.columns:
        if cfg["train_end"]:
            preds = preds.withColumn(
                "split",
                F.when(F.col(ts_col) < F.lit(cfg["train_end"]).cast("timestamp"), "train")
                .otherwise("test"),
            )
        else:
            preds = preds.withColumn("split", F.lit("train"))

    # 6. metrics per (split, horizon)
    metrics = multi_horizon_metrics(preds, horizons, baseline_col="baseline",
                                    group_cols=["split"])
    metrics_long = metrics.selectExpr(
        "split", "horizon",
        "stack(3, 'MAE', mae, 'Naive MAE', naive_mae, 'R2', r2) AS (metric, value)",
    ).withColumn("iteration", F.lit(0))

    # 7. results frame (S8 long format)
    results = results_frame(metrics_long)
    return {"predictions": preds, "metrics_long": metrics_long, "results": results}
