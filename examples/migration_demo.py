"""Migration demo — every reference entry point (SURVEY §3.1-§3.4) as
engine API calls, runnable end-to-end on the sf0.001 test data.

Each numbered step mirrors one reference workflow; MIGRATION.md walks
through them with the reference CLI lines they replace. The demo is
exercised by tests/test_migration_demo.py so the snippets cannot rot.

Usage: python examples/migration_demo.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(sf_dir: str = "/root/testdata/sf0.001", work_dir: str = "/tmp/migration_demo"):
    os.makedirs(work_dir, exist_ok=True)
    from pyspark.sql import functions as F

    from predictor_spark.session import get_spark
    from predictor_spark.sources.tables import load_table

    spark = get_spark("migration_demo")
    out: dict[str, object] = {}

    # --- §3.1  `predictor --load_config cfg.json`  (train + evaluate) ---
    # reference: app/main.py loads the config, runs the pipeline plugin,
    # trains the predictor plugin, writes predictions/metrics CSVs.
    from predictor_spark.models import tcn
    from predictor_spark.models.estimator import fit_predict_per_series
    from predictor_spark.operators.metrics import forecast_metrics
    from predictor_spark.sources.config_sink import merge_config, save_config

    config = merge_config(
        defaults={"window": 8, "epochs": 5, "plugin": "tcn"},
        plugin_params1={"channels": 4, "layers": 2, "kernel": 2},
        plugin_params2={},
        file_config={"epochs": 6},        # the "cfg.json"
        cli_args={}, unknown_args={}, cli_keys=[],
    )
    events = load_table(spark, sf_dir, "events")
    scored = fit_predict_per_series(
        events.select("user_id", "ts", "value"),
        core=tcn,
        series_col="user_id",
        train_end="2024-01-22 00:00:00",
        window=config["window"],
        horizons=(1,),
        train_kwargs=dict(epochs=config["epochs"], channels=config["channels"],
                          layers=config["layers"], kernel=config["kernel"]),
        seed=0,
    ).cache()
    metrics = forecast_metrics(scored, "pred_h1", "target_h1", "baseline",
                               group_cols=["user_id"])
    out["metrics_rows"] = metrics.count()

    # predictions + results sinks (S5-S8)
    from predictor_spark.sources.sinks import predictions_frame, write_csv

    preds = predictions_frame(
        scored.withColumnRenamed("ts", "DATE_TIME")
        .withColumnRenamed("baseline", "test_CLOSE"),
        horizons=[1], ts_col="DATE_TIME", baseline_col="test_CLOSE",
    )
    write_csv(preds, f"{work_dir}/predictions_csv", order_by="DATE_TIME")
    out["predictions_written"] = True

    # config_out.json, like app/main.py:303-310
    save_config(config, f"{work_dir}/config_out.json",
                defaults={"window": 8, "epochs": 5, "plugin": "tcn"})
    out["config_overlay"] = json.load(open(f"{work_dir}/config_out.json"))

    # --- §3.2  `predictor ... use_optimizer=true`  (hyperparameter GA) ---
    from predictor_spark.plans.model_search import nbeats_ga_search_report

    report = nbeats_ga_search_report(spark, sf_dir, pop_size=2,
                                     n_generations=1, epochs=3,
                                     max_series=20, seed=0)
    out["ga_champion_rows"] = report.count()

    # --- §3.3  `predictor --load_model model.keras`  (inference-only) ---
    # reference: separate train/predict phases via .keras artifacts; the
    # engine analog is the parquet model store (weights as rows).
    from predictor_spark.models import registry

    weights = registry.fit_per_series(
        events.select("user_id", "ts", "value"), core=tcn,
        series_col="user_id", train_end="2024-01-22 00:00:00",
        window=8, horizons=(1,),
        train_kwargs=dict(epochs=3, channels=4, layers=2, kernel=2), seed=0)
    registry.save_model_store(weights, f"{work_dir}/model_store")
    restored = registry.load_model_store(spark, f"{work_dir}/model_store")
    rescored = registry.predict_from_weights(
        events.select("user_id", "ts", "value"), restored, core=tcn,
        series_col="user_id")
    out["inference_rows"] = rescored.count()

    # --- trading backtest (app/heuristic_strategy.py) on the forecasts ---
    from predictor_spark.operators.trading import (
        simulate_heuristic_strategy,
        trading_summary,
    )

    trades = simulate_heuristic_strategy(events.select("user_id", "ts", "value"),
                                         series_col="user_id")
    out["trading_summary_rows"] = trading_summary(trades).count()

    # --- §3.4  results ETL into the OLAP star schema (olap/) ---
    from predictor_spark.sources.olap import StarSchemaWarehouse

    wh = StarSchemaWarehouse(spark, f"{work_dir}/warehouse")
    dim = metrics.select(F.col("user_id").alias("experiment_id")).distinct() \
        .withColumn("phase", F.lit("demo"))
    wh.upsert("dim_experiment", dim, keys=["experiment_id"])
    fact = metrics.select(F.col("user_id").alias("experiment_id"),
                          F.col("mae").alias("value")) \
        .withColumn("metric", F.lit("test mae h1"))
    wh.upsert("fact_performance", fact, keys=["experiment_id", "metric"])
    out["warehouse_facts"] = wh.query(
        "SELECT count(*) AS n FROM fact_performance").collect()[0]["n"]

    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    result = run(*args)
    print(json.dumps(result, indent=2, default=str))
