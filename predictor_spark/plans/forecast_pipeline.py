"""M0 vertical slice — the reference's main "query" end-to-end, Spark-first.

Reference lifecycle (SURVEY.md §3.1): CSV scan -> normalize -> log-returns ->
window tensorize -> multi-horizon lead targets -> baseline -> train/predict ->
per-horizon MAE / naive-MAE / R² -> long-format results table
(pipeline_plugins/stl_pipeline.py:196-377).

This plan runs that shape on any (series, ts, value) table with the model
replaced by the naive persistence predictor (pred := baseline = value at t),
which makes the whole slice a pure relational program: one window-function
stage + one aggregation. That is exactly the reference's own built-in sanity
benchmark (Naive MAE, stl_metrics.py:78-81).

Scale shape at 100 TB:
- one hash shuffle by series key for the window stage (all window exprs
  share one spec -> single sort);
- horizon family unpivoted via inline explode (no extra scans);
- one partial-agg shuffle for the metric groupBy;
- nothing ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from predictor_spark.operators.metrics import multi_horizon_metrics
from predictor_spark.operators.temporal import lead_targets, log_returns


def persistence_forecast_metrics(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str | None = "user_id",
    group_col: str | None = "event_type",
    horizons: Sequence[int] = (1, 3, 6),
    round_dp: int | None = 6,
) -> DataFrame:
    """Flagship query: per-series log-return features, multi-horizon lead
    targets, persistence predictions, per-(group, horizon) metric table.

    Output: (group, horizon, n, mae, naive_mae, r2) — for persistence the
    prediction IS the baseline, so mae == naive_mae and the table doubles
    as a self-check.
    """
    feat = log_returns(df, [value_col], ts_col=ts_col, series_col=series_col)
    tgt = lead_targets(feat, value_col, horizons, ts_col=ts_col, series_col=series_col, trim=True)
    # persistence model: prediction for every horizon = value at t (W4 baseline)
    preds = tgt.withColumns({f"pred_h{h}": F.col(value_col) for h in horizons})
    out = multi_horizon_metrics(
        preds,
        horizons,
        baseline_col=value_col,
        group_cols=[group_col] if group_col else [],
    )
    if round_dp is not None:
        out = out.withColumns({c: F.round(F.col(c), round_dp) for c in ("mae", "naive_mae", "r2")})
    return out
