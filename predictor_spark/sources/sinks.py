"""Sinks (SURVEY §2.1 S5-S8) — CSV compat + parquet native writers.

Output shapes follow FIXTURES.md F5-F7 exactly:
- predictions: DATE_TIME, test_CLOSE, Target_H{h}/Prediction_H{h} per
  horizon (pipeline_plugins/stl_io.py:37-84, column order preserved)
- uncertainties: DATE_TIME + Uncertainty_H{h} (stl_io.py:93-111)
- results: long-format Metric / Average / Std Dev / Min / Max
  (stl_metrics.py:164-201)

Compat CSV writes coalesce(1) to a single ordered file like the reference;
native mode writes partitioned parquet (the 100 TB path — a single-file
CSV sink is inherently driver-bottlenecked and exists only for parity).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def write_csv(df: DataFrame, path: str, single_file: bool = True, order_by: str | None = None) -> None:
    """S5 — CSV sink. single_file=True reproduces the reference's one-file
    output (bounded data only); otherwise partitioned write."""
    out = df
    if order_by:
        out = out.orderBy(order_by)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)


def predictions_frame(
    df: DataFrame,
    horizons: Sequence[int],
    ts_col: str = "DATE_TIME",
    baseline_col: str = "test_CLOSE",
    target_fmt: str = "target_h{h}",
    pred_fmt: str = "pred_h{h}",
) -> DataFrame:
    """S6 — per-horizon denormalized predictions table in the reference's
    exact column order: DATE_TIME, test_CLOSE, then Target_H{h},
    Prediction_H{h} pairs (stl_io.py:79-84 reindex)."""
    cols = [F.col(ts_col).alias("DATE_TIME"), F.col(baseline_col).alias("test_CLOSE")]
    for h in horizons:
        cols.append(F.col(target_fmt.format(h=h)).alias(f"Target_H{h}"))
        cols.append(F.col(pred_fmt.format(h=h)).alias(f"Prediction_H{h}"))
    return df.select(*cols)


def uncertainties_frame(
    df: DataFrame,
    horizons: Sequence[int],
    ts_col: str = "DATE_TIME",
    unc_fmt: str = "unc_h{h}",
) -> DataFrame:
    """S7 — DATE_TIME + Uncertainty_H{h} columns (stl_io.py:93-111)."""
    cols = [F.col(ts_col).alias("DATE_TIME")]
    cols += [F.col(unc_fmt.format(h=h)).alias(f"Uncertainty_H{h}") for h in horizons]
    return df.select(*cols)


def results_frame(metrics_long: DataFrame) -> DataFrame:
    """S8 — long-format results: Metric label "{Split} {Metric} H{h}" with
    Average/Std Dev/Min/Max across iterations (stl_metrics.py:164-201).

    Input: (split, metric, horizon, value, iteration) rows."""
    labeled = metrics_long.withColumn(
        "Metric",
        F.concat_ws(" ", F.initcap("split"), F.col("metric"), F.concat(F.lit("H"), F.col("horizon"))),
    )
    v = F.col("value")
    clean = labeled.filter(v.isNotNull() & ~F.isnan(v))
    return clean.groupBy("Metric").agg(
        F.avg(v).alias("Average"),
        F.coalesce(F.stddev_samp(v), F.lit(0.0)).alias("Std Dev"),
        F.min(v).alias("Min"),
        F.max(v).alias("Max"),
    )
