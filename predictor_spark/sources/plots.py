"""S11 — plot sinks: loss curve and predictions-vs-true with an
uncertainty band.

Reference: pipeline_plugins/stl_plots.py — plot_and_save_loss:16-28
(train/val loss per epoch), plot_predictions:30-120 (denormalized pred /
target / actual price lines + |uncertainty| fill band over the last
``plot_points`` rows, default 480).

Spark-first split: the PLOT FRAME (what gets drawn) is computed
distributed — the last-N slice is an orderBy-desc/limit pushed to the
engine, the band edges are column expressions — and only the bounded
result (≤ plot_points rows) reaches the driver. Rendering is a
driver-side matplotlib call exactly like the reference, import-gated: on
images without matplotlib the frame is written as a CSV sidecar next to
the requested PNG path so the artifact contract (one file per plot per
iteration) still holds. At 100 TB nothing changes: the limit bounds the
collect no matter the input size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from predictor_spark.operators.localrel import local_df

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    HAVE_MPL = True
except ImportError:  # rendering degrades to the CSV data sidecar
    plt = None
    HAVE_MPL = False


def loss_curve_frame(spark: SparkSession, history: dict[str, Sequence[float]]) -> DataFrame:
    """Epoch-indexed train/val loss table from a training history dict
    (the engine cores' train() return shape; reference history.history)."""
    train = [float(v) for v in history.get("loss", [])]
    val = list(history.get("val_loss", []))
    # pad (don't zip-truncate) when validation ran on fewer epochs: the
    # full train curve must survive a partial val history
    val += [None] * (len(train) - len(val))
    rows = [(i, t, None if v is None else float(v))
            for i, (t, v) in enumerate(zip(train, val))]
    return local_df(spark, rows, "epoch int, loss double, val_loss double")


def predictions_plot_frame(
    df: DataFrame,
    ts_col: str,
    pred_col: str,
    target_col: str,
    unc_col: str | None = None,
    actual_col: str | None = None,
    plot_points: int = 480,
) -> DataFrame:
    """The data behind plot_predictions (stl_plots.py:58-66 last-N slice,
    :100-106 pred ± |unc| band), computed engine-side: orderBy-desc +
    limit keeps the scan bounded, then re-sort ascending for drawing."""
    cols = [
        F.col(ts_col).alias("ts"),
        F.col(pred_col).alias("pred"),
        F.col(target_col).alias("target"),
    ]
    if actual_col is not None:
        cols.append(F.col(actual_col).alias("actual"))
    unc = F.abs(F.col(unc_col)) if unc_col is not None else F.lit(0.0)
    cols.append((F.col(pred_col) - unc).alias("band_lo"))
    cols.append((F.col(pred_col) + unc).alias("band_hi"))
    last_n = df.select(*cols).orderBy(F.col("ts").desc()).limit(plot_points)
    return last_n.orderBy("ts")


def _write_data_sidecar(pdf, path: str) -> str:
    """CSV fallback artifact when matplotlib is absent."""
    out = path + ".csv" if not path.endswith(".csv") else path
    pdf.to_csv(out, index=False)
    return out


def plot_and_save_loss(spark: SparkSession, history: dict, loss_plot_file: str,
                       iteration: int = 0) -> str:
    """stl_plots.py:16-28 — train/val loss curve. Returns the written
    artifact path (PNG, or the CSV sidecar without matplotlib)."""
    pdf = loss_curve_frame(spark, history).toPandas()
    if not HAVE_MPL:
        return _write_data_sidecar(pdf, loss_plot_file)
    plt.figure(figsize=(10, 5))
    plt.plot(pdf["epoch"], pdf["loss"], label="Train")
    if pdf["val_loss"].notna().any():
        plt.plot(pdf["epoch"], pdf["val_loss"], label="Val")
    plt.title(f"Loss-Iter {iteration}")
    plt.ylabel("Loss")
    plt.xlabel("Epoch")
    plt.legend()
    plt.grid(True, alpha=0.6)
    plt.savefig(loss_plot_file)
    plt.close()
    return loss_plot_file


def plot_predictions(
    df: DataFrame,
    predictions_plot_file: str,
    ts_col: str,
    pred_col: str,
    target_col: str,
    unc_col: str | None = None,
    actual_col: str | None = None,
    plot_points: int = 480,
    horizon: int | None = None,
) -> str:
    """stl_plots.py:30-120 — pred/target/actual lines + uncertainty fill
    band over the last plot_points rows. Returns the artifact path."""
    pdf = predictions_plot_frame(
        df, ts_col, pred_col, target_col, unc_col, actual_col, plot_points
    ).toPandas()
    if not HAVE_MPL:
        return _write_data_sidecar(pdf, predictions_plot_file)
    h = f"H{horizon}" if horizon is not None else ""
    plt.figure(figsize=(14, 7))
    plt.plot(pdf["ts"], pdf["pred"], label=f"Pred Price {h}", color="red",
             lw=1.5, zorder=3)
    plt.plot(pdf["ts"], pdf["target"], label=f"Target Price {h}",
             color="orange", lw=1.5, zorder=2)
    if "actual" in pdf.columns:
        plt.plot(pdf["ts"], pdf["actual"], label="Actual Price", color="blue",
                 lw=1, ls="--", alpha=0.7, zorder=1)
    plt.fill_between(pdf["ts"], pdf["band_lo"], pdf["band_hi"], color="green",
                     alpha=0.2, label=f"Uncertainty {h}", zorder=0)
    plt.title(f"Predictions vs Target/Actual ({h})")
    plt.xlabel("Time")
    plt.ylabel("Price")
    plt.legend()
    plt.grid(True, alpha=0.6)
    plt.tight_layout()
    plt.savefig(predictions_plot_file, dpi=300)
    plt.close()
    return predictions_plot_file
