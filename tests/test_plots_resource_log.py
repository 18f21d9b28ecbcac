"""S11 plot sinks + S12 resource-log sink.

Plot-frame semantics (band edges, last-N slice) are asserted on the
engine-computed frame; PNG rendering runs only where matplotlib exists
(stl_plots.py parity is in the data, not the pixels). Resource loggers
are exercised against the real /proc snapshot and through the MLP train
loop's on_epoch_end seam.
"""

from __future__ import annotations

import csv

import numpy as np
import pytest

from predictor_spark.sources import plots as PL
from predictor_spark.sources import resource_log as RL


def test_loss_curve_frame(spark):
    hist = {"loss": [3.0, 2.0, 1.5], "val_loss": [3.5, 2.6, 2.0]}
    rows = PL.loss_curve_frame(spark, hist).orderBy("epoch").collect()
    assert [(r["epoch"], r["loss"], r["val_loss"]) for r in rows] == [
        (0, 3.0, 3.5), (1, 2.0, 2.6), (2, 1.5, 2.0)]
    # no val_loss -> nullable column, not a crash
    rows = PL.loss_curve_frame(spark, {"loss": [1.0]}).collect()
    assert rows[0]["val_loss"] is None


def test_predictions_plot_frame_band_and_slice(spark):
    """stl_plots.py:58-66 last-N slice + :100-106 pred ± |unc| band."""
    data = [(i, float(i), float(i) + 0.5, -0.25, float(i) - 0.1)
            for i in range(10)]
    df = spark.createDataFrame(
        data, "t int, pred double, target double, unc double, actual double")
    out = PL.predictions_plot_frame(
        df, "t", "pred", "target", unc_col="unc", actual_col="actual",
        plot_points=4).collect()
    # last 4 timestamps, ascending for drawing
    assert [r["ts"] for r in out] == [6, 7, 8, 9]
    for r in out:
        assert r["band_lo"] == pytest.approx(r["pred"] - 0.25)  # |unc|
        assert r["band_hi"] == pytest.approx(r["pred"] + 0.25)
        assert r["actual"] == pytest.approx(r["pred"] - 0.1)


def test_plot_sinks_write_artifact(spark, tmp_path):
    """With matplotlib: a PNG; without: the CSV data sidecar. Either way
    exactly one artifact per call, at a deterministic path."""
    hist = {"loss": [3.0, 1.0], "val_loss": [3.1, 1.2]}
    p1 = PL.plot_and_save_loss(spark, hist, str(tmp_path / "loss.png"), iteration=2)
    df = spark.createDataFrame(
        [(i, float(i), float(i), 0.1) for i in range(6)],
        "t int, pred double, target double, unc double")
    p2 = PL.plot_predictions(df, str(tmp_path / "preds.png"), "t", "pred",
                             "target", unc_col="unc", plot_points=5, horizon=3)
    import os
    for p in (p1, p2):
        assert os.path.exists(p) and os.path.getsize(p) > 0
    if not PL.HAVE_MPL:
        assert p1.endswith(".csv") and p2.endswith(".csv")
        with open(p2) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 5 and float(rows[0]["band_hi"]) == pytest.approx(1.1)


def test_resource_snapshot_reads_proc():
    s = RL.capture_resource_snapshot(include_gc=True)
    assert s.rss_kb is not None and s.rss_kb > 1000  # a JVM-adjacent test runner
    assert s.hwm_kb >= s.rss_kb * 0  # present
    assert len(s.gc_counts) == 3


def test_ensure_csv_header_idempotent(tmp_path):
    """main.py:81-88 — header written once, appends never duplicate it."""
    p = str(tmp_path / "log" / "mem.csv")
    RL.ensure_csv_header(p, "a,b,c")
    with open(p, "a") as f:
        f.write("1,2,3\n")
    RL.ensure_csv_header(p, "a,b,c")
    assert open(p).read() == "a,b,c\n1,2,3\n"


def test_epoch_logger_rows_and_schema(tmp_path):
    p = str(tmp_path / "epoch.csv")
    log = RL.ResourceUsageLogger(p, tag="cand7", include_gc=True)
    for e in range(3):
        log.on_epoch_end(e)
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert rows[2]["epoch"] == "2" and rows[2]["tag"] == "cand7"
    assert int(rows[0]["VmRSS_kB"]) > 0
    assert rows[0]["gpu_current_B"] == ""  # CPU-only host: empty like the ref
    assert rows[0]["gc0"] != ""


def test_batch_logger_every_n(tmp_path):
    p = str(tmp_path / "batch.csv")
    log = RL.BatchResourceUsageLogger(p, every_n_batches=3)
    log.on_epoch_begin(1)
    for b in range(10):
        log.on_train_batch_end(b)
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert [r["batch"] for r in rows] == ["2", "5", "8"]
    assert all(r["epoch"] == "1" for r in rows)


def test_logger_attaches_to_mlp_train(tmp_path):
    """The S12 seam end-to-end: one CSV row per training epoch, and the
    callback does not perturb the deterministic weights."""
    from predictor_spark.models import mlp

    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 4))
    t = {1: X @ np.array([0.5, -0.2, 0.1, 0.3])}
    p = str(tmp_path / "train.csv")
    log = RL.ResourceUsageLogger(p, tag="mlp")
    p1, losses = mlp.train(X, t, (1,), seed=5, epochs=7, on_epoch_end=log)
    p2, _ = mlp.train(X, t, (1,), seed=5, epochs=7)
    with open(p) as f:
        assert len(list(csv.DictReader(f))) == 7
    for k in p1:
        np.testing.assert_array_equal(p1[k], p2[k])
