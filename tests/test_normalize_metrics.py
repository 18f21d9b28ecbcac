from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from predictor_spark.operators import normalize as N
from predictor_spark.operators.metrics import forecast_metrics, mc_uncertainty


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_zscore_roundtrip(spark):
    df = _df(spark, [(float(x),) for x in range(10)], "value double")
    stats = N.fit_zscore(df, ["value"])
    normed = N.normalize(df, stats)
    back = N.denormalize(normed, stats).toPandas()["value"].tolist()
    assert back == pytest.approx([float(x) for x in range(10)])


def test_zscore_zero_std_guard(spark):
    # std < 1e-8 -> 1.0 (anti_naive_lock.py:236-238)
    df = _df(spark, [(5.0,)] * 4, "value double")
    stats = N.fit_zscore(df, ["value"])
    assert stats["value"]["std"] == 1.0


def test_minmax_denormalize(spark):
    df = _df(spark, [(0.0,), (0.5,), (1.0,)], "value double")
    out = N.denormalize(df, {"value": {"min": 10.0, "max": 20.0}}).toPandas()
    assert out["value"].tolist() == pytest.approx([10.0, 15.0, 20.0])


def test_denormalize_delta_no_offset(spark):
    # N4 (stl_norm.py:119-170): deltas scale by std only, no mean shift
    df = _df(spark, [(1.0,), (-1.0,)], "u double")
    out = N.denormalize_delta(df, {"u": {"mean": 100.0, "std": 3.0}}, ["u"]).toPandas()
    assert out["u"].tolist() == pytest.approx([3.0, -3.0])


def test_train_stat_normalize_uses_train_only(spark):
    rows = [("train", 0.0), ("train", 2.0), ("test", 100.0)]
    df = _df(spark, rows, "split string, value double")
    out, stats = N.train_stat_normalize(df, ["value"])
    assert stats["value"]["mean"] == pytest.approx(1.0)  # test row excluded
    pdf = out.toPandas().set_index("split" )
    # test row normalized with TRAIN stats: (100-1)/std(train)
    std = float(np.std([0.0, 2.0], ddof=1))
    assert pdf.loc["test", "value"] == pytest.approx(99.0 / std)


def test_forecast_metrics_match_numpy(spark):
    rng = np.random.default_rng(3)
    t = rng.normal(10, 3, 200)
    p = t + rng.normal(0, 1, 200)
    b = np.roll(t, 1)
    rows = [(float(a), float(c), float(d)) for a, c, d in zip(p, t, b)]
    df = _df(spark, rows, "pred double, target double, baseline double")
    out = forecast_metrics(df, "pred", "target", "baseline").toPandas().iloc[0]
    assert out["mae"] == pytest.approx(np.mean(np.abs(p - t)))
    assert out["naive_mae"] == pytest.approx(np.mean(np.abs(b - t)))
    sse = np.sum((t - p) ** 2)
    sst = np.sum((t - t.mean()) ** 2)
    assert out["r2"] == pytest.approx(1 - sse / sst)  # sklearn r2_score definition


def test_mc_uncertainty_matches_numpy(spark):
    rng = np.random.default_rng(5)
    samples = rng.normal(0, 1, (50, 8))
    rows = [tuple(float(x) for x in r) for r in samples]
    cols = [f"s{i}" for i in range(8)]
    df = _df(spark, rows, ", ".join(f"{c} double" for c in cols))
    out = mc_uncertainty(df, cols).toPandas()
    np.testing.assert_allclose(out["pred_mean"], samples.mean(axis=1), rtol=1e-12)
    np.testing.assert_allclose(out["pred_std"], samples.std(axis=1, ddof=1), rtol=1e-9)
