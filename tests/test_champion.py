"""Champion-shape pipeline (VERDICT r3 #2): the reference's production
TCN configuration — window 79, ~50 feature channels, 19 filters, 3
stacked layers, kernel 3, horizons {9,12,15,18,21,24}
(examples/config/phase_1_daily/phase_1_tcn_neat_champion_1d_config.json)
— running end-to-end through the engine's bar/feature/Estimator path,
with the reference's fitness floor (MAE <= naive MAE * 1.05,
candidate_worker.py:344-359) asserted on held-out windows.
"""

from __future__ import annotations

import numpy as np
import pytest

from predictor_spark.models import tcn


def test_tcn_multichannel_gradcheck():
    """Backprop through the multi-channel layer-0 conv (the champion's
    (window, n_features) input frame) matches finite differences."""
    from tests.test_models_family import _gradcheck

    rng = np.random.default_rng(3)
    hs = (1, 3)
    X = rng.normal(size=(12, 10, 4))          # (N, T, C0=4)
    tgts = {h: rng.normal(size=12) for h in hs}
    p = tcn.init_params(rng, X.shape[1], hs, layers=2, channels=5,
                        kernel=2, in_channels=4)
    _gradcheck(tcn, p, X, tgts, hs)


def test_tcn_multichannel_receptive_field():
    """The head reads the last step; with layers=2, kernel=2 (dilations
    1,2) the receptive field is 4 steps. Steps inside it must matter,
    steps outside must not, and rows must be independent."""
    rng = np.random.default_rng(5)
    p = tcn.init_params(rng, 12, (1,), layers=2, channels=4, kernel=2,
                        in_channels=3)
    X = rng.normal(size=(4, 12, 3))
    base = tcn.predict(p, X, (1,))[1]
    inside = X.copy()
    inside[:, 9, :] += 100.0                  # within the 4-step field
    assert not np.allclose(base, tcn.predict(p, inside, (1,))[1])
    outside = X.copy()
    outside[:, :5, :] += 100.0                # beyond the field
    np.testing.assert_allclose(base, tcn.predict(p, outside, (1,))[1])
    single = tcn.predict(p, X[:1], (1,))[1]   # rows independent
    np.testing.assert_allclose(single, base[:1])


def test_estimator_feature_cols_matches_local(spark):
    """fit_predict_per_series(feature_cols=...) distributes the
    multivariate TCN bit-identically to a local numpy run on the same
    series (same differential contract as the univariate family)."""
    import pandas as pd

    from predictor_spark.models.estimator import (
        _windows,
        fit_predict_per_series,
    )

    rng = np.random.default_rng(11)
    n = 60
    ts = pd.date_range("2024-01-01", periods=n, freq="6h")
    v = np.cumsum(rng.normal(size=n)) + 50.0
    f1 = np.roll(v, 1)
    f2 = rng.normal(size=n)
    pdf = pd.DataFrame({"user_id": 7, "ts": ts, "value": v,
                        "f1": f1, "f2": f2})
    sdf = spark.createDataFrame(pdf)
    window, hs, cutoff = 8, (1, 2), "2024-01-10 00:00:00"
    kw = dict(layers=2, channels=4, kernel=2, epochs=6, lr=5e-3)
    out = (
        fit_predict_per_series(
            sdf, tcn, train_end=cutoff, window=window, horizons=hs,
            feature_cols=("f1", "f2"), train_kwargs=kw, seed=0)
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    assert len(out) > 0

    # local replay (same math as estimator.fit_group)
    cut = np.datetime64(cutoff.replace(" ", "T"))
    chans = [v, f1, f2]
    X = np.stack([_windows(c, window) for c in chans], axis=-1)
    ends = np.arange(window - 1, n)
    max_h = max(hs)
    tsv = ts.to_numpy()
    tr = (ends + max_h < n) & (tsv[np.minimum(ends + max_h, n - 1)] < cut)
    te = (tsv[ends] >= cut) & (ends + max_h < n)
    cuti = int(np.searchsorted(tsv, cut))
    mu, sd = v[:cuti].mean(), v[:cuti].std()
    ch_mu = np.array([c[:cuti].mean() for c in chans])
    ch_sd = np.array([c[:cuti].std() for c in chans])
    ch_sd[np.abs(ch_sd) < 1e-8] = 1.0
    ch_mu[0], ch_sd[0] = mu, sd
    tgts = {h: (v[ends[tr] + h] - mu) / sd for h in hs}
    params, _ = tcn.train((X[tr] - ch_mu) / ch_sd, tgts, hs, seed=(0, 7), **kw)
    preds = tcn.predict(params, (X[te] - ch_mu) / ch_sd, hs)
    for h in hs:
        np.testing.assert_allclose(
            out[f"pred_h{h}"].to_numpy(), preds[h] * sd + mu, rtol=1e-12)


def test_estimator_flatten_features_for_dense_cores(spark):
    """flatten_features lets the 2-D cores (MLP here) consume the same
    multivariate frame: per-channel z-norm first, then (N, window * C).
    Differential vs a local numpy replay."""
    import pandas as pd

    from predictor_spark.models import mlp
    from predictor_spark.models.estimator import (
        _windows,
        fit_predict_per_series,
    )

    rng = np.random.default_rng(21)
    n = 60
    ts = pd.date_range("2024-01-01", periods=n, freq="6h")
    v = np.cumsum(rng.normal(size=n)) + 30.0
    f1 = rng.normal(size=n)
    pdf = pd.DataFrame({"user_id": 1, "ts": ts, "value": v, "f1": f1})
    window, hs, cutoff = 5, (1,), "2024-01-10 00:00:00"
    kw = dict(layers=1, units=6, epochs=5, lr=5e-3)
    out = fit_predict_per_series(
        spark.createDataFrame(pdf), mlp, train_end=cutoff, window=window,
        horizons=hs, feature_cols=("f1",), flatten_features=True,
        train_kwargs=kw, seed=0,
    ).toPandas().sort_values("ts")
    assert len(out) > 0

    cut = np.datetime64(cutoff.replace(" ", "T"))
    chans = [v, f1]
    X = np.stack([_windows(c, window) for c in chans], axis=-1)
    ends = np.arange(window - 1, n)
    tsv = ts.to_numpy()
    tr = (ends + 1 < n) & (tsv[np.minimum(ends + 1, n - 1)] < cut)
    te = (tsv[ends] >= cut) & (ends + 1 < n)
    cuti = int(np.searchsorted(tsv, cut))
    ch_mu = np.array([c[:cuti].mean() for c in chans])
    ch_sd = np.array([c[:cuti].std() for c in chans])
    ch_sd[np.abs(ch_sd) < 1e-8] = 1.0
    mu, sd = ch_mu[0], ch_sd[0]
    Xtr = ((X[tr] - ch_mu) / ch_sd).reshape(tr.sum(), -1)
    Xte = ((X[te] - ch_mu) / ch_sd).reshape(te.sum(), -1)
    tgts = {1: (v[ends[tr] + 1] - mu) / sd}
    params, _ = mlp.train(Xtr, tgts, hs, seed=(0, 1), **kw)
    want = mlp.predict(params, Xte, hs)[1] * sd + mu
    np.testing.assert_allclose(out["pred_h1"].to_numpy(), want, rtol=1e-12)


@pytest.mark.slow
def test_champion_shape_beats_naive_floor(spark):
    """The full champion-shaped run (79 x 50 TCN, horizons {9..24}) on
    sf0.01 hourly bars beats the reference's fitness floor on every
    event-type series."""
    from predictor_spark.plans.champion import (
        CHAMPION_HORIZONS,
        CHAMPION_WINDOW,
        champion_tcn_run,
    )

    assert CHAMPION_WINDOW == 79 and max(CHAMPION_HORIZONS) == 24
    rows = champion_tcn_run(
        spark, "/root/testdata/sf0.01", bar_seconds=3600, epochs=8,
    ).collect()
    assert len(rows) == 5                     # one per event type
    for r in rows:
        assert r["n"] > 100
        assert r["mae"] <= r["naive_mae"] * 1.05, r.asDict()


@pytest.mark.slow
def test_champion_full_pipeline(spark):
    """The complete reference phase-1 loop: features -> champion TCN ->
    predictions -> model-driven strategy -> joined metrics + trading
    summary. Every series must beat the fitness floor and the strategy
    must produce trades from the model's forecasts."""
    from predictor_spark.plans.champion import champion_full_pipeline

    rows = champion_full_pipeline(
        spark, "/root/testdata/sf0.01", bar_seconds=3600, epochs=8,
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["beats_floor"], r.asDict()
        assert r["n_trades"] > 0
        assert r["final_balance"] is not None


def test_champion_feature_count():
    """The feature frame carries ~50 channels (value + 49 features),
    mirroring the reference preprocessor's ~54-column frame."""
    from predictor_spark.plans import champion

    n = (3 + 2 * len(champion._ROLL_SPANS) + 2 * len(champion._MINMAX_SPANS)
         + 6 + champion._RET_LAGS + 2 * len(champion._RET_ROLL_SPANS))
    assert 45 <= n + 1 <= 55                  # +1 for the value channel
