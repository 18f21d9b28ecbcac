"""MLP and TCN numpy cores + their Spark estimator instantiations.

Gradchecks pin the hand-derived backprop of each core; the differential
test pins that the generic fit_predict_per_series shell distributes any
core bit-identically to a local numpy run; causality is asserted for the
TCN (future inputs cannot influence earlier-step features).
"""

from __future__ import annotations

import numpy as np

from predictor_spark.models import mlp, tcn


def _toy(n=24, d=6, hs=(1, 3), seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    tgts = {h: rng.normal(size=n) for h in hs}
    return X, tgts, hs


def _gradcheck(core, p, X, tgts, hs):
    _, g = core.loss_and_grads(p, X, tgts, hs)
    eps = 1e-6
    rngk = np.random.default_rng(1)
    for k in g:
        arr = np.atleast_1d(p[k]).astype(float)
        flat = arr.reshape(-1)
        idxs = rngk.choice(flat.size, size=min(5, flat.size), replace=False)
        for i in idxs:
            orig = flat[i]
            flat[i] = orig + eps
            p[k] = flat.reshape(arr.shape) if p[k].ndim else np.array(flat[0])
            lp = core.loss_and_grads(p, X, tgts, hs)[0]
            flat[i] = orig - eps
            p[k] = flat.reshape(arr.shape) if p[k].ndim else np.array(flat[0])
            lm = core.loss_and_grads(p, X, tgts, hs)[0]
            flat[i] = orig
            p[k] = flat.reshape(arr.shape) if p[k].ndim else np.array(flat[0])
            num = (lp - lm) / (2 * eps)
            ana = np.atleast_1d(g[k]).reshape(-1)[i]
            assert abs(num - ana) < 1e-5 * max(1.0, abs(num)), (k, i, num, ana)


def test_mlp_gradcheck():
    X, tgts, hs = _toy()
    p = mlp.init_params(np.random.default_rng(0), X.shape[1], hs,
                        layers=2, units=5)
    _gradcheck(mlp, p, X, tgts, hs)


def test_tcn_gradcheck():
    X, tgts, hs = _toy(d=8)
    p = tcn.init_params(np.random.default_rng(0), X.shape[1], hs,
                        layers=2, channels=4, kernel=2)
    _gradcheck(tcn, p, X, tgts, hs)


def test_cores_deterministic_and_learn():
    # target = linear function of the window -> both cores should fit well
    rng = np.random.default_rng(4)
    X = rng.normal(size=(60, 6))
    y = 0.5 * X[:, -1] - 0.25 * X[:, -2]
    tgts = {1: y}
    for core, kw in ((mlp, dict(layers=2, units=8)),
                     (tcn, dict(layers=2, channels=8, kernel=2))):
        p1, l1 = core.train(X, tgts, (1,), seed=3, epochs=150, lr=2e-2, **kw)
        p2, l2 = core.train(X, tgts, (1,), seed=3, epochs=150, lr=2e-2, **kw)
        assert l1 == l2
        assert all(np.array_equal(p1[k], p2[k]) for k in p1)
        assert l1[-1] < 0.25 * l1[0], core.__name__   # actually learns


def test_tcn_is_causal():
    """Features at the last step may depend on the whole window; but a
    window shorter than the receptive field implies a PREFIX change (at
    t=0) must alter the output while a change beyond the receptive field
    must not. With layers=2, kernel=2: receptive field = 1 + 1 + 2 = 4."""
    rng = np.random.default_rng(0)
    D = 10
    p = tcn.init_params(rng, D, (1,), layers=2, channels=4, kernel=2)
    X = rng.normal(size=(3, D))
    base = tcn.predict(p, X, (1,))[1]
    X2 = X.copy()
    X2[:, : D - 4] += 100.0          # beyond the receptive field of step -1
    assert np.allclose(tcn.predict(p, X2, (1,))[1], base)
    X3 = X.copy()
    X3[:, -1] += 1.0                  # inside it
    assert not np.allclose(tcn.predict(p, X3, (1,))[1], base)


def test_estimator_distributes_any_core(spark):
    """Differential oracle for the generic shell: Spark result ==
    local numpy run for BOTH new cores, same seed."""
    import pandas as pd
    from predictor_spark.models.estimator import fit_predict_per_series

    rng = np.random.default_rng(11)
    n = 66
    ts = pd.date_range("2024-01-01", periods=n, freq="10h")
    v = np.cumsum(rng.normal(size=n)) + 50.0
    pdf = pd.DataFrame({"user_id": 7, "ts": ts, "value": v})
    sdf = spark.createDataFrame(pdf)

    cut = np.datetime64("2024-01-22 00:00:00")
    W, h = 8, 1
    X = np.lib.stride_tricks.sliding_window_view(v, W)
    ends = np.arange(W - 1, n)
    tr = (ends + h < n) & (ts.values[np.minimum(ends + h, n - 1)] < cut)
    te = (ts.values[ends] >= cut) & (ends + h < n)
    ntr = np.searchsorted(ts.values, cut)
    mu, sd = v[:ntr].mean(), v[:ntr].std()
    Xtr, Xte = (X[tr] - mu) / sd, (X[te] - mu) / sd
    tg = {1: (v[ends[tr] + 1] - mu) / sd}

    for core, kw in ((mlp, dict(layers=2, units=8, epochs=40, lr=5e-3)),
                     (tcn, dict(layers=2, channels=6, kernel=2,
                                epochs=40, lr=5e-3))):
        got = (
            fit_predict_per_series(
                sdf, core, train_end="2024-01-22 00:00:00", window=W,
                horizons=(1,), train_kwargs=kw, seed=0)
            .toPandas().sort_values("ts").reset_index(drop=True)
        )
        params, _ = core.train(Xtr, tg, (1,), seed=(0, 7), **kw)
        want = core.predict(params, Xte, (1,))[1] * sd + mu
        assert np.allclose(got["pred_h1"].to_numpy(), want, atol=1e-9), core.__name__


def test_transformer_gradcheck():
    from predictor_spark.models import transformer

    X, tgts, hs = _toy(d=8)
    p = transformer.init_params(np.random.default_rng(0), X.shape[1], hs,
                                d_model=8, n_heads=2, d_ff=8)
    _gradcheck(transformer, p, X, tgts, hs)


def test_tft_gradcheck():
    from predictor_spark.models import tft

    X, tgts, hs = _toy(d=8)
    p = tft.init_params(np.random.default_rng(0), X.shape[1], hs, d_model=6)
    # MAE loss is non-smooth at zero error; the toy targets keep errors
    # away from 0, and the finite-difference tolerance in _gradcheck
    # absorbs the elu kink
    _gradcheck(tft, p, X, tgts, hs)


def test_transformer_tft_deterministic_and_learn():
    from predictor_spark.models import tft, transformer

    rng = np.random.default_rng(4)
    X = rng.normal(size=(60, 8))
    y = 0.5 * X[:, -1] - 0.25 * X[:, -2]
    tgts = {1: y}
    for core, kw in ((transformer, dict(d_model=8, n_heads=2, d_ff=16)),
                     (tft, dict(d_model=8))):
        p1, l1 = core.train(X, tgts, (1,), seed=3, epochs=150, lr=1e-2,
                            weight_decay=0.0, **kw)
        p2, l2 = core.train(X, tgts, (1,), seed=3, epochs=150, lr=1e-2,
                            weight_decay=0.0, **kw)
        assert l1 == l2
        assert all(np.array_equal(p1[k], p2[k]) for k in p1)
        assert l1[-1] < 0.5 * l1[0], core.__name__   # actually learns


def test_estimator_distributes_transformer_and_tft(spark):
    import pandas as pd
    from predictor_spark.models import tft, transformer
    from predictor_spark.models.estimator import fit_predict_per_series

    rng = np.random.default_rng(11)
    n = 66
    ts = pd.date_range("2024-01-01", periods=n, freq="10h")
    v = np.cumsum(rng.normal(size=n)) + 50.0
    pdf = pd.DataFrame({"user_id": 7, "ts": ts, "value": v})
    sdf = spark.createDataFrame(pdf)

    cut = np.datetime64("2024-01-22 00:00:00")
    W, h = 8, 1
    X = np.lib.stride_tricks.sliding_window_view(v, W)
    ends = np.arange(W - 1, n)
    tr = (ends + h < n) & (ts.values[np.minimum(ends + h, n - 1)] < cut)
    te = (ts.values[ends] >= cut) & (ends + h < n)
    ntr = np.searchsorted(ts.values, cut)
    mu, sd = v[:ntr].mean(), v[:ntr].std()
    Xtr, Xte = (X[tr] - mu) / sd, (X[te] - mu) / sd
    tg = {1: (v[ends[tr] + 1] - mu) / sd}

    for core, kw in ((transformer, dict(d_model=8, n_heads=2, d_ff=16,
                                        epochs=30, lr=5e-3)),
                     (tft, dict(d_model=6, epochs=30, lr=5e-3))):
        got = (
            fit_predict_per_series(
                sdf, core, train_end="2024-01-22 00:00:00", window=W,
                horizons=(1,), train_kwargs=kw, seed=0)
            .toPandas().sort_values("ts").reset_index(drop=True)
        )
        params, _ = core.train(Xtr, tg, (1,), seed=(0, 7), **kw)
        want = core.predict(params, Xte, (1,))[1] * sd + mu
        assert np.allclose(got["pred_h1"].to_numpy(), want, atol=1e-9), core.__name__


def test_forward_expr_layers_match_cores():
    """The transformer/TFT forward-pass companion queries build the
    forward pass as SQL expression layers (plans/model_exprs.py); each
    must compute the same function as its numpy core."""
    import duckdb
    import pandas as pd

    from predictor_spark.models import tft, transformer
    from predictor_spark.plans.catalog_models import (
        _tft_literal_params, _transformer_literal_params)
    from predictor_spark.plans.model_exprs import (
        tft_forward_layers, transformer_forward_layers)

    rng = np.random.default_rng(5)
    X = rng.normal(size=(32, 8)) * 50.0
    con = duckdb.connect()
    con.register("wins", pd.DataFrame({f"w{i}": X[:, i] for i in range(8)}))
    for layers_fn, params_fn, core in (
        (transformer_forward_layers, _transformer_literal_params, transformer),
        (tft_forward_layers, _tft_literal_params, tft),
    ):
        p = params_fn()
        nested = "wins"
        for idx, layer in enumerate(layers_fn([f"w{i}" for i in range(8)], p)):
            cols = ", ".join(f"{e} AS {c}" for c, e in layer.items())
            nested = f"(SELECT *, {cols} FROM {nested}) l{idx}"
        got = con.execute(f"SELECT y FROM {nested}").df()["y"].to_numpy()
        want = core.predict(p, X / 100.0, (1,))[1]
        assert np.allclose(got, want, atol=1e-9), core.__name__


def test_lstm_gradcheck():
    from predictor_spark.models import lstm

    X, tgts, hs = _toy(d=8)
    p = lstm.init_params(np.random.default_rng(0), X.shape[1], hs,
                         d_model=4, n_heads=2, units=4)
    _gradcheck(lstm, p, X, tgts, hs)


def test_lstm_deterministic_learns_and_distributes(spark):
    import pandas as pd

    from predictor_spark.models import lstm
    from predictor_spark.models.estimator import fit_predict_per_series

    rng = np.random.default_rng(4)
    X = rng.normal(size=(60, 8))
    y = 0.5 * X[:, -1] - 0.25 * X[:, -2]
    p1, l1 = lstm.train(X, {1: y}, (1,), seed=3, epochs=120, lr=1e-2,
                        weight_decay=0.0, d_model=8, units=8)
    p2, l2 = lstm.train(X, {1: y}, (1,), seed=3, epochs=120, lr=1e-2,
                        weight_decay=0.0, d_model=8, units=8)
    assert l1 == l2 and all(np.array_equal(p1[k], p2[k]) for k in p1)
    assert l1[-1] < 0.5 * l1[0]

    n = 66
    ts = pd.date_range("2024-01-01", periods=n, freq="10h")
    v = np.cumsum(np.random.default_rng(11).normal(size=n)) + 50.0
    sdf = spark.createDataFrame(pd.DataFrame({"user_id": 7, "ts": ts, "value": v}))
    cut = np.datetime64("2024-01-22 00:00:00")
    W = 8
    Xw = np.lib.stride_tricks.sliding_window_view(v, W)
    ends = np.arange(W - 1, n)
    tr = (ends + 1 < n) & (ts.values[np.minimum(ends + 1, n - 1)] < cut)
    te = (ts.values[ends] >= cut) & (ends + 1 < n)
    ntr = np.searchsorted(ts.values, cut)
    mu, sd = v[:ntr].mean(), v[:ntr].std()
    kw = dict(d_model=8, n_heads=2, units=8, epochs=20, lr=5e-3)
    got = (fit_predict_per_series(sdf, lstm, train_end="2024-01-22 00:00:00",
                                  window=W, horizons=(1,), train_kwargs=kw, seed=0)
           .toPandas().sort_values("ts").reset_index(drop=True))
    params, _ = lstm.train((Xw[tr] - mu) / sd, {1: (v[ends[tr] + 1] - mu) / sd},
                           (1,), seed=(0, 7), **kw)
    want = lstm.predict(params, (Xw[te] - mu) / sd, (1,))[1] * sd + mu
    assert np.allclose(got["pred_h1"].to_numpy(), want, atol=1e-9)


def test_mimo_composite_gradcheck():
    from predictor_spark.models import composite, mimo

    X, tgts, hs = _toy(d=8)
    p = mimo.init_params(np.random.default_rng(0), X.shape[1], hs,
                         d_model=4, conv_taps=3, d_ff=8)
    _gradcheck(mimo, p, X, tgts, hs)
    p = composite.init_params(np.random.default_rng(0), X.shape[1], hs,
                              branch_units=6, merged_units=8)
    # zero-init biases can park a whole branch's pre-activations EXACTLY
    # on the relu kink (dead branch at init -> Z1 == b1 == 0), where the
    # two-sided finite difference measures the average slope but the
    # analytic subgradient is relu'(0) = 0; nudge biases off the kink
    nud = np.random.default_rng(9)
    for k, v in p.items():
        if k != "__meta" and v.ndim == 1:
            p[k] = v + nud.normal(scale=0.01, size=v.shape)
    _gradcheck(composite, p, X, tgts, hs)


def test_mimo_joint_decode_couples_horizons():
    """The MIMO contract: horizons share the encoder, so training with an
    extra horizon changes horizon-1 weights (vs independent models)."""
    from predictor_spark.models import mimo

    rng = np.random.default_rng(4)
    X = rng.normal(size=(48, 8))
    y1 = 0.6 * X[:, -1]
    y3 = -0.4 * X[:, -3]
    p_single, _ = mimo.train(X, {1: y1}, (1,), seed=2, epochs=20, lr=5e-3)
    p_joint, _ = mimo.train(X, {1: y1, 3: y3}, (1, 3), seed=2, epochs=20, lr=5e-3)
    assert not np.allclose(p_single["Wk"], p_joint["Wk"])


def test_mimo_composite_distribute(spark):
    import pandas as pd

    from predictor_spark.models import composite, mimo
    from predictor_spark.models.estimator import fit_predict_per_series

    rng = np.random.default_rng(11)
    n = 66
    ts = pd.date_range("2024-01-01", periods=n, freq="10h")
    v = np.cumsum(rng.normal(size=n)) + 50.0
    sdf = spark.createDataFrame(pd.DataFrame({"user_id": 7, "ts": ts, "value": v}))
    cut = np.datetime64("2024-01-22 00:00:00")
    W = 8
    X = np.lib.stride_tricks.sliding_window_view(v, W)
    ends = np.arange(W - 1, n)
    tr = (ends + 1 < n) & (ts.values[np.minimum(ends + 1, n - 1)] < cut)
    te = (ts.values[ends] >= cut) & (ends + 1 < n)
    ntr = np.searchsorted(ts.values, cut)
    mu, sd = v[:ntr].mean(), v[:ntr].std()
    Xtr, Xte = (X[tr] - mu) / sd, (X[te] - mu) / sd
    tg = {1: (v[ends[tr] + 1] - mu) / sd}
    for core, kw in ((mimo, dict(d_model=8, conv_taps=3, d_ff=16,
                                 epochs=30, lr=5e-3)),
                     (composite, dict(branch_units=8, merged_units=16,
                                      epochs=30, lr=5e-3))):
        got = (fit_predict_per_series(
            sdf, core, train_end="2024-01-22 00:00:00", window=W,
            horizons=(1,), train_kwargs=kw, seed=0)
            .toPandas().sort_values("ts").reset_index(drop=True))
        params, _ = core.train(Xtr, tg, (1,), seed=(0, 7), **kw)
        want = core.predict(params, Xte, (1,))[1] * sd + mu
        assert np.allclose(got["pred_h1"].to_numpy(), want, atol=1e-9), core.__name__
