"""TF/Keras execution seam (VERDICT r3 #7): the real path runs only
where tensorflow is importable (this image ships none — those tests
skip); the seam's guards and numpy-side contract are verified
everywhere.
"""

from __future__ import annotations

import numpy as np
import pytest

from predictor_spark.models import mlp
from predictor_spark.models.tf_bridge import tf_available

needs_tf = pytest.mark.skipif(not tf_available(),
                              reason="tensorflow not installed in this image")


def test_seam_guards_without_tf():
    """Without TF the bridge must fail loudly at the seam, not deep in a
    worker."""
    if tf_available():
        pytest.skip("tensorflow present — guard path not reachable")
    from predictor_spark.models import tf_bridge

    p = mlp.init_params(np.random.default_rng(0), 4, (1,))
    with pytest.raises(ImportError):
        tf_bridge.keras_model_from_params(p, (1,))


@needs_tf
def test_keras_forward_matches_numpy_core():
    """Keras rebuild of the MLP weights agrees with models/mlp.forward
    (float32 tolerance — TF computes in float32 by default)."""
    from predictor_spark.models.tf_bridge import keras_model_from_params

    rng = np.random.default_rng(1)
    hs = (1, 3)
    p = mlp.init_params(rng, 6, hs, layers=2, units=5)
    X = rng.normal(size=(17, 6))
    want = mlp.predict(p, X, hs)
    model = keras_model_from_params(p, hs)
    got = model(X, training=False)
    for h, y in zip(hs, got):
        np.testing.assert_allclose(np.asarray(y)[:, 0], want[h],
                                   rtol=1e-5, atol=1e-6)


@needs_tf
def test_keras_artifact_roundtrip(tmp_path):
    """.keras save/load (reference base.py:325-330) preserves inference."""
    from predictor_spark.models.tf_bridge import (
        keras_model_from_params,
        load_keras,
        save_keras,
    )

    rng = np.random.default_rng(2)
    p = mlp.init_params(rng, 5, (1,), layers=1, units=4)
    model = keras_model_from_params(p, (1,))
    path = str(tmp_path / "model.keras")
    save_keras(model, path)
    X = rng.normal(size=(9, 5))
    a = np.asarray(model(X, training=False))
    b = np.asarray(load_keras(path)(X, training=False))
    np.testing.assert_allclose(a, b)


@needs_tf
def test_tf_infer_mapinpandas(spark):
    """Distributed Keras inference equals the numpy core's predictions."""
    import pandas as pd

    from predictor_spark.models.tf_bridge import tf_infer

    rng = np.random.default_rng(3)
    n, d = 200, 4
    p = mlp.init_params(rng, d, (1,), layers=2, units=6)
    pdf = pd.DataFrame(rng.normal(size=(n, d)),
                       columns=[f"x{i}" for i in range(d)])
    pdf["row_id"] = range(n)
    out = tf_infer(
        spark.createDataFrame(pdf), p, (1,),
        feature_cols=[f"x{i}" for i in range(d)], id_cols=["row_id"],
    ).toPandas().sort_values("row_id")
    want = mlp.predict(p, pdf[[f"x{i}" for i in range(d)]].to_numpy(), (1,))[1]
    np.testing.assert_allclose(out["pred_h1"].to_numpy(), want,
                               rtol=1e-5, atol=1e-6)


def test_unknown_core_fails_fast():
    from predictor_spark.models.tf_bridge import keras_model_for_core

    p = mlp.init_params(np.random.default_rng(0), 4, (1,))
    with pytest.raises((ValueError, ImportError)):
        # without TF the mlp/tcn builders raise ImportError first; with
        # TF the typo must raise ValueError before any worker sees it
        keras_model_for_core("gru", p, (1,))


@needs_tf
def test_keras_tcn_matches_numpy_core():
    """Keras Conv1D(causal, dilated) rebuild of the TCN weights agrees
    with models/tcn.forward — incl. the multivariate-channel case
    (VERDICT r7 #8: the champion artifact is a TCN, not an MLP)."""
    from predictor_spark.models import tcn
    from predictor_spark.models.tf_bridge import keras_model_for_core

    rng = np.random.default_rng(5)
    hs = (1, 3)
    for in_ch in (1, 3):
        p = tcn.init_params(rng, 12, hs, layers=3, channels=5, kernel=2,
                            in_channels=in_ch)
        X = rng.normal(size=(11, 12, in_ch))
        want, _ = tcn.forward(p, X, hs)
        model = keras_model_for_core("tcn", p, hs)
        got = model(X, training=False)
        for h, y in zip(hs, got):
            np.testing.assert_allclose(np.asarray(y)[:, 0], want[h],
                                       rtol=1e-5, atol=1e-6)


@needs_tf
def test_keras_tcn_artifact_roundtrip(tmp_path):
    """.keras save/load of the TCN rebuild (base.py:325-330 contract)."""
    from predictor_spark.models import tcn
    from predictor_spark.models.tf_bridge import (keras_model_for_core,
                                                  load_keras, save_keras)

    rng = np.random.default_rng(6)
    p = tcn.init_params(rng, 8, (1,), layers=2, channels=4, kernel=2)
    model = keras_model_for_core("tcn", p, (1,))
    path = str(tmp_path / "tcn.keras")
    save_keras(model, path)
    X = rng.normal(size=(7, 8, 1))
    a = np.asarray(model(X, training=False))
    b = np.asarray(load_keras(path)(X, training=False))
    np.testing.assert_allclose(a, b)


@needs_tf
def test_tf_infer_tcn_mapinpandas(spark):
    """Distributed TCN inference (flat features reshaped to the
    (window, channels) frame) equals the numpy core."""
    import pandas as pd

    from predictor_spark.models import tcn
    from predictor_spark.models.tf_bridge import tf_infer

    rng = np.random.default_rng(7)
    n, T, C = 100, 6, 2
    p = tcn.init_params(rng, T, (1,), layers=2, channels=4, kernel=2,
                        in_channels=C)
    X = rng.normal(size=(n, T, C))
    flat = X.reshape(n, T * C)
    pdf = pd.DataFrame(flat, columns=[f"x{i}" for i in range(T * C)])
    pdf["row_id"] = range(n)
    out = tf_infer(
        spark.createDataFrame(pdf), p, (1,),
        feature_cols=[f"x{i}" for i in range(T * C)], id_cols=["row_id"],
        core="tcn",
    ).toPandas().sort_values("row_id")
    want, _ = tcn.forward(p, X, (1,))
    np.testing.assert_allclose(out["pred_h1"].to_numpy(), want[1],
                               rtol=1e-5, atol=1e-6)


def _keras_causal_conv1d_sim(x, W_keras, b, dilation):
    """Numpy simulation of tf.keras.layers.Conv1D(padding="causal",
    dilation_rate=d): cross-correlation where tap j reads lag (K-1-j)*d.
    Mirrors the Keras source semantics so the weight-layout contract is
    testable in an image without TensorFlow."""
    K = W_keras.shape[0]
    n, T, _ = x.shape
    out = np.zeros((n, T, W_keras.shape[2])) + b
    for j in range(K):
        s = (K - 1 - j) * dilation
        if s == 0:
            out += x @ W_keras[j]
        elif s < T:
            out[:, s:, :] += x[:, :-s, :] @ W_keras[j]
    return out


def test_conv1d_weight_flip_matches_keras_semantics():
    """In-image (no TF) guard for the ADVICE-r8 bug: loading the numpy TCN
    kernels into Keras Conv1D unflipped mis-times every tap for kernel>1.
    Simulate the Keras cross-correlation in numpy, load it with
    conv1d_weights_for_keras(W), and demand exact agreement with
    tcn.forward — and demand that the UNflipped load disagrees (so the
    test would catch the regression, not vacuously pass)."""
    from predictor_spark.models import tcn
    from predictor_spark.models.tf_bridge import conv1d_weights_for_keras

    def swish(z):
        return z / (1.0 + np.exp(-z))

    rng = np.random.default_rng(11)
    hs = (1, 4)
    for in_ch in (1, 3):
        p = tcn.init_params(rng, 10, hs, layers=3, channels=4, kernel=3,
                            in_channels=in_ch)
        X = rng.normal(size=(9, 10, in_ch))
        want, _ = tcn.forward(p, X, hs)

        def sim(flip):
            h = X
            layers = int(p["__meta"][0])
            for layer in range(layers):
                W = p[f"W{layer}"]
                Wk = conv1d_weights_for_keras(W) if flip else W
                h = swish(_keras_causal_conv1d_sim(
                    h, Wk, p[f"c{layer}"], 2 ** layer))
            top = h[:, -1, :]
            return {hz: top @ p[f"Wh{hz}"] + p[f"ch{hz}"] for hz in hs}

        got = sim(flip=True)
        for hz in hs:
            np.testing.assert_allclose(got[hz], want[hz],
                                       rtol=1e-12, atol=1e-12)
        bad = sim(flip=False)
        assert max(float(np.abs(bad[hz] - want[hz]).max()) for hz in hs) > 1e-3


@needs_tf
def test_keras_lstm_matches_numpy_core():
    """Keras rebuild (posenc + MHA + LN + BiLSTM + heads) agrees with
    models/lstm.forward (VERDICT r8 #2: the BiLSTM+attention family's
    .keras artifact path)."""
    from predictor_spark.models import lstm
    from predictor_spark.models.tf_bridge import keras_model_for_core

    rng = np.random.default_rng(13)
    hs = (1, 2)
    p = lstm.init_params(rng, 8, hs, d_model=6, n_heads=2, units=5)
    X = rng.normal(size=(9, 8))
    want, _ = lstm.forward(p, X, hs)
    model = keras_model_for_core("lstm", p, hs)
    got = model(X[:, :, None], training=False)
    for h, y in zip(hs, got):
        np.testing.assert_allclose(np.asarray(y)[:, 0], want[h],
                                   rtol=1e-5, atol=1e-6)


def _keras_mha_sim(E, Wq, qb, Wk, kb, Wv, vb, Wo, ob):
    """Numpy simulation of tf.keras.layers.MultiHeadAttention from its
    documented einsum equations (query 'abc,cde->abde', scores
    'aecd,abcd->acbe' scaled by 1/sqrt(key_dim), output
    'acbe,aecd->abcd' then 'abcd,cde->abe')."""
    dk = Wq.shape[-1]
    q = np.einsum("ntd,dhk->nthk", E, Wq) + qb
    k = np.einsum("ntd,dhk->nthk", E, Wk) + kb
    v = np.einsum("ntd,dhk->nthk", E, Wv) + vb
    s = np.einsum("nthk,nshk->nhts", q, k) / np.sqrt(dk)
    a = np.exp(s - s.max(axis=-1, keepdims=True))
    a = a / a.sum(axis=-1, keepdims=True)
    o = np.einsum("nhts,nshk->nthk", a, v)
    return np.einsum("nthk,hkd->ntd", o, Wo) + ob


def _keras_lstm_sim(x, kernel, recurrent, bias, reverse=False):
    """Numpy simulation of tf.keras.layers.LSTM(return_sequences=False)
    semantics: gate order (i, f, c, o), sigmoid gates, tanh cell."""
    n, T, _ = x.shape
    units = recurrent.shape[0]
    h = np.zeros((n, units))
    c = np.zeros((n, units))
    sig = lambda z: 1.0 / (1.0 + np.exp(-z))  # noqa: E731
    for t in (range(T - 1, -1, -1) if reverse else range(T)):
        z = x[:, t, :] @ kernel + h @ recurrent + bias
        i, f = sig(z[:, :units]), sig(z[:, units:2 * units])
        g, o = np.tanh(z[:, 2 * units:3 * units]), sig(z[:, 3 * units:])
        c = f * c + i * g
        h = o * np.tanh(c)
    return h


def test_lstm_weight_pack_matches_keras_semantics():
    """In-image (no TF) layout guard for the LSTM bridge, mirroring the
    TCN flip test: simulate each Keras layer's documented semantics in
    numpy, feed it lstm_keras_weight_pack's tensors, and demand exact
    agreement with models/lstm.forward end-to-end."""
    from predictor_spark.models import layers as L, lstm
    from predictor_spark.models.tf_bridge import lstm_keras_weight_pack

    rng = np.random.default_rng(17)
    hs = (1, 3)
    T, dm, H, units = 8, 6, 2, 5
    p = lstm.init_params(rng, T, hs, d_model=dm, n_heads=H, units=units)
    X = rng.normal(size=(7, T))
    want, _ = lstm.forward(p, X, hs)

    pack = lstm_keras_weight_pack(p)
    We, be = pack["embed"]
    E = X[:, :, None] @ We + be + L.positional_encoding(T, dm)
    O = _keras_mha_sim(E, *pack["mha"])
    # LayerNormalization(epsilon=1e-5): gamma/beta from the pack
    g, b = pack["ln1"]
    x = E + O
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    x = g * (x - mu) / np.sqrt(var + 1e-5) + b
    kf, rf, bf, kb_, rb, bb = pack["bilstm"]
    ctx = np.concatenate([_keras_lstm_sim(x, kf, rf, bf),
                          _keras_lstm_sim(x, kb_, rb, bb, reverse=True)],
                         axis=1)
    for hz in hs:
        W, c = pack[f"head_h{hz}"]
        got = ctx @ W[:, 0] + c[0]
        np.testing.assert_allclose(got, want[hz], rtol=1e-12, atol=1e-12)


@needs_tf
def test_keras_transformer_matches_numpy_core():
    """Keras rebuild (posenc + MHA + LN + FFN + LN + last-pos heads)
    agrees with models/transformer.forward."""
    from predictor_spark.models import transformer
    from predictor_spark.models.tf_bridge import keras_model_for_core

    rng = np.random.default_rng(19)
    hs = (1, 2)
    p = transformer.init_params(rng, 8, hs, d_model=6, n_heads=2, d_ff=10)
    X = rng.normal(size=(9, 8))
    want, _ = transformer.forward(p, X, hs)
    model = keras_model_for_core("transformer", p, hs)
    got = model(X[:, :, None], training=False)
    for h, y in zip(hs, got):
        np.testing.assert_allclose(np.asarray(y)[:, 0], want[h],
                                   rtol=1e-5, atol=1e-6)


def test_transformer_weight_pack_matches_keras_semantics():
    """In-image (no TF) layout guard for the transformer bridge: numpy
    simulation of each Keras layer's documented semantics fed with
    transformer_keras_weight_pack's tensors must agree exactly with
    models/transformer.forward."""
    from predictor_spark.models import layers as L, transformer
    from predictor_spark.models.tf_bridge import (
        transformer_keras_weight_pack)

    rng = np.random.default_rng(23)
    hs = (1, 4)
    T, dm, H, dff = 8, 6, 2, 10
    p = transformer.init_params(rng, T, hs, d_model=dm, n_heads=H,
                                d_ff=dff)
    X = rng.normal(size=(7, T))
    want, _ = transformer.forward(p, X, hs)

    pack = transformer_keras_weight_pack(p)
    We, be = pack["embed"]
    E = X[:, :, None] @ We + be + L.positional_encoding(T, dm)
    O = _keras_mha_sim(E, *pack["mha"])

    def ln(x, g, b):
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        return g * (x - mu) / np.sqrt(var + 1e-5) + b

    x = ln(E + O, *pack["ln1"])
    W1, b1 = pack["ffn1"]
    W2, b2 = pack["ffn2"]
    f = np.maximum(x @ W1 + b1, 0.0) @ W2 + b2
    x2 = ln(x + f, *pack["ln2"])
    ctx = x2[:, -1, :]
    for hz in hs:
        W, c = pack[f"head_h{hz}"]
        np.testing.assert_allclose(ctx @ W[:, 0] + c[0], want[hz],
                                   rtol=1e-12, atol=1e-12)


@needs_tf
def test_keras_nbeats_matches_numpy_core():
    from predictor_spark.models import nbeats
    from predictor_spark.models.tf_bridge import keras_model_for_core

    rng = np.random.default_rng(29)
    hs = (1, 3)
    p = nbeats.init_params(rng, 10, hs, blocks=2, layers=2, units=6)
    X = rng.normal(size=(9, 10))
    want, _ = nbeats.forward(p, X, hs)
    model = keras_model_for_core("nbeats", p, hs)
    got = model(X, training=False)
    for h, y in zip(hs, got):
        np.testing.assert_allclose(np.asarray(y)[:, 0], want[h],
                                   rtol=1e-5, atol=1e-6)


@needs_tf
def test_keras_mimo_matches_numpy_core():
    from predictor_spark.models import mimo
    from predictor_spark.models.tf_bridge import keras_model_for_core

    rng = np.random.default_rng(31)
    hs = (1, 2)
    p = mimo.init_params(rng, 9, hs, d_model=6, conv_taps=3, d_ff=8)
    X = rng.normal(size=(7, 9))
    want, _ = mimo.forward(p, X, hs)
    model = keras_model_for_core("mimo", p, hs)
    got = model(X[:, :, None], training=False)
    for h, y in zip(hs, got):
        np.testing.assert_allclose(np.asarray(y)[:, 0], want[h],
                                   rtol=1e-5, atol=1e-6)


def test_mimo_conv_flip_matches_keras_semantics():
    """In-image guard for the MIMO tap-conv layout: simulate Keras
    Conv1D(causal) cross-correlation with the flipped kernel and demand
    agreement with mimo.forward's explicit tap sum end-to-end (and
    disagreement unflipped)."""
    from predictor_spark.models import layers as L, mimo
    from predictor_spark.models.tf_bridge import mimo_conv_kernel_for_keras

    rng = np.random.default_rng(37)
    hs = (1, 5)
    T, dm, taps, dff = 9, 6, 3, 8
    p = mimo.init_params(rng, T, hs, d_model=dm, conv_taps=taps, d_ff=dff)
    X = rng.normal(size=(7, T))
    want, _ = mimo.forward(p, X, hs)

    E = X[:, :, None] @ p["We"] + p["be"]

    def run(Wk):
        z = _keras_causal_conv1d_sim(E, Wk, p["bc"], dilation=1)
        C = np.where(z > 0, z, np.expm1(z))  # ELU
        K = C @ p["Wk"]
        V = C @ p["Wv"]
        outs = {}
        for hz in hs:
            s = (K @ p[f"q{hz}"]) / np.sqrt(dm)
            a = np.exp(s - s.max(axis=-1, keepdims=True))
            a = a / a.sum(axis=-1, keepdims=True)
            ctx = np.einsum("nt,ntd->nd", a, V)
            A1 = np.maximum(ctx @ p["W1"] + p["b1"], 0.0)
            outs[hz] = A1 @ p[f"Wh{hz}"] + p[f"ch{hz}"]
        return outs

    good = run(mimo_conv_kernel_for_keras(p))
    for hz in hs:
        np.testing.assert_allclose(good[hz], want[hz],
                                   rtol=1e-12, atol=1e-12)
    bad = run(np.stack([p[f"Wc{k}"] for k in range(taps)], axis=0))
    assert max(float(np.abs(bad[hz] - want[hz]).max()) for hz in hs) > 1e-3


@needs_tf
def test_keras_tft_matches_numpy_core():
    from predictor_spark.models import tft
    from predictor_spark.models.tf_bridge import keras_model_for_core

    rng = np.random.default_rng(41)
    hs = (1, 2)
    p = tft.init_params(rng, 8, hs, d_model=6, conv_taps=3)
    X = rng.normal(size=(7, 8))
    want, _ = tft.forward(p, X, hs)
    model = keras_model_for_core("tft", p, hs)
    got = model(X[:, :, None], training=False)
    for h, y in zip(hs, got):
        np.testing.assert_allclose(np.asarray(y)[:, 0], want[h],
                                   rtol=1e-5, atol=1e-6)


def test_tft_packs_match_keras_semantics():
    """In-image layout guard for the TFT bridge: numpy simulation of the
    Keras pieces (causal Conv1D cross-correlation with the flipped
    kernel, single-head MHA with the identity output projection, GRN
    algebra, eps=1e-5 LayerNorms) fed with the packed tensors must agree
    exactly with tft.forward."""
    from predictor_spark.models import tft
    from predictor_spark.models.tf_bridge import (
        mimo_conv_kernel_for_keras, tft_attention_pack)

    rng = np.random.default_rng(43)
    hs = (1, 3)
    T, dm, taps = 8, 6, 3
    p = tft.init_params(rng, T, hs, d_model=dm, conv_taps=taps)
    X = rng.normal(size=(7, T))
    want, _ = tft.forward(p, X, hs)

    def ln(x, g, b):
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        return g * (x - mu) / np.sqrt(var + 1e-5) + b

    def grn(x, pfx):
        z1 = x @ p[f"{pfx}Wa"] + p[f"{pfx}ba"]
        a1 = np.where(z1 > 0, z1, np.expm1(z1))
        h2 = a1 @ p[f"{pfx}Wb"] + p[f"{pfx}bb"]
        val = h2 @ p[f"{pfx}Wv"] + p[f"{pfx}bv"]
        gt = 1.0 / (1.0 + np.exp(-(h2 @ p[f"{pfx}Wg"] + p[f"{pfx}bg"])))
        return ln(x + val * gt, p[f"{pfx}gm"], p[f"{pfx}bt"])

    E = X[:, :, None] @ p["We"] + p["be"]
    g1 = grn(E, "g1_")
    z = _keras_causal_conv1d_sim(
        g1, mimo_conv_kernel_for_keras(p), p["bc"], dilation=1)
    c = np.where(z > 0, z, np.expm1(z))
    g2 = grn(c, "g2_")
    o = _keras_mha_sim(g2, *tft_attention_pack(p))
    g3 = grn(o, "g3_")
    r = ln(g2 + g3, p["ga"], p["ba_"])
    ctx = r[:, -1, :]
    for hz in hs:
        y = grn(ctx, f"gh{hz}_") @ p[f"Wh{hz}"] + p[f"ch{hz}"]
        np.testing.assert_allclose(y, want[hz], rtol=1e-12, atol=1e-12)


@needs_tf
def test_keras_composite_matches_numpy_core():
    from predictor_spark.models import composite
    from predictor_spark.models.tf_bridge import keras_model_for_core

    rng = np.random.default_rng(47)
    hs = (1, 2)
    p = composite.init_params(rng, 10, hs, branch_units=5, merged_units=7)
    X = rng.normal(size=(9, 10))
    want, _ = composite.forward(p, X, hs)
    model = keras_model_for_core("composite", p, hs)
    got = model(X, training=False)
    for h, y in zip(hs, got):
        np.testing.assert_allclose(np.asarray(y)[:, 0], want[h],
                                   rtol=1e-5, atol=1e-6)


def test_composite_fold_matches_channel_split():
    """In-image guard for the composite bridge: the channel split folded
    into the first Dense kernels (plain matmuls on the RAW window) must
    reproduce composite.forward exactly — validating both the channel
    matrices and the fold."""
    from predictor_spark.models import composite
    from predictor_spark.models.tf_bridge import (
        composite_channel_matrices, composite_keras_weight_pack)

    rng = np.random.default_rng(53)
    hs = (1, 4)
    D = 10
    p = composite.init_params(rng, D, hs, branch_units=5, merged_units=7)
    X = rng.normal(size=(8, D))
    want, _ = composite.forward(p, X, hs)

    # channel matrices reproduce composite.channels exactly
    M = composite_channel_matrices(D)
    ch = composite.channels(X)
    for b, m in M.items():
        np.testing.assert_allclose(X @ m.T, ch[b], rtol=0, atol=1e-14)

    pack = composite_keras_weight_pack(p)
    outs = []
    for b in ("tr", "df", "rs"):
        W0, b0 = pack[f"{b}_l0"]
        W1, b1 = pack[f"{b}_l1"]
        h = np.maximum(X @ W0 + b0, 0.0)
        outs.append(np.maximum(h @ W1 + b1, 0.0))
    Wm, bm = pack["merged"]
    Am = np.maximum(np.concatenate(outs, axis=1) @ Wm + bm, 0.0)
    for hz in hs:
        W, c = pack[f"head_h{hz}"]
        np.testing.assert_allclose(Am @ W[:, 0] + c[0], want[hz],
                                   rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# .keras artifact contract, pinned WITHOUT TensorFlow (VERDICT r9 #3):
# the weight-name manifest must agree with each builder's own graph, and
# the archive bytes must round-trip through an independent reader.
# ---------------------------------------------------------------------------

def _all_core_params(T=8, hs=(1, 3)):
    from predictor_spark.models import (composite, lstm, mimo, mlp, nbeats,
                                        tcn, tft, transformer)

    rng = np.random.default_rng(7)
    return {
        "mlp": mlp.init_params(rng, T, hs, layers=2, units=5),
        "tcn": tcn.init_params(rng, T, hs, layers=2, channels=4, kernel=2),
        "lstm": lstm.init_params(rng, T, hs, d_model=6, n_heads=2, units=5),
        "transformer": transformer.init_params(rng, T, hs, d_model=6,
                                               n_heads=2, d_ff=10),
        "nbeats": nbeats.init_params(rng, T, hs, blocks=2, layers=2,
                                     units=6),
        "mimo": mimo.init_params(rng, T, hs, d_model=6, conv_taps=3,
                                 d_ff=8),
        "tft": tft.init_params(rng, T, hs, d_model=6, conv_taps=3),
        "composite": composite.init_params(rng, T, hs, branch_units=5,
                                           merged_units=7),
    }


def _builder_name_templates(core):
    """Every name=... literal/f-string template in the core's Keras
    builder source, as regexes ({...} fields -> .+) — the ground truth
    the manifest's layer names must be producible from."""
    import inspect
    import re

    from predictor_spark.models import tf_bridge

    src = inspect.getsource(tf_bridge._KERAS_BUILDERS[core])
    if core == "lstm":  # heads/posenc templates shared via module level
        src += inspect.getsource(tf_bridge.lstm_keras_weight_pack)
    out = []
    for tpl in re.findall(r'name=f?"([^"]+)"', src):
        parts = re.split(r"\{[^}]*\}", tpl)
        out.append(re.compile(
            "^" + ".+".join(re.escape(p) for p in parts) + "$"))
    return out


def test_manifest_names_match_builder_graphs():
    """keras_weight_manifest is the in-image spec of what the TF-gated
    builders load — every manifest layer name must match a name=...
    template in the corresponding builder's source, and every weight
    must carry a concrete shape.  A builder rename without a manifest
    update (or vice versa) fails here, without TF."""
    from predictor_spark.models.tf_bridge import keras_weight_manifest

    hs = (1, 3)
    for core, params in _all_core_params(hs=hs).items():
        templates = _builder_name_templates(core)
        manifest = keras_weight_manifest(core, params, hs)
        assert manifest, core
        for name, weights in manifest:
            assert any(t.match(name) for t in templates), (core, name)
            for w in weights:
                assert w.shape is not None and w.size > 0, (core, name)
        names = [n for n, _ in manifest]
        assert len(names) == len(set(names)), f"{core}: duplicate layers"
        for hz in hs:  # per-horizon heads are part of the contract
            assert f"head_h{hz}" in names, core


def test_keras_archive_roundtrips_without_tf(tmp_path):
    """save_keras_archive -> load_keras_archive restores core, horizons,
    every weight byte-exactly, and the stored manifest — the VERDICT r9
    #3 'round-trip the archive bytes without TF' gate."""
    import zipfile

    from predictor_spark.models.tf_bridge import (KERAS_ARCHIVE_MEMBERS,
                                                  keras_weight_manifest,
                                                  load_keras_archive,
                                                  save_keras_archive)

    hs = (1, 3)
    for core, params in _all_core_params(hs=hs).items():
        path = str(tmp_path / f"{core}.keras")
        save_keras_archive(core, params, hs, path)
        with zipfile.ZipFile(path) as zf:  # member layout is the contract
            assert set(zf.namelist()) == set(KERAS_ARCHIVE_MEMBERS), core
        got_core, got_params, got_hs, manifest = load_keras_archive(path)
        assert (got_core, got_hs) == (core, hs)
        assert set(got_params) == set(params), core
        for k in params:
            np.testing.assert_array_equal(np.asarray(params[k]),
                                          got_params[k], err_msg=f"{core}/{k}")
        want = keras_weight_manifest(core, params, hs)
        assert [m["layer"] for m in manifest] == [n for n, _ in want], core


def test_keras_archive_rejects_tampered_store(tmp_path):
    """A store whose weights no longer produce the recorded manifest
    (wrong shapes after a hand edit) must refuse to load."""
    import io
    import json
    import zipfile

    from predictor_spark.models import mlp
    from predictor_spark.models.tf_bridge import (load_keras_archive,
                                                  save_keras_archive)

    p = mlp.init_params(np.random.default_rng(0), 6, (1,), layers=1, units=4)
    path = str(tmp_path / "m.keras")
    save_keras_archive("mlp", p, (1,), path)
    with zipfile.ZipFile(path) as zf:
        members = {n: zf.read(n) for n in zf.namelist()}
    bad = dict(p)
    bad["W0"] = np.zeros((3, 3))  # shape drifts from the manifest
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in bad.items()})
    members["model.weights.npz"] = buf.getvalue()
    tampered = str(tmp_path / "t.keras")
    with zipfile.ZipFile(tampered, "w") as zf:
        for n, b in members.items():
            zf.writestr(n, b)
    with pytest.raises(ValueError, match="manifest disagrees"):
        load_keras_archive(tampered)
    # and a zip missing a required member is rejected up front
    partial = str(tmp_path / "p.keras")
    with zipfile.ZipFile(partial, "w") as zf:
        zf.writestr("config.json", json.dumps({}))
    with pytest.raises(ValueError, match="missing members"):
        load_keras_archive(partial)


def test_keras_archive_property_random_architectures(tmp_path):
    """Property form of the archive round-trip: random core, layer
    sizes, and horizon sets — the manifest/archive contract must hold
    for ANY architecture a search loop can emit, not just the fixture
    shapes."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from predictor_spark.models import (composite, lstm, mimo, mlp, nbeats,
                                        tcn, tft, transformer)
    from predictor_spark.models.tf_bridge import (keras_weight_manifest,
                                                  load_keras_archive,
                                                  save_keras_archive)

    cores = {
        "mlp": lambda rng, T, hs, a, b: mlp.init_params(
            rng, T, hs, layers=a, units=2 + b),
        "tcn": lambda rng, T, hs, a, b: tcn.init_params(
            rng, T, hs, layers=a, channels=2 + b, kernel=2),
        "lstm": lambda rng, T, hs, a, b: lstm.init_params(
            rng, T, hs, d_model=4 + 2 * (b % 2), n_heads=2, units=2 + b),
        "transformer": lambda rng, T, hs, a, b: transformer.init_params(
            rng, T, hs, d_model=4, n_heads=2, d_ff=3 + b),
        "nbeats": lambda rng, T, hs, a, b: nbeats.init_params(
            rng, T, hs, blocks=a, layers=a, units=2 + b),
        "mimo": lambda rng, T, hs, a, b: mimo.init_params(
            rng, T, hs, d_model=3 + b, conv_taps=2, d_ff=4),
        "tft": lambda rng, T, hs, a, b: tft.init_params(
            rng, T, hs, d_model=3 + b, conv_taps=2),
        "composite": lambda rng, T, hs, a, b: composite.init_params(
            rng, T, hs, branch_units=2 + b, merged_units=3 + b),
    }

    @settings(max_examples=24, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(core=st.sampled_from(sorted(cores)),
           T=st.integers(4, 12),
           hs=st.lists(st.integers(1, 8), min_size=1, max_size=3,
                       unique=True).map(tuple),
           a=st.integers(1, 3), b=st.integers(0, 3),
           seed=st.integers(0, 2**16))
    def check(core, T, hs, a, b, seed):
        params = cores[core](np.random.default_rng(seed), T, hs, a, b)
        path = str(tmp_path / f"prop_{core}.keras")
        save_keras_archive(core, params, hs, path)
        got_core, got_params, got_hs, manifest = load_keras_archive(path)
        assert (got_core, got_hs) == (core, hs)
        for k in params:
            np.testing.assert_array_equal(np.asarray(params[k]),
                                          got_params[k])
        want = keras_weight_manifest(core, params, hs)
        assert [m["layer"] for m in manifest] == [n for n, _ in want]
        assert [m["shapes"] for m in manifest] == [
            [list(w.shape) for w in ws] for _, ws in want]

    check()
