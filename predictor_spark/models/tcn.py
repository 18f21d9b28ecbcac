"""Deterministic pure-numpy TCN forecaster — the engine's analog of the
reference's temporal-convolutional predictor plugin
(predictor_plugins/predictor_plugin_tcn.py:50-236: stacked causal
dilated Conv1D blocks, exponentially growing dilation, per-horizon
output heads). Same family contract as models/nbeats.py / models/mlp.py
(train / predict / predict_with_uncertainty) so it drops into
models/estimator.fit_predict_per_series unchanged.

Architecture (batch X of shape (N, D) viewed as a 1-channel length-D
causal sequence):
    h_0[:, t, 0] = X[:, t]
    per layer l (dilation d_l = 2^l, kernel K, C channels):
        z_l[:, t, :] = sum_j h_l[:, t - j*d_l, :] @ W_l[j] + c_l
                       (left zero-padding — strictly causal)
        h_{l+1} = swish(z_l)
    features = h_L[:, -1, :]                (last time step)
    per horizon H: y_H = features @ Wh_H + ch_H

The dilated causal convolution is expressed as K shifted dense matmuls
(shift-and-accumulate), which vectorizes exactly and keeps the backward
pass a mirror image (scatter the gradient back through the same shifts).
The reference's residual skip connections are dropped — at these depths
(2-3 layers) they change nothing measurable and the plain stack keeps
the gradient check tight. Optimizer/loss/uncertainty shared with the
family (AdamW, mean Huber, seeded MC dropout).
"""

from __future__ import annotations

import numpy as np

from predictor_spark.models.nbeats import (
    _huber,
    _huber_grad,
    _swish,
    _swish_grad,
    adam_init,
    adam_step,
)

__all__ = ["init_params", "forward", "loss_and_grads", "train",
           "predict", "predict_with_uncertainty"]


def init_params(
    rng: np.random.Generator,
    input_dim: int,
    horizons: tuple[int, ...] = (1,),
    layers: int = 2,
    channels: int = 8,
    kernel: int = 2,
    in_channels: int = 1,
) -> dict[str, np.ndarray]:
    """Glorot-uniform init over the (kernel*c_in, c_out) fan, seeded.

    ``in_channels`` > 1 is the multivariate-feature case: X arrives as
    (N, T, C0) and layer 0 maps C0 input channels, exactly the reference
    TCN's Conv1D over a (window, n_features) frame
    (predictor_plugin_tcn.py:50-236 with ~54 preprocessor features)."""

    def glorot(shape, n_in, n_out):
        lim = np.sqrt(6.0 / (n_in + n_out))
        return rng.uniform(-lim, lim, size=shape)

    p: dict[str, np.ndarray] = {
        "__meta": np.array([layers, channels, kernel, input_dim, in_channels])
    }
    for layer in range(layers):
        c_in = in_channels if layer == 0 else channels
        p[f"W{layer}"] = glorot((kernel, c_in, channels),
                                kernel * c_in, channels)
        p[f"c{layer}"] = np.zeros(channels)
    for h in horizons:
        p[f"Wh{h}"] = glorot((channels,), channels, 1)
        p[f"ch{h}"] = np.zeros(())
    return p


def _shift_right(x: np.ndarray, s: int) -> np.ndarray:
    """out[:, t, :] = x[:, t-s, :], zero-filled below t=s (causal pad)."""
    if s == 0:
        return x
    out = np.zeros_like(x)
    out[:, s:, :] = x[:, :-s, :]
    return out


def forward(
    p: dict[str, np.ndarray],
    X: np.ndarray,
    horizons: tuple[int, ...],
    want_cache: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: np.random.Generator | None = None,
):
    layers, channels, kernel = (int(x) for x in p["__meta"][:3])
    h = X[:, :, None] if X.ndim == 2 else X  # (N, T, C0)
    zs, hs = [], [h]
    for layer in range(layers):
        d = 2 ** layer
        # slice-accumulate instead of materializing shifted copies: the
        # causal zero-pad rows contribute nothing, so z[:, s:, :] +=
        # h[:, :-s, :] @ W[j] is the same conv at ~half the memory traffic
        z = np.empty((h.shape[0], h.shape[1], channels))
        z[:] = p[f"c{layer}"]
        for j in range(kernel):
            s = j * d
            if s == 0:
                z += h @ p[f"W{layer}"][j]
            elif s < h.shape[1]:
                z[:, s:, :] += h[:, :-s, :] @ p[f"W{layer}"][j]
        h = _swish(z)
        if dropout_rate > 0.0 and dropout_rng is not None:
            mask = (dropout_rng.random(h.shape) >= dropout_rate)
            h = h * mask / (1.0 - dropout_rate)
        zs.append(z)
        hs.append(h)
    top = h[:, -1, :]                        # (N, C) last time step
    ys = {hz: top @ p[f"Wh{hz}"] + p[f"ch{hz}"] for hz in horizons}
    if want_cache:
        return ys, (hs, zs, top)
    return ys, None


def loss_and_grads(
    p: dict[str, np.ndarray],
    X: np.ndarray,
    targets: dict[int, np.ndarray],
    horizons: tuple[int, ...],
    loss_fn=None,
) -> tuple[float, dict[str, np.ndarray]]:
    """Full-batch Huber loss + analytic gradients (finite-difference-
    checked in tests/test_models_family.py::test_tcn_gradcheck).
    ``loss_fn`` swaps in a models/losses.py objective: (y_true, y_pred)
    -> (value, dvalue/dy_pred); None keeps the default Huber path
    bit-identical (same contract as models/nbeats.py)."""
    layers, channels, kernel = (int(x) for x in p["__meta"][:3])
    N = X.shape[0]
    H = len(horizons)
    ys, (hs, zs, top) = forward(p, X, horizons, want_cache=True)

    g = {k: np.zeros_like(v) for k, v in p.items() if k != "__meta"}
    loss = 0.0
    dtop = np.zeros_like(top)
    for hz in horizons:
        if loss_fn is None:
            e = ys[hz] - targets[hz]
            loss += float(_huber(e).mean())
            de = _huber_grad(e) / (N * H)
        else:
            val, gy = loss_fn(targets[hz], ys[hz])
            loss += float(val)
            de = gy / H
        g[f"Wh{hz}"] = top.T @ de
        g[f"ch{hz}"] = np.array(de.sum())
        dtop += de[:, None] * p[f"Wh{hz}"][None, :]
    loss /= H

    dh = np.zeros_like(hs[-1])
    dh[:, -1, :] = dtop                     # only the last step feeds heads
    for layer in reversed(range(layers)):
        d = 2 ** layer
        dz = dh * _swish_grad(zs[layer])    # (N, T, C)
        g[f"c{layer}"] = dz.sum(axis=(0, 1))
        x_in = hs[layer]                    # (N, T, c_in)
        dh = np.zeros_like(x_in)
        for j in range(kernel):
            s = j * d
            # shifted-in zero rows drop out of the contraction, so slice
            # both operands instead of materializing a shifted copy; the
            # (N, T) contraction runs as one BLAS matmul via tensordot
            if s == 0:
                g[f"W{layer}"][j] = np.tensordot(x_in, dz,
                                                 axes=([0, 1], [0, 1]))
                dh += dz @ p[f"W{layer}"][j].T
            elif s < x_in.shape[1]:
                g[f"W{layer}"][j] = np.tensordot(
                    x_in[:, :-s, :], dz[:, s:, :], axes=([0, 1], [0, 1]))
                # gradient flows to x[:, t, :] from dz[:, t + s, :]
                dh[:, :-s, :] += dz[:, s:, :] @ p[f"W{layer}"][j].T
    return loss, g


def train(
    X: np.ndarray,
    targets: dict[int, np.ndarray],
    horizons: tuple[int, ...] = (1,),
    seed: int | tuple = 0,
    layers: int = 2,
    channels: int = 8,
    kernel: int = 2,
    epochs: int = 80,
    lr: float = 1e-2,
    weight_decay: float = 0.0,
    loss_fn=None,
) -> tuple[dict[str, np.ndarray], list[float]]:
    """Full-batch AdamW training; deterministic given (data, seed).
    X: (N, T) univariate or (N, T, C0) multivariate channels-last.
    ``loss_fn``: optional models/losses.py objective (default Huber)."""
    rng = np.random.default_rng(seed)
    in_ch = X.shape[2] if X.ndim == 3 else 1
    p = init_params(rng, X.shape[1], tuple(horizons), layers, channels,
                    kernel, in_channels=in_ch)
    st = adam_init(p)
    losses = []
    for _ in range(epochs):
        loss, g = loss_and_grads(p, X, targets, tuple(horizons),
                                 loss_fn=loss_fn)
        adam_step(p, g, st, lr=lr, weight_decay=weight_decay)
        losses.append(loss)
    return p, losses


def predict(p: dict[str, np.ndarray], X: np.ndarray,
            horizons: tuple[int, ...]) -> dict[int, np.ndarray]:
    ys, _ = forward(p, X, tuple(horizons))
    return ys


def predict_with_uncertainty(
    p: dict[str, np.ndarray],
    X: np.ndarray,
    horizons: tuple[int, ...],
    mc_samples: int = 1,
    dropout_rate: float = 0.1,
    seed: int | tuple = 0,
) -> tuple[dict[int, np.ndarray], dict[int, np.ndarray]]:
    """(means, stds) per horizon; same MC-dropout contract as the rest
    of the family."""
    hs = tuple(horizons)
    if mc_samples <= 1 or dropout_rate <= 0.0:
        ys = predict(p, X, hs)
        return ys, {h: np.zeros_like(y) for h, y in ys.items()}
    mean = {h: np.zeros(X.shape[0]) for h in hs}
    m2 = {h: np.zeros(X.shape[0]) for h in hs}
    for s in range(mc_samples):
        rng = np.random.default_rng((seed, s))
        ys, _ = forward(p, X, hs, dropout_rate=dropout_rate, dropout_rng=rng)
        for h in hs:                      # Welford update
            d = ys[h] - mean[h]
            mean[h] += d / (s + 1)
            m2[h] += d * (ys[h] - mean[h])
    std = {h: np.sqrt(m2[h] / mc_samples) for h in hs}
    return mean, std
