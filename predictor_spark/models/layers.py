"""Shared numpy layer primitives (forward + backward) for the deep-model
cores (transformer encoder, TFT-lite). Each function returns activations
plus whatever the matching *_back needs; gradients are finite-difference
checked in tests/test_models_family.py.

Public math only: scaled dot-product attention and layer normalization as
in Vaswani et al. 2017, GLU/GRN as in Lim et al. 2021 (Temporal Fusion
Transformers); reference analogs predictor_plugins/predictor_plugin_
transformer.py:70-76 (MultiHeadAttention + Add + LayerNormalization) and
predictor_plugin_tft.py:68-88 (_glu/_grn).
"""

from __future__ import annotations

import numpy as np


# --------------------------------------------------------------------------
# activations
# --------------------------------------------------------------------------

def relu(z: np.ndarray) -> np.ndarray:
    return np.maximum(z, 0.0)


def relu_grad(z: np.ndarray) -> np.ndarray:
    return (z > 0.0).astype(z.dtype)


def elu(z: np.ndarray) -> np.ndarray:
    return np.where(z > 0.0, z, np.expm1(z))


def elu_grad(z: np.ndarray) -> np.ndarray:
    return np.where(z > 0.0, 1.0, np.exp(z))


def sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


# --------------------------------------------------------------------------
# layer normalization (over the last axis)
# --------------------------------------------------------------------------

_LN_EPS = 1e-5


def layernorm(x: np.ndarray, g: np.ndarray, b: np.ndarray):
    """y = g * (x - mean)/sqrt(var + eps) + b over the last axis.
    Returns (y, cache)."""
    mu = x.mean(axis=-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + _LN_EPS)
    xhat = xc * inv
    return g * xhat + b, (xhat, inv)


def layernorm_back(dy: np.ndarray, g: np.ndarray, cache):
    """Returns (dx, dg, db). dg/db summed over all leading axes."""
    xhat, inv = cache
    lead = tuple(range(dy.ndim - 1))
    dg = (dy * xhat).sum(axis=lead)
    db = dy.sum(axis=lead)
    dxhat = dy * g
    m = dxhat.mean(axis=-1, keepdims=True)
    mx = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx = inv * (dxhat - m - xhat * mx)
    return dx, dg, db


# --------------------------------------------------------------------------
# softmax (over the last axis) — stable
# --------------------------------------------------------------------------

def softmax(z: np.ndarray) -> np.ndarray:
    e = np.exp(z - z.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def softmax_back(da: np.ndarray, a: np.ndarray) -> np.ndarray:
    return a * (da - (da * a).sum(axis=-1, keepdims=True))


# --------------------------------------------------------------------------
# scaled dot-product self-attention (single head over (N, T, dk) tensors)
# --------------------------------------------------------------------------

def attention(Q: np.ndarray, K: np.ndarray, V: np.ndarray):
    """O = softmax(Q K^T / sqrt(dk)) V. Returns (O, cache)."""
    dk = Q.shape[-1]
    scale = 1.0 / np.sqrt(dk)
    S = (Q @ K.transpose(0, 2, 1)) * scale
    A = softmax(S)
    return A @ V, (Q, K, V, A, scale)


def attention_back(dO: np.ndarray, cache):
    """Returns (dQ, dK, dV)."""
    Q, K, V, A, scale = cache
    dV = A.transpose(0, 2, 1) @ dO
    dA = dO @ V.transpose(0, 2, 1)
    dS = softmax_back(dA, A) * scale
    dQ = dS @ K
    dK = dS.transpose(0, 2, 1) @ Q
    return dQ, dK, dV


# --------------------------------------------------------------------------
# sinusoidal positional encoding (the engine's W18 operator as a matrix)
# --------------------------------------------------------------------------

def positional_encoding(T: int, d: int) -> np.ndarray:
    """pe[t, 2k] = sin(t / 10000^(2k/d)), pe[t, 2k+1] = cos(...) —
    common/positional_encoding.py:15-32 semantics."""
    pe = np.zeros((T, d))
    pos = np.arange(T)[:, None].astype(np.float64)
    for k in range(0, d, 2):
        denom = 10000.0 ** (k / d)
        pe[:, k] = np.sin(pos[:, 0] / denom)
        if k + 1 < d:
            pe[:, k + 1] = np.cos(pos[:, 0] / denom)
    return pe


# --------------------------------------------------------------------------
# losses
# --------------------------------------------------------------------------

def huber(e: np.ndarray, delta: float = 1.0) -> np.ndarray:
    a = np.abs(e)
    return np.where(a <= delta, 0.5 * e * e, delta * (a - 0.5 * delta))


def huber_grad(e: np.ndarray, delta: float = 1.0) -> np.ndarray:
    return np.clip(e, -delta, delta)


def mae_grad(e: np.ndarray) -> np.ndarray:
    return np.sign(e)
