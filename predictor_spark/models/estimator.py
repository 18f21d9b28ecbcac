"""Spark distribution shells for the numpy N-BEATS core.

Per-series training (`nbeats_fit_predict_per_series`): the reference
trains ONE Keras model per configured series in one process
(predictor_plugins/common/base.py:260-322); here every series trains its
own model inside one applyInPandas task — N series = N models in a single
Spark stage, the same topology that lets ar1_fit_predict scale to 10^8
series. Each task is seeded from (seed, series_id), so the distributed
result is bit-identical to a local numpy run on the same series
(differential-tested).

Scale: one shuffle (groupBy series) of the feature columns only; each
task holds ~|series| rows + a tiny weight dict. The driver never sees
weights or windows. Skewed series lengths are bounded by the per-series
row cap upstream; a giant single series would use the halo-chunked FFT
pattern instead (operators/spectral.py) — windows there, model here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from predictor_spark.models import nbeats


def _windows(v: np.ndarray, window: int) -> np.ndarray:
    """X[i] = v[i-window+1 .. i] for every complete-window end index i,
    via stride tricks (no copy until the model's matmul)."""
    if len(v) < window:
        return np.empty((0, window))
    return np.lib.stride_tricks.sliding_window_view(v, window)


def fit_predict_per_series(
    df: DataFrame,
    core=None,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    train_end: str = "2024-01-22 00:00:00",
    window: int = 8,
    horizons: tuple[int, ...] = (1,),
    train_kwargs: dict | None = None,
    mc_samples: int = 0,
    dropout_rate: float = 0.1,
    seed: int = 0,
    feature_cols: tuple[str, ...] = (),
    emit_train: bool = False,
    flatten_features: bool = False,
) -> DataFrame:
    """Fit one deterministic numpy model per series on the train slice
    (windows whose TARGET timestamp is still before the cutoff — the same
    no-leakage guard as ar1_fit_predict), score the held-out windows.

    ``core`` is any model module exposing the family contract (the
    engine's analog of the reference's predictor-plugin base,
    predictor_plugins/common/base.py:74-124):
      train(X, targets, horizons, seed=..., **train_kwargs)
        -> (params, losses)
      predict_with_uncertainty(params, X, horizons, mc_samples,
        dropout_rate, seed) -> (means, stds)
    Cores: models.nbeats (default), models.mlp, models.tcn.

    Returns one row per (series, test window end): value, baseline
    (persistence), and per horizon target_h / pred_h / unc_h. Inputs and
    targets are z-normalized by TRAIN stats inside the task (fit-on-train
    only, reference phase2_6_preprocessor.py:346-349), predictions are
    denormalized back.

    ``emit_train``: also emit one row per TRAIN window (in-sample
    predictions, uncertainty zeroed), flagged by an extra ``is_train``
    boolean column — the reference reports Train metrics alongside
    Validation/Test (results long format, FIXTURES F7), and the GA
    fitness needs the in-sample delta (candidate_worker.py:344-359).

    ``feature_cols``: extra per-timestep feature columns. When given, X
    becomes channels-last (N, window, 1 + len(feature_cols)) with the
    value channel first, each channel z-normalized by its OWN train
    stats — the multivariate frame the reference preprocessor feeds its
    Conv1D models (phase2_6_preprocessor.py:615-617, ~54 columns). The
    core must accept 3-D X (models.tcn does); univariate callers are
    unchanged. ``flatten_features`` reshapes that stack to
    (N, window * channels) for the dense cores (mlp / nbeats /
    transformer take 2-D input — the reference flattens windows the same
    way for its dense plugins, predictor_plugin_ann.py input reshape).
    """
    core = core if core is not None else nbeats
    train_kwargs = dict(train_kwargs or {})
    hs = tuple(int(h) for h in horizons)
    max_h = max(hs)
    cutoff = pd.Timestamp(train_end)

    fields = [f"{series_col} long", f"{ts_col} timestamp",
              "value double", "baseline double"]
    for h in hs:
        fields += [f"target_h{h} double", f"pred_h{h} double", f"unc_h{h} double"]
    if emit_train:
        fields.append("is_train boolean")
    schema = ", ".join(fields)

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        sid = int(pdf[series_col].iloc[0])
        v = pdf[value_col].to_numpy(dtype=np.float64)
        ts = pdf[ts_col]
        n = len(v)
        if feature_cols:
            chans = [v] + [pdf[c].to_numpy(dtype=np.float64)
                           for c in feature_cols]
            # (N, window, C) channels-last stack of per-channel windows
            X = np.stack([_windows(ch, window) for ch in chans], axis=-1)
        else:
            X = _windows(v, window)              # rows end at index window-1+i
        ends = np.arange(window - 1, n)          # window-end index per X row
        out_cols = {series_col: [], ts_col: [], "value": [], "baseline": []}
        for h in hs:
            out_cols[f"target_h{h}"] = []
            out_cols[f"pred_h{h}"] = []
            out_cols[f"unc_h{h}"] = []
        if emit_train:
            out_cols["is_train"] = []
        # train rows: every horizon target exists AND lands before cutoff
        tr = ends + max_h < n
        tr_end_ts = ts.iloc[np.minimum(ends + max_h, n - 1)].to_numpy()
        tr &= tr_end_ts < np.datetime64(cutoff)
        # test rows: window end at/after cutoff, all targets exist
        te = (ts.iloc[ends].to_numpy() >= np.datetime64(cutoff)) & (ends + max_h < n)
        if tr.sum() >= 4 and te.sum() > 0:
            cut = int(np.searchsorted(ts.to_numpy(), np.datetime64(cutoff)))
            mu = float(v[:cut].mean())
            sd = float(v[:cut].std())
            sd = sd if abs(sd) > 1e-8 else 1.0   # N1 std guard
            if feature_cols:
                # per-channel train stats (channel 0 is the value channel)
                ch_mu = np.array([ch[:cut].mean() for ch in chans])
                ch_sd = np.array([ch[:cut].std() for ch in chans])
                ch_sd[np.abs(ch_sd) < 1e-8] = 1.0
                ch_mu[0], ch_sd[0] = mu, sd
                Xtr = (X[tr] - ch_mu) / ch_sd
                Xte_norm = (X[te] - ch_mu) / ch_sd
                if flatten_features:
                    # per-channel norm FIRST, then (N, window * C) for the
                    # dense cores
                    Xtr = Xtr.reshape(Xtr.shape[0], -1)
                    Xte_norm = Xte_norm.reshape(Xte_norm.shape[0], -1)
            else:
                Xtr = (X[tr] - mu) / sd
                Xte_norm = (X[te] - mu) / sd
            tgts = {h: (v[ends[tr] + h] - mu) / sd for h in hs}
            params, _ = core.train(Xtr, tgts, hs, seed=(seed, sid),
                                   **train_kwargs)
            preds, uncs = core.predict_with_uncertainty(
                params, Xte_norm, hs, mc_samples=mc_samples,
                dropout_rate=dropout_rate, seed=(seed, sid, 1),
            )
            e_te = ends[te]
            k = len(e_te)
            if emit_train:
                tr_preds = core.predict(params, Xtr, hs)  # in-sample, no MC
                e_tr = ends[tr]
                out_cols[series_col] = [sid] * len(e_tr)
                out_cols[ts_col] = list(ts.iloc[e_tr])
                out_cols["value"] = list(v[e_tr])
                out_cols["baseline"] = list(v[e_tr])
                for h in hs:
                    out_cols[f"target_h{h}"] = list(v[e_tr + h])
                    out_cols[f"pred_h{h}"] = list(tr_preds[h] * sd + mu)
                    out_cols[f"unc_h{h}"] = [0.0] * len(e_tr)
                out_cols["is_train"] = [True] * len(e_tr) + [False] * k
            out_cols[series_col] += [sid] * k
            out_cols[ts_col] += list(ts.iloc[e_te])
            out_cols["value"] += list(v[e_te])
            out_cols["baseline"] += list(v[e_te])
            for h in hs:
                out_cols[f"target_h{h}"] += list(v[e_te + h])
                out_cols[f"pred_h{h}"] += list(preds[h] * sd + mu)
                out_cols[f"unc_h{h}"] += list(uncs[h] * sd)
        out = pd.DataFrame(out_cols)
        if not len(out):
            # a series with too little train data (or no test window)
            # yields ZERO rows: all-empty lists make float64 columns and
            # Arrow refuses the double->timestamp cast, killing the whole
            # job for one thin series — pin the dtypes the schema declares
            out[ts_col] = pd.to_datetime(out[ts_col])
            out[series_col] = out[series_col].astype("int64")
            if emit_train:
                out["is_train"] = out["is_train"].astype(bool)
        return out

    # ship the package zip: fit_group references the core module, which a
    # vanilla driver session's workers cannot import otherwise
    from predictor_spark.shiplib import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    # Explicit numbered repartition on the grouping key: the training shuffle
    # carries only a few MB, so AQE would coalesce it to ONE partition and
    # serialize all N model fits on a single core (the CPU-heavy/small-data
    # trap documented in operators/spectral.py:96-103). A user-specified
    # partition count is exempt from AQE coalescing, and since the data is
    # then already hash-partitioned on the key, groupBy adds no new exchange.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(n_part, series_col)
        .groupBy(series_col).applyInPandas(fit_group, schema)
    )


def nbeats_fit_predict_per_series(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    train_end: str = "2024-01-22 00:00:00",
    window: int = 8,
    horizons: tuple[int, ...] = (1,),
    blocks: int = 2,
    layers: int = 2,
    units: int = 8,
    epochs: int = 25,
    lr: float = 5e-3,
    weight_decay: float = 3e-2,
    mc_samples: int = 0,
    dropout_rate: float = 0.1,
    seed: int = 0,
    emit_train: bool = False,
) -> DataFrame:
    """N-BEATS instantiation of ``fit_predict_per_series``. Defaults are
    tuned for short noisy series: the AdamW weight decay is the
    early-stopping analog (the reference regularizes with l2 + early
    patience, predictor_plugin_n_beats.py:23-35) — unregularized nets
    memorize ~40-sample series and lose to the persistence baseline."""
    return fit_predict_per_series(
        df, nbeats, value_col, ts_col, series_col, train_end, window,
        horizons,
        train_kwargs=dict(blocks=blocks, layers=layers, units=units,
                          epochs=epochs, lr=lr, weight_decay=weight_decay),
        mc_samples=mc_samples, dropout_rate=dropout_rate, seed=seed,
        emit_train=emit_train,
    )


def transformer_fit_predict_per_series(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    train_end: str = "2024-01-22 00:00:00",
    window: int = 8,
    horizons: tuple[int, ...] = (1,),
    d_model: int = 8,
    n_heads: int = 2,
    d_ff: int = 16,
    epochs: int = 40,
    lr: float = 5e-3,
    weight_decay: float = 3e-2,
    mc_samples: int = 0,
    dropout_rate: float = 0.1,
    seed: int = 0,
) -> DataFrame:
    """Transformer-encoder instantiation of ``fit_predict_per_series``
    (models/transformer.py; reference predictor_plugin_transformer.py)."""
    from predictor_spark.models import transformer

    return fit_predict_per_series(
        df, transformer, value_col, ts_col, series_col, train_end, window,
        horizons,
        train_kwargs=dict(d_model=d_model, n_heads=n_heads, d_ff=d_ff,
                          epochs=epochs, lr=lr, weight_decay=weight_decay),
        mc_samples=mc_samples, dropout_rate=dropout_rate, seed=seed,
    )


def tft_fit_predict_per_series(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    train_end: str = "2024-01-22 00:00:00",
    window: int = 8,
    horizons: tuple[int, ...] = (1,),
    d_model: int = 8,
    conv_taps: int = 3,
    epochs: int = 40,
    lr: float = 5e-3,
    weight_decay: float = 3e-2,
    mc_samples: int = 0,
    dropout_rate: float = 0.1,
    seed: int = 0,
) -> DataFrame:
    """TFT-lite instantiation of ``fit_predict_per_series``
    (models/tft.py; reference predictor_plugin_tft.py)."""
    from predictor_spark.models import tft

    return fit_predict_per_series(
        df, tft, value_col, ts_col, series_col, train_end, window, horizons,
        train_kwargs=dict(d_model=d_model, conv_taps=conv_taps,
                          epochs=epochs, lr=lr, weight_decay=weight_decay),
        mc_samples=mc_samples, dropout_rate=dropout_rate, seed=seed,
    )


def lstm_fit_predict_per_series(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    train_end: str = "2024-01-22 00:00:00",
    window: int = 8,
    horizons: tuple[int, ...] = (1,),
    d_model: int = 8,
    n_heads: int = 2,
    units: int = 8,
    epochs: int = 30,
    lr: float = 5e-3,
    weight_decay: float = 3e-2,
    mc_samples: int = 0,
    dropout_rate: float = 0.1,
    seed: int = 0,
) -> DataFrame:
    """BiLSTM+attention instantiation of ``fit_predict_per_series``
    (models/lstm.py; reference predictor_plugin_lstm.py)."""
    from predictor_spark.models import lstm

    return fit_predict_per_series(
        df, lstm, value_col, ts_col, series_col, train_end, window, horizons,
        train_kwargs=dict(d_model=d_model, n_heads=n_heads, units=units,
                          epochs=epochs, lr=lr, weight_decay=weight_decay),
        mc_samples=mc_samples, dropout_rate=dropout_rate, seed=seed,
    )


def mimo_fit_predict_per_series(
    df: DataFrame,
    horizons: tuple[int, ...] = (1, 3),
    **kw,
) -> DataFrame:
    """MIMO instantiation (models/mimo.py; reference
    predictor_plugin_mimo.py): every horizon decoded jointly from one
    shared encoder via per-horizon cross-attention embeddings."""
    from predictor_spark.models import mimo

    train_kwargs = {k: kw.pop(k) for k in
                    ("d_model", "conv_taps", "d_ff", "epochs", "lr",
                     "weight_decay") if k in kw}
    return fit_predict_per_series(df, mimo, horizons=horizons,
                                  train_kwargs=train_kwargs, **kw)


def composite_fit_predict_per_series(
    df: DataFrame,
    horizons: tuple[int, ...] = (1,),
    **kw,
) -> DataFrame:
    """Composite multi-branch instantiation (models/composite.py;
    reference predictor_plugin_composite.py)."""
    from predictor_spark.models import composite

    train_kwargs = {k: kw.pop(k) for k in
                    ("branch_units", "merged_units", "epochs", "lr",
                     "weight_decay") if k in kw}
    return fit_predict_per_series(df, composite, horizons=horizons,
                                  train_kwargs=train_kwargs, **kw)
