"""Causal spectral features — W15 MTM/FFT decomposition
(phase2_6_preprocessor.py:200-294).

Reference semantics per tick t: FFT of diff(data[t-w : t]), take the first
n_components magnitudes, normalize by their sum; downstream each component
is first-differenced and train-z-scored.

Spark realization: this is inherently NumPy work (per-window FFT), so it
runs in ``applyInPandas`` per series partition — the whole series for one
key lands in one pandas frame, the rolling FFT is vectorized with stride
tricks, and the output rejoins the DataFrame world keyed by (series, ts).
This is the sanctioned slow path (SURVEY §2.3: "pandas_udf over partition,
O(n * w log w) — batch per partition").

Scale: one shuffle on the series key; within a series the computation is
sequential by nature (each tick needs its trailing window). Series are the
parallelism unit — 10^6 series saturate any cluster. For a single giant
series, range-chunk with w-row halos via mapInPandas (same math, overlap
windows duplicated across chunk boundaries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def fft_window_features(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    window_size: int = 16,
    n_components: int = 4,
) -> DataFrame:
    """Per-tick causal FFT magnitudes of the first-differenced trailing
    window (exclusive of t), sum-normalized. Emits (series, ts, fft_0..)."""
    out_fields = ", ".join(f"fft_{k} double" for k in range(n_components))
    schema = f"{series_col} bigint, {ts_col} timestamp, {out_fields}"
    w, nc = window_size, n_components

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(vals)
        if n <= w:
            return pd.DataFrame(columns=[series_col, ts_col] + [f"fft_{k}" for k in range(nc)])
        # windows[t] = vals[t-w : t] for t in [w, n) — exclusive of t (W2)
        sw = np.lib.stride_tricks.sliding_window_view(vals, w)[:-1]  # (n-w, w)
        d = np.diff(sw, axis=1)                                      # causal diffs
        mags = np.abs(np.fft.rfft(d, axis=1))[:, :nc]                # first nc magnitudes
        denom = mags.sum(axis=1, keepdims=True)
        denom[denom == 0.0] = 1.0
        mags = mags / denom
        out = pd.DataFrame({series_col: pdf[series_col].iloc[w:].to_numpy(),
                            ts_col: pdf[ts_col].iloc[w:].to_numpy()})
        for k in range(nc):
            out[f"fft_{k}"] = mags[:, k]
        return out

    # explicit repartition by the series key: groupBy alone lets AQE
    # coalesce the tiny shuffle to ~1 partition, serializing ALL the
    # Python FFT work in one worker. The explicit hash partitioning is
    # reused by applyInPandas (same key, no second exchange) and pins the
    # parallelism to the worker count.
    from predictor_spark.shiplib import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(series_col, ts_col, value_col)
        .repartition(n_parts, series_col)
        .groupBy(series_col)
        .applyInPandas(per_series, schema)
    )
