"""STL-style seasonal-trend decomposition per series (SURVEY §2.3 W7/W8).

The reference wraps statsmodels STL (target_plugins/stl_target.py:37-98).
statsmodels is not in this image, so the engine ships a NumPy classical
additive decomposition with the same output contract (trend/seasonal/
resid + recomposition identity trend+seasonal+resid == value), gated so a
real statsmodels STL drops in when available.

Execution: applyInPandas per series — same topology as spectral.py (series
= parallelism unit, one shuffle on the series key). A windows-only variant
(moving-average trend + phase-mean seasonal) also exists as a pure SQL
plan in plans/catalog_forecast.py:stl_decompose_hourly for oracle parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - statsmodels absent in this image
    from statsmodels.tsa.seasonal import STL as _STL

    HAVE_STATSMODELS = True
except ImportError:
    HAVE_STATSMODELS = False


def _classical_decompose(vals: np.ndarray, period: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Additive decomposition: centered MA trend (edges backfilled with the
    nearest valid trend value), phase-mean seasonal (centered to sum 0),
    resid = remainder. Guarantees trend+seasonal+resid == vals exactly."""
    n = len(vals)
    half = period // 2
    kernel = np.ones(2 * half + 1) / (2 * half + 1)
    trend = np.convolve(vals, kernel, mode="same")
    if n > 2 * half:  # edge windows are truncated averages; clamp to valid region
        trend[:half] = trend[half]
        trend[n - half:] = trend[n - half - 1]
    detr = vals - trend
    phases = np.arange(n) % period
    seasonal = np.zeros(n)
    means = np.array([detr[phases == p].mean() if (phases == p).any() else 0.0 for p in range(period)])
    means -= means.mean()  # seasonal component sums to ~0 over a period
    seasonal = means[phases]
    resid = vals - trend - seasonal
    return trend, seasonal, resid


def stl_decompose(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
    period: int = 24,
    robust: bool = False,
) -> DataFrame:
    """W7 — per-series decomposition into trend/seasonal/resid columns.

    Uses statsmodels STL when installed (reference parity:
    stl_target.py:61 STL(series, period=..., robust=...)), else the
    classical fallback. Either way the output satisfies the W8
    recomposition identity value == trend + seasonal + resid.
    """
    schema = (f"{series_col} bigint, {ts_col} timestamp, {value_col} double, "
              "trend double, seasonal double, resid double")

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        if len(vals) < 2 * period + 1:
            t = np.full(len(vals), vals.mean() if len(vals) else 0.0)
            s = np.zeros(len(vals))
            r = vals - t
        elif HAVE_STATSMODELS:  # pragma: no cover
            res = _STL(vals, period=period, robust=robust).fit()
            t, s, r = res.trend, res.seasonal, res.resid
        else:
            t, s, r = _classical_decompose(vals, period)
        out = pdf[[series_col, ts_col, value_col]].copy()
        out["trend"], out["seasonal"], out["resid"] = t, s, r
        return out

    # explicit repartition by series: prevents AQE from coalescing the
    # shuffle to 1 partition and serializing the Python work (see
    # spectral.py); the hash partitioning is reused by applyInPandas.
    from predictor_spark.shiplib import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(series_col, ts_col, value_col)
        .repartition(n_parts, series_col)
        .groupBy(series_col)
        .applyInPandas(per_series, schema)
    )


def stl_recompose(df: DataFrame, out_col: str = "recomposed") -> DataFrame:
    """W8 — prediction recomposition trend+seasonal+resid
    (stl_decomposition_pipeline.py:202-219); uncertainty composes as
    sqrt(sum of squares) — see recompose_uncertainty."""
    from pyspark.sql import functions as F

    return df.withColumn(out_col, F.col("trend") + F.col("seasonal") + F.col("resid"))


def recompose_uncertainty(df: DataFrame, cols: list[str], out_col: str = "uncertainty") -> DataFrame:
    """W8 — component uncertainties compose as sqrt(Σ u²)
    (stl_decomposition_pipeline.py:214-219)."""
    from pyspark.sql import functions as F

    expr = None
    for c in cols:
        sq = F.col(c) * F.col(c)
        expr = sq if expr is None else expr + sq
    return df.withColumn(out_col, F.sqrt(expr))
