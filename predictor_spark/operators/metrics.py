"""Forecast metric aggregations (SURVEY.md §2.5, A1-A7).

The reference computes these with sklearn/NumPy on collected arrays
(pipeline_plugins/stl_metrics.py:18-161). Here each metric is a
distributed aggregate; the whole metric family for all (split, horizon)
cells is ONE groupBy pass (map-side partial aggregation, then a single
shuffle on the grouping key) — at 100 TB no row ever reaches the driver.

R² uses SST = n * var_pop(t) (Spark's var_pop is a numerically stable
streaming-moments aggregate, unlike the catastrophic-cancellation form
sum(t²) - n*avg(t)²), so R² = 1 - SSE / (n * var_pop(t)) — identical to
sklearn.r2_score up to float noise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def forecast_metrics(
    df: DataFrame,
    pred_col: str,
    target_col: str,
    baseline_col: str,
    group_cols: Sequence[str] = (),
    uncertainty_col: str | None = None,
) -> DataFrame:
    """A1-A5 — MAE, naive (persistence) MAE, R², mean |uncertainty|, SNR
    per group.

    - MAE        = avg(|pred - target|)                 (stl_metrics.py:72)
    - Naive MAE  = avg(|baseline - target|)             (stl_metrics.py:78-81)
    - R²         = 1 - sum((t-p)²)/sum((t-avg t)²)      (stl_metrics.py:73)
    - SNR        = avg(pred) / (unc_mean + 1e-9)        (stl_metrics.py:75)
    """
    p, t, b = F.col(pred_col), F.col(target_col), F.col(baseline_col)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.avg(F.abs(p - t)).alias("mae"),
        F.avg(F.abs(b - t)).alias("naive_mae"),
        (F.lit(1.0) - F.sum((t - p) * (t - p)) /
         (F.count(F.lit(1)) * F.var_pop(t))).alias("r2"),
    ]
    if uncertainty_col:
        u = F.col(uncertainty_col)
        aggs.append(F.avg(F.abs(u)).alias("uncertainty"))
        aggs.append((F.avg(p) / (F.avg(F.abs(u)) + F.lit(1e-9))).alias("snr"))
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(*aggs)


def multi_horizon_metrics(
    df: DataFrame,
    horizons: Sequence[int],
    target_fmt: str = "target_h{h}",
    pred_fmt: str = "pred_h{h}",
    baseline_col: str = "baseline",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """A1-A3 for every horizon in one pass, emitted long-format
    (horizon, mae, naive_mae, r2[, groups...]) like the reference results
    table (stl_metrics.py:164-201 / FIXTURES F7).

    Implementation: stack the horizon family with an inline explode (no
    N scans), then one groupBy. The unpivot is a projection — Catalyst
    keeps the parquet scan single and column-pruned.
    """
    pairs = F.array(*[
        F.struct(
            F.lit(int(h)).alias("horizon"),
            F.col(target_fmt.format(h=h)).cast("double").alias("t"),
            F.col(pred_fmt.format(h=h)).cast("double").alias("p"),
            F.col(baseline_col).cast("double").alias("b"),
        )
        for h in horizons
    ])
    keep = list(group_cols)
    long = df.select(*keep, F.explode(pairs).alias("x")).select(
        *keep, "x.horizon", "x.t", "x.p", "x.b"
    )
    t, p, b = F.col("t"), F.col("p"), F.col("b")
    return (
        long.groupBy(*keep, "horizon")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.abs(p - t)).alias("mae"),
            F.avg(F.abs(b - t)).alias("naive_mae"),
            (F.lit(1.0) - F.sum((t - p) * (t - p)) /
             (F.count(F.lit(1)) * F.var_pop(t))).alias("r2"),
        )
    )


def cross_iteration_stats(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str],
) -> DataFrame:
    """A6 — Average / Std Dev / Min / Max of a metric across iterations per
    (split x metric x horizon) key (stl_metrics.py:164-201). NaN-filtered
    like the reference (np.nanmean etc.)."""
    v = F.col(value_col)
    clean = df.filter(v.isNotNull() & ~F.isnan(v))
    return clean.groupBy(*key_cols).agg(
        F.avg(v).alias("Average"),
        F.stddev_samp(v).alias("Std Dev"),
        F.min(v).alias("Min"),
        F.max(v).alias("Max"),
    )


def mc_uncertainty(
    df: DataFrame,
    sample_cols: Sequence[str],
    mean_col: str = "pred_mean",
    std_col: str = "pred_std",
) -> DataFrame:
    """A7 — Monte-Carlo moments across stochastic forward passes.

    The reference streams Welford mean/M2 over mc_samples predict calls
    (predictor_plugins/common/bayesian.py:70-130) to bound memory. In the
    engine the MC samples are N columns of one row (bounded width), so the
    exact sample mean/std are a row-wise array aggregate — no state, no
    Python. std uses the (k-1) divisor like Welford's final step.
    """
    arr = F.array(*[F.col(c).cast("double") for c in sample_cols])
    k = len(sample_cols)
    mean = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.lit(float(k))
    df = df.withColumn(mean_col, mean)
    m2 = F.aggregate(
        arr, F.lit(0.0),
        lambda a, x: a + (x - F.col(mean_col)) * (x - F.col(mean_col)),
    )
    return df.withColumn(std_col, F.sqrt(m2 / F.lit(float(k - 1))))


def masked_moments(
    df: DataFrame,
    value_col: str,
    mask_col: str,
    group_cols: Sequence[str] = (),
    eps: float = 1e-8,
) -> DataFrame:
    """A10 — weighted/masked moments with the reference's gap-mask
    semantics (predictor_plugins/common/losses.py:66-69 _masked_mean,
    :128-131 _weighted_std):

        masked_mean(x, m) = sum(x*m) / (sum(m) + eps)
        weighted_std(x,m) = sqrt(masked_mean(m*(x-mu)^2) + eps)

    The centered second moment expands algebraically so the whole family
    is ONE groupBy pass (map-side partial aggregation, single shuffle):

        sum(m*(x-mu)^2) = sum(m*x^2) - 2*mu*sum(m*x) + mu^2*sum(m)

    Output per group: n (row count), mask_sum, masked_mean, masked_std.
    At 100 TB this is the same shuffle profile as any built-in agg — three
    partial sums per group, no second pass over the data.
    """
    x = F.col(value_col).cast("double")
    m = F.col(mask_col).cast("double")
    agg = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(m).alias("mask_sum"),
        F.sum(m * x).alias("_sxm"),
        F.sum(m * x * x).alias("_sx2m"),
    )
    s = F.col("mask_sum") + F.lit(eps)
    mu = F.col("_sxm") / s
    # clamp: the expanded second moment can cancel slightly negative for
    # near-constant large-magnitude groups; the reference's two-pass
    # _weighted_std is >= 0 by construction, so floor at 0 before sqrt
    var = F.greatest(
        (F.col("_sx2m") - F.lit(2.0) * mu * F.col("_sxm") + mu * mu * F.col("mask_sum")) / s,
        F.lit(0.0),
    )
    return agg.select(
        *group_cols,
        "n",
        "mask_sum",
        mu.alias("masked_mean"),
        F.sqrt(var + F.lit(eps)).alias("masked_std"),
    )
