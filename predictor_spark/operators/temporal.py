"""Temporal / windowing operators (SURVEY.md §2.3, W1-W20).

The reference implements these as per-row Python loops over pandas frames
(e.g. sliding windows `preprocessor_plugins/sliding_windows.py:99-115`,
log-returns `preprocessor_plugins/anti_naive_lock.py:157-179`). Here every
operator is a declarative Window-function expression over
``Window.partitionBy(series).orderBy(ts)`` so:

- one series (the reference's case) or 10^9 series run identical code;
- Catalyst groups identical window specs into a single WindowExec, so N
  horizons/features cost one sort, not N;
- at 100 TB the only shuffle is the single hash-partition by series key
  (window functions need no further shuffle after it).

Scale note: a *single* unpartitioned series forces all rows into one
window partition. That matches the reference semantics (one global
time-ordered series) and is fundamentally sequential; for genuinely huge
single series use ``series_col=None`` only at reference-compat scale, and
range-chunk with halo rows via ``mapInPandas`` beyond that (see
``plans/forecast_pipeline.py`` notes).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

TWO_PI = 2.0 * math.pi


def _w(series_col: str | None, ts_col: str) -> Window:
    """The canonical per-series time window spec."""
    if series_col:
        return Window.partitionBy(series_col).orderBy(ts_col)
    return Window.orderBy(ts_col)


def _zero_unless_finite(c: Column) -> Column:
    """Reference semantics: non-finite -> 0.0 (anti_naive_lock.py:173-179)."""
    return F.when(c.isNull() | F.isnan(c) | (F.abs(c) == float("inf")), F.lit(0.0)).otherwise(c)


def log_returns(
    df: DataFrame,
    cols: Sequence[str],
    ts_col: str = "ts",
    series_col: str | None = None,
    suffix: str = "_logret",
) -> DataFrame:
    """W9 — per-column log returns ln(x_t / x_{t-1}).

    Exact reference guards (anti_naive_lock.py:157-179): the first value is
    0; the result is 0 unless BOTH prev > 0 and cur > 0; NaN/Inf -> 0.
    A naive log(x/lag(x)) differs on non-positive neighbors — encode the
    guard explicitly (SURVEY §7 "What's hard"). ``suffix=""`` replaces the
    input column in place.
    """
    w = _w(series_col, ts_col)
    out = df
    for c in cols:
        cur, prev = F.col(c), F.lag(c, 1).over(w)
        expr = F.when(
            prev.isNotNull() & (prev > 0) & (cur > 0) & ~F.isnan(prev) & ~F.isnan(cur),
            F.log(cur / prev),
        ).otherwise(F.lit(0.0))
        out = out.withColumn(c + suffix, _zero_unless_finite(expr))
    return out


def first_diff(
    df: DataFrame,
    cols: Sequence[str],
    ts_col: str = "ts",
    series_col: str | None = None,
    suffix: str = "_diff",
) -> DataFrame:
    """W10 — first differences x_t - x_{t-1}; first value 0; Inf/NaN -> 0
    (anti_naive_lock.py:181-197)."""
    w = _w(series_col, ts_col)
    out = df
    for c in cols:
        expr = F.coalesce(F.col(c) - F.lag(c, 1).over(w), F.lit(0.0))
        out = out.withColumn(c + suffix, _zero_unless_finite(expr))
    return out


#: W11 period inference by column-name category (anti_naive_lock.py:132-155)
CYCLIC_PERIODS = {"hour": 24.0, "hod": 24.0, "dow": 7.0, "day_of_week": 7.0,
                  "dom": 31.0, "day_of_month": 31.0, "month": 12.0, "moy": 12.0}


def cyclic_encode(df: DataFrame, col: str, period: float | None = None) -> DataFrame:
    """W11 — sin(2*pi*x/period); period inferred from the column name when
    not given (hour->24, dow->7, dom->31, month->12)."""
    if period is None:
        period = next((p for k, p in CYCLIC_PERIODS.items() if k in col.lower()), None)
        if period is None:
            raise ValueError(f"no cyclic period inferable for column {col!r}")
    return df.withColumn(f"{col}_sin", F.sin(F.lit(TWO_PI) * F.col(col) / F.lit(period))).withColumn(
        f"{col}_cos", F.cos(F.lit(TWO_PI) * F.col(col) / F.lit(period))
    )


def time_features(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """W11/W20 — derive hod/dow/dom/moy sin+cos pairs from the timestamp.

    The reference consumes these precomputed (FIXTURES.md F2); the engine
    computes them natively: hour/dayofweek/dayofmonth/month are codegen'd
    JVM expressions.
    """
    specs = {
        "hod": (F.hour(ts_col), 24.0),
        "dow": (F.dayofweek(ts_col) - F.lit(1), 7.0),
        "dom": (F.dayofmonth(ts_col), 31.0),
        "moy": (F.month(ts_col), 12.0),
    }
    out = df
    for name, (expr, period) in specs.items():
        angle = F.lit(TWO_PI) * expr.cast("double") / F.lit(period)
        out = out.withColumn(f"{name}_sin", F.sin(angle)).withColumn(f"{name}_cos", F.cos(angle))
    return out


def lead_targets(
    df: DataFrame,
    target_col: str,
    horizons: Sequence[int],
    ts_col: str = "ts",
    series_col: str | None = None,
    trim: bool = True,
    returns: bool = False,
) -> DataFrame:
    """W5/W6 — multi-horizon lead targets.

    ``returns=False``: target_h{h} = x[t+h]            (default_target.py:36-86)
    ``returns=True``:  target_h{h} = x[t+h] - x[t]     (phase2_6_preprocessor.py:820-826)

    ``trim=True`` reproduces the reference's trim-to-``len - max_h`` rule:
    rows whose max-horizon lead does not exist are dropped, so every emitted
    row has ALL horizons defined (no silent non-finite->0 patching; compat
    callers can pass trim=False and coalesce).

    All horizon leads share one window spec -> Catalyst emits a single
    WindowExec (one sort) for the whole family.
    """
    w = _w(series_col, ts_col)
    out = df
    for h in horizons:
        lead = F.lead(target_col, int(h)).over(w)
        out = out.withColumn(f"target_h{h}", (lead - F.col(target_col)) if returns else lead)
    if trim:
        max_h = max(int(h) for h in horizons)
        out = out.withColumn("__tail_guard", F.lead(target_col, max_h).over(w)).filter(
            F.col("__tail_guard").isNotNull()
        ).drop("__tail_guard")
    return out


def rolling_stats(
    df: DataFrame,
    col: str,
    n: int = 24,
    ts_col: str = "ts",
    series_col: str | None = None,
    stats: Sequence[str] = ("mean", "std"),
) -> DataFrame:
    """W20 — trailing-window rolling statistics over the last ``n`` rows
    (inclusive of current), e.g. rolling_std_24 / rolling_mean_24 of F2."""
    w = _w(series_col, ts_col).rowsBetween(-(n - 1), 0)
    out = df
    if "mean" in stats:
        out = out.withColumn(f"rolling_mean_{n}", F.avg(col).over(w))
    if "std" in stats:
        out = out.withColumn(f"rolling_std_{n}", F.stddev_samp(col).over(w))
    if "min" in stats:
        out = out.withColumn(f"rolling_min_{n}", F.min(col).over(w))
    if "max" in stats:
        out = out.withColumn(f"rolling_max_{n}", F.max(col).over(w))
    if "sum" in stats:
        out = out.withColumn(f"rolling_sum_{n}", F.sum(col).over(w))
    return out


def rolling_ema(
    df: DataFrame,
    col: str,
    n: int = 24,
    ts_col: str = "ts",
    series_col: str | None = None,
) -> DataFrame:
    """W20 — exponential moving average with span ``n`` (pandas ewm
    semantics, adjust=True) expressed windows-only.

    adjust=True EMA is a ratio of two finite geometric sums:
        ema_t = sum_{i=0..t} a^i * x_{t-i} / sum_{i=0..t} a^i,  a = 1-2/(n+1)
    Both sums telescope: S_t = x_t + a*S_{t-1}, which is not a built-in
    window agg, but because a^i decays geometrically we truncate at
    ``12*n`` lags (dropped weight a^(12n) < 1e-10) and evaluate with
    ``collect_list`` + ``aggregate`` — stays JVM-side, no Python UDF.
    """
    a = 1.0 - 2.0 / (n + 1.0)
    w = _w(series_col, ts_col).rowsBetween(-(12 * n - 1), 0)
    vals = F.collect_list(F.col(col)).over(w)  # oldest..newest (window order)
    # aggregate over reversed list: weight newest with a^0
    rev = F.reverse(vals)
    num = F.aggregate(
        F.zip_with(rev, F.sequence(F.lit(0), F.size(rev) - 1),
                   lambda x, i: x * F.pow(F.lit(a), i.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(F.sequence(F.lit(0), F.size(rev) - 1),
                    lambda i: F.pow(F.lit(a), i.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return df.withColumn(f"ema_{n}", num / den)


def window_tensorize(
    df: DataFrame,
    feature_cols: Sequence[str],
    window_size: int,
    ts_col: str = "ts",
    series_col: str | None = None,
    inclusive: bool = True,
    max_horizon: int = 0,
    out_col: str = "window",
    extra_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """W1/W2 — sliding-window tensorization into an array<array<double>>
    column of shape (window_size, n_features).

    inclusive=True  (W1, sliding_windows.py:99-115): window = rows
        [t-w+1 .. t]; baseline is the LAST element (row t); first full
        window ends at the w-th row of the series.
    inclusive=False (W2, phase2_6_preprocessor.py:154-161, anti-leakage):
        window = rows [t-w .. t-1] — strictly before t; additionally a tail
        guard drops rows where t+max_horizon does not exist.

    Rows with fewer than ``window_size`` history rows are dropped (both
    reference variants emit only complete windows). The tensor stays a lazy
    array column — materialized to float32 only at the model boundary
    (SURVEY §1.4).

    ``extra_cols`` lets callers attach further window expressions (e.g. a
    target lead over the same per-series spec) in the SAME select batch:
    the analyzer then groups every same-spec function into ONE Window
    node, where a separate ``withColumn`` after this call would sit above
    the completeness filter and cost a second sort pass.
    """
    new_names = [out_col, "__rn", *(extra_cols or {})]
    clash = [n for n in new_names if n in df.columns]
    if clash:
        # select("*", ...) APPENDS; a same-named input column would leave
        # an ambiguous duplicate instead of being replaced (the pre-round-4
        # withColumn contract), so fail loudly at plan time
        raise ValueError(f"window_tensorize output column(s) already exist: {clash}")
    base = _w(series_col, ts_col)
    frame = base.rowsBetween(-(window_size - 1), 0) if inclusive else base.rowsBetween(-window_size, -1)
    row_vec = F.array(*[F.col(c).cast("double") for c in feature_cols])
    out = df.select(
        "*",
        F.collect_list(row_vec).over(frame).alias(out_col),
        F.row_number().over(base).alias("__rn"),
        *[c.alias(n) for n, c in (extra_cols or {}).items()],
    )
    min_rn = window_size if inclusive else window_size + 1
    out = out.filter(F.col("__rn") >= min_rn).drop("__rn")
    if max_horizon > 0:
        out = out.withColumn("__guard", F.lead(ts_col, int(max_horizon)).over(base)).filter(
            F.col("__guard").isNotNull()
        ).drop("__guard")
    return out


def window_baseline(df: DataFrame, window_col: str, target_idx: int, out_col: str = "baseline") -> DataFrame:
    """W4 — baseline = last element of each window for the target feature
    (sliding_windows.py:156-161): windows[:, -1, target_idx]."""
    return df.withColumn(out_col, F.element_at(F.element_at(window_col, -1), target_idx + 1))


def overlap_add(
    df: DataFrame,
    window_col: str,
    ts_col: str = "ts",
    series_col: str | None = None,
    tick_expr: Column | None = None,
) -> DataFrame:
    """W17 — reconstruct a series from overlapping per-row windows by
    averaging all window elements that map to the same tick
    (app/reconstruction.py:4-45 sums diagonals / coverage counts).

    The reference loops over diagonals; here: posexplode each window (the
    element at position p of the window ending at row t belongs to tick
    t-(w-1)+p), shuffle-group by reconstructed tick, average. One shuffle,
    fully parallel.

    ``df`` is expected to come from ``window_tensorize`` (complete windows
    only, the first w-1 series rows trimmed), so the row_number here is
    offset by w-1 from the original series position: original tick of
    element p in the window at post-trim row r is simply r + p (1-based).
    """
    base = _w(series_col, ts_col)
    out = df.withColumn("__rn", F.row_number().over(base))
    out = out.select(
        *( [series_col] if series_col else [] ),
        "__rn",
        F.posexplode(F.col(window_col)).alias("__pos", "__val"),
        F.size(F.col(window_col)).alias("__w"),
    )
    out = out.withColumn("__tick", F.col("__rn") + F.col("__pos"))
    keys = ([series_col] if series_col else []) + ["__tick"]
    return (
        out.groupBy(*keys)
        .agg(F.avg("__val").alias("value"), F.count("*").alias("coverage"))
        .withColumnRenamed("__tick", "tick")
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    series_col: str = "user_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Sessionization — assign session ids per series where a gap larger
    than ``gap_minutes`` starts a new session. lag + cumulative sum of
    gap indicators; one window spec, no extra shuffle beyond the series
    hash partition. (Engine extension; standard OLAP pattern.)"""
    w = _w(series_col, ts_col)
    gap_s = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double"), 1).over(w)
    is_new = F.when(gap_s.isNull() | (gap_s > gap_minutes * 60.0), 1).otherwise(0)
    return df.withColumn("session_id", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)))


def symmetric_log1p(df: DataFrame, cols: Sequence[str], suffix: str = "_slog1p") -> DataFrame:
    """W13 — sign(x) * log1p(|x|) (stl_preprocessor.py:122-165), applied
    BEFORE windowing (the reference applies it inside window tensors; the
    column-level application composes with W1/W2 and is equivalent)."""
    out = df
    for c in cols:
        out = out.withColumn(c + suffix, F.signum(c) * F.log1p(F.abs(F.col(c))))
    return out
