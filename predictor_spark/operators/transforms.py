"""Anti-naive-lock transform dispatcher and composite feature transforms
(SURVEY §2.3 W12/W14; reference preprocessor_plugins/anti_naive_lock.py).

The reference dispatches a per-column transform by column-name category
(anti_naive_lock.py:53-130): cyclic columns get sin-encoding, price-like
columns get log-returns, trend-like get first differences, the target and
excluded columns are preserved; default = log-returns. The engine keeps
that rule table but makes roles EXPLICIT (a ColumnRole mapping, SURVEY
§1.3) with name-based inference as the compat fallback.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

from predictor_spark.operators import temporal
from predictor_spark.operators.normalize import fit_zscore, normalize

#: role -> transform kind
ROLES = ("cyclic", "log_returns", "first_diff", "preserve")

#: name-category inference (anti_naive_lock.py:58-72): substring rules,
#: FIRST match wins — already-encoded _sin/_cos columns must be tested
#: before the raw cyclic names they contain
NAME_RULES: tuple[tuple[str, str], ...] = (
    ("_sin", "preserve"), ("_cos", "preserve"),
    ("hod", "cyclic"), ("hour", "cyclic"), ("dow", "cyclic"), ("dom", "cyclic"),
    ("moy", "cyclic"), ("month", "cyclic"),
    ("open", "log_returns"), ("high", "log_returns"), ("low", "log_returns"),
    ("close", "log_returns"), ("price", "log_returns"),
    ("trend", "first_diff"), ("ema", "first_diff"), ("sma", "first_diff"),
)


def infer_roles(
    cols: Sequence[str],
    target_col: str | None = None,
    excluded: Sequence[str] = (),
    default: str = "log_returns",
) -> dict[str, str]:
    """Compat role inference by name category; target & excluded preserved
    (anti_naive_lock.py:86-95)."""
    roles: dict[str, str] = {}
    for c in cols:
        if c == target_col or c in excluded:
            roles[c] = "preserve"
            continue
        low = c.lower()
        roles[c] = next((role for pat, role in NAME_RULES if pat in low), default)
    return roles


def anti_naive_lock(
    df: DataFrame,
    roles: Mapping[str, str],
    ts_col: str = "ts",
    series_col: str | None = None,
) -> DataFrame:
    """W12 — apply the per-column transform table IN PLACE (column names
    preserved, like the reference). One pass: all log-return/first-diff
    columns share the same window spec -> single WindowExec."""
    logret_cols = [c for c, r in roles.items() if r == "log_returns"]
    diff_cols = [c for c, r in roles.items() if r == "first_diff"]
    out = df
    if logret_cols:
        out = temporal.log_returns(out, logret_cols, ts_col, series_col, suffix="")
    if diff_cols:
        out = temporal.first_diff(out, diff_cols, ts_col, series_col, suffix="")
    for c, r in roles.items():
        if r == "cyclic":
            out = temporal.cyclic_encode(out, c)
    return out


def exact_stl_log_return_feature(
    df: DataFrame,
    price_col: str,
    ts_col: str = "ts",
    series_col: str | None = None,
    split_col: str = "split",
    train_value: str = "train",
    out_col: str = "log_return",
) -> DataFrame:
    """W14 — the "exact STL method" feature (phase2_6_preprocessor.py:
    318-359): log1p(max(0, price)) -> first difference (first value kept as
    the first log1p value, pandas diff-with-prepend semantics) ->
    z-score with scaler FIT ON TRAIN ONLY."""
    w = temporal._w(series_col, ts_col)
    lp = F.log1p(F.greatest(F.col(price_col), F.lit(0.0)))
    out = df.withColumn("__lp", lp).withColumn(
        out_col, F.coalesce(F.col("__lp") - F.lag("__lp", 1).over(w), F.col("__lp"))
    ).drop("__lp")
    stats = fit_zscore(out.filter(F.col(split_col) == train_value), [out_col])
    return normalize(out, stats, [out_col])
