"""ARIMA(p,d,q) order selection by AIC — the engine's full analog of the
reference's ARIMA GA (app/arima_optimizer.py:12-22: DEAP minimizing AIC
over (p,d,q)), done WITHOUT a driver-side GA: for a bounded grid the whole
search is closed-form column algebra, so every series selects its order in
two window passes + two aggregates (one per differencing level) — the
same no-iteration philosophy as plans/ar_model.ar_order_select, now with
differencing and MA terms.

Method (Hannan-Rissanen two-stage, classical and closed-form):
  1. per differencing level d in {0, 1}: difference, demean per series,
     fit a LONG AR(3) via Levinson-Durbin on lagged autocovariance sums
     (rounded to 6 dp so both engines derive bit-identical coefficients);
  2. innovation estimates e_t = x_t - a1 x_{t-1} - a2 x_{t-2} - a3 x_{t-3}
     (a pure projection once the per-series coefficients are joined back);
  3. every ARMA(p,q) with p+q <= 2 — (0,0) (1,0) (0,1) (2,0) (1,1)
     (0,2) — is a least-squares regression of x_t on lagged x and lagged
     e, solved by Cramer's rule from 13 shared cross-product sums
     (rounded 6 dp) over the COMMON sample (rows where e_{t-2} exists),
     one aggregate pass; (0,0) is the no-regressor baseline (RSS = syy),
     giving white-noise and pure-random-walk candidates;
  4. AIC = n*ln(RSS/n) + 2*(p+q+d+1), rounded 4 dp; argmin with ties to
     the earliest model in the fixed (d, then p+q, then q) enumeration.

The AIC algebra is shared VERBATIM between engines: `aic_select_exprs`
returns SQL scalar expressions evaluated by Spark via selectExpr and
spliced unchanged into the DuckDB oracle — the only engine-specific part
is producing the sums table, which follows the same rounded-sum spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: fixed enumeration of (p, d, q) candidates, ordered by (d, p+q, q);
#: earliest wins AIC ties
MODELS = [(0, 0, 0), (1, 0, 0), (0, 0, 1), (2, 0, 0), (1, 0, 1), (0, 0, 2),
          (0, 1, 0), (1, 1, 0), (0, 1, 1), (2, 1, 0), (1, 1, 1), (0, 1, 2)]

#: cross-product sums computed per series and differencing level
SUM_COLS = ["syy", "sx1y", "sx2y", "se1y", "se2y", "sx1x1", "sx2x2",
            "se1e1", "se2e2", "sx1x2", "se1e2", "sx1e1"]


def _rss_expr(p: int, q: int, d: int) -> str:
    s = lambda c: f"{c}_d{d}"  # noqa: E731
    syy = s("syy")
    if (p, q) == (0, 0):
        return syy

    def one(sxx, sxy):
        return f"({syy} - {s(sxy)}*{s(sxy)}/{s(sxx)})"

    def two(suu, svv, suv, suy, svy):
        det = f"({s(suu)}*{s(svv)} - {s(suv)}*{s(suv)})"
        bu_num = f"({s(suy)}*{s(svv)} - {s(svy)}*{s(suv)})"
        bv_num = f"({s(svy)}*{s(suu)} - {s(suy)}*{s(suv)})"
        return (f"({syy} - ({bu_num}*{s(suy)} + {bv_num}*{s(svy)}) / {det})")

    if (p, q) == (1, 0):
        return one("sx1x1", "sx1y")
    if (p, q) == (2, 0):
        return two("sx1x1", "sx2x2", "sx1x2", "sx1y", "sx2y")
    if (p, q) == (0, 1):
        return one("se1e1", "se1y")
    if (p, q) == (0, 2):
        return two("se1e1", "se2e2", "se1e2", "se1y", "se2y")
    if (p, q) == (1, 1):
        return two("sx1x1", "se1e1", "sx1e1", "sx1y", "se1y")
    raise ValueError((p, q))


def aic_select_exprs() -> list[str]:
    """SQL scalar expressions over the joined sums row (columns
    ``{sum}_d{d}`` + ``n_d{d}``): one aic_p{p}d{d}q{q} per model, then
    best_aic / best_p / best_d / best_q. Engine-portable SQL (ln,
    greatest, CASE) — evaluated by Spark selectExpr AND DuckDB."""
    exprs = []
    names = []
    for p, d, q in MODELS:
        n = f"CAST(n_d{d} AS DOUBLE)"
        rss = _rss_expr(p, q, d)
        k = p + q + d + 1
        name = f"aic_p{p}d{d}q{q}"
        names.append(name)
        exprs.append(
            f"round({n} * ln(greatest({rss}, 1e-9) / {n}) + 2 * {k}, 4) AS {name}"
        )
    exprs.append(f"least({', '.join(names)}) AS best_aic")
    for field, idx in (("best_p", 0), ("best_d", 1), ("best_q", 2)):
        cases = " ".join(
            f"WHEN aic_p{p}d{d}q{q} = least({', '.join(names)}) THEN {(p, d, q)[idx]}"
            for p, d, q in MODELS
        )
        exprs.append(f"CASE {cases} END AS {field}")
    return exprs


def _series_sums(df: DataFrame, d: int, value_col: str, ts_col: str,
                 series_col: str) -> DataFrame:
    """Per-series rounded cross-product sums for differencing level d.
    One window pass builds x, lags, innovations and their lags; one
    aggregate produces the 13 sums + n. All sums rounded to 6 dp — the
    cross-engine determinism pin (partial-aggregation summation order
    cannot leak past the rounding)."""
    w = Window.partitionBy(series_col).orderBy(ts_col)
    wall = Window.partitionBy(series_col)
    y = F.col(value_col) if d == 0 else F.col(value_col) - F.lag(value_col).over(w)
    base = df.select(series_col, ts_col, y.alias("y")).filter(F.col("y").isNotNull())
    x = base.withColumn("x", F.col("y") - F.avg("y").over(wall))
    for k in (1, 2, 3):
        x = x.withColumn(f"x{k}", F.lag("x", k).over(w))
    # r14 (guide §2.4/§5): x feeds BOTH the AR(3) moment aggregate (inside
    # the broadcast coef subtree) and the innovation projection — un-cached,
    # each consumer re-ran the scan + demean/lag window chain, so one
    # order-select invocation paid 4 events scans and ~9 window passes
    # (plans/r14/arima_order_select_aic_before.txt).  The frame is 6 narrow
    # columns over the train slice; MEMORY_AND_DISK spills at scale.
    x = x.cache()
    ars = x.groupBy(series_col).agg(
        *[F.round(F.sum(F.col("x") * F.col(c)), 6).alias(nm)
          for c, nm in [("x", "s0"), ("x1", "s1"), ("x2", "s2"), ("x3", "s3")]],
    ).filter(F.col("s0") > 0)
    # Levinson-Durbin AR(3) coefficients from rounded sums
    r1, r2, r3 = [F.col(f"s{k}") / F.col("s0") for k in (1, 2, 3)]
    k1 = r1
    e1v = 1 - k1 * k1
    k2 = (r2 - k1 * r1) / e1v
    a21 = k1 * (1 - k2)
    e2v = e1v * (1 - k2 * k2)
    k3 = (r3 - a21 * r2 - k2 * r1) / e2v
    coef = ars.select(
        series_col,
        (a21 - k3 * k2).alias("a1"),
        (k2 - k3 * a21).alias("a2"),
        k3.alias("a3"),
    )
    ex = (
        x.join(F.broadcast(coef), series_col)
        .withColumn("e", F.col("x") - F.col("a1") * F.col("x1")
                    - F.col("a2") * F.col("x2") - F.col("a3") * F.col("x3"))
        .withColumn("e1", F.lag("e", 1).over(w))
        .withColumn("e2", F.lag("e", 2).over(w))
        .filter(F.col("e2").isNotNull())
    )
    pairs = {
        "syy": ("x", "x"), "sx1y": ("x1", "x"), "sx2y": ("x2", "x"),
        "se1y": ("e1", "x"), "se2y": ("e2", "x"), "sx1x1": ("x1", "x1"),
        "sx2x2": ("x2", "x2"), "se1e1": ("e1", "e1"), "se2e2": ("e2", "e2"),
        "sx1x2": ("x1", "x2"), "se1e2": ("e1", "e2"), "sx1e1": ("x1", "e1"),
    }
    agg = ex.groupBy(series_col).agg(
        F.count(F.lit(1)).alias(f"n_d{d}"),
        *[F.round(F.sum(F.col(a) * F.col(b)), 6).alias(f"{nm}_d{d}")
          for nm, (a, b) in pairs.items()],
    )
    return agg.filter(
        (F.col(f"n_d{d}") >= 10)
        & (F.col(f"syy_d{d}") > 0) & (F.col(f"sx1x1_d{d}") > 0)
        & (F.col(f"sx2x2_d{d}") > 0) & (F.col(f"se1e1_d{d}") > 0)
        & (F.col(f"se2e2_d{d}") > 0)
    )


def arima_order_select(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    series_col: str = "user_id",
) -> DataFrame:
    """Per-series ARIMA(p,d,q) grid AICs + argmin (see module docstring).
    The caller passes the (scan-pruned) train slice."""
    s0 = _series_sums(df, 0, value_col, ts_col, series_col)
    s1 = _series_sums(df, 1, value_col, ts_col, series_col)
    joined = s0.join(s1, series_col)
    return joined.selectExpr(series_col, "n_d0", "n_d1", *aic_select_exprs())
