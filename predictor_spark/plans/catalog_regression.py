"""Catalog part — closed-form regression analytics (round 6, session 2).

The robust-trend family (catalog_robust: Theil-Sen, Mann-Kendall)
gives the reference's forecasting layer ORDER-statistic trends; this
module adds the classical LEAST-SQUARES counterparts every analytics
engine ships, each as a pure aggregation (no iterative solver — the
normal equations of 1- and 2-predictor OLS have closed forms):

- ols_trend_per_series     slope / intercept / R² of value on time
                           index per series (Gauss/Legendre least
                           squares)
- ols_price_qty_discount   2-predictor OLS via the 2x2 normal
                           equations (price on quantity + discount)
- price_elasticity_loglog  log-log OLS slope = price elasticity of
                           demand (Marshall 1890)
- durbin_watson_residuals  Durbin & Watson 1950 first-order residual
                           autocorrelation statistic on the per-series
                           OLS fit

Determinism: x is a row_number over a totally-ordered key and y rides
integer cents, so every raw moment (Σx, Σy, Σxy, Σx², Σy², Σxz, …) is
an EXACT integer accumulated in DECIMAL(38,0)/HUGEINT; the closed-form
combination (n·Σxy − Σx·Σy etc.) happens ONCE in doubles over those
exact operands with the identical expression tree in both engines.
Zero-variance denominators are guarded with CASE (the session runs
ANSI mode).  The elasticity row follows the text-statistics precedent
(bigram_logprob, zipf_rank_slope) for ln() portability: logs are
rounded to 9 dp per row before summation.

Scale: every row is scan → map-side-combinable aggregation on a
bounded group key; the Durbin-Watson second pass joins a ~5-row
broadcast coefficient table back onto one per-series window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: per-series (x=row index, y=integer cents) frame — shared Spark shape
_XY_SQL = """
    xy AS (
        SELECT event_type,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id) AS BIGINT) AS x,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events
    )
"""

#: exact raw moments of the per-series frame, HUGEINT-accumulated
_MOM_SQL = """
    mom AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
               CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM xy GROUP BY event_type
    )
"""


def _xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_type",
        F.row_number().over(w).cast("long").alias("x"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"))


def _moments(df: DataFrame) -> DataFrame:
    """Exact decimal(38,0) raw moments per series, surfaced as doubles
    (plus the bigint row count) for the closed-form combination."""
    def dsum(col):
        return F.sum(col.cast("decimal(38,0)")).cast("double")

    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        F.count(F.lit(1)).cast("long").alias("n_rows"))


@query(
    "ols_trend_per_series",
    oracle=f"""
    WITH {_XY_SQL}, {_MOM_SQL}
    SELECT event_type, n_rows AS n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100, 6)
               AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n / 100, 4) AS intercept,
           CASE WHEN n * syy - sy * sy = 0 THEN NULL
                ELSE round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
                           6) END AS r2
    FROM mom
    """,
)
def ols_trend_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of each series: slope/intercept of value on
    the observation index and the fit's R², from the closed form
    slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), R² = M_xy²/(M_xx·M_yy).
    The parametric companion to theil_sen_trend (same question, robust
    vs efficient estimator — a real engine ships both).

    Every Σ is an exact integer in DECIMAL(38,0); the combination runs
    once in doubles over identical exact operands in both engines.  A
    constant series (M_yy = 0) yields NULL R² under the CASE guard.

    Scale: one shuffle for the row_number window, then a map-side-
    combinable aggregation to ~5 moment rows."""
    m = _moments(_xy(spark, sf_dir))
    mxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    mxy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    myy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = mxy / mxx
    return m.select(
        "event_type", F.col("n_rows").alias("n"),
        F.round(slope / 100, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n") / 100, 4)
        .alias("intercept"),
        F.when(myy == 0, F.lit(None).cast("double"))
        .otherwise(F.round(mxy * mxy / (mxx * myy), 6)).alias("r2"))


@query(
    "ols_price_qty_discount",
    oracle="""
    WITH raw AS (
        SELECT l_returnflag,
               CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_discount * 100) AS BIGINT) AS z,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    mom AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(sum(CAST(z AS HUGEINT)) AS DOUBLE) AS sz,
               CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(z AS HUGEINT) * z) AS DOUBLE) AS szz,
               CAST(sum(CAST(x AS HUGEINT) * z) AS DOUBLE) AS sxz,
               CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
               CAST(sum(CAST(z AS HUGEINT) * y) AS DOUBLE) AS szy
        FROM raw GROUP BY l_returnflag
    ),
    cm AS (
        SELECT l_returnflag, n, n_rows, sx, sz, sy,
               n * sxx - sx * sx AS mxx,
               n * szz - sz * sz AS mzz,
               n * sxz - sx * sz AS mxz,
               n * sxy - sx * sy AS mxy,
               n * szy - sz * sy AS mzy
        FROM mom
    )
    SELECT l_returnflag, n_rows AS n,
           CASE WHEN mxx * mzz - mxz * mxz = 0 THEN NULL
                ELSE round((mzz * mxy - mxz * mzy)
                           / (mxx * mzz - mxz * mxz) / 100, 4) END
               AS b_qty,
           CASE WHEN mxx * mzz - mxz * mxz = 0 THEN NULL
                ELSE round((mxx * mzy - mxz * mxy)
                           / (mxx * mzz - mxz * mxz) / 100, 4) END
               AS b_discount_bp,
           CASE WHEN mxx * mzz - mxz * mxz = 0 THEN NULL
                ELSE round((sy - (mzz * mxy - mxz * mzy)
                                 / (mxx * mzz - mxz * mxz) * sx
                               - (mxx * mzy - mxz * mxy)
                                 / (mxx * mzz - mxz * mxz) * sz)
                           / n / 100, 4) END AS intercept
    FROM cm
    """,
)
def ols_price_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-predictor least squares without an iterative solver: regress
    extended price on quantity and discount (basis points) per return
    flag by solving the 2x2 normal equations in closed form —
    b = [Mzz·Mxy − Mxz·Mzy, Mxx·Mzy − Mxz·Mxy] / (Mxx·Mzz − Mxz²) over
    n-scaled central moments.  The multi-feature step between simple
    OLS and the distributed-PCA / linear-forecaster rows.

    Quantities are integral, discounts quantize exactly to basis
    points, price rides cents: all ten raw moments are exact integers
    in DECIMAL(38,0)/HUGEINT; the closed form runs once in doubles.
    A singular design (collinear qty/discount, det = 0) yields NULLs.

    Scale: ONE map-side-combinable aggregation over the scan — the
    normal-equation trick means no second pass, no gradient loop."""
    raw = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_quantity", 0).cast("long").alias("x"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("z"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"))

    def dsum(col):
        return F.sum(col.cast("decimal(38,0)")).cast("double")

    m = raw.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        dsum(F.col("x")).alias("sx"), dsum(F.col("z")).alias("sz"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("z") * F.col("z")).alias("szz"),
        dsum(F.col("x") * F.col("z")).alias("sxz"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("z") * F.col("y")).alias("szy"))
    mxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    mzz = F.col("n") * F.col("szz") - F.col("sz") * F.col("sz")
    mxz = F.col("n") * F.col("sxz") - F.col("sx") * F.col("sz")
    mxy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    mzy = F.col("n") * F.col("szy") - F.col("sz") * F.col("sy")
    det = mxx * mzz - mxz * mxz
    b_x = (mzz * mxy - mxz * mzy) / det
    b_z = (mxx * mzy - mxz * mxy) / det
    null = F.lit(None).cast("double")
    return m.select(
        "l_returnflag", F.col("n_rows").alias("n"),
        F.when(det == 0, null).otherwise(F.round(b_x / 100, 4))
        .alias("b_qty"),
        F.when(det == 0, null).otherwise(F.round(b_z / 100, 4))
        .alias("b_discount_bp"),
        F.when(det == 0, null).otherwise(
            F.round((F.col("sy") - b_x * F.col("sx") - b_z * F.col("sz"))
                    / F.col("n") / 100, 4)).alias("intercept"))


@query(
    "price_elasticity_loglog",
    oracle="""
    WITH ll AS (
        SELECT p_brand,
               round(ln(l_extendedprice / l_quantity), 9) AS lx,
               round(ln(l_quantity), 9) AS ly
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_quantity > 0
    ),
    mom AS (
        SELECT p_brand, CAST(count(*) AS DOUBLE) AS n,
               CAST(count(*) AS BIGINT) AS n_rows,
               sum(lx) AS sx, sum(ly) AS sy,
               sum(lx * lx) AS sxx, sum(lx * ly) AS sxy
        FROM ll GROUP BY p_brand
    )
    SELECT p_brand, n_rows AS n,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
                END AS elasticity
    FROM mom
    """,
)
def price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand per brand: the OLS slope of
    ln(quantity) on ln(unit price) (Marshall 1890's log-log form —
    the slope IS the elasticity).  Unit price is extendedprice /
    quantity, so the regression reads how order size co-moves with the
    realized unit price inside each brand.

    ln() portability follows the text-statistics precedent
    (bigram_logprob_per_doc, zipf_rank_slope — five driver rounds
    green): per-row logs are rounded to 9 dp before the moment sums,
    and the slope rounds at 4 dp after one division.

    Scale: broadcast part dim, one combinable aggregation; no window,
    no second pass."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ll = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .select("p_brand",
                  F.round(F.log(F.col("l_extendedprice")
                                / F.col("l_quantity")), 9).alias("lx"),
                  F.round(F.log("l_quantity"), 9).alias("ly")))
    m = ll.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("lx").alias("sx"), F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"))
    mxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    mxy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "p_brand", F.col("n_rows").alias("n"),
        F.when(mxx == 0, F.lit(None).cast("double"))
        .otherwise(F.round(mxy / mxx, 4)).alias("elasticity"))


@query(
    "durbin_watson_residuals",
    oracle=f"""
    WITH {_XY_SQL}, {_MOM_SQL},
    coef AS (
        SELECT event_type,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   AS a
        FROM mom
    ),
    resid AS (
        SELECT xy.event_type,
               round(xy.y - a - b * xy.x, 6) AS e,
               lag(round(xy.y - a - b * xy.x, 6)) OVER (
                   PARTITION BY xy.event_type ORDER BY xy.x) AS e_prev
        FROM xy JOIN coef ON xy.event_type = coef.event_type
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(CASE WHEN e_prev IS NULL THEN 0
                          ELSE (e - e_prev) * (e - e_prev) END)
                 / sum(e * e), 4) AS dw
    FROM resid GROUP BY event_type
    """,
)
def durbin_watson_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic (Durbin & Watson 1950) on the residuals
    of each series' OLS trend fit: DW = Σ(e_t − e_{t−1})² / Σe_t² —
    ≈2 means uncorrelated residuals, →0 positive autocorrelation (the
    model-diagnostics number that says whether the trend fit left
    structure on the table; pairs with ljung_box_q, which asks the
    same of the raw series).

    Two passes: exact-moment coefficients per series (broadcast back,
    ~5 rows), then residuals rounded at 6 dp before the lag/square
    sums so both engines fold identical doubles.

    Scale: the coefficient table is a broadcast join; the residual
    window partitions per series and reuses the same (ts, event_id)
    sort the index window needed."""
    xy = _xy(spark, sf_dir)
    m = _moments(xy)
    mxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    mxy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = mxy / mxx
    coef = m.select(
        "event_type", slope.alias("b"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("a"))
    e = F.round(F.col("y") - F.col("a") - F.col("b") * F.col("x"), 6)
    w = Window.partitionBy("event_type").orderBy("x")
    resid = (xy.join(F.broadcast(coef), "event_type")
             .withColumn("e", e)
             .withColumn("e_prev", F.lag("e").over(w)))
    return (resid.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(F.sum(F.when(F.col("e_prev").isNull(), F.lit(0.0))
                               .otherwise((F.col("e") - F.col("e_prev"))
                                          * (F.col("e") - F.col("e_prev"))))
                         / F.sum(F.col("e") * F.col("e")), 4).alias("dw")))
