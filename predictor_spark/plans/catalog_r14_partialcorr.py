"""Catalog part — partial correlation & collinearity (STAGED for r9).

The regression stack (ols_price_qty_discount: 2-predictor OLS;
catalog_r13_regdiag: BP/Cook's) gains the two pre-fit screens run
BEFORE trusting multi-regressor coefficients:

- partial_correlation_qpd  first-order partial correlation of price
                           and quantity CONTROLLING for discount,
                           r_xy.z = (r_xy - r_xz r_yz) /
                           sqrt((1-r_xz^2)(1-r_yz^2)) — does the
                           price-quantity relation survive removing
                           the discount channel?
- vif_regressors           variance inflation factors of the
                           (quantity, discount) regressor pair:
                           VIF = 1/(1 - r_xz^2) for both (symmetric in
                           the 2-regressor case) — the collinearity
                           gate for ols_price_qty_discount's
                           coefficients

Determinism: the same integer triple (x = quantity, z = discount
cents, y = price cents) as ols_price_qty_discount, so all pairwise
moments are exact HUGEINT/decimal(38) sums; each r is one closed-form
double, combined once and rounded in-query (6 dp).

Scale: ONE map-side-combinable lineitem scan for all three pairwise
correlations; no joins, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

#: pairwise moments of (x=qty, z=discount_cents, y=price_cents)
_MOM_SQL = """
    raw AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_discount * 100) AS BIGINT) AS z,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT count(*) AS n,
               sum(CAST(x AS HUGEINT)) AS sx,
               sum(CAST(z AS HUGEINT)) AS sz,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(z AS HUGEINT) * z) AS szz,
               sum(CAST(y AS HUGEINT) * y) AS syy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * z) AS sxz,
               sum(CAST(z AS HUGEINT) * y) AS szy
        FROM raw
    ),
    r AS (
        SELECT n,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy
                         - CAST(sy AS DOUBLE) * sy)) AS rxy,
               (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
               / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * szz
                         - CAST(sz AS DOUBLE) * sz)) AS rxz,
               (CAST(n AS DOUBLE) * szy - CAST(sz AS DOUBLE) * sy)
               / sqrt((CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)
                      * (CAST(n AS DOUBLE) * syy
                         - CAST(sy AS DOUBLE) * sy)) AS rzy
        FROM m
    )
"""


def _corrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n, rxy, rxz, rzy) from exact integer moments."""
    li = _t(spark, sf_dir, "lineitem")
    raw = li.select(
        F.round("l_quantity", 0).cast("long").alias("x"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("z"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = raw.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).alias("sx"), F.sum(dec("z")).alias("sz"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("z") * F.col("z")).alias("szz"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("x") * F.col("z")).alias("sxz"),
        F.sum(dec("z") * F.col("y")).alias("szy"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731

    def corr(sab, sa, sb, saa, sbb):
        return ((d("n") * d(sab) - d(sa) * d(sb))
                / F.sqrt((d("n") * d(saa) - d(sa) * d(sa))
                         * (d("n") * d(sbb) - d(sb) * d(sb))))

    return m.select(
        "n",
        corr("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        corr("szy", "sz", "sy", "szz", "syy").alias("rzy"))


@query(
    "partial_correlation_qpd",
    oracle=f"""
    WITH {_MOM_SQL}
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(rxy, 6) AS r_price_qty,
           round(rzy, 6) AS r_price_discount,
           round((rxy - rxz * rzy)
                 / sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy)), 6)
               AS partial_r
    FROM r
    """,
)
def partial_correlation_qpd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation of price and quantity given
    discount, next to the two raw correlations it adjusts."""
    r = _corrs(spark, sf_dir)
    partial = ((F.col("rxy") - F.col("rxz") * F.col("rzy"))
               / F.sqrt((1.0 - F.col("rxz") * F.col("rxz"))
                        * (1.0 - F.col("rzy") * F.col("rzy"))))
    return r.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round("rxy", 6).alias("r_price_qty"),
        F.round("rzy", 6).alias("r_price_discount"),
        F.round(partial, 6).alias("partial_r"))


@query(
    "vif_regressors",
    oracle=f"""
    WITH {_MOM_SQL}
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(rxz, 6) AS r_qty_discount,
           round(1.0 / (1.0 - rxz * rxz), 6) AS vif
    FROM r
    """,
)
def vif_regressors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance inflation factor of the (quantity, discount) regressor
    pair: VIF = 1/(1 - r^2) — VIF near 1 certifies
    ols_price_qty_discount's coefficients are not collinearity
    artifacts; VIF > 10 would invalidate them."""
    r = _corrs(spark, sf_dir)
    return r.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round("rxz", 6).alias("r_qty_discount"),
        F.round(1.0 / (1.0 - F.col("rxz") * F.col("rxz")), 6)
        .alias("vif"))
