"""Catalog part — inequality indices + decomposition (STAGED r10).

The concentration family (catalog_concentration: Gini, Lorenz, HHI,
top-k shares) measures dispersion ordinally. These rows add the
ENTROPY-BASED inequality battery economists actually decompose with —
over order values grouped by the customer's region:

- theil_atkinson_by_region  Theil T index (1/n)Σ(x/μ)ln(x/μ) and the
                            Atkinson index at ε=0.5
                            (1 - ((1/n)Σ√x)²/μ) per region — both 0
                            for perfect equality, rising with
                            concentration; Atkinson has the welfare
                            interpretation ("share of total income
                            society would give up for equality")
- theil_decomposition       the property Gini famously lacks: T_total
                            = T_between + T_within exactly, where
                            T_between = Σ s_g·ln(μ_g/μ) and T_within =
                            Σ s_g·T_g with income shares s_g =
                            n_g·μ_g/(n·μ) — how much inequality lives
                            across regions vs inside them

Determinism: order values are exact integer cents; the two nonlinear
per-row terms (x·ln x and √x in dollar units) are quantized to integer
micro-units per row BEFORE summation (the established nano-quantize
idiom), so every aggregate is an exact HUGEINT/decimal(38,0) sum and
the indices are identical double expressions of exact integers, rounded
6 dp.

Scale: one orders scan joined to customer ON THE CUSTOMER KEY
(co-partitioned equi-join), nation/region broadcast; everything reduces
to 5 region moment rows. The decomposition reuses the same aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

#: per-region exact moment sums of order values (cents, x·lnx, √x)
_REGION_MOMENTS = """
    vals AS (
        SELECT r.r_name AS region,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    terms AS (
        SELECT region, cents,
               CAST(round(1e6 * (cents / 100.0) * ln(cents / 100.0))
                    AS BIGINT) AS xlnx_micro,
               CAST(round(1e6 * sqrt(cents / 100.0)) AS BIGINT)
                   AS sqrtx_micro
        FROM vals
    ),
    rm AS (
        SELECT region, count(*) AS n,
               sum(CAST(cents AS HUGEINT)) AS s_cents,
               sum(CAST(xlnx_micro AS HUGEINT)) AS s_xlnx,
               sum(CAST(sqrtx_micro AS HUGEINT)) AS s_sqrtx
        FROM terms GROUP BY region
    )"""


def _region_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    vals = (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select(F.col("r_name").alias("region"),
                    cents.alias("cents")))
    xd = F.col("cents") / 100.0
    terms = vals.select(
        "region", "cents",
        F.round(1e6 * xd * F.log(xd), 0).cast("long").alias("xlnx_micro"),
        F.round(1e6 * F.sqrt(xd), 0).cast("long").alias("sqrtx_micro"))
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    # cached: the 5-row moment frame feeds both the per-region indices
    # and the decomposition's global reduction
    return (terms.groupBy("region")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(dec("cents")).alias("s_cents"),
                 F.sum(dec("xlnx_micro")).alias("s_xlnx"),
                 F.sum(dec("sqrtx_micro")).alias("s_sqrtx"))
            .cache())


@query(
    "theil_atkinson_by_region",
    oracle=f"""
    WITH {_REGION_MOMENTS}
    SELECT region, CAST(n AS BIGINT) AS n_orders,
           round(CAST(s_cents AS DOUBLE) / n / 100.0, 2) AS mean_value,
           round(CAST(s_xlnx AS DOUBLE) / 1e6
                 / (n * (CAST(s_cents AS DOUBLE) / n / 100.0))
                 - ln(CAST(s_cents AS DOUBLE) / n / 100.0), 6) AS theil_t,
           round(1.0 - (CAST(s_sqrtx AS DOUBLE) / 1e6 / n)
                     * (CAST(s_sqrtx AS DOUBLE) / 1e6 / n)
                     / (CAST(s_cents AS DOUBLE) / n / 100.0), 6)
               AS atkinson_05
    FROM rm ORDER BY region
    """,
)
def theil_atkinson_by_region(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Theil T and Atkinson(0.5) inequality of order values per customer
    region. T = [Σx·lnx]/(n·μ) - ln μ (the one-pass form); A = 1 -
    ((Σ√x)/n)²/μ. Both from exact quantized moment sums.

    Scale: keyed fact join, broadcast dims, 5-group partials."""
    rm = _region_moments(spark, sf_dir)
    mu = F.col("s_cents").cast("double") / F.col("n") / 100.0
    sx = F.col("s_xlnx").cast("double") / 1e6
    sq = F.col("s_sqrtx").cast("double") / 1e6
    return (rm.select(
        "region", F.col("n").cast("long").alias("n_orders"),
        F.round(mu, 2).alias("mean_value"),
        F.round(sx / (F.col("n") * mu) - F.log(mu), 6).alias("theil_t"),
        F.round(1.0 - (sq / F.col("n")) * (sq / F.col("n")) / mu, 6)
        .alias("atkinson_05"))
        .orderBy("region"))


@query(
    "theil_decomposition",
    oracle=f"""
    WITH {_REGION_MOMENTS},
    g AS (
        SELECT sum(n) AS n, sum(s_cents) AS s_cents, sum(s_xlnx) AS s_xlnx
        FROM rm
    ),
    parts AS (
        SELECT
            CAST(g.s_xlnx AS DOUBLE) / 1e6
              / (g.n * (CAST(g.s_cents AS DOUBLE) / g.n / 100.0))
              - ln(CAST(g.s_cents AS DOUBLE) / g.n / 100.0) AS t_total,
            sum((CAST(rm.s_cents AS DOUBLE) / CAST(g.s_cents AS DOUBLE))
                * ln((CAST(rm.s_cents AS DOUBLE) / rm.n)
                     / (CAST(g.s_cents AS DOUBLE) / g.n))) AS t_between
        FROM rm, g GROUP BY g.n, g.s_cents, g.s_xlnx
    )
    SELECT round(t_total, 6) AS theil_total,
           round(t_between, 6) AS theil_between,
           round(t_total - t_between, 6) AS theil_within
    FROM parts
    """,
)
def theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between/within-region decomposition of the Theil T index:
    T_between = Σ s_g·ln(μ_g/μ) over income shares s_g = (region value
    mass)/(total value mass); T_within = T_total - T_between, which by
    Theil's additive-decomposability equals Σ s_g·T_g exactly. One row.

    Scale: derived entirely from the cached 5-region moment frame —
    the fact is scanned once across both inequality rows."""
    rm = _region_moments(spark, sf_dir)
    g = rm.agg(F.sum("n").alias("gn"),
               F.sum("s_cents").alias("gs"),
               F.sum("s_xlnx").alias("gx"))
    mu_g = F.col("gs").cast("double") / F.col("gn") / 100.0
    t_total = (F.col("gx").cast("double") / 1e6
               / (F.col("gn") * mu_g) - F.log(mu_g))
    share = F.col("s_cents").cast("double") / F.col("gs").cast("double")
    mu_r = F.col("s_cents").cast("double") / F.col("n")
    mu_all = F.col("gs").cast("double") / F.col("gn")
    parts = (rm.crossJoin(F.broadcast(g))
             .agg(F.max(t_total).alias("t_total"),
                  F.sum(share * F.log(mu_r / mu_all)).alias("t_between")))
    return parts.select(
        F.round(F.col("t_total"), 6).alias("theil_total"),
        F.round(F.col("t_between"), 6).alias("theil_between"),
        F.round(F.col("t_total") - F.col("t_between"), 6)
        .alias("theil_within"))
