"""Catalog part — inventory / supply-chain planning (STAGED for r8).

The demand-planning stack every supply-side warehouse runs on the
order book (pairs with the fulfillment family catalog_r7_ops.py and
pareto_abc_classification — together: the full ABC-XYZ planning
matrix):

- croston_forecast            Croston's method (Croston 1972) for
                              INTERMITTENT demand: separate EWMAs of
                              demand size and inter-demand interval
- safety_stock_reorder_point  classical safety stock + reorder point
                              (z·σ_d·√L + μ_d·L, service level 95%)
- eoq_order_quantity          economic order quantity (Harris 1913)
- xyz_demand_variability      XYZ classing by coefficient of demand
                              variation (the ABC-XYZ planning matrix)

Determinism: daily demand sizes and day indexes are exact integers
(quantity is integral; days are date_diffs); Croston's float64 EWMA
recursion runs in the same operation order on both engines (the
Holt-Winters recursive-CTE pattern); every moment is an exact integer
sum divided once at the end; z(95%) = 1.6449 rides as a shared
literal.

Scale: the fact stream reduces to (key, day) demand cells map-side in
one scan; Croston's fold is one applyInPandas task per part (N parts
= N tasks, state O(1)); the brand families are two-level aggregations
with a broadcast part dim — nothing wide ever forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

_ALPHA = 0.2        # Croston smoothing
_Z95 = 1.6449       # 95% service-level z (shared literal both engines)
_EPOCH = "DATE '1995-01-01'"


@query(
    "croston_forecast",
    oracle=f"""
    WITH RECURSIVE base AS (
        SELECT l_partkey AS pk,
               date_diff('day', {_EPOCH}, CAST(l_shipdate AS DATE)) + 1 AS d,
               CAST(sum(l_quantity) AS BIGINT) AS s
        FROM lineitem WHERE l_partkey <= 20 GROUP BY 1, 2
    ),
    seq AS (
        SELECT pk, count(*) AS n,
               list(s ORDER BY d) AS ss, list(d ORDER BY d) AS ds
        FROM base GROUP BY pk HAVING count(*) >= 2
    ),
    rec AS (
        SELECT pk, n, ss, ds, 1 AS i,
               CAST(ss[1] AS DOUBLE) AS z, CAST(ds[1] AS DOUBLE) AS q
        FROM seq
        UNION ALL
        SELECT pk, n, ss, ds, i + 1,
               {_ALPHA} * ss[i + 1] + {1 - _ALPHA} * z,
               {_ALPHA} * (ds[i + 1] - ds[i]) + {1 - _ALPHA} * q
        FROM rec WHERE i < n
    )
    SELECT pk AS part_key, CAST(n AS BIGINT) AS n_demand_days,
           round(z, 6) AS size_ewma, round(q, 6) AS interval_ewma,
           round(z / q, 6) AS croston_rate
    FROM rec WHERE i = n ORDER BY part_key
    """,
)
def croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand method per part (first 21 part
    keys — sparse series at every SF): demand sizes z_k (daily total
    quantity on days WITH demand) and inter-demand intervals q_k feed
    two α=0.2 EWMAs seeded at the first observation (first interval =
    days since the epoch window opened); the demand-per-day rate is
    their ratio.  Croston 1972; the standard spare-parts forecaster.

    The oracle replays the recursion as a recursive CTE in the same
    float64 operation order (the Holt-Winters-proven pattern).

    Scale: one fact scan reduced to (part, day) cells map-side; one
    applyInPandas fold per part, O(1) state, parts as the parallel
    axis."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    li = _t(spark, sf_dir, "lineitem")
    base = (li.where(F.col("l_partkey") <= 20)
            .select(F.col("l_partkey").alias("pk"),
                    (F.datediff(F.col("l_shipdate").cast("date"),
                                F.lit("1995-01-01").cast("date")) + 1)
                    .alias("d"),
                    F.col("l_quantity").cast("long").alias("q"))
            .groupBy("pk", "d").agg(F.sum("q").alias("s")))

    schema = StructType([
        StructField("part_key", LongType()),
        StructField("n_demand_days", LongType()),
        StructField("size_ewma", DoubleType()),
        StructField("interval_ewma", DoubleType()),
        StructField("croston_rate", DoubleType()),
    ])

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"part_key": pd.Series(dtype=np.int64),
                 "n_demand_days": pd.Series(dtype=np.int64),
                 "size_ewma": pd.Series(dtype=np.float64),
                 "interval_ewma": pd.Series(dtype=np.float64),
                 "croston_rate": pd.Series(dtype=np.float64)})
        ds = pdf["d"].to_numpy(dtype=np.int64)
        ss = pdf["s"].to_numpy(dtype=np.int64)
        z, q = float(ss[0]), float(ds[0])
        for k in range(1, n):
            z = _ALPHA * float(ss[k]) + (1 - _ALPHA) * z
            q = _ALPHA * float(ds[k] - ds[k - 1]) + (1 - _ALPHA) * q
        return pd.DataFrame({
            "part_key": [int(pdf["pk"].iloc[0])],
            "n_demand_days": [n],
            "size_ewma": [round(z, 6)],
            "interval_ewma": [round(q, 6)],
            "croston_rate": [round(z / q, 6)]})

    return base.groupBy("pk").applyInPandas(fold, schema).orderBy("part_key")


#: shared oracle prelude for the brand families: per-(brand, day)
#: demand cells + per-cell lead-day sums from ONE joined scan
_BRAND_CELLS = f"""
    cells AS MATERIALIZED (
        SELECT p_brand AS brand,
               date_diff('day', {_EPOCH}, CAST(l_shipdate AS DATE)) AS d,
               CAST(sum(l_quantity) AS BIGINT) AS dq,
               CAST(sum(greatest(date_diff('day', CAST(o_orderdate AS DATE),
                                           CAST(l_shipdate AS DATE)), 0))
                    AS BIGINT) AS ld_sum,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    brand AS (
        SELECT brand, count(*) AS n_days,
               sum(dq) AS sq, sum(CAST(dq AS HUGEINT) * dq) AS sq2,
               sum(ld_sum) AS ld_sum, sum(n_lines) AS n_lines
        FROM cells GROUP BY brand
    )
"""


def _brand_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the oracle's `cells`/`brand`: one lineitem scan,
    keyed join to orders (co-partitioned on the order key), broadcast
    part dim, two-level aggregation to exact per-brand moments."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    epoch = F.lit("1995-01-01").cast("date")
    joined = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .select(
                  F.col("p_brand").alias("brand"),
                  F.datediff(F.col("l_shipdate").cast("date"), epoch)
                  .alias("d"),
                  F.col("l_quantity").cast("long").alias("q"),
                  F.greatest(
                      F.datediff(F.col("l_shipdate").cast("date"),
                                 F.col("o_orderdate").cast("date")),
                      F.lit(0)).alias("ld")))
    cells = (joined.groupBy("brand", "d")
             .agg(F.sum("q").alias("dq"),
                  F.sum("ld").alias("ld_sum"),
                  F.count(F.lit(1)).alias("n_lines")))
    return (cells.groupBy("brand")
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.sum("dq").alias("sq"),
                 F.sum(F.col("dq").cast("decimal(38,0)") * F.col("dq"))
                 .alias("sq2"),
                 F.sum("ld_sum").alias("ld_sum"),
                 F.sum("n_lines").alias("n_lines")))


#: shared closed forms (identical operation tree both engines)
_MU = "CAST(sq AS DOUBLE) / n_days"
_SIGMA = ("sqrt((CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n_days)"
          " / (n_days - 1))")
_LEAD = "CAST(ld_sum AS DOUBLE) / n_lines"


@query(
    "safety_stock_reorder_point",
    oracle=f"""
    WITH {_BRAND_CELLS}
    SELECT brand, CAST(n_days AS BIGINT) AS n_days,
           round({_MU}, 6) AS mu_daily,
           round({_SIGMA}, 6) AS sigma_daily,
           round({_LEAD}, 6) AS lead_days,
           round({_Z95} * {_SIGMA} * sqrt({_LEAD}), 4) AS safety_stock,
           round({_MU} * {_LEAD}
                 + {_Z95} * {_SIGMA} * sqrt({_LEAD}), 4) AS reorder_point
    FROM brand ORDER BY brand
    """,
)
def safety_stock_reorder_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical continuous-review (s, Q) policy inputs per brand:
    safety stock SS = z·σ_d·√L̄ at 95% service and reorder point
    ROP = μ_d·L̄ + SS, where μ_d/σ_d are daily-demand moments over
    observed demand days and L̄ is the mean order→ship lead time with
    early ships clamped to zero lead (the synthetic order book ships
    ~half its lines before the order date; negative lead is physically
    meaningless for stock cover).

    Scale: exact integer moments from a two-level aggregation; the
    lead-time sum shares the same (brand, day) cell pass."""
    b = _brand_cells(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mu = d("sq") / F.col("n_days")
    sigma = F.sqrt((d("sq2") - d("sq") * F.col("sq") / F.col("n_days"))
                   / (F.col("n_days") - 1))
    lead = d("ld_sum") / F.col("n_lines")
    return b.select(
        "brand", F.col("n_days").cast("long").alias("n_days"),
        F.round(mu, 6).alias("mu_daily"),
        F.round(sigma, 6).alias("sigma_daily"),
        F.round(lead, 6).alias("lead_days"),
        F.round(_Z95 * sigma * F.sqrt(lead), 4).alias("safety_stock"),
        F.round(mu * lead + _Z95 * sigma * F.sqrt(lead), 4)
        .alias("reorder_point")).orderBy("brand")


@query(
    "eoq_order_quantity",
    oracle=f"""
    WITH per_brand AS MATERIALIZED (
        SELECT p_brand AS brand,
               CAST(sum(l_quantity) AS BIGINT) AS tot_q,
               CAST(sum(round(l_extendedprice * 100)) AS HUGEINT) AS price_c
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    ),
    span AS (
        SELECT date_diff('day', min(CAST(l_shipdate AS DATE)),
                         max(CAST(l_shipdate AS DATE))) + 1 AS span_days
        FROM lineitem
    )
    SELECT brand,
           round(CAST(tot_q AS DOUBLE) * 365.0 / span_days, 6)
               AS annual_demand,
           round(0.2 * (CAST(price_c AS DOUBLE) / 100.0 / tot_q), 6)
               AS holding_cost,
           round(sqrt(2.0 * (CAST(tot_q AS DOUBLE) * 365.0 / span_days)
                      * 100.0
                      / (0.2 * (CAST(price_c AS DOUBLE) / 100.0 / tot_q))),
                 4) AS eoq
    FROM per_brand, span ORDER BY brand
    """,
)
def eoq_order_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per brand (Harris 1913):
    EOQ = √(2·D·S/H) with annualized demand D from the observed ship
    span, ordering cost S = 100 (shared literal) and holding cost
    H = 20% of the brand's average unit price (exact cent sums).

    Scale: one fact scan per leg — the brand rollup and the 1-row
    global span, broadcast back; all-integer sufficient statistics."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
                 .groupBy(F.col("p_brand").alias("brand"))
                 .agg(F.sum(F.col("l_quantity").cast("long")).alias("tot_q"),
                      F.sum(F.round(F.col("l_extendedprice") * 100)
                            .cast("long")).alias("price_c")))
    span = li.agg(
        (F.datediff(F.max(F.col("l_shipdate").cast("date")),
                    F.min(F.col("l_shipdate").cast("date"))) + 1)
        .alias("span_days"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    dem = d("tot_q") * 365.0 / F.col("span_days")
    hold = 0.2 * (d("price_c") / 100.0 / F.col("tot_q"))
    return (per_brand.crossJoin(F.broadcast(span))
            .select("brand",
                    F.round(dem, 6).alias("annual_demand"),
                    F.round(hold, 6).alias("holding_cost"),
                    F.round(F.sqrt(2.0 * dem * 100.0 / hold), 4)
                    .alias("eoq"))
            .orderBy("brand"))


@query(
    "xyz_demand_variability",
    oracle=f"""
    WITH {_BRAND_CELLS}
    SELECT brand,
           round({_SIGMA} / ({_MU}), 6) AS demand_cv,
           CASE WHEN {_SIGMA} / ({_MU}) < 0.5 THEN 'X'
                WHEN {_SIGMA} / ({_MU}) < 1.0 THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM brand ORDER BY brand
    """,
)
def xyz_demand_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ classification by coefficient of daily-demand variation:
    X (CV < 0.5, steady), Y (CV < 1, variable), Z (CV >= 1, erratic) —
    the variability axis of the ABC-XYZ planning matrix (ABC =
    pareto_abc_classification, catalog_concentration.py).

    Scale: reuses the exact per-brand moments of the cell pass."""
    b = _brand_cells(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mu = d("sq") / F.col("n_days")
    sigma = F.sqrt((d("sq2") - d("sq") * F.col("sq") / F.col("n_days"))
                   / (F.col("n_days") - 1))
    cv = sigma / mu
    return b.select(
        "brand", F.round(cv, 6).alias("demand_cv"),
        F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z")
        .alias("xyz_class")).orderBy("brand")
