"""Catalog part — revenue-concentration analytics (round 6, session 2).

The reference's OLAP layer (sql/olap_star_schema.sql metric rollups;
app_config.json portfolio summaries) reports revenue by dimension; the
concentration family answers the follow-up every analyst asks next:
HOW concentrated is that revenue?

- gini_revenue_concentration  Gini coefficient of customer revenue per
                              market segment (Gini 1912; the sorted
                              closed form of Sen 1973)
- lorenz_curve_deciles        cumulative revenue share by customer
                              decile (the Lorenz 1905 curve the Gini
                              integrates)
- pareto_abc_classification   A/B/C classes of parts by cumulative
                              revenue share (80/95 cut points; the
                              inventory-management Pareto analysis)
- hhi_market_concentration    Herfindahl-Hirschman index of nation
                              market shares within each region (the
                              antitrust concentration screen)

Determinism: every revenue is an EXACT integer-cent sum; ranks are
row_number over (revenue, key) so ties are totally ordered; decile and
class assignment are pure integer arithmetic ((rn-1)*10 DIV n; cum*5
<= tot*4); squared-cents sums ride DECIMAL(38,0) / HUGEINT so nothing
overflows or rounds before the single final double division, which
both engines evaluate over identical exact operands.

Scale: ranking windows partition on the segment/brand/region key —
the sort is per-group, never global; dims (part, nation, region) are
broadcast; at 100 TB the heavy side stays a linear scan + one shuffle
onto the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_OCENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
_LCENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"


def _cust_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer revenue in exact integer cents, with segment."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (orders.groupBy("o_custkey")
            .agg(F.sum("cents").alias("rev"))
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_custkey", "c_mktsegment", "rev"))


@query(
    "gini_revenue_concentration",
    oracle=f"""
    WITH rev AS (
        SELECT c_custkey, c_mktsegment, sum({_OCENTS}) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    ),
    ranked AS (
        SELECT c_mktsegment, rev,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY rev, c_custkey) AS rn
        FROM rev
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(rev) AS DOUBLE) / 100, 2) AS total_revenue,
           round((2.0 * CAST(sum(CAST(rn AS HUGEINT) * rev) AS DOUBLE)
                  - (count(*) + 1.0) * CAST(sum(rev) AS DOUBLE))
                 / (count(*) * CAST(sum(rev) AS DOUBLE)), 6) AS gini
    FROM ranked GROUP BY c_mktsegment
    """,
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue within each market segment:
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending-rank
    revenues (Sen 1973 closed form).  0 = perfectly equal accounts,
    ->1 = one whale holds the book (reference OLAP rollups report the
    totals; this reports how skewed they are).

    Scale: rank window partitions BY SEGMENT (per-group sort, no global
    ordering); i*x_i products are summed in DECIMAL(38,0) so the rank-
    weighted sum cannot overflow at any SF; ties (equal revenue) are
    totally ordered by custkey, and the Gini sum is tie-order invariant
    because equal x contribute identically to sum(i*x)."""
    ranked = _cust_rev(spark, sf_dir).withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("c_mktsegment").orderBy("rev", "c_custkey")))
    n = F.count(F.lit(1))
    s = F.sum("rev").cast("decimal(38,0)").cast("double")
    ws = F.sum((F.col("rn") * F.col("rev")).cast("decimal(38,0)")) \
        .cast("double")
    return (ranked.groupBy("c_mktsegment")
            .agg(n.cast("long").alias("n_customers"),
                 F.round(s / 100, 2).alias("total_revenue"),
                 F.round((2.0 * ws - (n + F.lit(1.0)) * s) / (n * s), 6)
                 .alias("gini")))


@query(
    "lorenz_curve_deciles",
    oracle=f"""
    WITH rev AS (
        SELECT c_custkey, c_mktsegment, sum({_OCENTS}) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    ),
    ranked AS (
        SELECT c_mktsegment, rev,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY rev, c_custkey) AS rn,
               count(*) OVER (PARTITION BY c_mktsegment) AS n
        FROM rev
    ),
    deciles AS (
        SELECT c_mktsegment,
               CAST(1 + ((rn - 1) * 10) // n AS BIGINT) AS decile,
               count(*) AS n_customers, sum(rev) AS dec_rev
        FROM ranked GROUP BY c_mktsegment, CAST(1 + ((rn - 1) * 10) // n AS BIGINT)
    )
    SELECT c_mktsegment, decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           round(CAST(dec_rev AS DOUBLE) / 100, 2) AS decile_revenue,
           round(CAST(sum(dec_rev) OVER (PARTITION BY c_mktsegment
                                         ORDER BY decile) AS DOUBLE)
                 / CAST(sum(dec_rev) OVER (PARTITION BY c_mktsegment)
                        AS DOUBLE), 6) AS cum_share
    FROM deciles
    """,
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve sampled at customer deciles: customers ranked by
    revenue ascending within segment, binned into 10 equal-count tiles
    by pure integer arithmetic (1 + (rn-1)*10 DIV n — NOT ntile(), so
    the bucket split is the same formula in both engines), with each
    decile's revenue and the running cumulative share.

    Scale: the rank window is per-segment; after the decile reduction
    the running-share window sees 10 rows per segment — negligible.
    Everything is integer cents until the two final display divisions."""
    w = Window.partitionBy("c_mktsegment")
    ranked = (_cust_rev(spark, sf_dir)
              .withColumn("rn", F.row_number().over(
                  w.orderBy("rev", "c_custkey")))
              .withColumn("n", F.count(F.lit(1)).over(w)))
    dec = (ranked
           .withColumn("decile", F.expr(
               "CAST(1 + ((rn - 1) * 10) DIV n AS BIGINT)"))
           .groupBy("c_mktsegment", "decile")
           .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                F.sum("rev").alias("dec_rev")))
    wcum = w.orderBy("decile").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    return dec.select(
        "c_mktsegment", "decile", "n_customers",
        F.round(F.col("dec_rev").cast("double") / 100, 2)
        .alias("decile_revenue"),
        F.round(F.sum("dec_rev").over(wcum).cast("double")
                / F.sum("dec_rev").over(w).cast("double"), 6)
        .alias("cum_share"))


@query(
    "pareto_abc_classification",
    oracle=f"""
    WITH rev AS (
        SELECT p_brand, l_partkey, sum({_LCENTS}) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, l_partkey
    ),
    ranked AS (
        SELECT p_brand, l_partkey, rev,
               sum(rev) OVER (PARTITION BY p_brand
                              ORDER BY rev DESC, l_partkey) AS cum,
               sum(rev) OVER (PARTITION BY p_brand) AS tot
        FROM rev
    ),
    classed AS (
        SELECT p_brand, rev,
               CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                    WHEN cum * 20 <= tot * 19 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    )
    SELECT p_brand, abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(sum(rev) AS DOUBLE) / 100, 2) AS class_revenue
    FROM classed GROUP BY p_brand, abc_class
    """,
)
def pareto_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory analysis: parts ranked by revenue descending within
    brand; class A = parts up to 80% of cumulative brand revenue, B to
    95%, C the tail (the standard Pareto cut points).  Class membership
    compares exact integer cents (cum*5 <= tot*4, cum*20 <= tot*19) —
    no float threshold can flip a part's class between engines.

    Scale: part dim broadcasts into the lineitem join; the rank window
    partitions by brand (per-brand sort over its own parts only)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        .alias("cents"))
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
           .groupBy("p_brand", "l_partkey")
           .agg(F.sum("cents").alias("rev")))
    w = Window.partitionBy("p_brand")
    ranked = (rev
              .withColumn("cum", F.sum("rev").over(
                  w.orderBy(F.desc("rev"), "l_partkey")
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
              .withColumn("tot", F.sum("rev").over(w)))
    classed = ranked.withColumn(
        "abc_class",
        F.when(F.col("cum") * 5 <= F.col("tot") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
        .otherwise("C"))
    return (classed.groupBy("p_brand", "abc_class")
            .agg(F.count(F.lit(1)).cast("long").alias("n_parts"),
                 F.round(F.sum("rev").cast("double") / 100, 2)
                 .alias("class_revenue")))


@query(
    "hhi_market_concentration",
    oracle=f"""
    WITH nat AS (
        SELECT r_name, n_name, sum({_OCENTS}) AS c
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    )
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           round(CAST(sum(c) AS DOUBLE) / 100, 2) AS total_revenue,
           round(10000.0 * CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
                 / CAST(sum(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4)
               AS hhi
    FROM nat GROUP BY r_name
    """,
)
def hhi_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of nation market shares within each
    region: HHI = 10000 * sum(share_i^2), share_i = nation revenue /
    region revenue (the antitrust screen; 10000/n_nations = perfectly
    even, 10000 = monopoly).  Squared-cents sums ride DECIMAL(38,0) /
    HUGEINT — nation-revenue-squared exceeds int64 already at sf0.1 —
    and the one double division happens on exact operands at the end.

    Scale: nation + region dims broadcast; one shuffle reduces orders
    to ~25 nation rows per region before any squaring."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    reg = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cust_dim = (cust.join(F.broadcast(nat),
                          cust.c_nationkey == nat.n_nationkey)
                .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
                .select("c_custkey", "n_name", "r_name"))
    per_nation = (orders
                  .join(cust_dim, orders.o_custkey == cust_dim.c_custkey)
                  .groupBy("r_name", "n_name")
                  .agg(F.sum("cents").alias("c")))
    t = F.sum("c").cast("decimal(38,0)").cast("double")
    s2 = F.sum((F.col("c").cast("decimal(38,0)")
                * F.col("c").cast("decimal(38,0)")).cast("decimal(38,0)")) \
        .cast("double")
    return (per_nation.groupBy("r_name")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nations"),
                 F.round(t / 100, 2).alias("total_revenue"),
                 F.round(F.lit(10000.0) * s2 / t / t, 4).alias("hhi")))
