"""Catalog part — spatial autocorrelation over the geo hierarchy (STAGED
r10).

The relational star's region->nation hierarchy is a contiguity graph:
two nations are neighbors iff they share a region. That makes the
classic spatial-autocorrelation statistics computable over per-nation
aggregates — "do neighboring markets carry similar customer wealth?" —
a question the reference's OLAP dashboards pose over geography dims and
no existing family answers:

- morans_i_nation_balance  global Moran's I (Moran 1950) AND Geary's C
                           (Geary 1954) of mean customer account
                           balance over the same-region binary weight
                           matrix — the two canonical global statistics
                           (I: covariance form; C: squared-difference
                           form), one row
- local_moran_nation       Anselin (1995) LISA decomposition: each
                           nation's local Moran term
                           I_i = (d_i/m2)·Σ_{j~i} d_j with its neighbor
                           count — the per-site drill-down of the
                           global I (which equals sum(I_i)·.../S0)

Both exploit the block structure of same-region weights: Σ_{i≠j∈R} d_i
d_j = (Σ_R d_i)² - Σ_R d_i², and Σ_{i≠j∈R}(x_i-x_j)² = 2(n_R·Σ_R x² -
(Σ_R x)²) — so NO pairwise join exists anywhere; everything is two
aggregation levels (nation, then region), exactly how a 100 TB fact
would roll up before the O(|nations|) statistic.

Determinism: per-nation means come from exact integer cents sums over
exact bigint counts (one double division); the region/global reductions
run over ≤25 such doubles and every output rounds to 6 dp, far above
double-sum order noise.

Scale: one customer scan -> 25-nation aggregate; everything after is
constant-size. The nation->region map rides a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

#: per-nation mean balance (exact cents / exact count) + its region key
_NATION_X = """
    nx AS (
        SELECT n.n_nationkey AS nationkey, n.n_name AS nation,
               n.n_regionkey AS regionkey,
               CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                 / count(*) / 100.0 AS x
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2, 3
    ),
    g AS (
        SELECT avg(x) AS xbar, count(*) AS n,
               sum(x * x) - count(*) * avg(x) * avg(x) AS m2abs
        FROM nx
    ),
    d AS (
        SELECT nx.nationkey, nx.nation, nx.regionkey, nx.x,
               nx.x - g.xbar AS dev FROM nx, g
    ),
    reg AS (
        SELECT regionkey, count(*) AS nr,
               sum(dev) AS sd, sum(dev * dev) AS sdd,
               sum(x) AS sx, sum(x * x) AS sxx
        FROM d GROUP BY regionkey
    )"""


def _nation_x(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    # cached: the 25-row nation frame feeds the global-moment, deviation
    # and region branches — one customer scan, not three (plan audit)
    return (cust.join(F.broadcast(nat),
                      cust.c_nationkey == nat.n_nationkey)
            .groupBy(F.col("n_nationkey").alias("nationkey"),
                     F.col("n_name").alias("nation"),
                     F.col("n_regionkey").alias("regionkey"))
            .agg((F.sum(cents).cast("double") / F.count(F.lit(1)) / 100.0)
                 .alias("x"))
            .cache())


@query(
    "morans_i_nation_balance",
    oracle=f"""
    WITH {_NATION_X},
    agg AS (
        SELECT sum(nr * (nr - 1)) AS s0,
               sum(sd * sd - sdd) AS cross_sum,
               sum(2 * (nr * sxx - sx * sx)) AS sqdiff_sum
        FROM reg
    )
    SELECT CAST(g.n AS BIGINT) AS n_nations,
           CAST(agg.s0 AS BIGINT) AS s0,
           round((g.n / agg.s0) * agg.cross_sum / g.m2abs, 6) AS moran_i,
           round(((g.n - 1) / (2.0 * agg.s0)) * agg.sqdiff_sum / g.m2abs, 6)
               AS geary_c
    FROM agg, g
    """,
)
def morans_i_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I and Geary's C of per-nation mean customer
    balance under same-region binary contiguity weights. Random-pattern
    expectation is I ≈ -1/(n-1), C ≈ 1; I > E[I] / C < 1 marks positive
    spatial autocorrelation. The same-region block identity reduces both
    numerators to region-level sums — no pairwise join.

    Scale: customer scan -> 25-row aggregate -> 5-region reduction."""
    nx = _nation_x(spark, sf_dir)
    g = nx.agg(F.avg("x").alias("xbar"),
               F.count(F.lit(1)).alias("n"),
               (F.sum(F.col("x") * F.col("x"))
                - F.count(F.lit(1)) * F.avg("x") * F.avg("x"))
               .alias("m2abs"))
    d = nx.crossJoin(F.broadcast(g)).withColumn(
        "dev", F.col("x") - F.col("xbar"))
    reg = d.groupBy("regionkey").agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum("dev").alias("sd"),
        F.sum(F.col("dev") * F.col("dev")).alias("sdd"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    agg = reg.agg(
        F.sum(F.col("nr") * (F.col("nr") - 1)).alias("s0"),
        F.sum(F.col("sd") * F.col("sd") - F.col("sdd")).alias("cross_sum"),
        F.sum(2 * (F.col("nr") * F.col("sxx") - F.col("sx") * F.col("sx")))
        .alias("sqdiff_sum"))
    return (agg.crossJoin(F.broadcast(g))
            .select(F.col("n").cast("long").alias("n_nations"),
                    F.col("s0").cast("long").alias("s0"),
                    F.round((F.col("n") / F.col("s0")) * F.col("cross_sum")
                            / F.col("m2abs"), 6).alias("moran_i"),
                    F.round(((F.col("n") - 1) / (2.0 * F.col("s0")))
                            * F.col("sqdiff_sum") / F.col("m2abs"), 6)
                    .alias("geary_c")))


@query(
    "local_moran_nation",
    oracle=f"""
    WITH {_NATION_X}
    SELECT d.nation,
           CAST(reg.nr - 1 AS BIGINT) AS n_neighbors,
           round(d.dev * (reg.sd - d.dev) / (g.m2abs / g.n), 6)
               AS local_i
    FROM d JOIN reg ON reg.regionkey = d.regionkey, g
    ORDER BY d.nation
    """,
)
def local_moran_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anselin (1995) local Moran I_i per nation: (d_i/m2)·Σ_{j~i} d_j,
    where the neighbor deviation sum over the same-region block is just
    (region sum - own deviation), and m2 = Σd²/n. Positive local_i =
    the nation sits in a high-high or low-low wealth cluster; negative
    = a spatial outlier against its region.

    Scale: the LISA terms reuse the region-level reduction — still no
    pairwise join; output is |nations| rows."""
    nx = _nation_x(spark, sf_dir)
    g = nx.agg(F.avg("x").alias("xbar"),
               F.count(F.lit(1)).alias("n"),
               (F.sum(F.col("x") * F.col("x"))
                - F.count(F.lit(1)) * F.avg("x") * F.avg("x"))
               .alias("m2abs"))
    d = nx.crossJoin(F.broadcast(g)).withColumn(
        "dev", F.col("x") - F.col("xbar"))
    reg = d.groupBy("regionkey").agg(
        F.count(F.lit(1)).alias("nr"), F.sum("dev").alias("sd"))
    return (d.join(F.broadcast(reg), "regionkey")
            .select("nation",
                    (F.col("nr") - 1).cast("long").alias("n_neighbors"),
                    F.round(F.col("dev") * (F.col("sd") - F.col("dev"))
                            / (F.col("m2abs") / F.col("n")), 6)
                    .alias("local_i"))
            .orderBy("nation"))
