"""Catalog part — cluster validity indices (STAGED r10).

The engine ships k-means (operators/kmeans.py, the IVF quantizer) and
segment profiles (rfm_segments, value_decile_profile) but no measure of
HOW GOOD a grouping is. These rows score the market-segment partition of
customers in a 2-feature space (account balance, order count) with the
two classic internal validity indices — the numbers an analyst checks
before trusting any clustering:

- calinski_harabasz_segments  CH / variance-ratio criterion (Calinski &
                              Harabasz 1974): (B/(k-1))/(W/(n-k)) over
                              z-scored features — higher = tighter,
                              better-separated clusters
- davies_bouldin_segments     per-cluster Davies-Bouldin (1979)
                              component: scatter S_i = RMS distance to
                              centroid and DB_i = max_j (S_i+S_j)/M_ij
                              over the 5x5 centroid-distance matrix —
                              the global DB index is avg(DB_i)

Determinism: features are exact integers (balance cents, order counts);
all per-cluster first/second moments are exact bigint sums; z-scoring
uses population moments derived from those sums, so the within/between
decompositions are identical double expressions on both engines, rounded
6 dp.

Scale: one customer scan + one orders scan joined ON THE CUSTOMER KEY
(co-partitioned equi-join), reduced to k=5 cluster moment rows; the
centroid-pair "join" is 5x5 on a broadcast frame. Nothing pairwise ever
touches point-level data — this is the moment-sketch design that holds
at any fact size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

#: per-customer integer features + global z-moments + per-cluster moments
_CLUSTER_MOMENTS = """
    pts AS (
        SELECT c.c_mktsegment AS seg,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS f1,
               coalesce(o.n, 0) AS f2
        FROM customer c LEFT JOIN (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY o_custkey) o
          ON o.o_custkey = c.c_custkey
    ),
    g AS (
        SELECT count(*) AS n,
               CAST(sum(f1) AS DOUBLE) / count(*) AS mu1,
               sqrt((CAST(sum(f1 * f1) AS DOUBLE) * count(*)
                     - CAST(sum(f1) AS DOUBLE) * sum(f1))
                    / (CAST(count(*) AS DOUBLE) * count(*))) AS sd1,
               CAST(sum(f2) AS DOUBLE) / count(*) AS mu2,
               sqrt((CAST(sum(f2 * f2) AS DOUBLE) * count(*)
                     - CAST(sum(f2) AS DOUBLE) * sum(f2))
                    / (CAST(count(*) AS DOUBLE) * count(*))) AS sd2
        FROM pts
    ),
    cm AS (
        SELECT seg, count(*) AS nc,
               sum(f1) AS s1, sum(f1 * f1) AS q1,
               sum(f2) AS s2, sum(f2 * f2) AS q2
        FROM pts GROUP BY seg
    ),
    z AS (
        -- per-cluster z-space centroid and within-cluster sum of squares,
        -- from exact integer moments: mean_z = (S/n - mu)/sd,
        -- sum z^2 = (Q - 2 mu S + n mu^2)/sd^2, W_dim = sum z^2 - n mean_z^2
        SELECT seg, nc,
               (CAST(s1 AS DOUBLE) / nc - mu1) / sd1 AS c1,
               (CAST(s2 AS DOUBLE) / nc - mu2) / sd2 AS c2,
               (CAST(q1 AS DOUBLE) - 2 * mu1 * s1 + nc * mu1 * mu1)
                 / (sd1 * sd1)
                 - nc * ((CAST(s1 AS DOUBLE) / nc - mu1) / sd1)
                      * ((CAST(s1 AS DOUBLE) / nc - mu1) / sd1)
               + (CAST(q2 AS DOUBLE) - 2 * mu2 * s2 + nc * mu2 * mu2)
                 / (sd2 * sd2)
                 - nc * ((CAST(s2 AS DOUBLE) / nc - mu2) / sd2)
                      * ((CAST(s2 AS DOUBLE) / nc - mu2) / sd2) AS w
        FROM cm, g
    )"""


def _cluster_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seg, nc, c1, c2, w): z-space centroid + within-SS per segment."""
    cust = _t(spark, sf_dir, "customer")
    ords = (_t(spark, sf_dir, "orders")
            .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))
    pts = (cust.join(ords, cust.c_custkey == ords.o_custkey, "left")
           .select(F.col("c_mktsegment").alias("seg"),
                   F.round(F.col("c_acctbal") * 100, 0).cast("long")
                   .alias("f1"),
                   F.coalesce(F.col("n"), F.lit(0)).cast("long")
                   .alias("f2")))

    def moments(col):
        c = F.col(col).cast("decimal(38,0)")
        return [F.sum(c).alias(f"s_{col}"),
                F.sum(c * F.col(col)).alias(f"q_{col}")]

    # cached: cm feeds both the derived global moments and the z frame
    cm = pts.groupBy("seg").agg(
        F.count(F.lit(1)).alias("nc"), *moments("f1"),
        *moments("f2")).cache()

    # global moments DERIVE from the k=5 cluster moments (integer sums
    # are associative-exact), so the points frame is scanned exactly once
    def gstats(col, n):
        s = F.sum(F.col(f"s_{col}")).cast("double")
        q = F.sum(F.col(f"q_{col}")).cast("double")
        return [(s / n).alias(f"mu_{col}"),
                F.sqrt((q * n - s * s) / (n.cast("double") * n))
                .alias(f"sd_{col}")]

    n = F.sum("nc")
    g = cm.agg(n.cast("long").alias("n"),
               *[e for col in ("f1", "f2") for e in gstats(col, n)])

    def zparts(col):
        s = F.col(f"s_{col}").cast("double")
        q = F.col(f"q_{col}").cast("double")
        mu, sd = F.col(f"mu_{col}"), F.col(f"sd_{col}")
        mean_z = (s / F.col("nc") - mu) / sd
        wdim = ((q - 2 * mu * s + F.col("nc") * mu * mu) / (sd * sd)
                - F.col("nc") * mean_z * mean_z)
        return mean_z, wdim

    c1, w1 = zparts("f1")
    c2, w2 = zparts("f2")
    # cached: the k=5 moment frame feeds the CH scalar and BOTH legs of
    # the DB centroid self-join — one (customer ⋈ orders) pass, not three
    return (cm.crossJoin(F.broadcast(g))
            .select("seg", "nc", c1.alias("c1"), c2.alias("c2"),
                    (w1 + w2).alias("w"),
                    F.col("n").alias("n_total"))
            .cache())


@query(
    "calinski_harabasz_segments",
    oracle=f"""
    WITH {_CLUSTER_MOMENTS}
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(max(g.n) AS BIGINT) AS n_points,
           round(sum(nc * (c1 * c1 + c2 * c2)), 6) AS between_ss,
           round(sum(w), 6) AS within_ss,
           round((sum(nc * (c1 * c1 + c2 * c2)) / (count(*) - 1))
                 / (sum(w) / (max(g.n) - count(*))), 6) AS ch_index
    FROM z, g
    """,
)
def calinski_harabasz_segments(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Calinski-Harabasz variance-ratio of the market-segment partition
    over z-scored (balance, order count): between-SS exploits that the
    global z-mean is exactly 0, so B = Σ nc·||centroid||². One row.

    Scale: two keyed scans -> k=5 moment rows -> scalar."""
    z = _cluster_moments(spark, sf_dir)
    b = F.sum(F.col("nc") * (F.col("c1") * F.col("c1")
                             + F.col("c2") * F.col("c2")))
    w = F.sum("w")
    k = F.count(F.lit(1))
    n = F.max("n_total")
    return z.agg(
        k.cast("long").alias("k"),
        n.cast("long").alias("n_points"),
        F.round(b, 6).alias("between_ss"),
        F.round(w, 6).alias("within_ss"),
        F.round((b / (k - 1)) / (w / (n - k)), 6).alias("ch_index"))


@query(
    "davies_bouldin_segments",
    oracle=f"""
    WITH {_CLUSTER_MOMENTS}
    SELECT a.seg, CAST(a.nc AS BIGINT) AS n_points,
           round(sqrt(a.w / a.nc), 6) AS scatter,
           round(max((sqrt(a.w / a.nc) + sqrt(b.w / b.nc))
                     / sqrt((a.c1 - b.c1) * (a.c1 - b.c1)
                            + (a.c2 - b.c2) * (a.c2 - b.c2))), 6)
               AS db_component
    FROM z a JOIN z b ON a.seg <> b.seg
    GROUP BY a.seg, a.nc, a.w ORDER BY a.seg
    """,
)
def davies_bouldin_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Davies-Bouldin component: scatter S_i = sqrt(W_i/n_i)
    and DB_i = max over other segments of (S_i+S_j)/||centroid_i -
    centroid_j|| in z-space; the global DB index is the mean of
    db_component. One row per segment — the drill-down view.

    Scale: the pairwise leg is a 5x5 self-join on the broadcast moment
    frame; point data is never joined pairwise."""
    z = _cluster_moments(spark, sf_dir)
    a, b = z.alias("a"), z.alias("b")
    dist = F.sqrt(
        (F.col("a.c1") - F.col("b.c1")) * (F.col("a.c1") - F.col("b.c1"))
        + (F.col("a.c2") - F.col("b.c2"))
        * (F.col("a.c2") - F.col("b.c2")))
    ratio = ((F.sqrt(F.col("a.w") / F.col("a.nc"))
              + F.sqrt(F.col("b.w") / F.col("b.nc"))) / dist)
    return (a.join(F.broadcast(b), F.col("a.seg") != F.col("b.seg"))
            .groupBy(F.col("a.seg").alias("seg"),
                     F.col("a.nc").alias("nc"), F.col("a.w").alias("w"))
            .agg(F.round(F.max(ratio), 6).alias("db_component"))
            .select("seg", F.col("nc").cast("long").alias("n_points"),
                    F.round(F.sqrt(F.col("w") / F.col("nc")), 6)
                    .alias("scatter"),
                    "db_component")
            .orderBy("seg"))
