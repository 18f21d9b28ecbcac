"""Catalog part — clustering tendency (STAGED r10).

Before trusting ANY clustering (or its validity indices,
catalog_r15_clusterval), the screening question is whether the data has
cluster structure AT ALL — uniform noise happily yields k-means
centroids and plausible-looking CH scores. The Hopkins statistic
(Hopkins & Skellam 1954; the form in Banerjee & Davé 2004) answers it:

- hopkins_statistic   H = Σu / (Σu + Σw) where u_i = nearest-neighbor
                      distance from m synthetic UNIFORM probes to the
                      data and w_i = NN distance from m sampled REAL
                      points to the rest of the data. H ≈ 0.5 for
                      spatial randomness, → 1 for clustered data,
                      → 0 for regular/grid-like data. One row.
- nn_distance_sample  the m real probes with their NN distances — the
                      distance-scale drill-down (and the brute-force
                      NN leg reused as an inspectable result).

Probes are DETERMINISTIC, not RNG: real probes are the m=40 customers
with the lowest md5(custkey) (the established md5-sample idiom);
uniform probes take md5-derived integers mod the feature bounding box.
Feature space is the integer (balance cents, order count) plane —
distances are exact integer squared sums, so every argmin is exact and
the only doubles are the final square roots, rounded 6 dp.

Scale: this is the knn_cosine_bruteforce design — the 80 probes
broadcast and the point set streams ONCE through a keyed-free
broadcast join (O(80·n) map-side work, no shuffle of the fact);
everything after is an 80-row reduce. The customer⋈orders feature join
is co-partitioned on the customer key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_M = 40  # probes per leg

#: integer feature points + md5-sampled real probes + uniform probes
_HOPKINS_BASE = f"""
    pts AS (
        SELECT c.c_custkey AS custkey,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS f1,
               coalesce(o.n, 0) AS f2
        FROM customer c LEFT JOIN (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY o_custkey) o
          ON o.o_custkey = c.c_custkey
    ),
    bbox AS (
        SELECT min(f1) AS lo1, max(f1) AS hi1,
               min(f2) AS lo2, max(f2) AS hi2
        FROM pts
    ),
    real_probes AS (
        SELECT custkey, f1, f2 FROM pts
        ORDER BY md5(CAST(custkey AS VARCHAR)) LIMIT {_M}
    ),
    uniform_probes AS (
        SELECT i,
               lo1 + CAST(('0x' || substr(md5('u1-' || CAST(i AS VARCHAR)),
                                          1, 12)) AS BIGINT)
                     % (hi1 - lo1 + 1) AS f1,
               lo2 + CAST(('0x' || substr(md5('u2-' || CAST(i AS VARCHAR)),
                                          1, 12)) AS BIGINT)
                     % (hi2 - lo2 + 1) AS f2
        FROM range(1, {_M} + 1) t(i), bbox
    ),
    u_nn AS (
        SELECT u.i,
               min((u.f1 - p.f1) * (u.f1 - p.f1)
                   + (u.f2 - p.f2) * (u.f2 - p.f2)) AS sq
        FROM uniform_probes u, pts p GROUP BY u.i
    ),
    w_nn AS (
        SELECT r.custkey,
               min((r.f1 - p.f1) * (r.f1 - p.f1)
                   + (r.f2 - p.f2) * (r.f2 - p.f2)) AS sq
        FROM real_probes r JOIN pts p ON p.custkey <> r.custkey
        GROUP BY r.custkey
    )"""


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    ords = (_t(spark, sf_dir, "orders")
            .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))
    return (cust.join(ords, cust.c_custkey == ords.o_custkey, "left")
            .select(F.col("c_custkey").alias("custkey"),
                    F.round(F.col("c_acctbal") * 100, 0).cast("long")
                    .alias("f1"),
                    F.coalesce(F.col("n"), F.lit(0)).cast("long")
                    .alias("f2")))


def _real_probes(pts: DataFrame) -> DataFrame:
    return (pts.orderBy(F.md5(F.col("custkey").cast("string")))
            .limit(_M))


def _uniform_probes(spark: SparkSession, pts: DataFrame) -> DataFrame:
    bbox = pts.agg(F.min("f1").alias("lo1"), F.max("f1").alias("hi1"),
                   F.min("f2").alias("lo2"), F.max("f2").alias("hi2"))
    i = F.col("id").cast("int").alias("i")

    def coord(tag, lo, hi):
        h = F.conv(F.substring(
            F.md5(F.concat(F.lit(f"u{tag}-"), F.col("id").cast("string"))),
            1, 12), 16, 10).cast("long")
        return (F.col(lo) + h % (F.col(hi) - F.col(lo) + 1)).alias(f"f{tag}")

    return (spark.range(1, _M + 1)
            .crossJoin(F.broadcast(bbox))
            .select(i, coord(1, "lo1", "hi1"), coord(2, "lo2", "hi2")))


def _nn(probes: DataFrame, pts: DataFrame, key: str,
        exclude_self: bool) -> DataFrame:
    """min squared distance from each probe to the point set — probes
    broadcast, points streamed once."""
    p = probes.select(F.col(key).alias("pk"), F.col("f1").alias("a1"),
                      F.col("f2").alias("a2"))
    cond = (F.col("custkey") != F.col("pk")) if exclude_self else F.lit(True)
    sq = ((F.col("a1") - F.col("f1")) * (F.col("a1") - F.col("f1"))
          + (F.col("a2") - F.col("f2")) * (F.col("a2") - F.col("f2")))
    return (pts.join(F.broadcast(p), cond)
            .groupBy("pk").agg(F.min(sq).alias("sq")))


@query(
    "hopkins_statistic",
    oracle=f"""
    WITH {_HOPKINS_BASE}
    SELECT CAST({_M} AS BIGINT) AS m_probes,
           round(sum_u, 6) AS sum_u,
           round(sum_w, 6) AS sum_w,
           round(sum_u / (sum_u + sum_w), 6) AS hopkins
    FROM (SELECT (SELECT sum(sqrt(CAST(sq AS DOUBLE))) FROM u_nn) AS sum_u,
                 (SELECT sum(sqrt(CAST(sq AS DOUBLE))) FROM w_nn) AS sum_w)
    """,
)
def hopkins_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopkins clustering-tendency statistic over the (balance cents,
    order count) plane with deterministic md5 probes: H near 0.5 means
    no exploitable cluster structure; near 1 means clustered.

    Scale: two broadcast-probe NN passes, each streaming the point set
    once map-side."""
    pts = _pts(spark, sf_dir).cache()
    u = _nn(_uniform_probes(spark, pts), pts, "i", exclude_self=False)
    w = _nn(_real_probes(pts), pts, "custkey", exclude_self=True)
    su = u.agg(F.sum(F.sqrt(F.col("sq").cast("double"))).alias("sum_u"))
    sw = w.agg(F.sum(F.sqrt(F.col("sq").cast("double"))).alias("sum_w"))
    return (su.crossJoin(sw)
            .select(F.lit(_M).cast("long").alias("m_probes"),
                    F.round("sum_u", 6).alias("sum_u"),
                    F.round("sum_w", 6).alias("sum_w"),
                    F.round(F.col("sum_u")
                            / (F.col("sum_u") + F.col("sum_w")), 6)
                    .alias("hopkins")))


@query(
    "nn_distance_sample",
    oracle=f"""
    WITH {_HOPKINS_BASE}
    SELECT custkey, round(sqrt(CAST(sq AS DOUBLE)), 6) AS nn_dist
    FROM w_nn ORDER BY custkey
    """,
)
def nn_distance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The m md5-sampled customers with their exact nearest-neighbor
    distance in the integer feature plane — the Hopkins real-probe leg
    as an inspectable per-point result (brute-force NN, broadcast
    probes).

    Scale: one broadcast-probe pass over the point set."""
    pts = _pts(spark, sf_dir).cache()
    w = _nn(_real_probes(pts), pts, "custkey", exclude_self=True)
    return (w.select(F.col("pk").alias("custkey"),
                     F.round(F.sqrt(F.col("sq").cast("double")), 6)
                     .alias("nn_dist"))
            .orderBy("custkey"))
