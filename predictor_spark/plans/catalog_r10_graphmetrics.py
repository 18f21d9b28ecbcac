"""Catalog part — node-level graph topology metrics (STAGED r10).

Extends the nation trade graph's census (triangle_count_trade_graph,
catalog_quality.py:237 — same thresholded edge list, same fact-join
reduction) with two node-level topology readouts (Newman degree assortativity
already ships on the neighbor graph as degree_assortativity,
catalog_r7_linkanalysis.py:302):

- local_clustering_coefficient  per-node C_i = 2·t_i / (k_i(k_i−1))
                                (Watts & Strogatz 1998)
- rich_club_coefficients        φ(k) = 2·E_{>k} / (N_{>k}(N_{>k}−1))
                                at k ∈ {2,4,6,8} (Colizza et al. 2006)

Graph: nodes = nations, undirected edge when the pair's distinct-order
trade volume reaches the mean pair volume (the relative threshold that
keeps the graph non-complete at every SF).

Determinism: degrees, wedge counts, triangle counts and edge counts
are exact integers; every ratio rounds 6 dp in-query.

Scale: the ONLY heavy step is the fact-join reduction to the
≤|nations|²/2 pair table (scan-bound at 100 TB); both metrics run
wedge/edge joins on that broadcast-sized frame, so their cost does not
grow with fact rows at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

#: oracle prelude — the triangle_count_trade_graph edge list + the
#: symmetric copy and per-node degrees
_GRAPH = """
    pc AS MATERIALIZED (
        SELECT least(c.c_nationkey, s.s_nationkey) AS u,
               greatest(c.c_nationkey, s.s_nationkey) AS v,
               count(DISTINCT o.o_orderkey) AS w
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY u, v
    ),
    thr AS (SELECT CAST(sum(w) AS DOUBLE) / count(*) AS t FROM pc),
    pairs AS MATERIALIZED (
        SELECT u, v FROM pc, thr WHERE w >= t
    ),
    sym AS MATERIALIZED (
        SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
    ),
    deg AS MATERIALIZED (
        SELECT u AS node, count(*) AS k FROM sym GROUP BY u
    )
"""


def _graph(spark: SparkSession, sf_dir: str):
    """Spark twin of the oracle's pairs/sym/deg frames (all tiny,
    cached — the census idiom from triangle_count_trade_graph)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pc = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
          .join(li, o.o_orderkey == li.l_orderkey)
          .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
          .filter(F.col("c_nationkey") != F.col("s_nationkey"))
          .select(F.least("c_nationkey", "s_nationkey").alias("u"),
                  F.greatest("c_nationkey", "s_nationkey").alias("v"),
                  "o_orderkey")
          .groupBy("u", "v")
          .agg(F.countDistinct("o_orderkey").alias("w"))
          .cache())
    thr = pc.agg((F.sum("w").cast("double") / F.count(F.lit(1)))
                 .alias("t"))
    pairs = (pc.crossJoin(F.broadcast(thr))
             .filter(F.col("w") >= F.col("t")).select("u", "v").cache())
    sym = pairs.unionAll(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))).cache()
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("k"))
    return pairs, sym, deg


@query(
    "local_clustering_coefficient",
    oracle=f"""
    WITH {_GRAPH},
    tri AS (
        SELECT s1.u AS node, count(*) AS t
        FROM sym s1
        JOIN sym s2 ON s2.u = s1.u AND s2.v > s1.v
        JOIN pairs p ON p.u = s1.v AND p.v = s2.v
        GROUP BY s1.u
    )
    SELECT CAST(d.node AS BIGINT) AS node, CAST(d.k AS BIGINT) AS degree,
           CAST(COALESCE(tri.t, 0) AS BIGINT) AS n_triangles,
           round(CASE WHEN d.k >= 2
                      THEN 2.0 * COALESCE(tri.t, 0) / (d.k * (d.k - 1))
                      ELSE 0.0 END, 6) AS clustering_coef
    FROM deg d LEFT JOIN tri ON tri.node = d.node
    ORDER BY node
    """,
)
def local_clustering_coefficient(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Watts-Strogatz local clustering per nation: of each node's
    neighbor pairs, the share that are themselves connected — the
    node-level refinement of the global triangle census, flagging
    nations whose trade partners also trade with each other.

    Scale: wedges enumerate as one self-join on the symmetric edge
    copy with the canonical v1 < v2 guard, closed against the u<v edge
    list — all on the broadcast-sized pair frame."""
    pairs, sym, deg = _graph(spark, sf_dir)
    s1 = sym.select(F.col("u").alias("node"), F.col("v").alias("n1"))
    s2 = sym.select(F.col("u").alias("node"), F.col("v").alias("n2"))
    closing = pairs.select(F.col("u").alias("n1"), F.col("v").alias("n2"))
    tri = (s1.join(s2, "node")
           .where(F.col("n2") > F.col("n1"))
           .join(closing, ["n1", "n2"])
           .groupBy("node").agg(F.count(F.lit(1)).alias("t")))
    lcc = F.when(F.col("k") >= 2,
                 2.0 * F.coalesce(F.col("t"), F.lit(0))
                 / (F.col("k") * (F.col("k") - 1))).otherwise(0.0)
    return (deg.join(tri, "node", "left")
            .select(F.col("node").cast("long").alias("node"),
                    F.col("k").cast("long").alias("degree"),
                    F.coalesce(F.col("t"), F.lit(0)).cast("long")
                    .alias("n_triangles"),
                    F.round(lcc, 6).alias("clustering_coef"))
            .orderBy("node"))


@query(
    "rich_club_coefficients",
    oracle=f"""
    WITH {_GRAPH},
    ks AS (SELECT unnest([2, 4, 6, 8]) AS k),
    rich AS (
        SELECT ks.k, d.node FROM ks JOIN deg d ON d.k > ks.k
    ),
    counts AS (
        SELECT ks.k,
               (SELECT count(*) FROM rich r WHERE r.k = ks.k) AS n_rich,
               (SELECT count(*) FROM pairs p
                JOIN rich a ON a.k = ks.k AND a.node = p.u
                JOIN rich b ON b.k = ks.k AND b.node = p.v) AS e_rich
        FROM ks
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n_rich AS BIGINT) AS n_rich,
           CAST(e_rich AS BIGINT) AS e_rich,
           round(2.0 * e_rich / (n_rich * (n_rich - 1)), 6) AS phi
    FROM counts WHERE n_rich >= 2 ORDER BY k
    """,
)
def rich_club_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) at k ∈ {2,4,6,8}: among nations of
    degree > k, the realized share of possible edges — φ near 1 says
    the high-degree trade hubs form a near-clique.

    Scale: the k-ladder is a 4-row literal frame joined against the
    tiny degree and edge frames; counts are exact integers."""
    pairs, sym, deg = _graph(spark, sf_dir)
    ks = spark.range(1, 5).select((F.col("id") * 2).alias("k"))
    rich = (ks.crossJoin(F.broadcast(
        deg.select(F.col("node"), F.col("k").alias("kd"))))
        .where(F.col("kd") > F.col("k"))
        .select("k", "node"))
    n_rich = rich.groupBy("k").agg(F.count(F.lit(1)).alias("n_rich"))
    pa = pairs.select(F.col("u").alias("node"), F.col("v"))
    e_rich = (rich.join(pa, "node")
              .join(rich.select(F.col("k"), F.col("node").alias("v")),
                    ["k", "v"])
              .groupBy("k").agg(F.count(F.lit(1)).alias("e_rich")))
    return (n_rich.join(e_rich, "k", "left")
            .select(F.col("k").cast("long").alias("k"),
                    F.col("n_rich").cast("long").alias("n_rich"),
                    F.coalesce(F.col("e_rich"), F.lit(0)).cast("long")
                    .alias("e_rich"),
                    F.round(2.0 * F.coalesce(F.col("e_rich"), F.lit(0))
                            / (F.col("n_rich") * (F.col("n_rich") - 1)), 6)
                    .alias("phi"))
            .where(F.col("n_rich") >= 2)
            .orderBy("k"))
