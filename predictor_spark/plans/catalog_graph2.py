"""Catalog part — graph topology analytics on the nation trade graph.

Completing the graph family (triangle census, BFS hops, PageRank,
connected components elsewhere) with the three remaining shapes a
relationship-mining pipeline runs:

- trade_degree_distribution  degree histogram (the first thing anyone
                             plots about a graph)
- label_propagation_rounds   2 synchronous rounds of min-label
                             propagation (community seeding — the
                             deterministic core of LPA before random
                             tie-breaking enters)
- node_jaccard_similarity    neighborhood Jaccard for co-neighbor
                             pairs (link prediction's classic feature,
                             Liben-Nowell & Kleinberg 2003)

Graph: nodes = nations, undirected edge (u, v) when any order ships a
customer of u a line item supplied by v (u != v) — the same
distinct-pair reduction the triangle row uses
(catalog_quality.py:243), without the volume threshold so the three
rows here stay independent of quantile choices.

Determinism: the edge set is a distinct over integer pairs; LPA with
MIN is order-free (synchronous rounds commute with partial agg);
Jaccard counts are exact integers, the ratio divides once and ranks on
the ROUNDED value with (u, v) tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

_EDGES = """
    e0 AS MATERIALIZED (
        SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS u,
               greatest(c.c_nationkey, s.s_nationkey) AS v
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
    ),
    edges AS (
        SELECT u AS a, v AS b FROM e0
        UNION ALL SELECT v AS a, u AS b FROM e0
    )"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed view (both orientations) of the distinct undirected
    nation trade edges.  One fact join -> distinct on 25x25 pairs; at
    100 TB the distinct is the reduction that makes everything after
    it metadata-sized."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    e0 = (o.join(li, o.o_orderkey == li.l_orderkey)
          .join(F.broadcast(c), o.o_custkey == c.c_custkey)
          .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
          .filter(F.col("c_nationkey") != F.col("s_nationkey"))
          .select(F.least("c_nationkey", "s_nationkey").alias("u"),
                  F.greatest("c_nationkey", "s_nationkey").alias("v"))
          .distinct())
    # both orientations via ONE generator over the distinct pairs — a
    # unionAll of two e0 projections re-derives the whole fact-join
    # subtree per branch (the plan audit showed the 4-table join + its
    # distinct TWICE inside one cache materialization), doubling the
    # corpus passes; explode emits (u,v) and (v,u) row-locally from a
    # single e0 evaluation (guide §2.4: don't compute the same pass twice)
    return (e0.select(F.explode(F.array(
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
                F.struct(F.col("v").alias("a"), F.col("u").alias("b"))))
            .alias("e"))
            .select("e.a", "e.b"))


@query(
    "trade_degree_distribution",
    oracle=f"""
    WITH {_EDGES},
    deg AS (SELECT a, count(*) AS degree FROM edges GROUP BY a)
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def trade_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the trade graph: how many nations have k
    trading partners — the degree-distribution profile (power-law vs
    uniform) that picks the partitioning strategy for every downstream
    graph algorithm (skewed degrees -> salt the high-degree vertices).

    Scale: two groupBys over the already-tiny distinct edge list; the
    heavy lifting is the fact-join distinct inside _edges."""
    deg = _edges(spark, sf_dir).groupBy("a") \
        .agg(F.count(F.lit(1)).alias("degree"))
    return (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .select(F.col("degree").cast("long").alias("degree"), "n_nodes"))


@query(
    "label_propagation_rounds",
    oracle=f"""
    WITH {_EDGES},
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    r1 AS (
        SELECT n.node,
               least(n.node, coalesce(min(e.b), n.node)) AS label
        FROM nodes n LEFT JOIN edges e ON e.a = n.node
        GROUP BY n.node
    ),
    r2 AS (
        SELECT n.node,
               least(min(r.label), coalesce(min(rn.label), min(r.label)))
                   AS label
        FROM nodes n
        JOIN r1 r ON r.node = n.node
        LEFT JOIN edges e ON e.a = n.node
        LEFT JOIN r1 rn ON rn.node = e.b
        GROUP BY n.node
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
    FROM r2
    """,
)
def label_propagation_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous rounds of min-label propagation: every node
    starts labeled with its own id, then repeatedly takes the minimum
    of its own and its neighbors' labels.  This is the deterministic
    skeleton of label propagation (and of large-star connected
    components — dedup.py:289 runs it to convergence); fixing the
    round count makes the intermediate state itself checkable.

    Scale: each round is ONE self-equi-join of the label frame with
    the edge list plus a min-aggregate — the classic iterate-as-join
    pattern; rounds double the propagation radius, so O(log diameter)
    rounds converge."""
    edges = _edges(spark, sf_dir).cache()
    nodes = edges.select(F.col("a").alias("node")).distinct()

    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(2):
        nbr = (edges.join(labels, edges.b == labels.node)
               .groupBy("a").agg(F.min("label").alias("nbr_label")))
        labels = (labels.join(nbr, labels.node == nbr.a, "left")
                  .select(labels.node,
                          F.least(F.col("label"),
                                  F.coalesce(F.col("nbr_label"),
                                             F.col("label"))).alias("label")))
    return labels.select(F.col("node").cast("long").alias("node"),
                         F.col("label").cast("long").alias("label"))


@query(
    "node_jaccard_similarity",
    oracle=f"""
    WITH {_EDGES},
    deg AS (SELECT a, count(*) AS d FROM edges GROUP BY a),
    inter AS (
        SELECT e1.a AS u, e2.a AS v, count(*) AS common
        FROM edges e1 JOIN edges e2
          ON e1.b = e2.b AND e1.a < e2.a
        GROUP BY e1.a, e2.a
    )
    SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
           CAST(common AS BIGINT) AS n_common,
           round(CAST(common AS DOUBLE)
                 / (du.d + dv.d - common), 6) AS jaccard
    FROM inter
    JOIN deg du ON du.a = u
    JOIN deg dv ON dv.a = v
    ORDER BY jaccard DESC, u, v
    LIMIT 20
    """,
)
def node_jaccard_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood Jaccard for every co-neighbor node pair, top-20 —
    the classic link-prediction feature (Liben-Nowell & Kleinberg
    2003): |N(u) n N(v)| / |N(u) u N(v)| with the union expanded as
    deg(u) + deg(v) - common so ONE join computes it.

    Scale: candidate pairs come only from the wedge join (shared
    neighbor b), never all-pairs — the same candidate-generation
    discipline as MinHash-LSH; high-degree hub nodes are the skew axis
    (salt b or cap with top-k-per-node at web scale)."""
    edges = _edges(spark, sf_dir).cache()
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    e1 = edges.select(F.col("a").alias("u"), F.col("b").alias("w"))
    e2 = edges.select(F.col("a").alias("v"), F.col("b").alias("w"))
    inter = (e1.join(e2, (e1.w == e2.w) & (e1.u < e2.v))
             .groupBy("u", "v").agg(F.count(F.lit(1)).alias("common")))
    du = deg.select(F.col("a").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("a").alias("v"), F.col("d").alias("dv"))
    return (inter.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
            .select(F.col("u").cast("long").alias("u"),
                    F.col("v").cast("long").alias("v"),
                    F.col("common").cast("long").alias("n_common"),
                    F.round(F.col("common").cast("double")
                            / (F.col("du") + F.col("dv") - F.col("common")),
                            6).alias("jaccard"))
            .orderBy(F.col("jaccard").desc(), "u", "v").limit(20))
