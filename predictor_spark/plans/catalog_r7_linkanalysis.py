"""Catalog part — link-analysis centralities and link prediction
(STAGED for r7).

Completes the graph stack (pagerank: catalog_mlprep; BFS/triangles:
catalog_quality; degree distribution / node Jaccard: catalog_graph2)
with the other classical link-analysis measures:

- hits_hubs_authorities  HITS power iteration (Kleinberg 1999):
                         mutually-reinforcing hub and authority scores
- katz_centrality_trade  truncated Katz (1953) centrality:
                         c = sum_k alpha^k (A^T)^k 1, K=3
- adamic_adar_links      Adamic-Adar link prediction (Adamic & Adar
                         2003): sum over common neighbors of 1/ln(deg)
- degree_assortativity   Newman (2002) degree assortativity: Pearson
                         correlation of endpoint degrees over edges

Graph: the HIGH-VOLUME directed trade graph — customer nation ->
supplier nation pairs in the top decile by distinct-order volume (p90
discrete quantile), the same thresholded construction
bfs_hops_trade_graph proved non-degenerate at every SF (the full
nation graph is complete, which collapses degree variance).  AA and
assortativity run on its symmetrized undirected form with self-loops
dropped.

Determinism: edges are binarized, so degrees and neighbor sets are
exact integers; HITS/Katz iterate with per-step round(9) state
synchronization (the pagerank idiom); Adamic-Adar quantizes each
1/ln(deg) term to integer nano-units before the cross-pair sum;
assortativity is closed-form over exact integer moment sums, NULL
when the degree variance is zero.

Scale: the 100 TB work is the ONE fact-join pair-volume pass (dims
broadcast, orderkey shuffle); the thresholded edge list (<= a few
hundred rows at nation grain) is eagerly localCheckpoint-ed once — the
iterations below reference it many times, and the checkpoint keeps the
lineage a LEAF instead of embedding the fact join 2^k times (the exact
lesson from bfs_hops_trade_graph).  At 1 M+ nodes the same loops run
with score frames shuffled on the join key instead of broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_HITS_ITERS = 3
_KATZ_ALPHA = 0.05
_KATZ_ITERS = 3

# directed high-volume trade edges (oracle CTEs): top-decile
# (customer nation -> supplier nation) pairs by distinct-order volume
_EDGE_SQL = """
    pc AS MATERIALIZED (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               count(DISTINCT o.o_orderkey) AS w
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY src, dst
    ),
    thr AS (SELECT quantile_disc(w, 0.9) AS t FROM pc),
    edges AS MATERIALIZED (SELECT src, dst FROM pc, thr WHERE w >= t)"""

# symmetrized undirected neighbor pairs + degrees (AA / assortativity)
_NEIGH_SQL = _EDGE_SQL + """,
    und AS MATERIALIZED (
        SELECT DISTINCT u, z FROM (
            SELECT src AS u, dst AS z FROM edges WHERE src <> dst
            UNION ALL
            SELECT dst AS u, src AS z FROM edges WHERE src <> dst
        )
    ),
    deg AS MATERIALIZED (
        SELECT u AS node, count(*) AS d FROM und GROUP BY u
    )"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed top-decile trade edges (src, dst nation keys), eagerly
    checkpointed: one fact-join pair-volume pass + the discrete-p90
    threshold idiom from bfs_hops_trade_graph, then a <=|nations|^2-row
    LEAF the iterative queries can reference freely."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pc = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
          .join(li, o.o_orderkey == li.l_orderkey)
          .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
          .select(F.col("c_nationkey").alias("src"),
                  F.col("s_nationkey").alias("dst"), "o_orderkey")
          .groupBy("src", "dst")
          .agg(F.countDistinct("o_orderkey").alias("w"))
          .cache())
    wv = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, 0)
    tot = pc.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nall = tot.agg(F.sum("c").alias("n"))
    thr = (tot.crossJoin(F.broadcast(nall))
           .select("w", (F.sum("c").over(wv) / F.col("n")).alias("cd"))
           .agg(F.min(F.when(F.col("cd") >= 0.9, F.col("w"))).alias("t")))
    return (pc.crossJoin(F.broadcast(thr))
            .filter(F.col("w") >= F.col("t")).select("src", "dst")
            .coalesce(1).localCheckpoint(eager=True))


def _nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"))


def _hits_oracle() -> str:
    """Unnormalized integer HITS: scale factors cancel, so the whole
    trajectory is exact bigint sums; ONE final L1 division per score."""
    ctes = [f"""
    WITH {_EDGE_SQL},
    h0 AS (SELECT n_nationkey AS node, CAST(1 AS BIGINT) AS s FROM nation)"""]
    for k in range(1, _HITS_ITERS + 1):
        ctes.append(f""",
    a{k} AS (
        SELECT n.n_nationkey AS node,
               coalesce(sum(h.s), 0) AS s
        FROM nation n
        LEFT JOIN edges e ON e.dst = n.n_nationkey
        LEFT JOIN h{k - 1} h ON h.node = e.src
        GROUP BY n.n_nationkey
    ),
    h{k} AS (
        SELECT n.n_nationkey AS node,
               coalesce(sum(a.s), 0) AS s
        FROM nation n
        LEFT JOIN edges e ON e.src = n.n_nationkey
        LEFT JOIN a{k} a ON a.node = e.dst
        GROUP BY n.n_nationkey
    )""")
    return "".join(ctes) + f"""
    SELECT h.node AS n_nationkey,
           round(CAST(h.s AS DOUBLE)
                 / (SELECT sum(s) FROM h{_HITS_ITERS}), 6) AS hub,
           round(CAST(a.s AS DOUBLE)
                 / (SELECT sum(s) FROM a{_HITS_ITERS}), 6) AS authority
    FROM h{_HITS_ITERS} h JOIN a{_HITS_ITERS} a ON a.node = h.node
    """


@query("hits_hubs_authorities", oracle=_hits_oracle())
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) over the high-volume trade graph:
    importing nations are hubs, exporting nations authorities; 3
    mutually-reinforcing iterations.  Per-step normalization is a
    scalar that cancels in exact arithmetic, so the iteration runs
    UNNORMALIZED on exact bigint state (h0 = 1; values bounded by
    deg^(2K) << 2^63) and each score is L1-normalized exactly once at
    the end — zero float drift to synchronize, no per-step windows.

    Scale: the edge LEAF is checkpointed once; each half-step is one
    broadcast of the |nodes|-row score frame onto it + a node groupBy;
    the lineage is linear in the iteration count and the only float op
    is the final division."""
    edges = _edges(spark, sf_dir)
    # the node dim is referenced once per half-step — cache it so the
    # plan reads one in-memory 25-row frame instead of 13 dim scans
    nodes = _nodes(spark, sf_dir).cache()

    def half_step(score: DataFrame, inbound: bool) -> DataFrame:
        ekey, skey = ("dst", "src") if inbound else ("src", "dst")
        contrib = (edges.join(
            F.broadcast(score.withColumnRenamed("node", "sn")),
            F.col(skey) == F.col("sn"))
            .select(F.col(ekey).alias("tgt"), "s"))
        return (nodes.join(F.broadcast(contrib),
                           F.col("node") == F.col("tgt"), "left")
                .groupBy("node")
                .agg(F.coalesce(F.sum("s"), F.lit(0)).cast("long")
                     .alias("s")))

    h = nodes.select("node", F.lit(1).cast("long").alias("s"))
    a = None
    for _ in range(_HITS_ITERS):
        a = half_step(h, inbound=True)
        h = half_step(a, inbound=False)
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    hub = (h.select("node", F.round(F.col("s").cast("double")
                                    / F.sum("s").over(wall), 6)
                    .alias("hub")))
    auth = (a.select("node", F.round(F.col("s").cast("double")
                                     / F.sum("s").over(wall), 6)
                     .alias("authority")))
    return (hub.join(F.broadcast(auth), "node")
            .select(F.col("node").alias("n_nationkey"), "hub",
                    "authority"))


def _katz_oracle() -> str:
    ctes = [f"""
    WITH {_EDGE_SQL},
    c0 AS (SELECT n_nationkey AS node, 1.0 AS c FROM nation)"""]
    for k in range(1, _KATZ_ITERS + 1):
        ctes.append(f""",
    c{k} AS (
        SELECT n.n_nationkey AS node,
               round(1.0 + {_KATZ_ALPHA}
                     * coalesce(sum(p.c), 0.0), 9) AS c
        FROM nation n
        LEFT JOIN edges e ON e.dst = n.n_nationkey
        LEFT JOIN c{k - 1} p ON p.node = e.src
        GROUP BY n.n_nationkey
    )""")
    return "".join(ctes) + f"""
    SELECT node AS n_nationkey, round(c - 1.0, 6) AS katz
    FROM c{_KATZ_ITERS}
    """


@query("katz_centrality_trade", oracle=_katz_oracle())
def katz_centrality_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality (Katz 1953): c = sum_{k=1..3} alpha^k
    (A^T)^k 1 via the recurrence c_k = 1 + alpha * A^T c_{k-1},
    round(9) per step; the constant 1 is subtracted at the end so the
    score is pure inbound path mass.

    Scale: same checkpointed edge leaf and broadcast-iterate shape as
    HITS; each of the 3 steps is one join + one node groupBy — the
    lineage references the score frame once per step, so it stays
    linear with no re-aggregation blowup."""
    edges = _edges(spark, sf_dir)
    nodes = _nodes(spark, sf_dir)
    c = nodes.select("node", F.lit(1.0).alias("c"))
    for _ in range(_KATZ_ITERS):
        contrib = (edges.join(
            F.broadcast(c.withColumnRenamed("node", "cn")),
            F.col("src") == F.col("cn"))
            .select("dst", "c"))
        c = (nodes.join(F.broadcast(contrib),
                        F.col("node") == F.col("dst"), "left")
             .groupBy("node")
             .agg(F.round(1.0 + _KATZ_ALPHA
                          * F.coalesce(F.sum("c"), F.lit(0.0)), 9)
                  .alias("c")))
    return c.select(F.col("node").alias("n_nationkey"),
                    F.round(F.col("c") - 1.0, 6).alias("katz"))


def _und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (u, z) neighbor pairs from the checkpointed edge
    leaf, self-loops dropped."""
    e = _edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    return (e.select(F.col("src").alias("u"), F.col("dst").alias("z"))
            .unionAll(e.select(F.col("dst").alias("u"),
                               F.col("src").alias("z")))
            .distinct().cache())


@query(
    "adamic_adar_links",
    oracle=f"""
    WITH {_NEIGH_SQL},
    terms AS (
        SELECT a.u AS u, b.u AS v,
               CAST(round(1e9 / ln(deg.d)) AS BIGINT) AS t
        FROM und a JOIN und b ON a.z = b.z AND a.u < b.u
        JOIN deg ON deg.node = a.z
        WHERE deg.d > 1
    )
    SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
           round(sum(t) / 1e9, 4) AS adamic_adar
    FROM terms GROUP BY u, v
    """,
)
def adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the undirected high-volume
    graph: for each node pair, sum 1/ln(deg(z)) over common neighbors
    z (rare shared partners count more); degree-1 neighbors are
    excluded (ln 1 = 0).  Terms are nano-quantized integers before the
    cross-pair sum.

    Scale: the common-neighbor self-join is keyed on the shared
    neighbor z (never an all-pairs product); the degree table is a
    broadcast dim; output is bounded by candidate pairs, not rows."""
    und = _und(spark, sf_dir)
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d"))
    a = und.select(F.col("u").alias("ua"), "z")
    b = und.select(F.col("u").alias("ub"), F.col("z").alias("zb"))
    terms = (a.join(b, (F.col("z") == F.col("zb"))
                    & (F.col("ua") < F.col("ub")))
             .join(F.broadcast(deg), F.col("z") == F.col("node"))
             .filter(F.col("d") > 1)
             .select(F.col("ua").alias("u"), F.col("ub").alias("v"),
                     F.round(F.lit(1e9) / F.log(F.col("d").cast("double")),
                             0).cast("long").alias("t")))
    return (terms.groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("n_common"),
                 F.round(F.sum("t") / 1e9, 4).alias("adamic_adar"))
            .select("u", "v", F.col("n_common").cast("long")
                    .alias("n_common"), "adamic_adar"))


@query(
    "degree_assortativity",
    oracle=f"""
    WITH {_NEIGH_SQL},
    ep AS (
        SELECT du.d AS x, dz.d AS y
        FROM und
        JOIN deg du ON du.node = und.u
        JOIN deg dz ON dz.node = und.z
    ),
    s AS (
        SELECT count(*) AS n,
               sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy,
               sum(CAST(x AS HUGEINT) * y) AS sxy
        FROM ep
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round((CAST(n AS DOUBLE) * sxy
                            - CAST(sx AS DOUBLE) * sy)
                           / sqrt((CAST(n AS DOUBLE) * sxx
                                   - CAST(sx AS DOUBLE) * sx)
                                  * (CAST(n AS DOUBLE) * syy
                                     - CAST(sy AS DOUBLE) * sy)), 6)
           END AS assortativity
    FROM s
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over all directed neighbor pairs — negative means
    hubs attach to leaves.  Degrees are exact integers, so every
    moment sum is exact; NULL when degree variance is zero (a regular
    graph has no assortativity).

    Scale: two broadcast joins of the degree dim onto the edge list +
    one global moment aggregate; no window, no self-join."""
    und = _und(spark, sf_dir)
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d"))
    ep = (und.join(F.broadcast(deg.withColumnRenamed("node", "nu")
                               .withColumnRenamed("d", "x")),
                   F.col("u") == F.col("nu"))
          .join(F.broadcast(deg.withColumnRenamed("node", "nz")
                            .withColumnRenamed("d", "y")),
                F.col("z") == F.col("nz"))
          .select("x", "y"))
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    s = ep.agg(F.count(F.lit(1)).alias("n"),
               F.sum(dx).alias("sx"), F.sum(dy).alias("sy"),
               F.sum(dx * F.col("x")).alias("sxx"),
               F.sum(dy * F.col("y")).alias("syy"),
               F.sum(dx * F.col("y")).alias("sxy"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    varx = d("n") * d("sxx") - d("sx") * d("sx")
    vary = d("n") * d("syy") - d("sy") * d("sy")
    return s.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.when((varx > 0) & (vary > 0),
               F.round((d("n") * d("sxy") - d("sx") * d("sy"))
                       / F.sqrt(varx * vary), 6)).alias("assortativity"))


_CORE_ROUNDS = 6  # peeling rounds; converges in <= diameter rounds here


def _kcore_oracle() -> str:
    """Unrolled peel: keep{i} = nodes with induced degree >= k among
    keep{i-1} survivors, one CTE pair per round per k."""
    parts = [f"""
    WITH {_NEIGH_SQL}"""]
    for k in (2, 3):
        parts.append(f""",
    keep{k}_0 AS (SELECT DISTINCT u AS n FROM und)""")
        for i in range(1, _CORE_ROUNDS + 1):
            parts.append(f""",
    keep{k}_{i} AS (
        SELECT und.u AS n FROM und
        JOIN keep{k}_{i - 1} a ON a.n = und.u
        JOIN keep{k}_{i - 1} b ON b.n = und.z
        GROUP BY und.u HAVING count(*) >= {k}
    )""")
    return "".join(parts) + f"""
    SELECT nt.n_nationkey,
           CAST(CASE WHEN k2.n IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS in_2core,
           CAST(CASE WHEN k3.n IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS in_3core
    FROM nation nt
    LEFT JOIN keep2_{_CORE_ROUNDS} k2 ON k2.n = nt.n_nationkey
    LEFT JOIN keep3_{_CORE_ROUNDS} k3 ON k3.n = nt.n_nationkey
    """


@query("kcore_membership", oracle=_kcore_oracle())
def kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core and 3-core membership (Seidman 1983) of the undirected
    high-volume trade graph: iteratively peel nodes whose degree in
    the surviving subgraph is below k; 6 unrolled rounds (the peel
    converges within the graph's diameter here — the test verifies the
    fixed point against an unbounded pure-Python peel).

    Scale: the cached neighbor list is re-filtered by two broadcast
    joins of the <=|nodes|-row survivor set per round — the peeling
    cost is |edges| per round, never the fact table; identical shape
    to the label-propagation and BFS iterations."""
    und = _und(spark, sf_dir)
    nodes = _nodes(spark, sf_dir).cache()

    def peel(k: int) -> DataFrame:
        keep = und.select(F.col("u").alias("n")).distinct()
        for _ in range(_CORE_ROUNDS):
            a = keep.select(F.col("n").alias("ka"))
            b = keep.select(F.col("n").alias("kb"))
            # each round references the survivor set TWICE — an eager
            # checkpoint keeps the lineage a <=|nodes|-row LEAF instead
            # of doubling the plan per round (2^rounds exchanges
            # without it; the BFS lesson again)
            keep = (und.join(F.broadcast(a), F.col("u") == F.col("ka"))
                    .join(F.broadcast(b), F.col("z") == F.col("kb"))
                    .groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
                    .filter(F.col("deg") >= k)
                    .select(F.col("u").alias("n"))
                    .coalesce(1).localCheckpoint(eager=True))
        return keep

    k2 = peel(2).withColumnRenamed("n", "n2")
    k3 = peel(3).withColumnRenamed("n", "n3")
    return (nodes
            .join(F.broadcast(k2), F.col("node") == F.col("n2"), "left")
            .join(F.broadcast(k3), F.col("node") == F.col("n3"), "left")
            .select(F.col("node").alias("n_nationkey"),
                    F.col("n2").isNotNull().cast("long").alias("in_2core"),
                    F.col("n3").isNotNull().cast("long").alias("in_3core")))
