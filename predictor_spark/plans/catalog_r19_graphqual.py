"""Catalog part — graph partition quality (STAGED r11).

The graph stack (pagerank, link analysis, clustering coefficient, rich
club, connected components) measures NODES and EDGES; these rows
measure a PARTITION of the graph — the two statistics community
detection is evaluated with, over the customer-nation → supplier-nation
trade graph (edge weight = order-line count, an exact integer):

- modularity_regions     Newman-Girvan directed modularity of the
                         REGION partition: per region, the internal
                         weight share minus the expected share
                         (kout_R·kin_R/m²) — Q = Σ contributions; Q>0
                         means intra-region trade beats the random
                         null
- trade_assortativity    Newman (2002) degree assortativity of
                         the TRADE graph (the r7 linkanalysis
                         family already measures the user
                         co-event graph's unweighted form): the
                         edge-weighted Pearson correlation between the
                         src nation's out-strength and the dst
                         nation's in-strength across edges — do
                         heavy traders trade with heavy traders?

Determinism: edge weights and node strengths are exact integer counts;
modularity contributions are rationals of exact integers; the
assortativity moments are integer-weighted sums of integer products
(decimal(38,0)/HUGEINT), one double division at the end, rounded 6 dp.

Scale: ONE fact pass aggregates the 100 TB joins down to the ≤625-edge
nation graph (dims broadcast, orderkey-keyed joins); everything after
runs on that constant-size edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

#: (src nation, src region, dst nation, dst region, w): integer-count
#: trade edges
_EDGE_SQL = """
    edges AS MATERIALIZED (
        SELECT cn.n_name AS src, cn.n_regionkey AS src_reg,
               sn.n_name AS dst, sn.n_regionkey AS dst_reg,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        GROUP BY 1, 2, 3, 4
    )"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cnk"),
                  F.col("n_name").alias("src"),
                  F.col("n_regionkey").alias("src_reg"))
    sn = n.select(F.col("n_nationkey").alias("snk"),
                  F.col("n_name").alias("dst"),
                  F.col("n_regionkey").alias("dst_reg"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
            .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
            .groupBy("src", "src_reg", "dst", "dst_reg")
            .agg(F.count(F.lit(1)).alias("w"))
            .cache())


@query(
    "modularity_regions",
    oracle=f"""
    WITH {_EDGE_SQL},
    m AS (SELECT sum(CAST(w AS HUGEINT)) AS m FROM edges),
    per_reg AS (
        SELECT r.reg,
               coalesce(wi.w_in, 0) AS w_internal,
               coalesce(ko.w, 0) AS k_out,
               coalesce(ki.w, 0) AS k_in
        FROM (SELECT DISTINCT src_reg AS reg FROM edges) r
        LEFT JOIN (SELECT src_reg AS reg, sum(CAST(w AS HUGEINT)) AS w_in
                   FROM edges WHERE src_reg = dst_reg
                   GROUP BY src_reg) wi ON wi.reg = r.reg
        LEFT JOIN (SELECT src_reg AS reg, sum(CAST(w AS HUGEINT)) AS w
                   FROM edges GROUP BY src_reg) ko ON ko.reg = r.reg
        LEFT JOIN (SELECT dst_reg AS reg, sum(CAST(w AS HUGEINT)) AS w
                   FROM edges GROUP BY dst_reg) ki ON ki.reg = r.reg
    )
    SELECT CAST(reg AS BIGINT) AS regionkey,
           CAST(w_internal AS BIGINT) AS w_internal,
           CAST(k_out AS BIGINT) AS k_out,
           CAST(k_in AS BIGINT) AS k_in,
           round(CAST(w_internal AS DOUBLE) / m.m
                 - (CAST(k_out AS DOUBLE) / m.m)
                   * (CAST(k_in AS DOUBLE) / m.m), 6) AS q_contrib
    FROM per_reg, m ORDER BY regionkey
    """,
)
def modularity_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region directed-modularity contribution of the region
    partition of the nation trade graph: w_internal/m - (kout/m)(kin/m).
    The partition's modularity Q is the sum of q_contrib.

    Scale: one fact pass -> ≤625 edges; the rest is a 5-region
    reduction."""
    e = _edges(spark, sf_dir)
    dec = F.col("w").cast("decimal(38,0)")
    m = e.agg(F.sum(dec).alias("m"))
    regs = e.select(F.col("src_reg").alias("reg")).distinct()
    wi = (e.filter(F.col("src_reg") == F.col("dst_reg"))
          .groupBy(F.col("src_reg").alias("reg"))
          .agg(F.sum(dec).alias("w_internal")))
    ko = (e.groupBy(F.col("src_reg").alias("reg"))
          .agg(F.sum(dec).alias("k_out")))
    ki = (e.groupBy(F.col("dst_reg").alias("reg"))
          .agg(F.sum(dec).alias("k_in")))
    per = (regs.join(wi, "reg", "left").join(ko, "reg", "left")
           .join(ki, "reg", "left")
           .select("reg",
                   F.coalesce("w_internal", F.lit(0)).alias("w_internal"),
                   F.coalesce("k_out", F.lit(0)).alias("k_out"),
                   F.coalesce("k_in", F.lit(0)).alias("k_in")))
    md = F.col("m").cast("double")
    return (per.crossJoin(F.broadcast(m))
            .select(F.col("reg").cast("long").alias("regionkey"),
                    F.col("w_internal").cast("long").alias("w_internal"),
                    F.col("k_out").cast("long").alias("k_out"),
                    F.col("k_in").cast("long").alias("k_in"),
                    F.round(F.col("w_internal").cast("double") / md
                            - (F.col("k_out").cast("double") / md)
                            * (F.col("k_in").cast("double") / md), 6)
                    .alias("q_contrib"))
            .orderBy("regionkey"))


@query(
    "trade_assortativity",
    oracle=f"""
    WITH {_EDGE_SQL},
    strength AS (
        SELECT n, sum(ko) AS kout, sum(ki) AS kin FROM (
            SELECT src AS n, CAST(w AS HUGEINT) AS ko,
                   CAST(0 AS HUGEINT) AS ki FROM edges
            UNION ALL
            SELECT dst, CAST(0 AS HUGEINT), CAST(w AS HUGEINT) FROM edges
        ) GROUP BY n
    ),
    pairs AS (
        SELECT CAST(e.w AS HUGEINT) AS w,
               CAST(so.kout AS HUGEINT) AS x,
               CAST(si.kin AS HUGEINT) AS y
        FROM edges e
        JOIN strength so ON so.n = e.src
        JOIN strength si ON si.n = e.dst
    ),
    mom AS (
        SELECT sum(w) AS sw, sum(w * x) AS sx, sum(w * y) AS sy,
               sum(w * x * x) AS sxx, sum(w * y * y) AS syy,
               sum(w * x * y) AS sxy
        FROM pairs
    )
    SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(sw AS BIGINT) AS total_weight,
           round((CAST(sxy AS DOUBLE) * CAST(sw AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(sxx AS DOUBLE) * CAST(sw AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(syy AS DOUBLE) * CAST(sw AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS assortativity
    FROM mom
    """,
)
def trade_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted degree assortativity of the trade graph: the
    edge-weight-weighted Pearson correlation between the source's
    out-strength and the destination's in-strength. Negative =
    disassortative (hubs feed the periphery).

    Scale: strengths and moments all reduce the constant-size edge
    list; moments are exact integer sums."""
    e = _edges(spark, sf_dir)
    dec = F.col("w").cast("decimal(38,0)")
    ko = e.groupBy(F.col("src").alias("n")).agg(F.sum(dec).alias("kout"))
    ki = e.groupBy(F.col("dst").alias("n")).agg(F.sum(dec).alias("kin"))
    pairs = (e.join(F.broadcast(ko), e.src == ko.n)
             .join(F.broadcast(ki), e.dst == ki.n)
             .select(dec.alias("w"),
                     F.col("kout").alias("x"), F.col("kin").alias("y")))
    mom = pairs.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("x")).alias("sx"),
        F.sum(F.col("w") * F.col("y")).alias("sy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("w") * F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).alias("sxy"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return mom.select(
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("sw").cast("long").alias("total_weight"),
        F.round((d("sxy") * d("sw") - d("sx") * d("sy"))
                / (F.sqrt(d("sxx") * d("sw") - d("sx") * d("sx"))
                   * F.sqrt(d("syy") * d("sw") - d("sy") * d("sy"))), 6)
        .alias("assortativity"))
