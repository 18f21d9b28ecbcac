"""Catalog part — multi-criteria decision analysis (STAGED for r8).

The decision-support read-outs over the engine's rollups — which
parts / brands / suppliers win when there is more than one axis of
"good":

- skyline_parts            the Pareto frontier / skyline operator
                           (Börzsönyi, Kossmann & Stocker, ICDE 2001):
                           parts no other part beats on BOTH price
                           (lower better) and size (higher better)
- borda_brand_ranking      Borda-count rank aggregation (Borda 1781)
                           of three per-brand criterion rankings
- topsis_supplier_ranking  TOPSIS (Hwang & Yoon 1981): closeness to
                           the ideal solution over vector-normalized
                           criteria

Determinism: skyline runs on exact integer cents/sizes; Borda on
integer competition ranks of exact integer aggregates; TOPSIS keeps
every sufficient statistic an exact integer until the one closed-form
closeness expression (same operation tree both engines, IEEE-identical)
and ranks by the ROUNDED closeness with a key tie-break.

Cent sums ride LONG partials, not DECIMAL(38,0): a 128-bit decimal
partial aggregation measured ~6x slower than int64 on the same sf1
sum, and per-group cent totals are bounded by the table's total cents
(~6e18 at the 100 TB design point, inside int64).  Statistics whose
magnitude grows with n² (pair products, squared sums) stay DECIMAL
elsewhere in the catalog — the bound, not a blanket rule, picks the
type.

Scale: the classic skyline is a quadratic block-nested-loop self-join;
in 2D it collapses to a sort + running strict-prefix max — expressed
here as two RANGE-frame window maxes over the part dim (O(n log n),
shuffle-free after one hash by nothing: the window is the only sort).
Borda/TOPSIS reduce facts to |dim| sufficient-statistic rows map-side;
the normalization totals broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t


@query(
    "skyline_parts",
    oracle="""
    WITH pts AS (
        SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
               CAST(p_size AS BIGINT) AS size
        FROM part
    ),
    flagged AS (
        SELECT p_partkey, price_c, size,
               max(size) OVER (ORDER BY price_c
                               RANGE BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS m_strict,
               max(size) OVER (ORDER BY price_c
                               RANGE BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS m_incl
        FROM pts
    )
    SELECT p_partkey, round(CAST(price_c AS DOUBLE) / 100.0, 2) AS price,
           size
    FROM flagged
    WHERE (m_strict IS NULL OR m_strict < size) AND m_incl <= size
    ORDER BY p_partkey
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of the part dim — minimize retail price, maximize
    size.  A part is dominated iff some strictly-cheaper part is at
    least as large (m_strict >= size) OR some equal-priced part is
    strictly larger (m_incl > size); the two prefix maxes replace the
    O(n²) dominance self-join of the BNL algorithm.

    Scale: one dim scan, one value-range window (single sort by the
    price key); generalizes to d dims by iterating the same pass per
    added axis or falling back to the grid-partitioned BNL."""
    pts = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("size"))
    w_strict = (Window.orderBy("price_c")
                .rangeBetween(Window.unboundedPreceding, -1))
    w_incl = (Window.orderBy("price_c")
              .rangeBetween(Window.unboundedPreceding, 0))
    flagged = pts.select(
        "p_partkey", "price_c", "size",
        F.max("size").over(w_strict).alias("m_strict"),
        F.max("size").over(w_incl).alias("m_incl"))
    return (flagged
            .where((F.col("m_strict").isNull()
                    | (F.col("m_strict") < F.col("size")))
                   & (F.col("m_incl") <= F.col("size")))
            .select("p_partkey",
                    F.round(F.col("price_c").cast("double") / 100.0, 2)
                    .alias("price"),
                    "size")
            .orderBy("p_partkey"))


@query(
    "borda_brand_ranking",
    oracle="""
    WITH stats AS MATERIALIZED (
        SELECT p_brand AS brand,
               CAST(sum(round(l_extendedprice * (1 - l_discount) * 100))
                    AS HUGEINT) AS rev_c,
               count(DISTINCT o_custkey) AS n_cust,
               CAST(sum(l_quantity) AS BIGINT) AS tot_q
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    ),
    ranked AS (
        SELECT brand,
               rank() OVER (ORDER BY rev_c DESC) AS rev_rank,
               rank() OVER (ORDER BY n_cust DESC) AS cust_rank,
               rank() OVER (ORDER BY tot_q DESC) AS qty_rank,
               count(*) OVER () AS n
        FROM stats
    )
    SELECT brand, CAST(rev_rank AS BIGINT) AS rev_rank,
           CAST(cust_rank AS BIGINT) AS cust_rank,
           CAST(qty_rank AS BIGINT) AS qty_rank,
           CAST(3 * n - rev_rank - cust_rank - qty_rank AS BIGINT)
               AS borda_score
    FROM ranked ORDER BY borda_score DESC, brand
    """,
)
def borda_brand_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda-count rank aggregation over three brand criteria —
    discounted revenue, distinct buying customers, total quantity.
    Each criterion contributes (n − rank) points (competition ranking
    on exact integer statistics); the aggregate score orders brands.

    Scale: ONE fact pass (keyed join to orders, broadcast part dim)
    reduces to 25 stat rows; the three rank windows run over those."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    stats = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .join(F.broadcast(part), li.l_partkey == part.p_partkey)
             .groupBy(F.col("p_brand").alias("brand"))
             .agg(F.sum(F.round(F.col("l_extendedprice")
                                * (1 - F.col("l_discount")) * 100)
                        .cast("long")).alias("rev_c"),
                  F.countDistinct("o_custkey").alias("n_cust"),
                  F.sum(F.col("l_quantity").cast("long")).alias("tot_q")))
    ranked = stats.select(
        "brand",
        F.rank().over(Window.orderBy(F.desc("rev_c"))).alias("rev_rank"),
        F.rank().over(Window.orderBy(F.desc("n_cust"))).alias("cust_rank"),
        F.rank().over(Window.orderBy(F.desc("tot_q"))).alias("qty_rank"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n"))
    return (ranked.select(
        "brand",
        F.col("rev_rank").cast("long").alias("rev_rank"),
        F.col("cust_rank").cast("long").alias("cust_rank"),
        F.col("qty_rank").cast("long").alias("qty_rank"),
        (3 * F.col("n") - F.col("rev_rank") - F.col("cust_rank")
         - F.col("qty_rank")).cast("long").alias("borda_score"))
        .orderBy(F.desc("borda_score"), "brand"))


@query(
    "topsis_supplier_ranking",
    oracle="""
    WITH stats AS MATERIALIZED (
        SELECT l_suppkey AS suppkey,
               CAST(sum(round(l_extendedprice * (1 - l_discount) * 100))
                    AS HUGEINT) AS rev_c,
               CAST(sum(l_quantity) AS BIGINT) AS tot_q,
               CAST(sum(round(l_discount * 100)) AS HUGEINT) AS disc_c,
               count(*) AS n_lines
        FROM lineitem GROUP BY 1
    ),
    norms AS (
        SELECT sqrt(sum(CAST(rev_c AS DOUBLE) * rev_c)) AS nr,
               sqrt(sum(CAST(tot_q AS DOUBLE) * tot_q)) AS nq,
               sqrt(sum((CAST(disc_c AS DOUBLE) / n_lines)
                        * (CAST(disc_c AS DOUBLE) / n_lines))) AS nd
        FROM stats
    ),
    scaled AS (
        SELECT suppkey,
               CAST(rev_c AS DOUBLE) / nr / 3 AS vr,
               CAST(tot_q AS DOUBLE) / nq / 3 AS vq,
               (CAST(disc_c AS DOUBLE) / n_lines) / nd / 3 AS vd
        FROM stats, norms
    ),
    ideal AS (
        SELECT max(vr) AS vr_p, max(vq) AS vq_p, min(vd) AS vd_p,
               min(vr) AS vr_m, min(vq) AS vq_m, max(vd) AS vd_m
        FROM scaled
    ),
    close AS (
        SELECT suppkey,
               sqrt((vr - vr_m) * (vr - vr_m) + (vq - vq_m) * (vq - vq_m)
                    + (vd - vd_m) * (vd - vd_m))
               / (sqrt((vr - vr_p) * (vr - vr_p) + (vq - vq_p) * (vq - vq_p)
                       + (vd - vd_p) * (vd - vd_p))
                  + sqrt((vr - vr_m) * (vr - vr_m) + (vq - vq_m) * (vq - vq_m)
                         + (vd - vd_m) * (vd - vd_m))) AS closeness
        FROM scaled, ideal
    )
    SELECT suppkey, round(closeness, 6) AS closeness,
           CAST(row_number() OVER (ORDER BY round(closeness, 6) DESC,
                                   suppkey) AS BIGINT) AS topsis_rank
    FROM close ORDER BY topsis_rank
    """,
)
def topsis_supplier_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOPSIS over suppliers: criteria = discounted revenue (benefit),
    quantity shipped (benefit), mean discount given (cost), vector-
    normalized, equal weights 1/3; closeness = d⁻/(d⁺ + d⁻) to the
    ideal/anti-ideal points.  Rank by ROUNDED closeness (key
    tie-break) so knife-edge doubles can't reorder engines.

    Scale: one fact scan to |suppliers| exact-integer stat rows; the
    norm and ideal rows are 1-row broadcasts; one rank window over
    the dim-sized frame."""
    li = _t(spark, sf_dir, "lineitem")
    stats = (li.groupBy(F.col("l_suppkey").alias("suppkey"))
             .agg(F.sum(F.round(F.col("l_extendedprice")
                                * (1 - F.col("l_discount")) * 100)
                        .cast("long")).alias("rev_c"),
                  F.sum(F.col("l_quantity").cast("long")).alias("tot_q"),
                  F.sum(F.round(F.col("l_discount") * 100)
                        .cast("long")).alias("disc_c"),
                  F.count(F.lit(1)).alias("n_lines"))
             .cache())  # |suppliers| rows: feeds norms + scaled legs
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean_disc = d("disc_c") / F.col("n_lines")
    norms = stats.agg(
        F.sqrt(F.sum(d("rev_c") * F.col("rev_c"))).alias("nr"),
        F.sqrt(F.sum(d("tot_q") * F.col("tot_q"))).alias("nq"),
        F.sqrt(F.sum(mean_disc * mean_disc)).alias("nd"))
    scaled = (stats.crossJoin(F.broadcast(norms))
              .select("suppkey",
                      (d("rev_c") / F.col("nr") / 3).alias("vr"),
                      (d("tot_q") / F.col("nq") / 3).alias("vq"),
                      (mean_disc / F.col("nd") / 3).alias("vd")))
    ideal = scaled.agg(
        F.max("vr").alias("vr_p"), F.max("vq").alias("vq_p"),
        F.min("vd").alias("vd_p"), F.min("vr").alias("vr_m"),
        F.min("vq").alias("vq_m"), F.max("vd").alias("vd_m"))
    c = scaled.crossJoin(F.broadcast(ideal))
    dm = F.sqrt((F.col("vr") - F.col("vr_m")) * (F.col("vr") - F.col("vr_m"))
                + (F.col("vq") - F.col("vq_m")) * (F.col("vq") - F.col("vq_m"))
                + (F.col("vd") - F.col("vd_m"))
                * (F.col("vd") - F.col("vd_m")))
    dp = F.sqrt((F.col("vr") - F.col("vr_p")) * (F.col("vr") - F.col("vr_p"))
                + (F.col("vq") - F.col("vq_p")) * (F.col("vq") - F.col("vq_p"))
                + (F.col("vd") - F.col("vd_p"))
                * (F.col("vd") - F.col("vd_p")))
    close = c.select(
        "suppkey", F.round(dm / (dp + dm), 6).alias("closeness"))
    w = Window.orderBy(F.desc("closeness"), "suppkey")
    return (close.select(
        "suppkey", "closeness",
        F.row_number().over(w).cast("long").alias("topsis_rank"))
        .orderBy("topsis_rank"))
