"""Catalog part — privacy / governance audits (STAGED for r7).

A training-data platform that ships user-derived tables needs the
standard disclosure-risk screens next to its quality screens
(catalog_drift.py) and integrity audits (catalog_integrity.py).  This
family implements the three classic ones (Sweeney 2002, k-anonymity;
Machanavajjhala et al. 2007, l-diversity):

- k_anonymity_histogram   equivalence-class size histogram over a
                          quasi-identifier tuple: how many rows sit in
                          classes of size 1 / 2-4 / 5-9 / 10+
- l_diversity_audit       per-class distinct-sensitive-value count and
                          dominant-value share (the homogeneity-attack
                          risk readout)
- reid_risk_ladder        re-identification uniqueness rate under a
                          GROWING quasi-identifier set — the marketer's
                          "how fast does risk climb as I add columns"
                          ladder, computed in ONE rollup pass

Quasi-identifiers here: customer (c_nationkey, c_mktsegment,
floor(c_acctbal/1000) balance band) and orders (o_orderpriority,
order year) with o_orderstatus as the sensitive attribute — the same
shapes a real customer table would audit (region, segment, coarse
numeric band).

Determinism: every statistic is integer counting (class sizes,
distinct counts, singleton counts); the only doubles are final
one-shot ratios rounded in-query.

Scale: each audit is one scan + one partial-aggregated groupBy on the
QI tuple; the ladder's three QI levels come out of a single ROLLUP
(one Expand + one shuffle — NOT three scans), then a <=4-row regroup
of the class table.  Class tables are |distinct QI| rows — the 100 TB
path never materializes anything row-sized after the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

# shared QI projection over customer (oracle CTE)
_QI_BASE = """
    qi AS (
        SELECT c_nationkey AS nat, c_mktsegment AS seg,
               CAST(floor(c_acctbal / 1000) AS INTEGER) AS balband
        FROM customer
    )"""


def _qi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer quasi-identifier tuple: nation, segment, $1000
    balance band."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("balband"))


@query(
    "k_anonymity_histogram",
    oracle=f"""
    WITH {_QI_BASE},
    classes AS (
        SELECT count(*) AS k FROM qi GROUP BY nat, seg, balband
    ),
    bucketed AS (
        SELECT CASE WHEN k = 1 THEN '1'
                    WHEN k <= 4 THEN '2-4'
                    WHEN k <= 9 THEN '5-9'
                    ELSE '10+' END AS k_bucket,
               k
        FROM classes
    )
    SELECT k_bucket,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(k) AS BIGINT) AS n_rows,
           round(100.0 * sum(k) / (SELECT count(*) FROM qi), 4)
               AS pct_rows
    FROM bucketed GROUP BY 1
    """,
)
def k_anonymity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity class-size histogram (Sweeney 2002) over the customer
    QI tuple: rows in singleton classes are individually re-identifiable;
    the 10+ bucket is the safe mass.

    Scale: one scan -> one QI groupBy (map-side partial counts); the
    histogram regroups the |distinct QI| class table; the total-row
    denominator is a broadcast scalar, not a second scan (sum over the
    class table)."""
    classes = _qi(spark, sf_dir).groupBy("nat", "seg", "balband").agg(
        F.count(F.lit(1)).alias("k"))
    bucketed = classes.select(
        F.when(F.col("k") == 1, "1")
        .when(F.col("k") <= 4, "2-4")
        .when(F.col("k") <= 9, "5-9")
        .otherwise("10+").alias("k_bucket"),
        "k")
    # <=4 rows — cached so the total doesn't re-run the QI aggregation
    hist = bucketed.groupBy("k_bucket").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").alias("n_rows")).cache()
    total = hist.agg(F.sum("n_rows").alias("t"))
    return (hist.crossJoin(F.broadcast(total))
            .select("k_bucket", "n_classes",
                    F.col("n_rows").cast("long").alias("n_rows"),
                    F.round(100.0 * F.col("n_rows") / F.col("t"), 4)
                    .alias("pct_rows")))


@query(
    "l_diversity_audit",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS priority,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               o_orderstatus, count(*) AS c
        FROM orders GROUP BY 1, 2, 3
    )
    SELECT priority, order_year,
           CAST(sum(c) AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS l_distinct,
           round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS dominant_share
    FROM cells GROUP BY 1, 2
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity (Machanavajjhala et al. 2007) of the order
    status within each (priority, year) QI class, plus the dominant
    sensitive value's share — a class with l=1 or share~1 leaks its
    sensitive attribute even at large k.

    Scale: one scan -> (QI, sensitive) cell counts (partial agg) ->
    regroup the cell table by QI.  Both aggregates shuffle on prefixes
    of the same key; the second input is |QI|x|statuses| rows."""
    cells = (_t(spark, sf_dir, "orders")
             .groupBy(F.col("o_orderpriority").alias("priority"),
                      F.year("o_orderdate").cast("int").alias("order_year"),
                      "o_orderstatus")
             .agg(F.count(F.lit(1)).alias("c")))
    return (cells.groupBy("priority", "order_year")
            .agg(F.sum("c").alias("k"),
                 F.count(F.lit(1)).alias("l_distinct"),
                 F.max("c").alias("mx"))
            .select("priority", "order_year",
                    F.col("k").cast("long").alias("k"),
                    F.col("l_distinct").cast("long").alias("l_distinct"),
                    F.round(F.col("mx").cast("double") / F.col("k"), 4)
                    .alias("dominant_share")))


@query(
    "reid_risk_ladder",
    oracle=f"""
    WITH {_QI_BASE},
    classes AS (
        SELECT GROUPING(nat) * 4 + GROUPING(seg) * 2 + GROUPING(balband)
                   AS gid,
               count(*) AS k
        FROM qi GROUP BY ROLLUP (nat, seg, balband)
    )
    SELECT CASE gid WHEN 3 THEN 'nation'
                    WHEN 1 THEN 'nation+segment'
                    WHEN 0 THEN 'nation+segment+balband' END AS qi_set,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_singletons,
           round(100.0 * sum(CASE WHEN k = 1 THEN k ELSE 0 END) / sum(k), 4)
               AS uniqueness_pct,
           round(CAST(sum(k) AS DOUBLE) / count(*), 4) AS avg_class_size
    FROM classes WHERE gid IN (0, 1, 3)
    GROUP BY 1
    """,
)
def reid_risk_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk ladder: uniqueness rate and mean class
    size as the quasi-identifier set grows nation -> +segment ->
    +balance band.  The three levels come from ONE ROLLUP aggregation
    (single Expand + shuffle), not three passes — the same trick lets a
    100 TB audit price every QI prefix for one scan.

    grouping_id bit semantics (1 = column rolled up) match between
    Spark's grouping_id() and DuckDB's GROUPING(): level 0 = full
    tuple, 1 = (nat, seg), 3 = (nat)."""
    classes = (_qi(spark, sf_dir)
               .rollup("nat", "seg", "balband")
               .agg(F.count(F.lit(1)).alias("k"),
                    F.grouping_id().alias("gid"))
               .filter(F.col("gid").isin(0, 1, 3)))
    return (classes.groupBy("gid")
            .agg(F.count(F.lit(1)).alias("n_classes"),
                 F.sum(F.when(F.col("k") == 1, 1).otherwise(0))
                 .alias("n_singletons"),
                 F.sum(F.when(F.col("k") == 1, F.col("k")).otherwise(0))
                 .alias("u_rows"),
                 F.sum("k").alias("rows"))
            .select(
                F.when(F.col("gid") == 3, "nation")
                .when(F.col("gid") == 1, "nation+segment")
                .otherwise("nation+segment+balband").alias("qi_set"),
                F.col("n_classes").cast("long").alias("n_classes"),
                F.col("n_singletons").cast("long").alias("n_singletons"),
                F.round(100.0 * F.col("u_rows") / F.col("rows"), 4)
                .alias("uniqueness_pct"),
                F.round(F.col("rows").cast("double") / F.col("n_classes"), 4)
                .alias("avg_class_size")))
