"""Catalog part — nonparametric rank statistics (STAGED for r7).

Completes the experiment-statistics surface (catalog_experiment.py:
Welch t, Mann-Whitney, chi-square, CUPED) with the three rank-based
screens analysts reach for when normality is off the table:

- spearman_qty_discount       Spearman rank correlation (Spearman 1904)
                              between line-item quantity and discount
- kruskal_wallis_value_by_type  Kruskal-Wallis H (Kruskal & Wallis
                              1952) for event value across event types,
                              with the standard tie correction
- kendall_tau_qty_discount    Kendall tau-b (Kendall 1945) from the
                              quantity x discount contingency table

Determinism: every rank is a MIDRANK over grouped values carried as
the exact integer 2*midrank (the roc_auc_rank half-unit trick), so all
rank sums / products are exact integers (DECIMAL(38,0) on Spark,
HUGEINT on DuckDB); concordant/discordant pair counts come from exact
cell-count products.  Each statistic is ONE closed-form double
expression over those exact integer aggregates, written with the same
operation tree on both engines, then rounded for display.

Scale: ranks come from GROUPED values (groupBy(value) then a window
over |distinct| rows), never a per-row global sort; the Kendall cell
table is |qty| x |discount| ~ 550 rows, self-joined broadcast-side;
everything else is map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

# half-unit midrank of a tie group: 2*midrank = 2*(cum - c) + c + 1,
# where cum is the inclusive cumulative count in value order
_MID2 = "(2 * (cum - c) + c + 1)"


@query(
    "spearman_qty_discount",
    oracle=f"""
    WITH li AS MATERIALIZED (
        SELECT CAST(l_quantity AS BIGINT) AS q, l_discount AS d
        FROM lineitem
    ),
    qr AS (
        SELECT q, {_MID2} AS r2
        FROM (SELECT q, count(*) AS c,
                     sum(count(*)) OVER (ORDER BY q) AS cum
              FROM li GROUP BY q)
    ),
    dr AS (
        SELECT d, {_MID2} AS r2
        FROM (SELECT d, count(*) AS c,
                     sum(count(*)) OVER (ORDER BY d) AS cum
              FROM li GROUP BY d)
    ),
    s AS (
        SELECT count(*) AS n,
               sum(CAST(qr.r2 AS HUGEINT)) AS sx,
               sum(CAST(dr.r2 AS HUGEINT)) AS sy,
               sum(CAST(qr.r2 AS HUGEINT) * qr.r2) AS sxx,
               sum(CAST(dr.r2 AS HUGEINT) * dr.r2) AS syy,
               sum(CAST(qr.r2 AS HUGEINT) * dr.r2) AS sxy
        FROM li JOIN qr ON li.q = qr.q JOIN dr ON li.d = dr.d
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS spearman_rho
    FROM s
    """,
)
def spearman_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho = Pearson correlation of the midranks of quantity
    and discount.  The half-unit doubling cancels in the correlation
    ratio, so no rescaling is needed.

    Scale: the two midrank tables are ~50 and ~11 rows (broadcast back
    onto the fact scan); the moment sums are map-side partial DECIMAL
    aggregates; one double formula at the end."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.col("l_discount").alias("d"))
    # the two tiny midrank tables and the moment aggregation all read
    # this scan; cache() would pin the full fact — instead each GROUP BY
    # is pushed to the scan and only the joined pass is wide
    def ranks(col: str):
        grp = li.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        cum = F.sum("c").over(
            Window.orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return grp.select(col, (2 * (cum - F.col("c")) + F.col("c") + 1)
                          .alias("r2"))

    qr = ranks("q").withColumnRenamed("r2", "rx2")
    dr = ranks("d").withColumnRenamed("r2", "ry2")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = (li.join(F.broadcast(qr), "q").join(F.broadcast(dr), "d")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(dec("rx2")).alias("sx"),
              F.sum(dec("ry2")).alias("sy"),
              F.sum(dec("rx2") * F.col("rx2")).alias("sxx"),
              F.sum(dec("ry2") * F.col("ry2")).alias("syy"),
              F.sum(dec("rx2") * F.col("ry2")).alias("sxy")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round((d("n") * d("sxy") - d("sx") * d("sy"))
                / F.sqrt((d("n") * d("sxx") - d("sx") * d("sx"))
                         * (d("n") * d("syy") - d("sy") * d("sy"))),
                6).alias("spearman_rho"))


@query(
    "kruskal_wallis_value_by_type",
    oracle=f"""
    WITH ev AS MATERIALIZED (
        SELECT event_type, value FROM events
    ),
    vr AS MATERIALIZED (
        SELECT value, c, {_MID2} AS r2
        FROM (SELECT value, count(*) AS c,
                     sum(count(*)) OVER (ORDER BY value) AS cum
              FROM ev GROUP BY value)
    ),
    grp AS (
        SELECT event_type, count(*) AS nj,
               sum(CAST(vr.r2 AS HUGEINT)) AS rj2
        FROM ev JOIN vr ON ev.value = vr.value
        GROUP BY event_type
    ),
    ties AS (
        SELECT sum(CAST(c AS HUGEINT) * c * c - c) AS t3t FROM vr
    ),
    tot AS (
        SELECT sum(nj) AS n, count(*) AS k,
               sum(CAST(rj2 AS DOUBLE) * rj2 / (4.0 * nj)) AS rterm
        FROM grp
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(k - 1 AS BIGINT) AS df,
           round((12.0 * rterm / (CAST(n AS DOUBLE) * (n + 1))
                  - 3.0 * (n + 1))
                 / (1.0 - CAST(t3t AS DOUBLE)
                          / (CAST(n AS DOUBLE) * n * n - n)), 6)
               AS h_statistic
    FROM tot, ties
    """,
)
def kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across event types with tie correction:
    H = [12/(N(N+1)) * sum R_j^2/n_j - 3(N+1)] / [1 - sum(t^3-t)/(N^3-N)].
    R_j rides half-unit midranks, so R_j^2/n_j uses /4 once in the
    double term; the tie term sums exact c^3-c integers.

    Scale: midranks are per-DISTINCT-value (one groupBy + one window
    over |distinct| rows); the per-group rank sums are map-side
    partials over the value-joined scan; the final H is a 1-row
    formula over k exact integers."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    grp_v = ev.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    cum = F.sum("c").over(
        Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    vr = grp_v.select(
        "value", "c",
        (2 * (cum - F.col("c")) + F.col("c") + 1).alias("r2")).cache()
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    grp = (ev.join(vr.select("value", "r2"), "value")
           .groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("nj"), F.sum(dec("r2")).alias("rj2")))
    ties = vr.agg(
        F.sum(dec("c") * F.col("c") * F.col("c") - F.col("c")).alias("t3t"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    tot = grp.agg(
        F.sum("nj").alias("n"), F.count(F.lit(1)).alias("k"),
        F.sum(d("rj2") * F.col("rj2") / (4.0 * F.col("nj"))).alias("rterm"))
    return (
        tot.crossJoin(F.broadcast(ties))
        .select(
            F.col("n").cast("long").alias("n"),
            (F.col("k") - 1).cast("long").alias("df"),
            F.round((12.0 * F.col("rterm") / (d("n") * (F.col("n") + 1))
                     - 3.0 * (F.col("n") + 1))
                    / (1.0 - d("t3t") / (d("n") * F.col("n") * F.col("n")
                                         - F.col("n"))), 6)
            .alias("h_statistic")))


@query(
    "kendall_tau_qty_discount",
    oracle="""
    WITH cells AS MATERIALIZED (
        SELECT CAST(l_quantity AS BIGINT) AS x, l_discount AS y,
               CAST(count(*) AS HUGEINT) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
        SELECT sum(CASE WHEN b.y > a.y THEN a.c * b.c ELSE 0 END) AS nc,
               sum(CASE WHEN b.y < a.y THEN a.c * b.c ELSE 0 END) AS nd
        FROM cells a JOIN cells b ON b.x > a.x
    ),
    margx AS (
        SELECT sum(t * (t - 1) / 2) AS n1
        FROM (SELECT sum(c) AS t FROM cells GROUP BY x)
    ),
    margy AS (
        SELECT sum(t * (t - 1) / 2) AS n2
        FROM (SELECT sum(c) AS t FROM cells GROUP BY y)
    ),
    tot AS (SELECT sum(c) AS n FROM cells)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(nc AS BIGINT) AS concordant,
           CAST(nd AS BIGINT) AS discordant,
           round(CAST(nc - nd AS DOUBLE)
                 / sqrt((CAST(n * (n - 1) / 2 - n1 AS DOUBLE))
                        * (CAST(n * (n - 1) / 2 - n2 AS DOUBLE))), 6)
               AS tau_b
    FROM pairs, margx, margy, tot
    """,
)
def kendall_tau_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b from the quantity x discount contingency table:
    concordant/discordant counts are exact products of cell counts over
    the ~550-cell table (never the O(n^2) row-pair join), tie margins
    come from the row/column marginals, tau-b = (nc-nd)/sqrt((n0-n1)(n0-n2)).

    Scale: ONE groupBy over the fact scan reduces 6M rows to |qty| x
    |discount| cells; the cell self-join is broadcast x broadcast.
    All counts exact DECIMAL; one double formula at the end."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.col("l_discount").alias("y"))
    cells = (li.groupBy("x", "y")
             .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
             .cache())
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (a.join(F.broadcast(b), F.col("b.x") > F.col("a.x"))
             .agg(F.sum(F.when(F.col("b.y") > F.col("a.y"),
                               F.col("a.c") * F.col("b.c"))
                        .otherwise(F.lit(0).cast("decimal(38,0)")))
                  .alias("nc"),
                  F.sum(F.when(F.col("b.y") < F.col("a.y"),
                               F.col("a.c") * F.col("b.c"))
                        .otherwise(F.lit(0).cast("decimal(38,0)")))
                  .alias("nd")))
    n1 = (cells.groupBy("x").agg(F.sum("c").alias("t"))
          .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n1")))
    n2 = (cells.groupBy("y").agg(F.sum("c").alias("t"))
          .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n2")))
    tot = cells.agg(F.sum("c").alias("n"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n0 = F.col("n") * (F.col("n") - 1) / 2
    return (
        pairs.crossJoin(F.broadcast(n1)).crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("nc").cast("long").alias("concordant"),
            F.col("nd").cast("long").alias("discordant"),
            F.round((d("nc") - d("nd"))
                    / F.sqrt((n0 - F.col("n1")).cast("double")
                             * (n0 - F.col("n2")).cast("double")),
                    6).alias("tau_b")))
