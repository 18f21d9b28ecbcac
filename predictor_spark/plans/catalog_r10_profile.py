"""Catalog part — warehouse data-profiling screens (STAGED r10).

The Deequ-style table-profiling pass (Schelter et al., "Automating
Large-Scale Data Quality Verification", VLDB 2018) every ingestion
pipeline runs before trusting a 100 TB table:

- table_profile_orders        per-column completeness / distinct /
                              null counts for the orders table, one
                              row per column
- categorical_entropy_profile Shannon entropy (bits) of the low-
                              cardinality columns across four tables —
                              the "is this column degenerate?" screen
- histogram_totalprice_profile a 10-bucket equi-width histogram of
                              order value in exact integer cents

Determinism: all counts are exact integers; completeness is one
int/int division; entropy terms −p·ln(p) accumulate in explicit
category order via a cumulative window (never a blind float SUM) and
convert to bits by one ln(2) division; histogram bucket indices and
bounds are pure integer arithmetic on cents — no float ever assigns
a row to a bucket.

Scale: each profile is one aggregation pass over its table
(map-side-combinable); the entropy/histogram frames collapse to
≤ |categories| / 10 rows before their windows. The exact
count(DISTINCT) columns are the oracle-checkable stand-in for the
HLL sketches the same profile would ride at 100 TB
(hll_distinct_users, catalog_mlprep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_ORDER_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority")


@query(
    "table_profile_orders",
    oracle="""
    WITH base AS (
        SELECT count(*) AS n FROM orders
    )
    SELECT col_name, n_rows, n_nulls, n_distinct,
           round(CAST(n_rows - n_nulls AS DOUBLE) / n_rows, 6)
               AS completeness
    FROM (
        SELECT 'o_orderkey' AS col_name, (SELECT n FROM base) AS n_rows,
               count(*) FILTER (WHERE o_orderkey IS NULL) AS n_nulls,
               count(DISTINCT o_orderkey) AS n_distinct FROM orders
        UNION ALL
        SELECT 'o_custkey', (SELECT n FROM base),
               count(*) FILTER (WHERE o_custkey IS NULL),
               count(DISTINCT o_custkey) FROM orders
        UNION ALL
        SELECT 'o_orderstatus', (SELECT n FROM base),
               count(*) FILTER (WHERE o_orderstatus IS NULL),
               count(DISTINCT o_orderstatus) FROM orders
        UNION ALL
        SELECT 'o_totalprice', (SELECT n FROM base),
               count(*) FILTER (WHERE o_totalprice IS NULL),
               count(DISTINCT o_totalprice) FROM orders
        UNION ALL
        SELECT 'o_orderdate', (SELECT n FROM base),
               count(*) FILTER (WHERE o_orderdate IS NULL),
               count(DISTINCT o_orderdate) FROM orders
        UNION ALL
        SELECT 'o_orderpriority', (SELECT n FROM base),
               count(*) FILTER (WHERE o_orderpriority IS NULL),
               count(DISTINCT o_orderpriority) FROM orders
    ) ORDER BY col_name
    """,
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the orders table: row count, null count,
    exact distinct count and completeness ratio — the first screen a
    data platform renders for any newly landed table.

    Scale: ONE aggregation pass computes every column's null and
    distinct aggregates together (Spark expands distinct aggregates
    into one shuffle); the 6-row report is a stack over that single
    row. At 100 TB the distinct columns would ride HLL sketches —
    exact here so DuckDB can replay it."""
    od = _t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _ORDER_COLS:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = od.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _ORDER_COLS)
    rows = one.select(
        F.col("n_rows"),
        F.expr(f"stack({len(_ORDER_COLS)}, {stack_args}) "
               "AS (col_name, n_nulls, n_distinct)"))
    return rows.select(
        "col_name", F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round((F.col("n_rows") - F.col("n_nulls")).cast("double")
                / F.col("n_rows"), 6).alias("completeness")
    ).orderBy("col_name")


#: (report label, table, column) for the entropy screen
_ENTROPY_COLS = (
    ("events.event_type", "events", "event_type"),
    ("lineitem.l_returnflag", "lineitem", "l_returnflag"),
    ("orders.o_orderpriority", "orders", "o_orderpriority"),
    ("orders.o_orderstatus", "orders", "o_orderstatus"),
)


def _entropy_sql(label: str, table: str, col: str) -> str:
    # H = ln(n) − (Σ c·ln c)/n  ==  −Σ (c/n)·ln(c/n): the right-hand
    # form needs n before the scan, the left-hand form lets counts, k
    # and Σ c·ln c accumulate in ONE ordered cumulative window whose
    # last row carries every total
    return f"""
        SELECT '{label}' AS col_name, rn AS k, sc AS n,
               ln(CAST(sc AS DOUBLE)) - scl / sc AS entropy_nats
        FROM (
            SELECT sum(c) OVER w AS sc,
                   sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                       OVER w AS scl,
                   row_number() OVER (ORDER BY cat) AS rn
            FROM (
                SELECT CAST({col} AS VARCHAR) AS cat, count(*) AS c
                FROM {table} GROUP BY {col}
            ) WINDOW w AS (ORDER BY cat ROWS UNBOUNDED PRECEDING)
        ) ORDER BY rn DESC LIMIT 1
    """


@query(
    "categorical_entropy_profile",
    oracle=f"""
    SELECT col_name, CAST(k AS BIGINT) AS n_categories,
           CAST(n AS BIGINT) AS n_rows,
           round(entropy_nats / ln(2.0), 6) AS entropy_bits
    FROM (
        {" UNION ALL ".join("(" + _entropy_sql(*e) + ")"
                            for e in _ENTROPY_COLS)}
    ) ORDER BY col_name
    """,
)
def categorical_entropy_profile(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of four low-cardinality columns across
    three tables — near-zero entropy flags a degenerate column, entropy
    near log2(k) says the categories are balanced. The −p·ln(p) terms
    accumulate in explicit category order; bits = nats / ln 2.

    Scale: each column is one map-side-combinable count-by-category,
    collapsing to ≤|categories| rows before the entropy window."""
    outs = []
    for label, table, col in _ENTROPY_COLS:
        counts = (_t(spark, sf_dir, table)
                  .groupBy(F.col(col).cast("string").alias("cat"))
                  .agg(F.count(F.lit(1)).alias("c")))
        # H = ln(n) − (Σ c·ln c)/n lets counts, k and Σ c·ln c all ride
        # ONE ordered cumulative window (same spec, same frame); the
        # last row (max rn — rn is unique, so the struct-max is exact)
        # carries every total
        wasc = Window.orderBy("cat").rowsBetween(
            Window.unboundedPreceding, 0)
        cum = counts.select(
            F.sum("c").over(wasc).alias("sc"),
            F.sum(F.col("c").cast("double")
                  * F.log(F.col("c").cast("double"))).over(wasc)
            .alias("scl"),
            F.row_number().over(Window.orderBy("cat")).alias("rn"))
        last = (cum.agg(F.max(F.struct("rn", "sc", "scl")).alias("m"))
                .select(F.lit(label).alias("col_name"),
                        F.col("m.rn").alias("k"),
                        F.col("m.sc").alias("n"),
                        (F.log(F.col("m.sc").cast("double"))
                         - F.col("m.scl") / F.col("m.sc"))
                        .alias("entropy_nats")))
        outs.append(last)
    allc = outs[0]
    for o in outs[1:]:
        allc = allc.unionByName(o)
    return (allc.select(
        "col_name", F.col("k").cast("long").alias("n_categories"),
        F.col("n").cast("long").alias("n_rows"),
        F.round(F.col("entropy_nats") / F.log(F.lit(2.0)), 6)
        .alias("entropy_bits"))
        .orderBy("col_name"))


@query(
    "histogram_totalprice_profile",
    oracle="""
    WITH cents AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ),
    bounds AS (
        SELECT min(c) AS mn, max(c) - min(c) + 1 AS w FROM cents
    ),
    bucketed AS (
        SELECT least((c - mn) * 10 // w, 9) AS bucket, mn, w
        FROM cents, bounds
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(mn + bucket * w // 10 AS BIGINT) AS lo_cents,
           CAST(mn + (bucket + 1) * w // 10 - 1 AS BIGINT) AS hi_cents,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM bucketed GROUP BY bucket, mn, w ORDER BY bucket
    """,
)
def histogram_totalprice_profile(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """10-bucket equi-width histogram of order value: bucket index
    (c−min)·10 div width and the bucket bounds are pure integer
    arithmetic on exact cents — the profile histogram a warehouse
    draws beside every numeric column.

    Scale: one min/max pass (broadcast as a 1-row scalar frame), one
    map-side-combinable count by bucket."""
    od = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
    bounds = od.agg(F.min("c").alias("mn"),
                    (F.max("c") - F.min("c") + 1).alias("w"))
    bucketed = od.crossJoin(F.broadcast(bounds)).select(
        F.least(F.expr("(c - mn) * 10 div w"), F.lit(9).cast("long"))
        .alias("bucket"),
        "mn", "w")
    return (bucketed.groupBy("bucket", "mn", "w")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
            .select("bucket",
                    (F.col("mn") + F.expr("bucket * w div 10"))
                    .cast("long").alias("lo_cents"),
                    (F.col("mn") + F.expr("(bucket + 1) * w div 10") - 1)
                    .cast("long").alias("hi_cents"),
                    "n_orders")
            .orderBy("bucket"))
