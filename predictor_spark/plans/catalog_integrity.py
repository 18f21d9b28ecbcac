"""Catalog part — referential / structural integrity screens.

The data-contract checks a warehouse runs on every load, as queries
(complementing the statistical screens in catalog_quality):

- referential_orphan_counts  orphaned foreign keys across every FK
                             edge of the star schema, one row per edge
- duplicate_pk_check         primary-key uniqueness per table
- order_reconciliation       cross-table value reconciliation: the
                             order header total vs the recomputed
                             line-item sum, bucketed by relative error

Determinism: orphan and duplicate counts are exact integers;
reconciliation compares integer cents (header cents vs sum of per-line
rounded cents) and buckets on exact integer thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from functools import reduce

from predictor_spark.plans.catalog import query, _t

# FK graph of the star schema: (edge name, child table, child key,
# parent table, parent key)
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
]

_PK_TABLES = [
    ("region", "r_regionkey"), ("nation", "n_nationkey"),
    ("customer", "c_custkey"), ("supplier", "s_suppkey"),
    ("part", "p_partkey"), ("orders", "o_orderkey"),
    ("events", "event_id"), ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]


@query(
    "referential_orphan_counts",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{name}' AS fk_edge,
            CAST(count(*) AS BIGINT) AS n_child_rows,
            CAST(sum(CASE WHEN p.{pkey} IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_orphans
            FROM {child} c LEFT JOIN {parent} p ON c.{ckey} = p.{pkey}"""
        for name, child, ckey, parent, pkey in _FK_EDGES),
)
def referential_orphan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphaned-FK audit over every foreign-key edge of the schema:
    child rows whose key has no parent — the first data-contract
    check after any load, emitted as one row per edge so the alert
    rule is a simple `n_orphans > 0` filter.

    Scale: the edges are grouped by CHILD table, so each child — in
    particular the lineitem fact, which owns three FK edges — is
    scanned ONCE for all of its edges with only the key columns read
    (r14, guide §2.4: the per-edge form scanned lineitem three times).
    Every parent is pre-aggregated to (key, multiplicity) before the
    broadcast, which keeps the chained LEFT joins row-preserving even
    on a degenerate duplicate-PK parent: per edge,
    sum(coalesce(cnt, 1)) and sum(cnt IS NULL) reproduce the raw
    left join's count(*) / NULL-parent sum exactly for ANY parent
    multiplicity, so the combined single-scan form is equivalent to
    the per-edge joins on every input."""
    by_child: dict[str, list] = {}
    for edge in _FK_EDGES:
        by_child.setdefault(edge[1], []).append(edge)
    parts = []
    for child, edges in by_child.items():
        joined = _t(spark, sf_dir, child).select(
            *sorted({e[2] for e in edges}))
        for i, (name, _, ckey, parent, pkey) in enumerate(edges):
            p = (_t(spark, sf_dir, parent).select(pkey)
                 .groupBy(pkey).agg(F.count(F.lit(1)).alias(f"_cnt{i}")))
            joined = joined.join(
                F.broadcast(p), F.col(ckey) == F.col(pkey), "left"
            ).drop(pkey)
        aggs = []
        for i in range(len(edges)):
            aggs.append(F.coalesce(F.sum(F.coalesce(F.col(f"_cnt{i}"),
                                                    F.lit(1))), F.lit(0))
                        .cast("long").alias(f"_ncr{i}"))
            aggs.append(F.sum(F.when(F.col(f"_cnt{i}").isNull(), 1)
                              .otherwise(0)).cast("long").alias(f"_no{i}"))
        one = joined.agg(*aggs)
        stack_args = ", ".join(
            f"'{edges[i][0]}', _ncr{i}, _no{i}" for i in range(len(edges)))
        parts.append(one.select(F.expr(
            f"stack({len(edges)}, {stack_args}) "
            "AS (fk_edge, n_child_rows, n_orphans)")))
    return reduce(lambda a, b: a.unionAll(b), parts)


@query(
    "duplicate_pk_check",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{table}' AS table_name,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(DISTINCT {key}) AS BIGINT) AS n_distinct_keys,
            CAST(count(*) - count(DISTINCT {key}) AS BIGINT) AS n_dup_rows
            FROM {table}"""
        for table, key in _PK_TABLES),
)
def duplicate_pk_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit for every keyed table: row count vs
    distinct-key count, one row per table — the other half of the
    load-time data contract (duplicate keys silently double-count in
    every downstream join).

    Scale: count(distinct key) is the only shuffle per table and reads
    ONE column; for approximate monitoring at 100 TB swap in
    approx_count_distinct / the HLL row (catalog_mlprep) — this exact
    variant is the reconciliation-grade check."""
    parts = []
    for table, key in _PK_TABLES:
        t = _t(spark, sf_dir, table).select(key)
        parts.append(
            t.agg(F.lit(table).alias("table_name"),
                  F.count(F.lit(1)).cast("long").alias("n_rows"),
                  F.count_distinct(F.col(key)).cast("long")
                  .alias("n_distinct_keys"))
            .select("table_name", "n_rows", "n_distinct_keys",
                    (F.col("n_rows") - F.col("n_distinct_keys"))
                    .cast("long").alias("n_dup_rows")))
    return reduce(lambda a, b: a.unionAll(b), parts)


@query(
    "order_reconciliation",
    oracle="""
    WITH line AS (
        SELECT l_orderkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount)
                              * (1 + l_tax) * 100) AS BIGINT)) AS line_cents
        FROM lineitem GROUP BY l_orderkey
    ),
    cmp AS (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
               coalesce(l.line_cents, 0) AS line_cents
        FROM orders o LEFT JOIN line l ON l.l_orderkey = o.o_orderkey
    ),
    bucketed AS (
        SELECT CASE
            WHEN header_cents = line_cents THEN 'exact'
            WHEN abs(header_cents - line_cents) * 100
                 <= abs(header_cents) THEN 'within_1pct'
            WHEN abs(header_cents - line_cents) * 20
                 <= abs(header_cents) THEN 'within_5pct'
            ELSE 'mismatch' END AS bucket,
            header_cents, line_cents
        FROM cmp
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(abs(header_cents - line_cents)) AS DOUBLE)
                 / count(*) / 100, 4) AS mean_abs_diff
    FROM bucketed GROUP BY bucket
    """,
)
def order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table value reconciliation: the order header's total price
    against the total recomputed from its line items (extended price
    net of discount, plus tax), bucketed by relative error — the
    finance-grade consistency check between a fact table and its
    rollup (synthetic data isn't constructed to reconcile; the row
    REPORTS the divergence profile rather than asserting zero).

    Scale: one groupBy(orderkey) on lineitem + one key join to orders
    — both already partitioned on the same key in a bucketed layout,
    so the join can be shuffle-free; comparisons and bucket edges are
    exact integer-cent arithmetic (|diff| * 100 <= |header| avoids any
    float ratio)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    line = (li.groupBy("l_orderkey")
            .agg(F.sum(F.round(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))
                               * (1 + F.col("l_tax")) * 100, 0)
                       .cast("long")).alias("line_cents")))
    cmp_df = (o.join(line, o.o_orderkey == line.l_orderkey, "left")
              .select(F.round(F.col("o_totalprice") * 100, 0).cast("long")
                      .alias("header_cents"),
                      F.coalesce(F.col("line_cents"), F.lit(0))
                      .alias("line_cents")))
    diff = F.abs(F.col("header_cents") - F.col("line_cents"))
    bucket = (F.when(F.col("header_cents") == F.col("line_cents"), "exact")
              .when(diff * 100 <= F.abs(F.col("header_cents")), "within_1pct")
              .when(diff * 20 <= F.abs(F.col("header_cents")), "within_5pct")
              .otherwise("mismatch"))
    return (cmp_df.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
                 F.round(F.sum(diff).cast("double") / F.count(F.lit(1))
                         / 100, 4).alias("mean_abs_diff")))
