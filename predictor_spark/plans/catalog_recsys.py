"""Catalog part — co-occurrence item similarity (recommender core).

item_cooccurrence_similarity: brand-brand cosine over the co-purchase
matrix — sim(a, b) = |buyers(a) n buyers(b)| / sqrt(|buyers(a)| *
|buyers(b)|) — the item-item collaborative-filtering kernel
(Sarwar et al. 2001; Amazon's item-to-item CF) whose output feeds the
negative-sampling and precision@k rows from the other side.

Determinism: all counts are distinct-buyer integers; the cosine
divides once and the top-20 ranks on the ROUNDED value with brand-pair
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t


@query(
    "item_cooccurrence_similarity",
    oracle="""
    WITH bought AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey, p.p_brand
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
    ),
    deg AS (SELECT p_brand, count(*) AS n FROM bought GROUP BY p_brand),
    co AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               count(*) AS n_common
        FROM bought a JOIN bought b
          ON a.o_custkey = b.o_custkey AND a.p_brand < b.p_brand
        GROUP BY a.p_brand, b.p_brand
    )
    SELECT brand_a, brand_b, CAST(n_common AS BIGINT) AS n_common,
           round(CAST(n_common AS DOUBLE) / sqrt(da.n * CAST(db.n AS DOUBLE)),
                 6) AS cosine
    FROM co
    JOIN deg da ON da.p_brand = brand_a
    JOIN deg db ON db.p_brand = brand_b
    ORDER BY cosine DESC, brand_a, brand_b
    LIMIT 20
    """,
)
def item_cooccurrence_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity of brands
    over their distinct-buyer sets, top-20 pairs — the co-occurrence
    kernel behind "customers who bought X also bought Y".

    Scale: the (customer, brand) matrix is one distinct-reduced fact
    join (25-row part dim broadcast); candidate pairs come from the
    self-join ON CUSTOMER (only brands sharing a buyer meet — the
    wedge-join discipline again), and the per-customer fan-out is
    bounded by |brands| = 25, so no customer explodes.  At catalog
    scale the standard cap is top-k brands per customer before the
    self-join; degree counts broadcast onto the pair frame."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bought = (o.join(li, o.o_orderkey == li.l_orderkey)
              .join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .select("o_custkey", "p_brand").distinct()
              .cache())
    deg = bought.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    a = bought.select(F.col("o_custkey").alias("cust"),
                      F.col("p_brand").alias("brand_a"))
    b = bought.select(F.col("o_custkey").alias("cust"),
                      F.col("p_brand").alias("brand_b"))
    co = (a.join(b, ["cust"])
          .filter(F.col("brand_a") < F.col("brand_b"))
          .groupBy("brand_a", "brand_b")
          .agg(F.count(F.lit(1)).alias("n_common")))
    da = deg.select(F.col("p_brand").alias("brand_a"),
                    F.col("n").alias("na"))
    db = deg.select(F.col("p_brand").alias("brand_b"),
                    F.col("n").alias("nb"))
    return (co.join(F.broadcast(da), "brand_a")
            .join(F.broadcast(db), "brand_b")
            .select("brand_a", "brand_b",
                    F.col("n_common").cast("long").alias("n_common"),
                    F.round(F.col("n_common").cast("double")
                            / F.sqrt(F.col("na") * F.col("nb")
                                     .cast("double")), 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), "brand_a", "brand_b")
            .limit(20))
