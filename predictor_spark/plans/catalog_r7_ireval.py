"""Catalog part — ranked-retrieval evaluation metrics (STAGED for r7).

Completes the offline-eval battery (catalog_eval.py) with the three
graded-ranking metrics every retrieval / recommender stack reports
beside precision@k: NDCG@10 (Jarvelin & Kekalainen 2002), MAP@10 (the
TREC mean-average-precision), and MRR (Voorhees 1999).  Same scenario
as `precision_recall_at_k` (reference app_mvp.md "Evaluation" /
predictor_plugins/common/metrics.py surface): rank brands by
TRAIN-period popularity, grade the ranked list against the brands each
customer actually buys in the held-out TEST period, report the mean
per market segment.

Determinism — every per-user metric is integer micro-units before the
cross-user mean, so partial-agg summation order cannot move a hash:

- the log2 rank discounts 1/log2(r+1) are PRE-QUANTIZED nano-unit
  integer literals generated once in Python and inlined into BOTH the
  Spark plan and the oracle SQL — neither engine evaluates log2, so
  libm last-ulp drift cannot exist;
- DCG / IDCG are exact integer sums of those literals; NDCG is ONE
  double division then floor (the `_EVAL_BASE` score pattern);
- average precision rides the LCM trick: precision@r = h/r with
  r <= 10, so sum(h * 2520/r) is an exact integer numerator over the
  constant denominator 2520 * min(n_rel, 10);
- reciprocal rank is pure integer division (1000000 div r).

Scale: train/test are date-pruned fact joins (part dim broadcast, one
cached fact-join pass feeds both periods); the ranked list is 25 rows
(broadcast); per-user grading is one groupBy(customer); the segment
rollup is a 5-group aggregate of exact bigints.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.operators.localrel import local_df

_DISC_NANO = {r: int(round(1e9 / math.log2(r + 1))) for r in range(1, 11)}
_IDCG_NANO = {m: sum(_DISC_NANO[r] for r in range(1, m + 1))
              for m in range(1, 11)}
_AP_W = {r: 2520 // r for r in range(1, 11)}  # 2520 = lcm(1..10)

_DISC_SQL = ", ".join(f"({r}, {v})" for r, v in _DISC_NANO.items())
_IDCG_SQL = ", ".join(f"({m}, {v})" for m, v in _IDCG_NANO.items())
_AP_W_SQL = ", ".join(f"({r}, {v})" for r, v in _AP_W.items())

# shared oracle scaffold: train/test splits, popularity ranking, per-user
# relevant-count and ranked-hit positions
_RANK_BASE = """
    train AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey, p.p_brand
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE o.o_orderdate < DATE '1999-01-01'
    ),
    test AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey, p.p_brand
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE o.o_orderdate >= DATE '1999-01-01'
    ),
    ranked AS (
        SELECT p_brand,
               row_number() OVER (ORDER BY pop DESC, p_brand) AS rnk
        FROM (SELECT p_brand, count(DISTINCT o_custkey) AS pop
              FROM train GROUP BY p_brand)
    ),
    nrel AS (
        SELECT o_custkey, count(*) AS n_rel FROM test GROUP BY o_custkey
    ),
    hits AS MATERIALIZED (
        SELECT t.o_custkey, r.rnk,
               row_number() OVER (PARTITION BY t.o_custkey ORDER BY r.rnk)
                   AS h
        FROM test t JOIN ranked r ON t.p_brand = r.p_brand
    )"""


def _test_ranked(spark: SparkSession, sf_dir: str):
    """(test, ranked) frames: the distinct held-out (customer, brand)
    pairs, and the 25-row popularity ranking of the train-period brands.
    NDCG/MRR fold their per-user metric AND n_rel into one
    groupBy(customer) over test left-joined to the broadcast ranking, so
    the test distinct is evaluated once per query."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                           "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    split = F.lit("1999-01-01").cast("date")
    bought = (o.join(li, o.o_orderkey == li.l_orderkey)
              .join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .select("o_custkey", "p_brand", "o_orderdate")
              # train (ranking) and test (grading) both read this fact
              # join; uncached each re-runs it
              .cache())
    train = (bought.filter(F.col("o_orderdate") < split)
             .select("o_custkey", "p_brand").distinct())
    test = (bought.filter(F.col("o_orderdate") >= split)
            .select("o_custkey", "p_brand").distinct())
    ranked = (train.groupBy("p_brand")
              .agg(F.count_distinct("o_custkey").alias("pop"))
              .withColumn("rnk", F.row_number().over(
                  Window.orderBy(F.col("pop").desc(), "p_brand")))
              .select("p_brand", "rnk"))
    return test, ranked


def _rank_base(spark: SparkSession, sf_dir: str):
    """(nrel, hits) frames: per-test-user relevant count, and the rank +
    hit-ordinal of every test brand found in the popularity ranking
    (MAP@10 needs the per-user hit ordinal, hence the window)."""
    test, ranked = _test_ranked(spark, sf_dir)
    nrel = test.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = (test.join(F.broadcast(ranked), "p_brand")
            .select("o_custkey", "rnk")
            .withColumn("h", F.row_number().over(
                Window.partitionBy("o_custkey").orderBy("rnk"))))
    return nrel, hits


def _segment_mean(spark: SparkSession, sf_dir: str, per_user: DataFrame,
                  micro_col: str, out_col: str) -> DataFrame:
    """Mean of an integer micro-unit metric per market segment: exact
    bigint sum, ONE division by (count * 1e6), rounded for display."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        per_user.join(F.broadcast(cust),
                      per_user.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_"),
             F.sum(micro_col).alias("s_"))
        .select("segment",
                F.col("n_").cast("long").alias("n_users"),
                F.round(F.col("s_").cast("double")
                        / (F.col("n_") * F.lit(1000000.0)), 6)
                .alias(out_col))
    )


_SEG_TAIL = """
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(u.micro) AS DOUBLE) / (count(*) * 1000000.0), 6)
               AS {out_col}
    FROM per_user u JOIN customer c ON c.c_custkey = u.o_custkey
    GROUP BY c.c_mktsegment"""


@query(
    "ndcg_at_10_brands",
    oracle=f"""
    WITH {_RANK_BASE},
    disc(rnk, nano) AS (VALUES {_DISC_SQL}),
    idcg(m, nano) AS (VALUES {_IDCG_SQL}),
    dcg AS (
        SELECT o_custkey, sum(d.nano) AS dcg_nano
        FROM hits JOIN disc d ON hits.rnk = d.rnk
        GROUP BY o_custkey
    ),
    per_user AS (
        SELECT n.o_custkey,
               CAST(floor((1000000.0 * coalesce(g.dcg_nano, 0)) / i.nano)
                    AS BIGINT) AS micro
        FROM nrel n
        LEFT JOIN dcg g ON g.o_custkey = n.o_custkey
        JOIN idcg i ON i.m = least(n.n_rel, 10)
    )
    {_SEG_TAIL.format(out_col="ndcg_at_10")}
    """,
)
def ndcg_at_10_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean NDCG@10 of the popularity-ranked brand list per market
    segment.  DCG sums pre-quantized nano-unit discounts over the
    relevant ranks <= 10; IDCG is the prefix sum at min(n_rel, 10);
    NDCG is one floored double division to micro-units.

    Scale: the only non-broadcast shuffles are the fact-join distinct
    and one groupBy(customer); discount lookup is a 10-row broadcast."""
    # n_rel and the DCG sum collapse into ONE groupBy(customer) over the
    # test distinct left-joined to the 25-row (brand -> nano) broadcast:
    # the _rank_base form ran the test-period distinct TWICE (nrel +
    # hits), a per-customer rank window whose hit ordinal NDCG never
    # uses, and an nrel⋈dcg shuffle join (guide §2.4).  Brands outside
    # the ranking or ranked past 10 carry a NULL nano, which sum()
    # ignores — exactly the rows the old inner joins dropped; the
    # all-NULL (no-hit) sum is NULL, coalesced to 0 like the old left
    # join.  All integers, so results are bit-identical.
    test, ranked = _test_ranked(spark, sf_dir)
    disc = F.broadcast(local_df(spark, 
        sorted(_DISC_NANO.items()), "rnk int, nano long"))
    idcg = F.broadcast(local_df(spark, 
        sorted(_IDCG_NANO.items()), "m int, inano long"))
    brand_nano = ranked.join(disc, "rnk", "left").select("p_brand", "nano")
    per_user = (
        test.join(F.broadcast(brand_nano), "p_brand", "left")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_rel"),
             F.sum("nano").alias("dcg_nano"))
        .withColumn("m", F.least(F.col("n_rel"), F.lit(10)).cast("int"))
        .join(idcg, "m")
        .select(
            "o_custkey",
            F.floor((F.lit(1000000.0) * F.coalesce(F.col("dcg_nano"),
                                                   F.lit(0)))
                    / F.col("inano")).cast("long").alias("micro")))
    return _segment_mean(spark, sf_dir, per_user, "micro", "ndcg_at_10")


@query(
    "map_at_10_brands",
    oracle=f"""
    WITH {_RANK_BASE},
    w(rnk, w) AS (VALUES {_AP_W_SQL}),
    apn AS (
        SELECT o_custkey, sum(hits.h * w.w) AS numer
        FROM hits JOIN w ON hits.rnk = w.rnk
        GROUP BY o_custkey
    ),
    per_user AS (
        SELECT n.o_custkey,
               CAST(floor((1000000.0 * coalesce(a.numer, 0))
                          / (2520.0 * least(n.n_rel, 10)))
                    AS BIGINT) AS micro
        FROM nrel n LEFT JOIN apn a ON a.o_custkey = n.o_custkey
    )
    {_SEG_TAIL.format(out_col="map_at_10")}
    """,
)
def map_at_10_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean average precision at 10 per market segment.  precision@r at
    each relevant rank r is the exact rational h/r (h = hits so far);
    sum(h * 2520/r) keeps the numerator integer (2520 = lcm(1..10)),
    so AP needs exactly one floored double division per user.

    Scale: identical shuffle profile to ndcg_at_10_brands — the weight
    table is a 10-row broadcast, everything else is the shared cached
    fact join plus groupBy(customer) aggregates."""
    nrel, hits = _rank_base(spark, sf_dir)
    w = F.broadcast(local_df(spark, 
        sorted(_AP_W.items()), "rnk int, w long"))
    apn = (hits.join(w, "rnk")
           .groupBy("o_custkey")
           .agg(F.sum(F.col("h") * F.col("w")).alias("numer")))
    per_user = (
        nrel.join(apn, "o_custkey", "left")
        .select(
            "o_custkey",
            F.floor((F.lit(1000000.0) * F.coalesce(F.col("numer"), F.lit(0)))
                    / (F.lit(2520.0)
                       * F.least(F.col("n_rel"), F.lit(10))))
            .cast("long").alias("micro")))
    return _segment_mean(spark, sf_dir, per_user, "micro", "map_at_10")


@query(
    "mrr_brands",
    oracle=f"""
    WITH {_RANK_BASE},
    first AS (
        SELECT o_custkey, min(rnk) AS r1 FROM hits GROUP BY o_custkey
    ),
    per_user AS (
        SELECT n.o_custkey,
               CAST(coalesce(1000000 // f.r1, 0) AS BIGINT) AS micro
        FROM nrel n LEFT JOIN first f ON f.o_custkey = n.o_custkey
    )
    {_SEG_TAIL.format(out_col="mrr")}
    """,
)
def mrr_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the first test-period brand in the
    popularity ranking, per market segment.  1/rank is carried as the
    exact integer 1000000 div rank — no floating point exists anywhere
    before the final display division.

    Scale: min(rank) per customer is a map-side partial min; the rest
    is the shared broadcast-ranked fact join."""
    # min(rnk) and n_rel share ONE groupBy(customer) over the test
    # distinct left-joined to the broadcast ranking (the ndcg idiom):
    # min() ignores the NULL rnk of unranked brands, and a user with no
    # ranked brand gets r1 NULL -> micro 0, exactly the old nrel⋈first
    # left join.  n_rel itself is unused by the metric but keeps the
    # user set = all test users.
    test, ranked = _test_ranked(spark, sf_dir)
    per_user = (
        test.join(F.broadcast(ranked), "p_brand", "left")
        .groupBy("o_custkey")
        .agg(F.min("rnk").alias("r1"))
        .select(
            "o_custkey",
            F.coalesce(F.expr("1000000 div r1"), F.lit(0))
            .cast("long").alias("micro")))
    return _segment_mean(spark, sf_dir, per_user, "micro", "mrr")
