"""Catalog part — repeated-measures rank tests (STAGED for r10).

The nonparametric stack has independent-groups (kruskal_wallis) and
two-sample (mann_whitney_value) tests; this family adds the BLOCKED
design — each day is a block, the five event types are the repeated
treatments measured on it:

- friedman_test_daily    Friedman's (1937) test: within-day ranks of
                         the five types' daily returns;
                         Q = 12n/(k(k+1)) sum_j (Rbar_j - (k+1)/2)^2
                         ~ chi^2(k-1) under exchangeability — "does
                         some type systematically out-return the
                         others, day after day?"
- kendalls_w_concordance Kendall's W = Q / (n (k-1)) — the effect size
                         of the same ranks (0 = no day-to-day
                         agreement on the ordering, 1 = identical
                         ranking every day)

Only complete blocks (days where ALL k types have a return) enter, the
standard Friedman requirement.

Determinism: returns are integer micro-units; within-day ranks use the
stable tie-break (r, event_type) — the rank() average-ties variant is
deliberately avoided because with k = 5 distinct integer returns ties
are measure-zero and the total order keeps every rank an exact small
integer; rank sums and their squares are exact integers; Q and W are
single closed-form doubles, rounded in-query (6 dp).

Scale: one events scan -> the daily rollup; the within-day rank is a
window over (date ordered by return) — |days| tiny partitions; the
complete-block filter and the k rank sums are grouped integer
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets

_K = 5  # event types per complete block

#: within-day ranks over complete blocks + per-type rank sums
_RANKS_SQL = f"""
    {_RET_BASE},
    blocks AS (
        SELECT ddate FROM rets GROUP BY ddate HAVING count(*) = {_K}
    ),
    ranked AS (
        SELECT r.event_type, r.ddate,
               row_number() OVER (PARTITION BY r.ddate
                                  ORDER BY r.r, r.event_type) AS rk
        FROM rets r JOIN blocks b ON b.ddate = r.ddate
    ),
    sums AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(rk AS HUGEINT)) AS rs
        FROM ranked GROUP BY event_type
    ),
    q AS (
        SELECT max(n) AS n, count(*) AS k,
               sum(CAST(rs AS HUGEINT) * rs) AS srs2
        FROM sums
    ),
    stat AS (
        SELECT n, k,
               12.0 * srs2 / (CAST(n AS DOUBLE) * k * (k + 1))
                   - 3.0 * n * (k + 1) AS fq
        FROM q
    )
"""


def _stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, k, fq): complete-block count, treatments, UNROUNDED Friedman
    Q — the shared core both rows project from (W must divide the
    unrounded Q or the two 6-dp roundings could disagree at 1e-7)."""
    rets = _rets(spark, sf_dir)
    wday = Window.partitionBy("ddate")
    ranked = (rets
              .withColumn("kcnt", F.count(F.lit(1)).over(wday))
              .filter(F.col("kcnt") == _K)
              .withColumn("rk", F.row_number().over(
                  Window.partitionBy("ddate")
                  .orderBy("r", "event_type"))))
    sums = (ranked.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("rk").cast("decimal(38,0)")).alias("rs")))
    q = sums.agg(F.max("n").alias("n"), F.count(F.lit(1)).alias("k"),
                 F.sum(F.col("rs").cast("decimal(38,0)") * F.col("rs"))
                 .alias("srs2"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    fq = (F.lit(12.0) * d("srs2")
          / (d("n") * F.col("k") * (F.col("k") + 1))
          - F.lit(3.0) * F.col("n") * (F.col("k") + 1))
    return q.select("n", "k", fq.alias("fq"))


@query(
    "friedman_test_daily",
    oracle=f"""
    WITH {_RANKS_SQL}
    SELECT CAST(n AS BIGINT) AS n_blocks,
           CAST(k AS BIGINT) AS k_treatments,
           round(fq, 6) AS friedman_q
    FROM stat
    """,
)
def friedman_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman Q over complete daily blocks (computational form
    Q = 12/(n k (k+1)) sum R_j^2 - 3 n (k+1), exact integer rank-sum
    squares), chi-square(k-1) under no systematic type ordering."""
    st = _stat(spark, sf_dir)
    return st.select(F.col("n").cast("long").alias("n_blocks"),
                     F.col("k").cast("long").alias("k_treatments"),
                     F.round("fq", 6).alias("friedman_q"))


@query(
    "kendalls_w_concordance",
    oracle=f"""
    WITH {_RANKS_SQL}
    SELECT CAST(n AS BIGINT) AS n_blocks,
           CAST(k AS BIGINT) AS k_treatments,
           round(fq / (CAST(n AS DOUBLE) * (k - 1)), 6) AS kendalls_w
    FROM stat
    """,
)
def kendalls_w_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W = Q / (n (k-1)) from the
    same complete-block ranks — the [0, 1] effect size telling HOW
    consistently the daily type ordering repeats."""
    st = _stat(spark, sf_dir)
    return st.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.col("k").cast("long").alias("k_treatments"),
        F.round(F.col("fq") / (F.col("n").cast("double")
                               * (F.col("k") - 1)), 6)
        .alias("kendalls_w"))
