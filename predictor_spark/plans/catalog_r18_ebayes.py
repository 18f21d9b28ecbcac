"""Catalog part — empirical-Bayes rate estimation (STAGED r11).

Small-sample rates (conversion, defect, return rates per segment) are
noisy; every production dashboard eventually reaches for shrinkage.
Over each nation's "high-value order rate" (share of the nation's
orders above the GLOBAL median order value — an exact integer-rank
threshold):

- beta_posterior_rates  per-nation Beta(1,1)-posterior summary of the
                        rate: posterior mean (k+1)/(n+2) (the Laplace
                        rule of succession) and posterior standard
                        deviation — the honest uncertainty next to the
                        raw k/n
- eb_shrunk_rates       empirical Bayes: fit Beta(alpha, beta) to the
                        25 observed rates by method of moments (Morris
                        1983 normal-theory analog, beta-binomial form),
                        then shrink each nation toward the grand rate:
                        (k + alpha)/(n + alpha + beta) — nations with
                        few orders move most (shrink_weight reported)

Determinism: k and n are exact integer counts against an exact
nearest-rank median threshold; the moment fit runs over 25 exact
rationals; everything rounds 6 dp.

Scale: one orders scan for the threshold (rank window) + the keyed
customer/nation joins of the inequality family; the EB fit is a 25-row
reduction broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: (nation, n, k): orders per nation + count above the global median.
#: The EXACT global median comes from histogram refinement, not a
#: global-order rank window (which sorts the whole fact into ONE
#: partition — the classic scale killer; measured 3x at 10x data):
#: $1000-bucket counts aggregate fully parallel, the cumulative pass
#: runs over the tiny bucket frame, and only the median bucket's rows
#: (~n/buckets) are ever rank-sorted. Identical element to the global
#: (v, o_orderkey) order because bucket boundaries respect v order.
_RATE_SQL = """
    cents AS (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS v,
               n.n_name AS nation
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    bcum AS (
        SELECT bkt, c, sum(c) OVER (ORDER BY bkt) AS cum
        FROM (SELECT v // 100000 AS bkt, count(*) AS c
              FROM cents GROUP BY 1)
    ),
    want AS (
        SELECT CAST(ceil(0.5 * sum(c)) AS BIGINT) AS w FROM bcum
    ),
    target AS (
        SELECT bkt, cum - c AS before_cnt FROM bcum, want
        WHERE cum >= want.w AND cum - c < want.w
    ),
    med AS (
        SELECT v AS thresh FROM (
            SELECT c2.v,
                   row_number() OVER (ORDER BY c2.v, c2.o_orderkey) AS rn,
                   want.w - t.before_cnt AS need
            FROM cents c2, target t, want
            WHERE c2.v // 100000 = t.bkt
        ) WHERE rn = need
    ),
    rates AS (
        SELECT nation, count(*) AS n,
               sum(CASE WHEN v > med.thresh THEN 1 ELSE 0 END) AS k
        FROM cents, med GROUP BY nation
    )"""


def _rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cents = (o.join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .select("o_orderkey",
                     F.round(F.col("o_totalprice") * 100, 0).cast("long")
                     .alias("v"),
                     F.col("n_name").alias("nation"))
             .cache())
    # exact global median via histogram refinement (see _RATE_SQL note):
    # parallel bucket counts -> tiny cumulative frame -> rank ONLY the
    # median bucket's rows, never a whole-fact single-partition sort
    bcnt = (cents.groupBy((F.col("v") / 100000).cast("long").alias("bkt"))
            .agg(F.count(F.lit(1)).alias("c")))
    wcum = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    bcum = bcnt.withColumn("cum", F.sum("c").over(wcum))
    want = bcum.agg(F.ceil(0.5 * F.sum("c")).cast("long").alias("w"))
    target = (bcum.crossJoin(F.broadcast(want))
              .filter((F.col("cum") >= F.col("w"))
                      & (F.col("cum") - F.col("c") < F.col("w")))
              .select("bkt", (F.col("cum") - F.col("c"))
                      .alias("before_cnt"), "w"))
    in_bucket = (cents.join(
        F.broadcast(target),
        (F.col("v") / 100000).cast("long") == F.col("bkt")))
    wr = Window.orderBy("v", "o_orderkey")
    med = (in_bucket
           .withColumn("rn", F.row_number().over(wr))
           .filter(F.col("rn") == F.col("w") - F.col("before_cnt"))
           .select(F.col("v").alias("thresh")))
    return (cents.crossJoin(F.broadcast(med))
            .groupBy("nation")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("v") > F.col("thresh"), 1)
                       .otherwise(0)).alias("k")))


@query(
    "beta_posterior_rates",
    oracle=f"""
    WITH {_RATE_SQL}
    SELECT nation, CAST(n AS BIGINT) AS n_orders,
           CAST(k AS BIGINT) AS k_high,
           round(CAST(k AS DOUBLE) / n, 6) AS raw_rate,
           round((k + 1.0) / (n + 2.0), 6) AS post_mean,
           round(sqrt((k + 1.0) * (n - k + 1.0)
                      / ((n + 2.0) * (n + 2.0) * (n + 3.0))), 6)
               AS post_sd
    FROM rates ORDER BY nation
    """,
)
def beta_posterior_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta(1,1)-posterior summary of each nation's high-value order
    rate: Laplace posterior mean and the exact Beta posterior standard
    deviation next to the raw k/n.

    Scale: keyed joins + one rank window for the global median + a
    25-group aggregate."""
    r = _rates(spark, sf_dir)
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    return (r.select(
        "nation", F.col("n").cast("long").alias("n_orders"),
        F.col("k").cast("long").alias("k_high"),
        F.round(k / n, 6).alias("raw_rate"),
        F.round((k + 1.0) / (n + 2.0), 6).alias("post_mean"),
        F.round(F.sqrt((k + 1.0) * (n - k + 1.0)
                       / ((n + 2.0) * (n + 2.0) * (n + 3.0))), 6)
        .alias("post_sd"))
        .orderBy("nation"))


@query(
    "eb_shrunk_rates",
    oracle=f"""
    WITH {_RATE_SQL},
    g AS (
        SELECT avg(CAST(k AS DOUBLE) / n) AS mu,
               (sum(power(CAST(k AS DOUBLE) / n, 2))
                - count(*) * power(avg(CAST(k AS DOUBLE) / n), 2))
               / (count(*) - 1) AS var
        FROM rates
    ),
    ab AS (
        SELECT mu, var,
               greatest(mu * (1 - mu) / var - 1.0, 0.1) AS nu
        FROM g
    )
    SELECT nation,
           round(CAST(k AS DOUBLE) / n, 6) AS raw_rate,
           round((k + ab.mu * ab.nu) / (n + ab.nu), 6) AS shrunk_rate,
           round(ab.nu / (n + ab.nu), 6) AS shrink_weight
    FROM rates, ab ORDER BY nation
    """,
)
def eb_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of the per-nation rates: Beta prior fit
    by method of moments over the 25 observed rates (prior strength
    nu = alpha + beta = mu(1-mu)/var - 1, floored at 0.1 when the
    observed variance exceeds the binomial bound), posterior mean
    (k + mu·nu)/(n + nu), and the shrink weight nu/(n + nu) — how far
    each nation moved toward the grand rate.

    Scale: the prior fit is a 1-row reduction of the 25-rate frame,
    broadcast back."""
    r = _rates(spark, sf_dir).cache()
    rate = F.col("k").cast("double") / F.col("n")
    g = r.agg(
        F.avg(rate).alias("mu"),
        ((F.sum(rate * rate) - F.count(F.lit(1))
          * F.avg(rate) * F.avg(rate)) / (F.count(F.lit(1)) - 1))
        .alias("var"))
    ab = g.select("mu", F.greatest(
        F.col("mu") * (1 - F.col("mu")) / F.col("var") - 1.0,
        F.lit(0.1)).alias("nu"))
    return (r.crossJoin(F.broadcast(ab))
            .select("nation",
                    F.round(rate, 6).alias("raw_rate"),
                    F.round((F.col("k") + F.col("mu") * F.col("nu"))
                            / (F.col("n") + F.col("nu")), 6)
                    .alias("shrunk_rate"),
                    F.round(F.col("nu") / (F.col("n") + F.col("nu")), 6)
                    .alias("shrink_weight"))
            .orderBy("nation"))
