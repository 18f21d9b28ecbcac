"""Catalog part — deterministic resampling inference (STAGED r11).

Bootstrap and permutation inference are the workhorse tools when no
closed-form null exists — and both are usually RNG-driven, which the
engine's determinism contract forbids. These rows run them with
md5-derived resampling (the established hopkins/md5-sample idiom): the
"random" draws are pure functions of (series, replicate, position), so
both engines replay the identical resampling plan.

- bootstrap_ci_mean_return  B = 200 nonparametric bootstrap replicates
                            of the mean daily return per type: draw j
                            of replicate b takes the return at position
                            1 + (md5int(type|b|j) mod n); the 95% CI is
                            the exact 2.5/97.5 nearest-rank order
                            statistic of the replicate means (Efron
                            1979)
- signflip_permutation_test per-type sign-flip permutation test of
                            H0: mean return = 0 (the exact test for a
                            symmetric null): B = 500 sign patterns from
                            md5 parity, p = (1 + #{|T_b| >= |T_obs|})
                            / (B + 1)

Scale: resampling joins the (b, j) spine to the INDEXED return frame on
(type, position) — spine size B·n ≈ 6k/30k rows per type, constant at
any volume SF (days don't grow with rows); the raw fact is scanned
once. Replicate statistics are exact integer sums of micro-returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t  # noqa: F401
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets

_B_BOOT = 200
_B_PERM = 500

#: indexed returns: (event_type, pos 1..n, r, n)
_IDX_SQL = f"""
    WITH {_RET_BASE},
    idx AS MATERIALIZED (
        SELECT event_type, r,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ddate) AS pos,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM rets
    )"""


def _idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("ddate")
    wt = Window.partitionBy("event_type")
    return (_rets(spark, sf_dir)
            .select("event_type", "r",
                    F.row_number().over(w).alias("pos"),
                    F.count(F.lit(1)).over(wt).alias("n"))
            .cache())


@query(
    "bootstrap_ci_mean_return",
    oracle=f"""
    {_IDX_SQL},
    spine AS (
        SELECT i.event_type, i.n, b.b, j.j,
               1 + CAST(('0x' || substr(md5(i.event_type || '|'
                        || CAST(b.b AS VARCHAR) || '|'
                        || CAST(j.j AS VARCHAR)), 1, 12)) AS BIGINT)
                   % i.n AS pos
        FROM (SELECT DISTINCT event_type, n FROM idx) i,
             (SELECT unnest(range(1, {_B_BOOT} + 1)) AS b) b,
             LATERAL (SELECT unnest(range(1, i.n + 1)) AS j) j
    ),
    reps AS (
        SELECT s.event_type, s.b,
               sum(CAST(idx.r AS HUGEINT)) AS tot, count(*) AS n
        FROM spine s JOIN idx
          ON idx.event_type = s.event_type AND idx.pos = s.pos
        GROUP BY s.event_type, s.b
    ),
    means AS (
        SELECT event_type,
               CAST(tot AS DOUBLE) / n / 1e6 AS m,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY CAST(tot AS DOUBLE) / n, b)
                   AS rnk
        FROM reps
    )
    SELECT event_type,
           round(avg(m), 6) AS boot_mean,
           round(max(CASE WHEN rnk = CAST(ceil(0.025 * {_B_BOOT})
                                     AS BIGINT) THEN m END), 6) AS ci_lo,
           round(max(CASE WHEN rnk = CAST(ceil(0.975 * {_B_BOOT})
                                     AS BIGINT) THEN m END), 6) AS ci_hi
    FROM means GROUP BY event_type ORDER BY event_type
    """,
)
def bootstrap_ci_mean_return(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Deterministic md5-bootstrap 95% CI (nearest-rank percentile
    method over 200 replicate means) of the mean daily return per type.

    Scale: the (replicate, draw) spine is B·n rows per type — constant
    at any SF; the draw join is keyed on (type, pos)."""
    idx = _idx(spark, sf_dir)
    heads = idx.select("event_type", "n").distinct()
    spine = (heads
             .select("event_type", "n",
                     F.explode(F.sequence(F.lit(1), F.lit(_B_BOOT)))
                     .alias("b"))
             .select("event_type", "n", "b",
                     F.explode(F.sequence(F.lit(1), F.col("n")))
                     .alias("j")))
    h = F.conv(F.substring(F.md5(F.concat_ws(
        "|", "event_type", "b", "j")), 1, 12), 16, 10).cast("long")
    spine = spine.withColumn("pos", 1 + h % F.col("n")).drop("n")
    reps = (spine.join(idx.select("event_type", "pos", "r"),
                       ["event_type", "pos"])
            .groupBy("event_type", "b")
            .agg(F.sum(F.col("r").cast("decimal(38,0)")).alias("tot"),
                 F.count(F.lit(1)).alias("n")))
    m = F.col("tot").cast("double") / F.col("n") / 1e6
    wr = Window.partitionBy("event_type").orderBy(
        F.col("tot").cast("double") / F.col("n"), F.col("b"))
    means = reps.select("event_type", m.alias("m"),
                        F.row_number().over(wr).alias("rnk"))
    import math

    lo_r = int(math.ceil(0.025 * _B_BOOT))
    hi_r = int(math.ceil(0.975 * _B_BOOT))
    return (means.groupBy("event_type")
            .agg(F.round(F.avg("m"), 6).alias("boot_mean"),
                 F.round(F.max(F.when(F.col("rnk") == lo_r, F.col("m"))),
                         6).alias("ci_lo"),
                 F.round(F.max(F.when(F.col("rnk") == hi_r, F.col("m"))),
                         6).alias("ci_hi"))
            .orderBy("event_type"))


@query(
    "signflip_permutation_test",
    oracle=f"""
    {_IDX_SQL},
    obs AS (
        SELECT event_type,
               abs(sum(CAST(r AS HUGEINT))) AS t_obs
        FROM idx GROUP BY event_type
    ),
    flips AS (
        SELECT i.event_type, b.b,
               abs(sum(CASE WHEN CAST(('0x' || substr(md5(i.event_type
                             || '#' || CAST(b.b AS VARCHAR) || '#'
                             || CAST(i.pos AS VARCHAR)), 1, 12))
                             AS BIGINT) % 2 = 0
                            THEN CAST(i.r AS HUGEINT)
                            ELSE -CAST(i.r AS HUGEINT) END)) AS t_b
        FROM idx i, (SELECT unnest(range(1, {_B_PERM} + 1)) AS b) b
        GROUP BY i.event_type, b.b
    )
    SELECT f.event_type,
           round(CAST(max(o.t_obs) AS DOUBLE)
                 / max(i2.n) / 1e6, 6) AS observed_mean_abs,
           round((1.0 + sum(CASE WHEN f.t_b >= o.t_obs
                            THEN 1 ELSE 0 END))
                 / (1.0 + {_B_PERM}), 6) AS p_value
    FROM flips f
    JOIN obs o ON o.event_type = f.event_type
    JOIN (SELECT DISTINCT event_type, n FROM idx) i2
      ON i2.event_type = f.event_type
    GROUP BY f.event_type ORDER BY f.event_type
    """,
)
def signflip_permutation_test(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Sign-flip permutation test of H0: mean daily return = 0 per type
    — each of 500 md5-parity sign patterns yields |Σ ± r|; the p-value
    is the add-one smoothed share of patterns at least as extreme as
    the observed |Σ r|. Exact integer statistics throughout.

    Scale: the pattern frame is B·n rows per type — calendar-bounded;
    one aggregate per (type, replicate)."""
    idx = _idx(spark, sf_dir)
    obs = idx.groupBy("event_type").agg(
        F.abs(F.sum(F.col("r").cast("decimal(38,0)"))).alias("t_obs"),
        F.max("n").alias("n"))
    spine = idx.select(
        "event_type", "pos", "r",
        F.explode(F.sequence(F.lit(1), F.lit(_B_PERM))).alias("b"))
    parity = F.conv(F.substring(F.md5(F.concat_ws(
        "#", "event_type", "b", "pos")), 1, 12), 16, 10).cast("long") % 2
    signed = F.when(parity == 0, F.col("r").cast("decimal(38,0)")) \
        .otherwise(-F.col("r").cast("decimal(38,0)"))
    flips = (spine.groupBy("event_type", "b")
             .agg(F.abs(F.sum(signed)).alias("t_b")))
    return (flips.join(F.broadcast(obs), "event_type")
            .groupBy("event_type")
            .agg(F.round(F.max("t_obs").cast("double")
                         / F.max("n") / 1e6, 6)
                 .alias("observed_mean_abs"),
                 F.round((1.0 + F.sum(F.when(
                     F.col("t_b") >= F.col("t_obs"), 1).otherwise(0)))
                     / (1.0 + _B_PERM), 6).alias("p_value"))
            .orderBy("event_type"))
