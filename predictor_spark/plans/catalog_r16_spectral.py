"""Catalog part — frequency-domain summary statistics (STAGED r10).

The spectral operator family (operators/spectral.py: the W15 causal FFT
feature windows, oracle-checked against an explicit DFT) gains the two
summary statistics a screening pipeline wants per series, computed over
the daily micro-return sequence per event type:

- spectral_entropy_by_type  normalized spectral entropy (Shannon
                            entropy of the DFT power distribution over
                            k = 1..N/2, divided by ln K: 1 = white
                            noise, ~0 = single dominant cycle) plus the
                            dominant period N/k* in days (power argmax,
                            ties to the lowest frequency)
- band_power_by_type        low/mid/high frequency-band power shares
                            (thirds of the k range) — the coarse
                            "where does the variance live" fingerprint

Both compute the DFT explicitly (the w15_fft_features oracle precedent:
sum of r_t·cos/sin(2πkt/N) terms) — the k-spine is a per-type sequence
joined on event_type, so the term frame is N·K ≈ days²/2 rows per type:
bounded at ANY volume SF because the daily rollup's length is the
calendar, not the row count.

Determinism: returns are exact integer micro-units; the trig arguments
are rationals of small integers, so both engines evaluate identical
doubles into the power sums (the W15 precedent), and every output
rounds to 6 dp.

Scale: one events scan -> daily rollup; the DFT terms are a keyed
equi-join between two tiny frames; partial aggregation applies to the
(type, k) power sums.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t  # noqa: F401
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets

#: (type, k, power): DFT power spectrum over k = 1..N/2 per type
_POWER_SQL = f"""
    WITH {_RET_BASE},
    idx AS MATERIALIZED (
        SELECT event_type, r,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ddate) - 1 AS t,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM rets
    ),
    spine AS (
        SELECT event_type, n,
               unnest(range(1, CAST(n // 2 AS BIGINT) + 1)) AS k
        FROM (SELECT DISTINCT event_type, n FROM idx)
    ),
    terms AS (
        SELECT s.event_type, s.k, s.n,
               i.r * cos(2 * pi() * s.k * i.t / s.n) AS c,
               i.r * sin(2 * pi() * s.k * i.t / s.n) AS sn
        FROM spine s JOIN idx i ON i.event_type = s.event_type
    ),
    power AS (
        SELECT event_type, k, max(n) AS n,
               sum(c) * sum(c) + sum(sn) * sum(sn) AS p
        FROM terms GROUP BY event_type, k
    )"""


def _power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, k, n, p): explicit DFT power per frequency."""
    w = Window.partitionBy("event_type")
    idx = (_rets(spark, sf_dir)
           .withColumn("t", F.row_number().over(
               Window.partitionBy("event_type").orderBy("ddate")) - 1)
           .withColumn("n", F.count(F.lit(1)).over(w))
           .select("event_type", "r", "t", "n")
           .cache())
    spine = (idx.select("event_type", "n").distinct()
             .select("event_type", "n",
                     F.explode(F.sequence(
                         F.lit(1), (F.col("n") / 2).cast("long")))
                     .alias("k")))
    arg = 2 * math.pi * F.col("k") * F.col("t") / F.col("s.n")
    terms = (spine.alias("s")
             .join(idx.alias("i"),
                   F.col("s.event_type") == F.col("i.event_type"))
             .select(F.col("s.event_type").alias("event_type"),
                     F.col("k"), F.col("s.n").alias("n"),
                     (F.col("r") * F.cos(arg)).alias("c"),
                     (F.col("r") * F.sin(arg)).alias("sn")))
    return (terms.groupBy("event_type", "k")
            .agg(F.max("n").alias("n"),
                 (F.sum("c") * F.sum("c")
                  + F.sum("sn") * F.sum("sn")).alias("p")))


@query(
    "spectral_entropy_by_type",
    oracle=f"""
    {_POWER_SQL},
    norm AS (
        SELECT event_type, k, n, p,
               p / sum(p) OVER (PARTITION BY event_type) AS q,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY p DESC, k) AS rnk,
               count(*) OVER (PARTITION BY event_type) AS nk
        FROM power
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_days,
           round(-sum(CASE WHEN q > 0 THEN q * ln(q) ELSE 0 END)
                 / ln(max(nk)), 6) AS spectral_entropy,
           round(max(CASE WHEN rnk = 1
                     THEN CAST(n AS DOUBLE) / k END), 6)
               AS dominant_period_days
    FROM norm GROUP BY event_type ORDER BY event_type
    """,
)
def spectral_entropy_by_type(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Normalized spectral entropy of daily returns per event type
    (-Σ q ln q / ln K over the DFT power shares, k = 1..N/2) and the
    dominant period in days (N/k at the power argmax, ties to the
    slowest cycle). 1.0 = flat spectrum (white noise), small = one
    cycle carries the variance.

    Scale: the DFT term join is days²/2 rows per type — calendar-
    bounded; one events scan feeds it."""
    p = _power(spark, sf_dir)
    wt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(F.col("p").desc(),
                                                  F.col("k"))
    norm = (p.withColumn("q", F.col("p") / F.sum("p").over(wt))
            .withColumn("rnk", F.row_number().over(wr))
            .withColumn("nk", F.count(F.lit(1)).over(wt)))
    return (norm.groupBy("event_type")
            .agg(F.max("n").cast("long").alias("n_days"),
                 F.round(-F.sum(F.when(F.col("q") > 0,
                                       F.col("q") * F.log("q"))
                                .otherwise(F.lit(0.0)))
                         / F.log(F.max("nk").cast("double")), 6)
                 .alias("spectral_entropy"),
                 F.round(F.max(F.when(F.col("rnk") == 1,
                                      F.col("n").cast("double")
                                      / F.col("k"))), 6)
                 .alias("dominant_period_days"))
            .orderBy("event_type"))


@query(
    "band_power_by_type",
    oracle=f"""
    {_POWER_SQL},
    banded AS (
        SELECT event_type, p,
               CASE WHEN k * 3 <= (SELECT max(k2.k) FROM power k2
                                   WHERE k2.event_type = power.event_type)
                         THEN 'low'
                    WHEN k * 3 <= 2 * (SELECT max(k2.k) FROM power k2
                                   WHERE k2.event_type = power.event_type)
                         THEN 'mid'
                    ELSE 'high' END AS band
        FROM power
    )
    SELECT event_type,
           round(sum(CASE WHEN band = 'low' THEN p ELSE 0 END)
                 / sum(p), 6) AS low_share,
           round(sum(CASE WHEN band = 'mid' THEN p ELSE 0 END)
                 / sum(p), 6) AS mid_share,
           round(sum(CASE WHEN band = 'high' THEN p ELSE 0 END)
                 / sum(p), 6) AS high_share
    FROM banded GROUP BY event_type ORDER BY event_type
    """,
)
def band_power_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low/mid/high band power shares per event type — the k range split
    in integer thirds (k·3 ≤ K → low, ≤ 2K → mid, else high). A trend-y
    series loads low, an alternating one loads high.

    Scale: same bounded DFT frame; one extra window max + conditional
    aggregate."""
    p = _power(spark, sf_dir)
    wt = Window.partitionBy("event_type")
    kmax = F.max("k").over(wt)
    banded = p.withColumn(
        "band",
        F.when(F.col("k") * 3 <= kmax, "low")
        .when(F.col("k") * 3 <= 2 * kmax, "mid")
        .otherwise("high"))

    def share(b):
        return F.round(
            F.sum(F.when(F.col("band") == b, F.col("p"))
                  .otherwise(F.lit(0.0))) / F.sum("p"), 6)

    return (banded.groupBy("event_type")
            .agg(share("low").alias("low_share"),
                 share("mid").alias("mid_share"),
                 share("high").alias("high_share"))
            .orderBy("event_type"))
