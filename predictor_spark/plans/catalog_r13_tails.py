"""Catalog part — heavy-tail diagnostics (STAGED for r9).

The extreme-value stack (gumbel_return_level: block maxima;
var_historical_95: a single quantile; zipf_rank_slope: rank-frequency)
gains the two peaks-over-threshold diagnostics that decide WHETHER a
tail is power-law before anyone fits one:

- hill_tail_index     Hill's (1975) estimator over the top-k order
                      statistics of event values per type:
                      H = (1/k) sum ln(X_(i) / X_(k+1)), alpha = 1/H —
                      the standard tail-index readout
- tail_mean_excess    mean excess over the exact p90 threshold,
                      e(u) = E[X - u | X > u], plus e(u)/u — linear-
                      in-u growth (ratio stable) is the GPD signature,
                      a bounded tail decays to 0

Determinism: values are exact integer cents; the top-k order
statistics are a rank window with (value desc, event_id) total order,
so X_(1..k+1) are identical integers on both engines; each ln ratio is
quantized to integer nano-units before the k-term sum; the mean excess
is a ratio of exact integer sums over the exact discrete p90 threshold
(quantile_disc == percentile_approx-free exact rank pick on both
sides via the same window count arithmetic).

Scale: top-k per type is a rank window over the per-type stream (at
real scale: per-partition top-k then merge — Spark's WindowExec after
a range-partition does exactly this for rank <= k filters); the mean
excess is one filtered aggregate against a broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.plans.catalog_drift import _qdisc

_K = 30  # Hill order statistics per type


@query(
    "hill_tail_index",
    oracle=f"""
    WITH vals AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE value > 0
    ),
    topk AS (
        SELECT event_type, c,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c DESC, event_id) AS rn
        FROM vals
    ),
    kth AS (
        SELECT event_type, c AS ck FROM topk WHERE rn = {_K} + 1
    ),
    terms AS (
        SELECT t.event_type,
               CAST(round(1e9 * ln(CAST(t.c AS DOUBLE) / k.ck))
                    AS BIGINT) AS t_nano
        FROM topk t JOIN kth k USING (event_type)
        WHERE t.rn <= {_K}
    )
    SELECT event_type,
           CAST({_K} AS BIGINT) AS k,
           round(CAST(sum(t_nano) AS DOUBLE) / (1e9 * {_K}), 6)
               AS hill_h,
           round(1e9 * {_K} / CAST(sum(t_nano) AS DOUBLE), 6)
               AS tail_alpha
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator per event type over the top-{k} positive values:
    H = mean ln(X_(i)/X_(k+1)) with nano-quantized log ratios (exact
    sums under any aggregation order), alpha = 1/H.  Small alpha =
    heavy tail; alpha -> infinity for a bounded tail."""
    ev = _t(spark, sf_dir, "events")
    vals = (ev.filter(F.col("value") > 0)
            .select("event_type", "event_id",
                    F.round(F.col("value") * 100, 0).cast("long")
                    .alias("c")))
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("event_id"))
    # (K+1) x |types| rows after the rank filter — cached because BOTH
    # the kth-value leg and the terms leg consume it (uncached, the
    # rank window and the scan run twice)
    topk = (vals.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _K + 1)).cache()
    kth = (topk.filter(F.col("rn") == _K + 1)
           .select("event_type", F.col("c").alias("ck")))
    terms = (topk.filter(F.col("rn") <= _K)
             .join(F.broadcast(kth), "event_type")
             .select("event_type",
                     F.round(F.lit(1e9)
                             * F.log(F.col("c").cast("double")
                                     / F.col("ck")), 0).cast("long")
                     .alias("t_nano")))
    return (terms.groupBy("event_type")
            .agg(F.lit(_K).cast("long").alias("k"),
                 F.round(F.sum("t_nano").cast("double")
                         / (1e9 * _K), 6).alias("hill_h"),
                 F.round(F.lit(1e9 * _K)
                         / F.sum("t_nano").cast("double"), 6)
                 .alias("tail_alpha"))
            .orderBy("event_type"))


@query(
    "tail_mean_excess",
    oracle="""
    WITH vals AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE value > 0
    ),
    thr AS (
        SELECT event_type, quantile_disc(c, 0.90) AS u
        FROM vals GROUP BY event_type
    )
    SELECT v.event_type,
           CAST(max(t.u) AS BIGINT) AS threshold_cents,
           CAST(count(*) AS BIGINT) AS n_exceed,
           round(CAST(sum(v.c - t.u) AS DOUBLE) / count(*) / 100.0, 6)
               AS mean_excess,
           round(CAST(sum(v.c - t.u) AS DOUBLE) / count(*) / max(t.u),
                 6) AS excess_over_threshold
    FROM vals v JOIN thr t USING (event_type)
    WHERE v.c > t.u
    GROUP BY v.event_type ORDER BY v.event_type
    """,
)
def tail_mean_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean excess over the exact discrete p90 cents threshold per
    type: e(u) = mean(X - u | X > u) in value units and the e(u)/u
    ratio — the mean-excess-plot point every POT analysis starts from.
    Integer excess sums; the threshold is an exact data value
    (discrete quantile) on both engines."""
    ev = _t(spark, sf_dir, "events")
    vals = (ev.filter(F.col("value") > 0)
            .select("event_type",
                    F.round(F.col("value") * 100, 0).cast("long")
                    .alias("c")))
    # exact discrete quantile via the catalog_drift helper (DuckDB
    # quantile_disc semantics: smallest value with cume share >= q)
    thr = _qdisc(vals, "event_type", "c", [0.90], ["u"])
    j = (vals.join(F.broadcast(thr), "event_type")
         .filter(F.col("c") > F.col("u")))
    return (j.groupBy("event_type")
            .agg(F.max("u").cast("long").alias("threshold_cents"),
                 F.count(F.lit(1)).cast("long").alias("n_exceed"),
                 F.round(F.sum(F.col("c") - F.col("u")).cast("double")
                         / F.count(F.lit(1)) / 100.0, 6)
                 .alias("mean_excess"),
                 F.round(F.sum(F.col("c") - F.col("u")).cast("double")
                         / F.count(F.lit(1)) / F.max("u"), 6)
                 .alias("excess_over_threshold"))
            .orderBy("event_type"))
