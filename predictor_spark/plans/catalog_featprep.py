"""Catalog part — feature/index construction for training and serving.

Four build steps a training-data platform runs between "curated corpus"
and "model inputs", each a classic large-scale shape:

- inverted_index_postings   search-index build (the original MapReduce
                            workload): term -> document frequency +
                            capped sorted posting list
- negative_sampling_brands  contrastive negatives: per customer, the
                            k=2 brands they never bought, ranked by a
                            deterministic hash (recommender training)
- quantile_normalize_daily  cross-series quantile normalization: each
                            series' rank-r value mapped to the mean of
                            the rank-r order statistics across series
- forecast_reconcile_topdown  hierarchical forecast reconciliation
                            (Hyndman et al.): naive per-type forecasts
                            scaled so they sum to the total-series
                            forecast (top-down proportional)

Determinism: posting lists are rank-capped THEN collected sorted; the
negative-sample order is an md5 over a canonical string; the
quantile-normalization target sums the per-rank values as a SORTED
list (both engines fold in ascending order — no partial-agg order
dependence); reconciliation is ratios of exact integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.operators.text import tokens_col

_CENTS = "CAST(round(value * 100) AS BIGINT)"


@query(
    "inverted_index_postings",
    oracle=r"""
    WITH pairs AS (
        SELECT DISTINCT term, doc_id FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS term
            FROM documents
        )
    ),
    ranked AS (
        SELECT term, doc_id,
               row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        FROM pairs
    )
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           array_to_string(
               list(CAST(doc_id AS VARCHAR) ORDER BY doc_id)
                   FILTER (WHERE rn <= 10), ',')
               AS postings_head
    FROM ranked GROUP BY term
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build over the corpus: every term's document
    frequency plus the first 10 postings (sorted doc ids) — the search-
    index construction step (and the canonical MapReduce example),
    capped so the OUTPUT row stays bounded while df counts everything.

    Scale: explode -> distinct (term, doc) -> one shuffle on term; the
    posting cap is applied by rank BEFORE collect_list, so no task ever
    materializes an unbounded list (full posting lists at 100 TB are a
    partitioned WRITE, not a collected column).  df and the capped list
    come out of the same aggregation pass.  The posting head is emitted
    as a comma-joined STRING, not array<bigint>: the gate's canonical
    form is flat (nested output types are forbidden — see
    tools/check_correctness.py), and a joined string carries identical
    information for a head-capped list.
    """
    docs = _t(spark, sf_dir, "documents")
    pairs = (docs.select("doc_id",
                         F.explode(tokens_col("text")).alias("term"))
             .distinct())
    rn = F.row_number().over(
        Window.partitionBy("term").orderBy("doc_id"))
    return (pairs.withColumn("rn", rn)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.when(F.col("rn") <= 10, F.col("doc_id")))),
                         lambda x: x.cast("string")),
                     ",").alias("postings_head")))


@query(
    "negative_sampling_brands",
    oracle="""
    WITH pos AS (
        SELECT DISTINCT o.o_custkey, p.p_brand
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
    ),
    custs AS (SELECT DISTINCT o_custkey FROM pos),
    brands AS (SELECT DISTINCT p_brand FROM part),
    cand AS (
        SELECT c.o_custkey, b.p_brand
        FROM custs c, brands b
        WHERE NOT EXISTS (SELECT 1 FROM pos
                          WHERE pos.o_custkey = c.o_custkey
                            AND pos.p_brand = b.p_brand)
    ),
    ranked AS (
        SELECT o_custkey, p_brand,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY md5(o_custkey || ':' || p_brand)) AS rk
        FROM cand
    )
    SELECT o_custkey, p_brand AS neg_brand, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 2
    """,
)
def negative_sampling_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive/recommender
    training: per customer, k=2 brands they have NEVER bought, chosen
    by md5 rank over a canonical key — reproducible across runs,
    engines, and executors (no RNG state anywhere).

    Scale: positives are one distinct-aggregate of the fact join; the
    candidate space is customers x |brands| with the 25-row brand dim
    broadcast, thinned by a broadcast-able anti-join on the positives;
    the hash ranking shuffles on customer only.  k caps the output at
    2 rows/customer regardless of catalog size.
    """
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pos = (o.join(li, o.o_orderkey == li.l_orderkey)
           .join(F.broadcast(p), li.l_partkey == p.p_partkey)
           .select("o_custkey", "p_brand").distinct()
           # customer list AND the anti-join both read positives;
           # uncached each re-runs the fact join (7 scans)
           .cache())
    custs = pos.select("o_custkey").distinct()
    brands = p.select("p_brand").distinct()
    cand = (custs.crossJoin(F.broadcast(brands))
            .join(pos, ["o_custkey", "p_brand"], "left_anti"))
    rk = F.row_number().over(
        Window.partitionBy("o_custkey")
        .orderBy(F.md5(F.concat_ws(":", "o_custkey", "p_brand"))))
    return (cand.withColumn("rk", rk.cast("long"))
            .filter(F.col("rk") <= 2)
            .select("o_custkey", F.col("p_brand").alias("neg_brand"), "rk"))


@query(
    "quantile_normalize_daily",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
               CAST(sum({_CENTS}) AS DOUBLE) / count(*) / 100 AS m
        FROM events GROUP BY event_type, CAST(day(ts) AS BIGINT)
    ),
    ranked AS (
        SELECT event_type, day, m,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY m, day) AS rank
        FROM daily
    ),
    target AS (
        SELECT rank,
               round(list_aggregate(list(m ORDER BY m), 'sum')
                     / count(*), 6) AS normalized
        FROM ranked GROUP BY rank
    )
    SELECT event_type, day, CAST(rank AS BIGINT) AS rank,
           round(m, 6) AS orig, normalized
    FROM ranked JOIN target USING (rank)
    """,
)
def quantile_normalize_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series quantile normalization (the microarray-era standard,
    Bolstad et al. 2003): each event type's daily-mean series is mapped
    rank-for-rank onto the MEAN of the order statistics across all
    series, forcing identical marginal distributions while preserving
    each series' ordering — the cross-instrument leveller a multi-asset
    pipeline applies before pooled training.

    Scale: one aggregate to (type, day) bars, one rank window per type,
    and a |days|-row rank-target table joined back broadcast.  The
    rank-r target is the per-rank value list summed in SORTED order in
    both engines (F.aggregate over sort_array / list_aggregate over an
    ordered list) — no partial-agg float order anywhere.
    """
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = (ev.groupBy("event_type", F.dayofmonth("ts").cast("long")
                        .alias("day"))
             .agg((F.sum(cents).cast("double") / F.count(F.lit(1)) / 100)
                  .alias("m")))
    rank = F.row_number().over(
        Window.partitionBy("event_type").orderBy("m", "day"))
    # the rank targets and the final join both read the ranked bars;
    # cached (<=|types|*31 rows) so the stream aggregates once
    ranked = daily.withColumn("rank", rank.cast("long")).cache()
    target = (ranked.groupBy("rank")
              .agg((F.aggregate(F.sort_array(F.collect_list("m")),
                                F.lit(0.0), lambda acc, x: acc + x)
                    / F.count(F.lit(1))).alias("t"))
              .select("rank", F.round("t", 6).alias("normalized")))
    return (ranked.join(F.broadcast(target), "rank")
            .select("event_type", "day", "rank",
                    F.round("m", 6).alias("orig"), "normalized"))


@query(
    "forecast_reconcile_topdown",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
               sum({_CENTS}) AS dc
        FROM events GROUP BY event_type, CAST(day(ts) AS BIGINT)
    ),
    bottom AS (
        SELECT event_type, CAST(dc AS DOUBLE) / 100 AS f_base
        FROM daily WHERE day = 30
    ),
    top AS (
        SELECT CAST(sum(dc) AS DOUBLE) / 7 / 100 AS f_total
        FROM daily WHERE day >= 24
    ),
    s AS (SELECT CAST(sum(f_base * 100) AS DOUBLE) / 100 AS sum_base
          FROM bottom)
    SELECT event_type,
           round(f_base, 4) AS base_forecast,
           round(f_base * f_total / sum_base, 4) AS reconciled_forecast,
           round(f_total, 4) AS total_forecast
    FROM bottom, top, s
    """,
)
def forecast_reconcile_topdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast reconciliation, top-down proportional
    (Hyndman et al., Forecasting: Principles & Practice ch. 11): naive
    per-type day-31 forecasts (last daily value) are scaled by
    total_forecast / sum(base) so the per-type forecasts SUM to the
    total-series forecast (the 7-day-mean of the total) — coherence
    across the aggregation hierarchy, which independent per-series
    models never give for free.

    Scale: everything derives from the one (type, day) cents aggregate;
    bottom is |types| rows, top and the rescale factor are scalars
    broadcast onto them.  All inputs are exact integer cents, so the
    ratios are engine-identical doubles.
    """
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = (ev.groupBy("event_type", F.dayofmonth("ts").cast("long")
                        .alias("day"))
             .agg(F.sum(cents).alias("dc"))
             # bottom / top / rescale all read this <=|types|*31-row
             # frame; cached so the stream is aggregated once
             .cache())
    bottom = (daily.filter(F.col("day") == 30)
              .select("event_type",
                      (F.col("dc").cast("double") / 100).alias("f_base")))
    top = (daily.filter(F.col("day") >= 24)
           .agg((F.sum("dc").cast("double") / 7 / 100).alias("f_total")))
    s = bottom.agg((F.sum(F.col("f_base") * 100).cast("double") / 100)
                   .alias("sum_base"))
    return (bottom.crossJoin(F.broadcast(top)).crossJoin(F.broadcast(s))
            .select("event_type",
                    F.round("f_base", 4).alias("base_forecast"),
                    F.round(F.col("f_base") * F.col("f_total")
                            / F.col("sum_base"), 4)
                    .alias("reconciled_forecast"),
                    F.round("f_total", 4).alias("total_forecast")))
