"""Catalog part — sequence information theory (STAGED r10).

The Markov view of the event stream (event_transition_matrix,
catalog_r8_seqpred's next-event prediction) gains its information-
theoretic summary, and the counting-process view gains the dispersion
statistic point processes are screened with:

- markov_entropy_rate    per-state conditional entropy H(next|src) =
                         -Σ_j P(j|src) log2 P(j|src) over the per-user
                         transition counts, with the state's stationary
                         weight — Σ_src π_src·H(·|src) is the chain's
                         entropy rate (Shannon 1948; Cover & Thomas
                         ch.4), the compressibility floor of user
                         journeys
- fano_factor_by_type    Fano (1947) factor var/mean of HOURLY event
                         counts per type over the FULL hour grid
                         (zero-count hours included — dropping empty
                         bins biases the dispersion toward Poisson):
                         1 = Poisson, >1 over-dispersed/bursty

Determinism: transition and hourly counts are exact integers (ordering
tie-break (ts, event_id), the transition-matrix idiom); entropies and
variance ratios are double expressions of those integers, rounded 6 dp.
The hour grid is derived from the global [min(ts), max(ts)] hour range.

Scale: one events scan each; the transition aggregate is |types|² rows
off a user-key shuffle (short timelines, no skew); the hour spine is
days·24 rows cross-joined to 5 types — constant-size frames joined to
aggregated counts, never to raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t


@query(
    "markov_entropy_rate",
    oracle="""
    WITH p AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ),
    c AS (
        SELECT src, dst, count(*) AS n FROM p
        WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    terms AS (
        SELECT src, n, sum(n) OVER (PARTITION BY src) AS n_src
        FROM c
    ),
    per AS (
        SELECT src, max(n_src) AS n_out,
               -sum((CAST(n AS DOUBLE) / n_src)
                    * log2(CAST(n AS DOUBLE) / n_src)) AS h_cond
        FROM terms GROUP BY src
    )
    SELECT src, CAST(n_out AS BIGINT) AS n_out,
           round(CAST(n_out AS DOUBLE) / sum(n_out) OVER (), 6) AS pi_src,
           round(h_cond, 6) AS h_cond_bits
    FROM per ORDER BY src
    """,
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source-state conditional entropy of the user-journey Markov
    chain: H(next|src) in bits, with the empirical stationary weight
    pi_src = outgoing-transition share. The chain's entropy rate is
    Σ pi_src·h_cond_bits. Exact counts in, double logs out.

    Scale: one user-key window pass -> |types|² counts -> 5 rows."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type",
                                            "ts", "event_id")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select(F.col("event_type").alias("src"),
                       F.lead("event_type").over(wu).alias("dst"))
             .filter(F.col("dst").isNotNull()))
    c = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wsrc = Window.partitionBy("src")
    prob = F.col("n").cast("double") / F.sum("n").over(wsrc)
    per_src = (c.withColumn("term", -prob * F.log2(prob))
               .groupBy("src")
               .agg(F.sum("n").alias("n_out"),
                    F.sum("term").alias("h_cond")))
    wall = Window.partitionBy()
    return (per_src.select(
        "src", F.col("n_out").cast("long").alias("n_out"),
        F.round(F.col("n_out").cast("double")
                / F.sum("n_out").over(wall), 6).alias("pi_src"),
        F.round("h_cond", 6).alias("h_cond_bits"))
        .orderBy("src"))


@query(
    "fano_factor_by_type",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, h.hr
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(lo, hi,
                                            INTERVAL 1 HOUR)) AS hr
              FROM bounds) h
    ),
    cnt AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.event_type, coalesce(c.n, 0) AS n
        FROM spine s LEFT JOIN cnt c
          ON c.event_type = s.event_type AND c.hr = s.hr
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(n) AS BIGINT) AS n_events,
           round((CAST(sum(n * n) AS DOUBLE) * count(*)
                  - CAST(sum(n) AS DOUBLE) * sum(n))
                 / (CAST(count(*) AS DOUBLE) * count(*))
                 / (CAST(sum(n) AS DOUBLE) / count(*)), 6) AS fano
    FROM grid GROUP BY event_type ORDER BY event_type
    """,
)
def fano_factor_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion) of hourly event counts per
    type over the complete hour grid between the stream's first and
    last hour — population variance over mean; 1 for a Poisson process,
    >1 bursty, <1 more regular than Poisson.

    Scale: counts aggregate map-side off one scan; the spine is
    hours x types (constant per time range) built from a 1-row bounds
    aggregate, and the grid join keys on (type, hour) against the
    already-aggregated counts."""
    # ONE events scan: the hour bounds and the type list both derive from
    # the (type, hour) count aggregate — a cached ~3.6k-row frame — not
    # from separate passes over the raw stream (plan audit: 1 scan)
    cnt = (_t(spark, sf_dir, "events")
           .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
           .agg(F.count(F.lit(1)).alias("n"))
           .cache())
    bounds = cnt.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = (bounds
             .select(F.explode(F.sequence(
                 "lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"))
             .crossJoin(F.broadcast(
                 cnt.select("event_type").distinct())))
    grid = (spine.join(cnt, ["event_type", "hr"], "left")
            .select("event_type",
                    F.coalesce(F.col("n"), F.lit(0)).alias("n")))
    cnt_n = F.count(F.lit(1))
    s = F.sum("n").cast("double")
    q = F.sum(F.col("n") * F.col("n")).cast("double")
    return (grid.groupBy("event_type")
            .agg(cnt_n.cast("long").alias("n_hours"),
                 F.sum("n").cast("long").alias("n_events"),
                 F.round(((q * cnt_n - s * s)
                          / (cnt_n.cast("double") * cnt_n))
                         / (s / cnt_n), 6).alias("fano"))
            .orderBy("event_type"))
