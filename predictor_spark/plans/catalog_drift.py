"""Catalog part — distribution-drift monitoring + feature selection.

A 100 TB training pipeline retrains on a moving window; these are the
standard gates that decide WHETHER to retrain and WHICH features carry
signal (the reference's cross-iteration stats in data_processor.py
play this role for its per-run loop):

- ks_test_value_drift     two-sample Kolmogorov-Smirnov statistic
                          between an early and a late time slice
- psi_value_stability     Population Stability Index over decile bins
                          (the credit-scoring drift standard)
- mutual_info_value_type  mutual information between the value decile
                          and the event type (feature relevance)

All three reduce the fact stream to tiny sufficient statistics (CDF
merge points, bin counts, a 10×|types| contingency table) in one scan —
the monitoring queries a production pipeline can afford to run per
batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_SPLIT = "DATE '2024-01-16'"


@query(
    "ks_test_value_drift",
    oracle=f"""
    WITH a AS (SELECT value FROM events WHERE ts < {_SPLIT}),
    b AS (SELECT value FROM events WHERE ts >= {_SPLIT}),
    na AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM a),
    nb AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM b),
    pts AS (
        SELECT value, CAST(count(*) FILTER (WHERE src = 0) AS BIGINT) AS ca,
               CAST(count(*) FILTER (WHERE src = 1) AS BIGINT) AS cb
        FROM (SELECT value, 0 AS src FROM a
              UNION ALL SELECT value, 1 AS src FROM b)
        GROUP BY value
    ),
    cdf AS (
        SELECT sum(ca) OVER (ORDER BY value) / na.n AS fa,
               sum(cb) OVER (ORDER BY value) / nb.n AS fb
        FROM pts, na, nb
    )
    SELECT round(max(abs(fa - fb)), 6) AS ks_stat,
           CAST(na.n AS BIGINT) AS n_early, CAST(nb.n AS BIGINT) AS n_late
    FROM cdf, na, nb GROUP BY na.n, nb.n
    """,
)
def ks_test_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of the early (< Jan 16) and late event slices:
    sup |F_early − F_late| over the pooled support.

    Scale: the sup runs over DISTINCT pooled values (one groupBy reduces
    the stream to its support with per-side counts; both empirical CDFs
    are running sums over that reduced frame).  The single-partition
    global ordering is over |distinct values| — already aggregate-sized;
    for a truly dense support, pre-bin to a quantile grid first (as
    psi_value_stability does).  Counts divide as exact integers, so the
    CDF values are engine-identical.
    """
    ev = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("date")
    tagged = ev.select(
        "value", F.when(F.col("ts") < split, 0).otherwise(1).alias("src"))
    pts = tagged.groupBy("value").agg(
        F.sum(F.when(F.col("src") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0)).alias("cb"))
    tot = pts.agg(F.sum("ca").cast("double").alias("na"),
                  F.sum("cb").cast("double").alias("nb"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cdf = (pts.crossJoin(F.broadcast(tot))
           .select((F.sum("ca").over(w) / F.col("na")).alias("fa"),
                   (F.sum("cb").over(w) / F.col("nb")).alias("fb"),
                   "na", "nb"))
    return cdf.groupBy("na", "nb").agg(
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_stat")
    ).select("ks_stat", F.col("na").cast("bigint").alias("n_early"),
             F.col("nb").cast("bigint").alias("n_late"))


@query(
    "psi_value_stability",
    oracle=f"""
    WITH edges AS (
        SELECT quantile_disc(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e
        FROM events WHERE ts < {_SPLIT}
    ),
    binned AS (
        SELECT CASE WHEN ts < {_SPLIT} THEN 0 ELSE 1 END AS src,
               1 + len(list_filter(e, x -> x < value)) AS bin
        FROM events, edges
    ),
    cnts AS (
        SELECT bin,
               CAST(count(*) FILTER (WHERE src = 0) AS BIGINT) AS ca,
               CAST(count(*) FILTER (WHERE src = 1) AS BIGINT) AS cb
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
                   CAST(sum(cb) AS DOUBLE) AS nb FROM cnts)
    SELECT bin, ca AS n_expected, cb AS n_actual,
           round((cb / nb - ca / na)
                 * ln(greatest(cb / nb, 1e-6) / greatest(ca / na, 1e-6)),
                 6) + 0.0 AS psi_term
    FROM cnts, tot
    """,
)
def psi_value_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per decile bin: expected = early slice
    (which also defines the decile edges), actual = late slice; term =
    (p_a − p_e)·ln(p_a/p_e) with 1e-6 floors.  Σterms > 0.2 is the
    classic retrain trigger.

    Scale: decile edges come from one discrete-quantile aggregate of the
    early slice (collapsed to a 9-value broadcast literal — exact
    quantiles over the aggregated support, matching the oracle's
    quantile_disc); binning is then a map-side comparison against the
    broadcast edges and the count table is 10 rows.  Proportions are
    exact-integer ratios, so terms are engine-identical before rounding.
    """
    ev = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("date")
    # discrete (type-7-free) quantiles over the early slice: smallest
    # value with cume_dist >= q — identical to DuckDB quantile_disc
    early = ev.filter(F.col("ts") < split)
    qs = [i / 10.0 for i in range(1, 10)]
    sup = early.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    n1 = sup.agg(F.sum("c").alias("n"))
    cum = (sup.crossJoin(F.broadcast(n1))
           .select("value", (F.sum("c").over(wv) / F.col("n")).alias("cd")))
    # all 9 edges in ONE aggregate (conditional mins), one job — not a
    # collect per quantile
    edge_row = cum.agg(*[
        F.min(F.when(F.col("cd") >= q, F.col("value"))).alias(f"e{i}")
        for i, q in enumerate(qs)]).collect()[0]
    edges = [edge_row[f"e{i}"] for i in range(len(qs))]
    bin_expr = (1 + sum((F.lit(e) < F.col("value")).cast("int")
                        for e in edges)).alias("bin")
    binned = ev.select(
        F.when(F.col("ts") < split, 0).otherwise(1).alias("src"), bin_expr)
    cnts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("src") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0)).alias("cb"))
    tot = cnts.agg(F.sum("ca").cast("double").alias("na"),
                   F.sum("cb").cast("double").alias("nb"))
    pa, pb = F.col("ca") / F.col("na"), F.col("cb") / F.col("nb")
    term = ((pb - pa) * F.log(F.greatest(pb, F.lit(1e-6))
                              / F.greatest(pa, F.lit(1e-6))))
    return (cnts.crossJoin(F.broadcast(tot))
            .select("bin", F.col("ca").alias("n_expected"),
                    F.col("cb").alias("n_actual"),
                    (F.round(term, 6) + F.lit(0.0)).alias("psi_term")))


@query(
    "mutual_info_value_type",
    oracle="""
    WITH deciles AS (
        SELECT event_type,
               ntile(10) OVER (ORDER BY value, event_id) AS dec
        FROM events
    ),
    joint AS (
        SELECT event_type, dec, CAST(count(*) AS BIGINT) AS c
        FROM deciles GROUP BY event_type, dec
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM joint),
    mxated AS (
        SELECT event_type, dec, c,
               sum(c) OVER (PARTITION BY event_type) AS cx,
               sum(c) OVER (PARTITION BY dec) AS cy
        FROM joint
    )
    SELECT round(sum((c / n) * ln((c * n) / (CAST(cx AS DOUBLE) * cy))), 6)
               AS mutual_info_nats
    FROM mxated, tot
    """,
)
def mutual_info_value_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between the value decile and the event
    type — the model-free feature-relevance score a selection pass ranks
    features by: I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))).

    Scale: deciles via ntile over a (value, event_id) global order —
    deterministic under ties; the contingency table is 10×|types| rows
    and every probability is an exact-integer ratio.  The global sort is
    the one scale cost; a quantile-grid pre-bin (as in PSI) removes it
    when |distinct values| is large.  MI sums 50 terms — order noise is
    ~1e-15 against a 1e-6 rounding quantum.
    """
    ev = _t(spark, sf_dir, "events")
    dec = ev.select(
        "event_type",
        F.ntile(10).over(Window.orderBy("value", "event_id")).alias("dec"))
    joint = dec.groupBy("event_type", "dec").agg(
        F.count(F.lit(1)).alias("c"))
    tot = joint.agg(F.sum("c").cast("double").alias("n"))
    wx = Window.partitionBy("event_type")
    wy = Window.partitionBy("dec")
    m = (joint
         .withColumn("cx", F.sum("c").over(wx))
         .withColumn("cy", F.sum("c").over(wy))
         .crossJoin(F.broadcast(tot)))
    term = ((F.col("c") / F.col("n"))
            * F.log((F.col("c") * F.col("n"))
                    / (F.col("cx").cast("double") * F.col("cy"))))
    return m.agg(F.round(F.sum(term), 6).alias("mutual_info_nats"))
