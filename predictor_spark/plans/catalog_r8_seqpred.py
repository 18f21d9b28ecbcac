"""Catalog part — next-event prediction eval (STAGED for r8).

The event-transition matrix (event_transition_matrix,
catalog_tsa.py) DESCRIBES user journeys; this row closes the loop and
GRADES the first-order Markov model as a predictor — the standard
clickstream next-action baseline evaluated exactly like a model
release would be:

- markov_next_event_accuracy  train the argmax-transition predictor
                              on the early slice, score held-out
                              accuracy on the late slice next to the
                              majority-class baseline it must beat

Split: the drift family's Jan-16 boundary; a transition never spans
the boundary (pairs form WITHIN each (user, period) timeline).

Determinism: predictions are argmax over exact transition counts with
a lexicographic tie-break; accuracies are exact integer ratios
rounded at integer scale.

Scale: ONE fact pass (the lead window over (user, period) timelines)
reduces everything to the cached (period, src, dst) count table —
model, majority baseline, scoring and the train total all derive from
those ~2·|event_types|² rows, so the whole evaluation costs one scan
regardless of fact size (the first cut recomputed the pair stream per
leg: four scans, caught by the plan audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_SPLIT = "TIMESTAMP '2024-01-16 00:00:00'"


@query(
    "markov_next_event_accuracy",
    oracle=f"""
    WITH counts AS MATERIALIZED (
        SELECT period, src, dst, count(*) AS c FROM (
            SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END AS period,
                   event_type AS src,
                   lead(event_type) OVER (
                       PARTITION BY user_id,
                                    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0
                                         ELSE 1 END
                       ORDER BY ts, event_id) AS dst
            FROM events
        ) WHERE dst IS NOT NULL GROUP BY 1, 2, 3
    ),
    model AS (
        SELECT src, dst AS pred FROM (
            SELECT src, dst, row_number() OVER (
                       PARTITION BY src ORDER BY sum(c) DESC, dst) AS rn
            FROM counts WHERE period = 0 GROUP BY src, dst
        ) WHERE rn = 1
    ),
    majority AS (
        SELECT dst AS pred FROM (
            SELECT dst, row_number() OVER (ORDER BY sum(c) DESC, dst)
                       AS rn
            FROM counts WHERE period = 0 GROUP BY dst
        ) WHERE rn = 1
    ),
    scored AS (
        SELECT sum(t.c) AS n_test,
               sum(CASE WHEN m.pred = t.dst THEN t.c ELSE 0 END) AS hit_m,
               sum(CASE WHEN mj.pred = t.dst THEN t.c ELSE 0 END) AS hit_b
        FROM counts t JOIN model m USING (src), majority mj
        WHERE t.period = 1
    ),
    train_n AS (
        SELECT sum(c) AS n_train FROM counts WHERE period = 0
    )
    SELECT CAST(n_train AS BIGINT) AS n_train_transitions,
           CAST(n_test AS BIGINT) AS n_test_transitions,
           round(CAST(hit_m AS DOUBLE) * 1000000 / n_test) / 1000000.0
               AS markov_accuracy,
           round(CAST(hit_b AS DOUBLE) * 1000000 / n_test) / 1000000.0
               AS baseline_accuracy
    FROM scored, train_n
    """,
)
def markov_next_event_accuracy(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Held-out accuracy of the argmax first-order Markov next-event
    predictor vs the majority-class baseline: train transition counts
    on the early slice, predict argmax(dst | src) (ties: lexicographic
    dst), score on late-slice transitions.  Test pairs whose src never
    appeared in training drop out of the comparison identically on
    both engines (inner join — none occur at any test SF: every event
    type transitions in January's first half).

    Scale: module docstring — two aggregations + a broadcast argmax
    table; the eval never shuffles more than |event_types|² rows."""
    ev = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    period = F.when(F.col("ts") < split, 0).otherwise(1)
    w = Window.partitionBy("user_id", "period").orderBy("ts", "event_id")
    # ONE fact pass reduces everything downstream to the tiny
    # (period, src, dst) count table — model, baseline, scoring and
    # the train total all derive from these ~2·|types|² cached rows
    # (the first cut recomputed the pair stream per leg: 4 scans)
    counts = (ev.select(period.alias("period"),
                        F.col("event_type").alias("src"),
                        "user_id", "ts", "event_id")
              .withColumn("dst", F.lead("src").over(w))
              .where(F.col("dst").isNotNull())
              .groupBy("period", "src", "dst")
              .agg(F.count(F.lit(1)).alias("c"))
              .cache())
    train = counts.where(F.col("period") == 0)
    w_src = Window.partitionBy("src").orderBy(F.desc("sc"), "dst")
    model = (train.groupBy("src", "dst").agg(F.sum("c").alias("sc"))
             .withColumn("rn", F.row_number().over(w_src))
             .where(F.col("rn") == 1)
             .select("src", F.col("dst").alias("pred")))
    majority = (train.groupBy("dst").agg(F.sum("c").alias("sc"))
                .withColumn("rn", F.row_number().over(
                    Window.orderBy(F.desc("sc"), "dst")))
                .where(F.col("rn") == 1)
                .select(F.col("dst").alias("mj_pred")))
    test = counts.where(F.col("period") == 1)
    scored = (test.join(F.broadcast(model), "src")
              .crossJoin(F.broadcast(majority))
              .agg(F.sum("c").alias("n_test"),
                   F.sum(F.when(F.col("pred") == F.col("dst"), F.col("c"))
                         .otherwise(0)).alias("hit_m"),
                   F.sum(F.when(F.col("mj_pred") == F.col("dst"),
                                F.col("c"))
                         .otherwise(0)).alias("hit_b")))
    n_train = train.agg(F.sum("c").alias("n_train"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (scored.crossJoin(F.broadcast(n_train))
            .select(
                F.col("n_train").cast("long").alias("n_train_transitions"),
                F.col("n_test").cast("long").alias("n_test_transitions"),
                (F.round(d("hit_m") * 1000000 / F.col("n_test"))
                 / 1000000.0).alias("markov_accuracy"),
                (F.round(d("hit_b") * 1000000 / F.col("n_test"))
                 / 1000000.0).alias("baseline_accuracy")))
