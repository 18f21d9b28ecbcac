"""Catalog part — dataset sampling / split / reweighting plans.

The steps between "curated corpus" and "training batches" that decide
WHICH rows a model sees (complementing catalog_datapipe's split and
mixture rows):

- group_kfold_assignment   leakage-safe k-fold: ALL of a user's events
                           share a fold (group k-fold), folds by md5
                           hash so assignment is stable under data
                           growth (adding events never moves a user)
- class_balance_weights    inverse-frequency class weights normalized
                           to keep the effective sample size equal to
                           the real one (the loss-reweighting table)
- stratified_hash_sample   per-class target rates applied via a
                           deterministic md5 uniform on the EVENT id —
                           reproducible sampling with no RNG state

Determinism: all hashes are md5 over the canonical id string, mapped
to u in [0,1) via the 7-hex-digit prefix (the weighted_sample_docs
idiom, catalog_datapipe.py:236); counts are exact integers and each
output ratio divides once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

_CENTS = "CAST(round(value * 100) AS BIGINT)"

# md5-prefix uniform in [0,1): 7 hex digits / 16^7
_U_SQL = ("(CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 7)) "
          "AS BIGINT) / 268435456.0)")


def _u_col(key):
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 7),
                  16, 10).cast("double") / 268435456.0


@query(
    "group_kfold_assignment",
    oracle=f"""
    SELECT CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))
                     AS BIGINT) % 5 AS BIGINT) AS fold,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum({_CENTS}) AS DOUBLE) / 100, 2) AS value_sum
    FROM events
    GROUP BY 1
    """,
)
def group_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group k-fold (k=5): the fold is a function of user_id ONLY, so
    every event of a user lands in the same fold — the leakage guard
    cross-validation needs when rows within a group are correlated
    (scikit-learn GroupKFold semantics, hash-stable instead of
    index-based: adding data never reshuffles existing users).

    Scale: the fold is a map-side expression (md5 of the grouping key,
    no join, no sort); the summary is one groupBy over 5 groups with
    exact integer-cent sums."""
    ev = _t(spark, sf_dir, "events")
    fold = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 7),
                   16, 10).cast("long") % 5).alias("fold")
    return (ev.groupBy(fold)
            .agg(F.count_distinct("user_id").cast("long").alias("n_users"),
                 F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.round(F.sum(F.round(F.col("value") * 100, 0)
                               .cast("long")).cast("double") / 100, 2)
                 .alias("value_sum")))


@query(
    "class_balance_weights",
    oracle="""
    WITH cls AS (
        SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    ),
    tot AS (SELECT sum(n) AS nt, count(*) AS k FROM cls)
    SELECT event_type, CAST(n AS BIGINT) AS n_rows,
           round(CAST(nt AS DOUBLE) / (k * n), 6) AS weight,
           round(CAST(nt AS DOUBLE) / k, 2) AS effective_rows
    FROM cls, tot
    """,
)
def class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights, w_c = N / (K * n_c) — the
    standard loss-reweighting table for imbalanced training (every
    class contributes N/K effective rows; sum over rows of w = N, so
    the learning rate's meaning is unchanged).

    Scale: one groupBy(class) plus a broadcast 1-row total — the
    weight table itself is |classes| rows and ships to trainers as a
    broadcast literal."""
    cls = (_t(spark, sf_dir, "events")
           .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
           # read by the total and the output row set
           .cache())
    tot = cls.agg(F.sum("n").alias("nt"), F.count(F.lit(1)).alias("k"))
    return (cls.crossJoin(F.broadcast(tot))
            .select("event_type", F.col("n").cast("long").alias("n_rows"),
                    F.round(F.col("nt").cast("double")
                            / (F.col("k") * F.col("n")), 6).alias("weight"),
                    F.round(F.col("nt").cast("double") / F.col("k"), 2)
                    .alias("effective_rows")))


_RATE_SQL = """CASE event_type
    WHEN 'purchase' THEN 1.0 WHEN 'signup' THEN 1.0
    WHEN 'click' THEN 0.1 WHEN 'view' THEN 0.05 ELSE 0.2 END"""


@query(
    "stratified_hash_sample",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN {_U_SQL.format(key='event_id')}
                         < {_RATE_SQL} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           round(CAST(sum(CASE WHEN {_U_SQL.format(key='event_id')}
                               < {_RATE_SQL} THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS achieved_rate,
           round({_RATE_SQL}, 4) AS target_rate
    FROM events
    GROUP BY event_type
    """,
)
def stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with PER-CLASS target rates (keep all
    rare purchase/signup rows, thin the click/view flood) applied via
    a deterministic md5 uniform on the event id — the reproducible
    alternative to rand(): the same row is always in or out, across
    runs, engines, and retries (a must for exactly-once pipelines).

    Scale: pure map-side expression — no shuffle beyond the summary
    aggregate; at 100 TB the sampled WRITE is the output and this
    summary is the audit row.  Rates live in one CASE expression
    (swap per policy)."""
    ev = _t(spark, sf_dir, "events")
    rate = (F.when(F.col("event_type").isin("purchase", "signup"), 1.0)
            .when(F.col("event_type") == "click", 0.1)
            .when(F.col("event_type") == "view", 0.05)
            .otherwise(0.2))
    keep = (_u_col(F.col("event_id")) < rate).cast("int")
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_"),
                 F.sum(keep).alias("s_"),
                 F.round(F.max(rate), 4).alias("target_rate"))
            .select("event_type",
                    F.col("n_").cast("long").alias("n_total"),
                    F.col("s_").cast("long").alias("n_sampled"),
                    F.round(F.col("s_").cast("double") / F.col("n_"), 4)
                    .alias("achieved_rate"),
                    "target_rate"))
