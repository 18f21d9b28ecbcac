"""Catalog part — sequential testing (STAGED for r8).

The experiment-statistics family (catalog_experiment.py: Welch t,
CUPED, chi-square, SRM; catalog_r7_causal.py) decides AFTER a fixed
sample.  These two rows are the SEQUENTIAL designs a platform runs
when it wants to stop early:

- sprt_purchase_rate      Wald's sequential probability ratio test
                          (Wald 1945): H0 p=0.10 vs H1 p=0.15 on the
                          event stream's purchase indicator, alpha =
                          beta = 0.05 — the first boundary crossing
                          decides
- obrien_fleming_looks    group-sequential monitoring (O'Brien &
                          Fleming 1979): five equally-spaced calendar
                          looks at a two-arm outcome-rate z (outcome:
                          more purchases than errors — the predicate
                          that splits users non-degenerately at every
                          SF, the chi-square row's lesson; "any
                          purchase" saturates and zeroes the pooled
                          variance), each compared to the OBF
                          boundary z*sqrt(K/k)

Determinism: the SPRT log-likelihood increments are shared literal
expressions (ln of constant ratios — identical inputs, one ln each);
every count is an exact integer prefix sum; the z statistics divide
exact integers once; boundaries are literal constants.  Crossing
flags compare doubles both engines computed identically.

Scale: the SPRT scan is a prefix sum over an ORDERED bounded window
(the first 10k events — a sequential test that hasn't decided by
then is a design error; the cap also bounds the global sort, same
trade as ks_test_value_drift); the OBF looks are five ordinary
aggregates in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_P0, _P1 = 0.10, 0.15
_CAP = 10000            # SPRT horizon (bounds the ordered scan)
_LN_A = 2.944438979166441   # ln((1-beta)/alpha) = ln(19), accept H1
_LN_B = -2.944438979166441  # ln(beta/(1-alpha)) = -ln(19), accept H0
#: per-observation LLR increments (shared literal ratio -> same ln)
_L1 = f"ln({_P1} / {_P0})"
_L0 = f"ln((1 - {_P1}) / (1 - {_P0}))"

_Z_OBF = 2.0403  # final-look two-sided 5% OBF critical value (K=5)


@query(
    "sprt_purchase_rate",
    oracle=f"""
    WITH stream AS (
        SELECT ts, event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events ORDER BY ts, event_id LIMIT {_CAP}
    ),
    walk AS (
        SELECT row_number() OVER w AS n,
               sum(y) OVER (w ROWS UNBOUNDED PRECEDING) AS k
        FROM stream WINDOW w AS (ORDER BY ts, event_id)
    ),
    llr AS (
        -- the crossing compares the 6-dp ROUNDED walk so a last-ulp
        -- ln() difference between libms can never flip a boundary
        SELECT n, k, round(k * {_L1} + (n - k) * {_L0}, 6) AS llr
        FROM walk
    ),
    crossed AS (
        SELECT n, k, llr,
               row_number() OVER (ORDER BY n) AS rn
        FROM llr WHERE llr >= {_LN_A} OR llr <= {_LN_B}
    )
    SELECT CAST(n AS BIGINT) AS n_at_decision,
           CAST(k AS BIGINT) AS successes,
           llr,
           CASE WHEN llr >= {_LN_A} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision
    FROM crossed WHERE rn = 1
    """,
)
def sprt_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT on the purchase indicator in event order: after each
    observation, LLR_n = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0));
    cross ln(19) -> accept H1 (rate is 15%), cross −ln(19) -> accept
    H0 (rate is 10%).  Emits the FIRST decision row — the whole point
    of the design is how few observations it needs.

    Scale: one ordered prefix sum over the capped stream; at 100 TB
    the cap IS the operating mode (a sequential monitor reads a
    bounded head, never the full log)."""
    ev = _t(spark, sf_dir, "events")
    stream = (ev.orderBy("ts", "event_id").limit(_CAP)
              .select(F.when(F.col("event_type") == "purchase", 1)
                      .otherwise(0).alias("y"),
                      "ts", "event_id"))
    w = Window.orderBy("ts", "event_id")
    walk = stream.select(
        F.row_number().over(w).alias("n"),
        F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("k"))
    l1 = F.log(F.lit(_P1) / F.lit(_P0))
    l0 = F.log((1 - F.lit(_P1)) / (1 - F.lit(_P0)))
    # crossing compares the 6-dp ROUNDED walk (see oracle comment)
    llr = walk.select(
        "n", "k",
        F.round(F.col("k") * l1 + (F.col("n") - F.col("k")) * l0, 6)
        .alias("llr"))
    crossed = (llr.where((F.col("llr") >= _LN_A) | (F.col("llr") <= _LN_B))
               .withColumn("rn", F.row_number().over(Window.orderBy("n")))
               .where(F.col("rn") == 1))
    return crossed.select(
        F.col("n").cast("long").alias("n_at_decision"),
        F.col("k").cast("long").alias("successes"),
        "llr",
        F.when(F.col("llr") >= _LN_A, "accept_h1").otherwise("accept_h0")
        .alias("decision"))


@query(
    "obrien_fleming_looks",
    oracle=f"""
    WITH users AS (
        SELECT user_id, user_id % 2 AS arm,
               min(CAST(ts AS DATE)) AS first_day,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END)
                         > sum(CASE WHEN event_type = 'error'
                                    THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS y
        FROM events GROUP BY user_id
    ),
    looks AS (SELECT unnest(range(1, 6)) AS look),
    at_look AS (
        SELECT l.look,
               CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n0,
               CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS y0,
               CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS y1
        FROM looks l JOIN users u
          ON u.first_day < DATE '2024-01-01' + INTERVAL (l.look * 6) DAY
        GROUP BY l.look
    ),
    z AS (
        SELECT look, n0, n1,
               (CAST(y1 AS DOUBLE) / n1 - CAST(y0 AS DOUBLE) / n0)
               / sqrt((CAST(y0 + y1 AS DOUBLE) / (n0 + n1))
                      * (1 - CAST(y0 + y1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1)) AS z_stat
        FROM at_look
    )
    SELECT CAST(look AS BIGINT) AS look,
           CAST(n0 + n1 AS BIGINT) AS n_users,
           round(z_stat, 6) AS z_stat,
           round({_Z_OBF} * sqrt(5.0 / look), 6) AS obf_boundary,
           CASE WHEN abs(z_stat) >= {_Z_OBF} * sqrt(5.0 / look)
                THEN TRUE ELSE FALSE END AS crossed
    FROM z ORDER BY look
    """,
)
def obrien_fleming_looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five equally-spaced calendar looks (every 6 days of January) at
    the two-arm (user parity) outcome-rate z statistic (outcome: more
    purchases than errors), each compared to the O'Brien-Fleming boundary z*·sqrt(K/k) — early looks need
    overwhelming evidence, the final look spends almost the full
    alpha.  Users enter a look once their first event lands before it.

    Scale: the per-user reduction is one pass; the five looks join a
    5-row literal and re-aggregate 5x|users| tiny rows."""
    ev = _t(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.min(F.col("ts").cast("date")).alias("first_day"),
                  (F.sum(F.when(F.col("event_type") == "purchase", 1)
                         .otherwise(0))
                   > F.sum(F.when(F.col("event_type") == "error", 1)
                           .otherwise(0))).cast("int").alias("y"))
             .select((F.col("user_id") % 2).alias("arm"), "first_day", "y"))
    looks = spark.range(1, 6).select(F.col("id").cast("int").alias("look"))
    cutoff = F.expr("DATE '2024-01-01' + make_interval(0,0,0,look*6,0,0,0)")
    at_look = (looks.join(users, users.first_day < cutoff)
               .groupBy("look")
               .agg(F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
                    .alias("n0"),
                    F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
                    .alias("n1"),
                    F.sum(F.when(F.col("arm") == 0, F.col("y"))
                          .otherwise(0)).alias("y0"),
                    F.sum(F.when(F.col("arm") == 1, F.col("y"))
                          .otherwise(0)).alias("y1")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pbar = (F.col("y0") + F.col("y1")).cast("double") \
        / (F.col("n0") + F.col("n1"))
    z = (d("y1") / F.col("n1") - d("y0") / F.col("n0")) \
        / F.sqrt(pbar * (1 - pbar)
                 * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    bound = _Z_OBF * F.sqrt(5.0 / F.col("look"))
    return (at_look.select(
        F.col("look").cast("long").alias("look"),
        (F.col("n0") + F.col("n1")).cast("long").alias("n_users"),
        F.round(z, 6).alias("z_stat"),
        F.round(bound, 6).alias("obf_boundary"),
        (F.abs(z) >= bound).alias("crossed"))
        .orderBy("look"))
