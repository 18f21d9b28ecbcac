"""Catalog part — scorecard / model-risk statistics (STAGED for r8).

The credit-scoring model-governance battery (Siddiqi 2006) on top of
the engine's existing eval surface (catalog_eval.py: confusion / AUC /
calibration / lift; catalog_drift.py: PSI — the other half of the
standard scorecard monitoring pack):

- woe_iv_discount_returns  Weight of Evidence + Information Value of
                           the discount attribute against the return
                           flag (the feature-screening standard)
- somers_d_qty_returns     Somers' D (Somers 1962) of quantity vs the
                           return outcome — the asymmetric rank
                           association scorecards quote (D = 2·AUC−1)
- brier_decomposition      Murphy (1973) reliability / resolution /
                           uncertainty decomposition of the Brier
                           score over the eval family's score deciles

Determinism: WOE's ln and every ratio run over exact integer counts;
Somers' D is exact cell-count combinatorics; the Brier terms are
per-BIN rows (the PSI convention — no cross-bin double summation ever
happens in either engine), each one closed-form double expression
over exact integer sums.

Scale: every statistic reduces the fact stream to a tiny contingency
table map-side (11 discount bins, 50x2 quantity cells, 11 score
bins); nothing wide shuffles, broadcast joins only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t


@query(
    "woe_iv_discount_returns",
    oracle="""
    WITH bins AS MATERIALIZED (
        SELECT l_discount AS discount,
               CAST(count(*) FILTER (WHERE l_returnflag <> 'R') AS BIGINT)
                   AS n_good,
               CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
                   AS n_bad
        FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(n_good) AS g, sum(n_bad) AS b FROM bins)
    SELECT discount, n_good, n_bad,
           round(ln(CAST(n_good AS DOUBLE) * b
                    / (CAST(n_bad AS DOUBLE) * g)), 6) AS woe,
           round((CAST(n_good AS DOUBLE) / g - CAST(n_bad AS DOUBLE) / b)
                 * ln(CAST(n_good AS DOUBLE) * b
                      / (CAST(n_bad AS DOUBLE) * g)), 6) AS iv_term
    FROM bins, tot
    WHERE n_good > 0 AND n_bad > 0
    ORDER BY discount
    """,
)
def woe_iv_discount_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOE_i = ln((good_i/G)/(bad_i/B)) and its IV contribution per
    discount bin, 'bad' = returned line (l_returnflag = 'R').  The 11
    native discount values are the bins; empty-side bins are dropped
    identically on both engines (none occur at any test SF).

    Scale: one fact scan to an 11-row contingency table map-side; the
    2-number total broadcasts back; per-row math only (summing IV is
    the caller's trivial fold — no cross-bin float sum in-engine)."""
    li = _t(spark, sf_dir, "lineitem")
    bins = (li.groupBy(F.col("l_discount").alias("discount"))
            .agg(F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0))
                 .alias("n_good"),
                 F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
                 .alias("n_bad")))
    tot = bins.agg(F.sum("n_good").alias("g"), F.sum("n_bad").alias("b"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    woe = F.log(d("n_good") * F.col("b") / (d("n_bad") * F.col("g")))
    return (bins.crossJoin(F.broadcast(tot))
            .where((F.col("n_good") > 0) & (F.col("n_bad") > 0))
            .select("discount",
                    F.col("n_good").cast("long").alias("n_good"),
                    F.col("n_bad").cast("long").alias("n_bad"),
                    F.round(woe, 6).alias("woe"),
                    F.round((d("n_good") / F.col("g")
                             - d("n_bad") / F.col("b")) * woe, 6)
                    .alias("iv_term"))
            .orderBy("discount"))


@query(
    "somers_d_qty_returns",
    oracle="""
    WITH cells AS MATERIALIZED (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               CAST(count(*) AS HUGEINT) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
        SELECT sum(CASE WHEN b.y > a.y THEN a.c * b.c ELSE 0 END) AS nc,
               sum(CASE WHEN b.y < a.y THEN a.c * b.c ELSE 0 END) AS nd
        FROM cells a JOIN cells b ON b.x > a.x
    ),
    margy AS (
        SELECT sum(t * (t - 1) / 2) AS n_ty
        FROM (SELECT sum(c) AS t FROM cells GROUP BY y)
    ),
    tot AS (SELECT sum(c) AS n FROM cells)
    SELECT CAST(n AS BIGINT) AS n, CAST(nc AS BIGINT) AS concordant,
           CAST(nd AS BIGINT) AS discordant,
           round(CAST(nc - nd AS DOUBLE)
                 / CAST(n * (n - 1) / 2 - n_ty AS DOUBLE), 6) AS somers_d
    FROM pairs, margy, tot
    """,
)
def somers_d_qty_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D of quantity as a predictor of the return outcome:
    (nc − nd) / (pairs untied on the OUTCOME) = (nc − nd) /
    (n_pos · n_neg), from the exact 50x2 contingency table (the
    outcome-conditioned asymmetric variant, unlike tau-b's symmetric
    treatment in kendall_tau_qty_discount).  For binary outcomes this
    is exactly the scorecard Gini, 2·AUC − 1.

    Scale: ONE groupBy reduces the fact to ~100 cells; the pair sums
    are a broadcast x broadcast cell self-join."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"))
    cells = (li.groupBy("x", "y")
             .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
             .cache())
    a, b = cells.alias("a"), cells.alias("b")
    zero = F.lit(0).cast("decimal(38,0)")
    pairs = (a.join(F.broadcast(b), F.col("b.x") > F.col("a.x"))
             .agg(F.sum(F.when(F.col("b.y") > F.col("a.y"),
                               F.col("a.c") * F.col("b.c")).otherwise(zero))
                  .alias("nc"),
                  F.sum(F.when(F.col("b.y") < F.col("a.y"),
                               F.col("a.c") * F.col("b.c")).otherwise(zero))
                  .alias("nd")))
    n_ty = (cells.groupBy("y").agg(F.sum("c").alias("t"))
            .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n_ty")))
    tot = cells.agg(F.sum("c").alias("n"))
    return (pairs.crossJoin(F.broadcast(n_ty)).crossJoin(F.broadcast(tot))
            .select(
                F.col("n").cast("long").alias("n"),
                F.col("nc").cast("long").alias("concordant"),
                F.col("nd").cast("long").alias("discordant"),
                F.round((F.col("nc") - F.col("nd")).cast("double")
                        / (F.col("n") * (F.col("n") - 1) / 2
                           - F.col("n_ty")).cast("double"), 6)
                .alias("somers_d")))


# the eval family's deterministic backtest base (catalog_eval.py):
# score = floor(1e6 * early purchase share), label = heavy late buyer
_SPLIT = "TIMESTAMP '2024-01-16 00:00:00'"


@query(
    "brier_decomposition",
    oracle=f"""
    WITH base AS (
        SELECT CAST(floor(1000000.0
                    * sum(CASE WHEN ts < {_SPLIT}
                               AND event_type = 'purchase'
                          THEN 1 ELSE 0 END)
                    / sum(CASE WHEN ts < {_SPLIT} THEN 1 ELSE 0 END))
                    AS BIGINT) AS score_int,
               CASE WHEN sum(CASE WHEN ts >= {_SPLIT}
                                  AND event_type = 'purchase'
                             THEN 1 ELSE 0 END) >= 7
                    THEN 1 ELSE 0 END AS label
        FROM events GROUP BY user_id
        HAVING sum(CASE WHEN ts < {_SPLIT} THEN 1 ELSE 0 END) > 0
    ),
    bins AS MATERIALIZED (
        SELECT score_int // 100000 AS bin,
               count(*) AS n_k,
               CAST(sum(score_int) AS HUGEINT) AS s_k,
               CAST(sum(label) AS BIGINT) AS y_k,
               CAST(sum(CAST(score_int AS HUGEINT) * score_int) AS HUGEINT)
                   AS s2_k,
               CAST(sum(CAST(score_int AS HUGEINT) * label) AS HUGEINT)
                   AS sy_k
        FROM base GROUP BY 1
    ),
    tot AS (SELECT sum(n_k) AS n, sum(y_k) AS y FROM bins)
    SELECT CAST(bin AS BIGINT) AS bin, CAST(n_k AS BIGINT) AS n,
           round(CAST(s_k AS DOUBLE) / n_k / 1000000.0, 6)
               AS mean_forecast,
           round(CAST(y_k AS DOUBLE) / n_k, 6) AS event_rate,
           round((CAST(s_k AS DOUBLE) / n_k / 1000000.0
                  - CAST(y_k AS DOUBLE) / n_k)
                 * (CAST(s_k AS DOUBLE) / n_k / 1000000.0
                    - CAST(y_k AS DOUBLE) / n_k)
                 * n_k / n, 6) AS reliability_term,
           round((CAST(y_k AS DOUBLE) / n_k - CAST(y AS DOUBLE) / n)
                 * (CAST(y_k AS DOUBLE) / n_k - CAST(y AS DOUBLE) / n)
                 * n_k / n, 6) AS resolution_term,
           round((CAST(s2_k AS DOUBLE) / 1000000.0 / 1000000.0
                  - 2.0 * CAST(sy_k AS DOUBLE) / 1000000.0
                  + CAST(y_k AS DOUBLE)) / n, 6) AS brier_term
    FROM bins, tot ORDER BY bin
    """,
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973) decomposition inputs per score bin (score deciles
    of the eval family's backtest base, catalog_eval.py _EVAL_BASE):
    reliability n_k(p̄_k − ō_k)²/N, resolution n_k(ō_k − ō)²/N, and the
    bin's exact Brier contribution Σ(p_i − y_i)²/N.  Per-BIN rows (the
    PSI convention): Brier = Σ brier_term, REL − RES + UNC recomposes
    up to the within-bin forecast variance — the caller's 11-row fold,
    never a cross-bin float sum in-engine.

    Scale: one events scan to per-user scores (the shared backtest
    reduction), one 11-row bin rollup, a 2-number broadcast total."""
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    early = F.when(F.col("ts") < split, 1).otherwise(0)
    early_purch = F.when(
        (F.col("ts") < split) & (F.col("event_type") == "purchase"), 1
    ).otherwise(0)
    late_purch = F.when(
        (F.col("ts") >= split) & (F.col("event_type") == "purchase"), 1
    ).otherwise(0)
    base = (_t(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.sum(early).alias("n_early"),
                 F.sum(early_purch).alias("n_early_purch"),
                 (F.sum(late_purch) >= 7).cast("int").alias("label"))
            .filter(F.col("n_early") > 0)
            .select(
                F.floor(1000000.0 * F.col("n_early_purch")
                        / F.col("n_early")).cast("long").alias("score_int"),
                F.col("label").cast("long").alias("label")))
    s = F.col("score_int").cast("decimal(38,0)")
    bins = (base.groupBy(F.expr("score_int div 100000").alias("bin"))
            .agg(F.count(F.lit(1)).alias("n_k"),
                 F.sum("score_int").alias("s_k"),
                 F.sum("label").alias("y_k"),
                 F.sum(s * F.col("score_int")).alias("s2_k"),
                 F.sum(s * F.col("label")).alias("sy_k")))
    tot = bins.agg(F.sum("n_k").alias("n"), F.sum("y_k").alias("y"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    p_k = d("s_k") / F.col("n_k") / 1000000.0
    o_k = d("y_k") / F.col("n_k")
    o = d("y") / F.col("n")
    return (bins.crossJoin(F.broadcast(tot))
            .select(
                F.col("bin").cast("long").alias("bin"),
                F.col("n_k").cast("long").alias("n"),
                F.round(p_k, 6).alias("mean_forecast"),
                F.round(o_k, 6).alias("event_rate"),
                F.round((p_k - o_k) * (p_k - o_k) * F.col("n_k")
                        / F.col("n"), 6).alias("reliability_term"),
                F.round((o_k - o) * (o_k - o) * F.col("n_k") / F.col("n"), 6)
                .alias("resolution_term"),
                F.round((d("s2_k") / 1000000.0 / 1000000.0
                         - 2.0 * d("sy_k") / 1000000.0 + d("y_k"))
                        / F.col("n"), 6).alias("brier_term"))
            .orderBy("bin"))
