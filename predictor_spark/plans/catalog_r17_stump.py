"""Catalog part — decision-stump feature screening (STAGED r10).

The classic first step of tree induction — and the cheapest supervised
feature-importance screen a 100 TB pipeline can run: for each candidate
feature, the best single split threshold by information gain on a
binary target. Target: the lineitem return flag (l_returnflag = 'R'),
features: quantity and discount.

- decision_stump_gain  the best threshold per feature (split x <= v
                       over EVERY distinct feature value v as
                       candidate) with its information gain in bits
                       and the split's left/right class counts
- stump_gain_curve     the full gain curve over quantity thresholds —
                       gain as a function of v, the drill-down view
                       (what a tree library's split scan sees)

The threshold scan is the textbook aggregation trick: ONE pass reduces
the fact to per-(feature value) class counts (≤50 + ≤11 rows), and a
cumulative window over the value order turns those into left/right
counts for EVERY candidate split simultaneously — no per-threshold
rescan, which is why this design survives any fact size.

Determinism: class counts are exact integers; entropies are identical
double expressions of exact counts (0·log0 handled as 0), rounded 6 dp;
the argmax tie-breaks on the smaller threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: per-feature-value class counts + cumulative split counts + gain.
#: Discount thresholds are in integer cents (round(l_discount*100)).
_STUMP_BASE = """
    obs AS (
        SELECT CAST(l_quantity AS BIGINT) AS quantity,
               CAST(round(l_discount * 100) AS BIGINT) AS discount,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ),
    vc AS (
        SELECT 'quantity' AS feature, quantity AS v,
               count(*) AS n, sum(y) AS pos
        FROM obs GROUP BY quantity
        UNION ALL
        SELECT 'discount', discount, count(*), sum(y)
        FROM obs GROUP BY discount
    ),
    cum AS (
        SELECT feature, v,
               sum(n) OVER w AS nl, sum(pos) OVER w AS pl,
               sum(n) OVER t AS nt, sum(pos) OVER t AS pt,
               max(v) OVER t AS vmax
        FROM vc
        WINDOW w AS (PARTITION BY feature ORDER BY v),
               t AS (PARTITION BY feature)
    ),
    gain AS (
        SELECT feature, v, nl, nt - nl AS nr,
               pl, pt - pl AS pr,
               -- H(parent) - nl/n H(left) - nr/n H(right), bits
               (CASE WHEN pt IN (0, nt) THEN 0 ELSE
                 -(CAST(pt AS DOUBLE)/nt) * log2(CAST(pt AS DOUBLE)/nt)
                 -(1 - CAST(pt AS DOUBLE)/nt) * log2(1 - CAST(pt AS DOUBLE)/nt)
                END)
               - (CAST(nl AS DOUBLE)/nt) *
                 (CASE WHEN pl IN (0, nl) THEN 0 ELSE
                   -(CAST(pl AS DOUBLE)/nl) * log2(CAST(pl AS DOUBLE)/nl)
                   -(1 - CAST(pl AS DOUBLE)/nl)
                      * log2(1 - CAST(pl AS DOUBLE)/nl) END)
               - (CAST(nt - nl AS DOUBLE)/nt) *
                 (CASE WHEN pt - pl IN (0, nt - nl) THEN 0 ELSE
                   -(CAST(pt - pl AS DOUBLE)/(nt - nl))
                      * log2(CAST(pt - pl AS DOUBLE)/(nt - nl))
                   -(1 - CAST(pt - pl AS DOUBLE)/(nt - nl))
                      * log2(1 - CAST(pt - pl AS DOUBLE)/(nt - nl)) END)
               AS ig
        FROM cum WHERE v < vmax
    )"""


def _gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(feature, v, nl, nr, pl, pr, ig) for every candidate split."""
    li = _t(spark, sf_dir, "lineitem")
    obs = li.select(
        F.col("l_quantity").cast("long").alias("quantity"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("discount"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"))
    # ONE fact scan for both features: stack unpivots (feature, v) per
    # row before the aggregate — a per-feature groupBy union would scan
    # lineitem once per feature (plan audit pins max_scans 1)
    vc = (obs.select(F.expr(
        "stack(2, 'quantity', quantity, 'discount', discount)"
        " AS (feature, v)"), "y")
        .groupBy("feature", "v")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")))
    w = Window.partitionBy("feature").orderBy("v") \
        .rowsBetween(Window.unboundedPreceding, 0)
    t = Window.partitionBy("feature")
    cum = vc.select(
        "feature", "v",
        F.sum("n").over(w).alias("nl"), F.sum("pos").over(w).alias("pl"),
        F.sum("n").over(t).alias("nt"), F.sum("pos").over(t).alias("pt"),
        F.max("v").over(t).alias("vmax"))

    def h(p, n):
        q = p.cast("double") / n
        return F.when((p == 0) | (p == n), F.lit(0.0)).otherwise(
            -q * F.log2(q) - (1 - q) * F.log2(1 - q))

    nl, nt, pl, pt = (F.col(c) for c in ("nl", "nt", "pl", "pt"))
    nr, pr = nt - nl, pt - pl
    ig = (h(pt, nt) - (nl.cast("double") / nt) * h(pl, nl)
          - (nr.cast("double") / nt) * h(pr, nr))
    return (cum.filter(F.col("v") < F.col("vmax"))
            .select("feature", "v", "nl", nr.alias("nr"),
                    "pl", pr.alias("pr"), ig.alias("ig")))


@query(
    "decision_stump_gain",
    oracle=f"""
    WITH {_STUMP_BASE},
    best AS (
        SELECT feature, v, nl, nr, pl, pr, ig,
               row_number() OVER (PARTITION BY feature
                                  ORDER BY ig DESC, v) AS rnk
        FROM gain
    )
    SELECT feature, CAST(v AS BIGINT) AS threshold,
           round(ig, 6) AS info_gain_bits,
           CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
           CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right
    FROM best WHERE rnk = 1 ORDER BY feature
    """,
)
def decision_stump_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single-split stump per feature (quantity, discount-cents) on
    the return-flag target: the threshold maximizing information gain
    (ties to the smaller v), with the split's class counts.

    Scale: one fact scan -> ≤61 value rows; the cumulative window turns
    them into all candidate splits at once."""
    g = _gain(spark, sf_dir)
    wr = Window.partitionBy("feature").orderBy(F.col("ig").desc(),
                                               F.col("v"))
    return (g.withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") == 1)
            .select("feature", F.col("v").cast("long").alias("threshold"),
                    F.round("ig", 6).alias("info_gain_bits"),
                    F.col("nl").cast("long").alias("n_left"),
                    F.col("pl").cast("long").alias("pos_left"),
                    F.col("nr").cast("long").alias("n_right"),
                    F.col("pr").cast("long").alias("pos_right"))
            .orderBy("feature"))


@query(
    "stump_gain_curve",
    oracle=f"""
    WITH {_STUMP_BASE}
    SELECT CAST(v AS BIGINT) AS threshold,
           CAST(nl AS BIGINT) AS n_left,
           round(ig, 6) AS info_gain_bits
    FROM gain WHERE feature = 'quantity' ORDER BY v
    """,
)
def stump_gain_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full information-gain curve over quantity thresholds — one
    row per candidate split (what a tree library's split scan computes
    internally), monotone left-count, gain peaking at the stump's
    chosen threshold.

    Scale: same one-scan value aggregation; the curve is ≤49 rows."""
    g = _gain(spark, sf_dir)
    return (g.filter(F.col("feature") == "quantity")
            .select(F.col("v").cast("long").alias("threshold"),
                    F.col("nl").cast("long").alias("n_left"),
                    F.round("ig", 6).alias("info_gain_bits"))
            .orderBy("threshold"))
