"""Catalog part — Bradley-Terry paired-comparison model (STAGED r11).

The pairwise sign tests (catalog_r18_multipletest) ask "is any pair
different?"; Bradley-Terry (1952) fits the LATENT STRENGTH behind all
pairs at once — the model under chess ratings, A/B arena leaderboards
and LLM preference evaluation. "Contests": type i beats type j on each
common day its return is strictly higher (ties dropped):

- bt_strengths    per-type strength after 3 unrolled
                  minorize-maximize iterations (Hunter 2004):
                  p_i ← W_i / Σ_{j≠i} n_ij/(p_i + p_j), renormalized
                  to sum 1 each pass, from the uniform start
- bt_win_matrix   the fitted win probabilities p_i/(p_i + p_j) for
                  every ordered pair, next to the empirical win rate —
                  the model-vs-data residual view

Determinism: win counts are exact integers off the date-keyed return
self-join; the MM iterations are fixed-shape double expressions over
5 strengths and 10 pair counts (identical operand trees on both
engines), rounded 6 dp.

Scale: one events scan -> the daily rollup -> 10 pair-count rows;
iterations run on constant-size frames (the classic aggregate-then-
iterate design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t  # noqa: F401
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets

_ITERS = 3

#: directed win counts + symmetrized contest counts
_BT_BASE = f"""
    WITH {_RET_BASE},
    wins AS MATERIALIZED (
        SELECT a.event_type AS i, b.event_type AS j,
               CAST(count(*) AS BIGINT) AS w
        FROM rets a JOIN rets b
          ON a.ddate = b.ddate AND a.event_type <> b.event_type
        WHERE a.r > b.r
        GROUP BY 1, 2
    ),
    contests AS MATERIALIZED (
        SELECT w1.i, w1.j, w1.w,
               w1.w + coalesce(w2.w, 0) AS n
        FROM wins w1 LEFT JOIN wins w2
          ON w2.i = w1.j AND w2.j = w1.i
    ),
    wtot AS (
        SELECT i, sum(w) AS wi FROM wins GROUP BY i
    ),
    p0 AS (
        SELECT DISTINCT i AS t, 0.2 AS p FROM wins
    )"""


def _bt_iter_sql() -> str:
    parts = [_BT_BASE]
    for k in range(1, _ITERS + 1):
        parts.append(f""",
    raw{k} AS (
        SELECT c.i AS t,
               max(wtot.wi) / sum(c.n / (pa.p + pb.p)) AS p
        FROM contests c
        JOIN p{k - 1} pa ON pa.t = c.i
        JOIN p{k - 1} pb ON pb.t = c.j
        JOIN wtot ON wtot.i = c.i
        GROUP BY c.i
    ),
    p{k} AS (
        SELECT t, p / (SELECT sum(p) FROM raw{k}) AS p FROM raw{k}
    )""")
    return "".join(parts)


def _bt_strengths(spark: SparkSession, sf_dir: str):
    """((t, p) strengths after the unrolled MM iterations (sum 1),
    cached directed-win-count frame (i, j, w)) — callers derive wtot /
    contests from the returned wins instead of re-running the daily
    return self-join (r14, guide §2.4: both registered rows previously
    rebuilt the contest join a second time for their output frame)."""
    r = _rets(spark, sf_dir).cache()
    a = r.select(F.col("event_type").alias("i"), "ddate",
                 F.col("r").alias("ra"))
    b = r.select(F.col("event_type").alias("j"), "ddate",
                 F.col("r").alias("rb"))
    wins = (a.join(b, "ddate")
            .filter((F.col("i") != F.col("j"))
                    & (F.col("ra") > F.col("rb")))
            .groupBy("i", "j").agg(F.count(F.lit(1)).alias("w"))
            .cache())
    rev = wins.select(F.col("i").alias("j2"), F.col("j").alias("i2"),
                      F.col("w").alias("w_rev"))
    contests = (wins.join(rev, (wins.i == F.col("i2"))
                          & (wins.j == F.col("j2")), "left")
                .select("i", "j", "w",
                        (F.col("w") + F.coalesce("w_rev", F.lit(0)))
                        .alias("n"))
                .cache())
    wtot = wins.groupBy("i").agg(F.sum("w").alias("wi"))
    # iterate on COLLECTED 5-row state (the kmeans-centroid bounded-
    # collect idiom): leaving each p as a lazy frame nests three join
    # trees and the last iteration's plan compiled for 15-30 s; the
    # state is 5 (type, strength) rows, so each pass materializes it
    # and re-enters as literals, keeping every iteration's plan flat
    strengths = {r["t"]: 0.2 for r in
                 wins.select(F.col("i").alias("t")).distinct().collect()}
    base = (contests.join(F.broadcast(wtot), "i")
            .select("i", "j", "n", "wi").cache())
    for _ in range(_ITERS):
        pmap = F.create_map(
            *[F.lit(x) for kv in strengths.items() for x in kv])
        raw = (base
               .groupBy(F.col("i").alias("t"))
               .agg((F.max("wi")
                     / F.sum(F.col("n") / (pmap[F.col("i")]
                                           + pmap[F.col("j")])))
                    .alias("p"))
               .collect())
        # sort before the normalization sum so the 5-term float add
        # runs in a fixed order (run-to-run determinism)
        raw = sorted(raw, key=lambda r: r["t"])
        s = sum(r["p"] for r in raw)
        strengths = {r["t"]: r["p"] / s for r in raw}
    return spark.createDataFrame(
        sorted(strengths.items()), "t string, p double"), wins


@query(
    "bt_strengths",
    oracle=_bt_iter_sql() + f"""
    SELECT t AS event_type, round(p, 6) AS strength,
           CAST(wtot.wi AS BIGINT) AS total_wins
    FROM p{_ITERS} JOIN wtot ON wtot.i = p{_ITERS}.t
    ORDER BY event_type
    """,
)
def bt_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths of the five event types after 3 MM
    iterations over daily return contests (normalized to sum 1), with
    each type's raw win total.

    Scale: aggregate-then-iterate — iterations touch only the 10-pair
    frame."""
    p, wins = _bt_strengths(spark, sf_dir)
    wtot = wins.groupBy("i").agg(F.sum("w").alias("wi"))
    return (p.join(wtot, p.t == wtot.i)
            .select(F.col("t").alias("event_type"),
                    F.round("p", 6).alias("strength"),
                    F.col("wi").cast("long").alias("total_wins"))
            .orderBy("event_type"))


@query(
    "bt_win_matrix",
    oracle=_bt_iter_sql() + f"""
    SELECT c.i AS type_a, c.j AS type_b,
           round(pa.p / (pa.p + pb.p), 6) AS fitted_p_win,
           round(CAST(c.w AS DOUBLE) / c.n, 6) AS empirical_p_win,
           CAST(c.n AS BIGINT) AS n_contests
    FROM contests c
    JOIN p{_ITERS} pa ON pa.t = c.i
    JOIN p{_ITERS} pb ON pb.t = c.j
    WHERE c.i < c.j ORDER BY type_a, type_b
    """,
)
def bt_win_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fitted Bradley-Terry win probabilities p_i/(p_i+p_j) for every
    unordered pair next to the empirical win rate — large residuals
    mark pairs the one-dimensional strength model can't explain
    (intransitivity).

    Scale: the 10-pair frame joined to the 5-strength frame."""
    p, wins = _bt_strengths(spark, sf_dir)
    rev = wins.select(F.col("i").alias("j2"), F.col("j").alias("i2"),
                      F.col("w").alias("w_rev"))
    contests = (wins.join(rev, (wins.i == F.col("i2"))
                          & (wins.j == F.col("j2")), "left")
                .select("i", "j", "w",
                        (F.col("w") + F.coalesce("w_rev", F.lit(0)))
                        .alias("n")))
    pa = p.select(F.col("t").alias("i"), F.col("p").alias("pi"))
    pb = p.select(F.col("t").alias("j"), F.col("p").alias("pj"))
    return (contests.filter(F.col("i") < F.col("j"))
            .join(F.broadcast(pa), "i").join(F.broadcast(pb), "j")
            .select(F.col("i").alias("type_a"),
                    F.col("j").alias("type_b"),
                    F.round(F.col("pi") / (F.col("pi") + F.col("pj")), 6)
                    .alias("fitted_p_win"),
                    F.round(F.col("w").cast("double") / F.col("n"), 6)
                    .alias("empirical_p_win"),
                    F.col("n").cast("long").alias("n_contests"))
            .orderBy("type_a", "type_b"))
