"""Catalog part — lead-lag causality diagnostics (STAGED for r9).

The cointegration family (catalog_r12_cointegration) answers "do the
levels share a trend"; these rows answer the RETURN-space lead-lag
questions next to it:

- granger_causality_pairs  Granger (1969) causality at lag 1 for every
                           ORDERED event-type pair (x -> y): F test of
                           adding x_{t-1} to y_t ~ const + y_{t-1} —
                           F = (RSS_r - RSS_u) / (RSS_u / (n - 3))
- ccf_purchase_view        sample cross-correlation purchase-vs-view
                           daily returns at lags -3..+3 (Box & Jenkins
                           ch. 11) — which side leads, and by how much

Determinism: returns are the catalog_r7_risk integer micro-unit idiom,
so every raw cross-moment (per pair, per lag) is an exact integer; the
2-regressor OLS solves the CENTERED 2x2 normal equations in closed
form over those integers; both statistics are single double
expressions, rounded in-query (6 dp).  RSS terms reuse the exact
moments — no per-row residual materialization at all.

Scale: one events scan -> the shared daily rollup; the pair/lag joins
are |days| x |pairs| / x |lags| rows over the tiny return frame; all
moments are map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets

_LAGS = 3

#: lag-aligned (y_t, y_{t-1}, x_{t-1}) triples per ordered pair
_TRIPLES_SQL = f"""
    {_RET_BASE},
    lagged AS (
        SELECT event_type, ddate, r,
               lag(r) OVER (PARTITION BY event_type ORDER BY ddate)
                   AS r_prev
        FROM rets
    ),
    triples AS (
        SELECT x.event_type AS tx, y.event_type AS ty,
               y.r AS yt, y.r_prev AS yp, x.r_prev AS xp
        FROM lagged y JOIN lagged x
          ON x.ddate = y.ddate AND x.event_type <> y.event_type
        WHERE y.r_prev IS NOT NULL AND x.r_prev IS NOT NULL
    )
"""


@query(
    "granger_causality_pairs",
    oracle=f"""
    WITH {_TRIPLES_SQL},
    mom AS (
        SELECT tx, ty, count(*) AS n,
               sum(CAST(yt AS HUGEINT)) AS sy,
               sum(CAST(yp AS HUGEINT)) AS s1,
               sum(CAST(xp AS HUGEINT)) AS s2,
               sum(CAST(yt AS HUGEINT) * yt) AS syy,
               sum(CAST(yp AS HUGEINT) * yp) AS s11,
               sum(CAST(xp AS HUGEINT) * xp) AS s22,
               sum(CAST(yp AS HUGEINT) * xp) AS s12,
               sum(CAST(yp AS HUGEINT) * yt) AS s1y,
               sum(CAST(xp AS HUGEINT) * yt) AS s2y
        FROM triples GROUP BY tx, ty HAVING count(*) >= 5
    ),
    c AS (
        SELECT tx, ty, n,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy,
               CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS c11,
               CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS c22,
               CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS c12,
               CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n AS c1y,
               CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS c2y
        FROM mom
    ),
    fit AS (
        SELECT tx, ty, n,
               cyy - c1y * c1y / c11 AS rss_r,
               cyy - ((c22 * c1y - c12 * c2y) * c1y
                      + (c11 * c2y - c12 * c1y) * c2y)
                     / (c11 * c22 - c12 * c12) AS rss_u
        FROM c WHERE c11 > 0 AND c11 * c22 - c12 * c12 > 0
    )
    SELECT tx AS cause, ty AS effect, CAST(n AS BIGINT) AS n_days,
           round((rss_r - rss_u) / (rss_u / (n - 3)), 6) AS f_stat
    FROM fit ORDER BY cause, effect
    """,
)
def granger_causality_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger F for every ordered type pair: does yesterday's x
    return improve the AR(1) prediction of today's y return?  Solved in
    closed form on the centered 2x2 normal equations from exact integer
    micro-return moments (Cramer's rule), RSS by the projection
    identities — no residual rows ever materialize."""
    rets = _rets(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("ddate")
    # ~150-row frame consumed by BOTH join legs — cache so the rollup +
    # two lag windows run once (uncached: 2 scans / 4 WindowExec nodes)
    lagged = rets.withColumn("r_prev", F.lag("r").over(w)).cache()
    y = lagged.select(F.col("event_type").alias("ty"), "ddate",
                      F.col("r").alias("yt"), F.col("r_prev").alias("yp"))
    x = lagged.select(F.col("event_type").alias("tx"),
                      F.col("ddate").alias("ddate2"),
                      F.col("r_prev").alias("xp"))
    triples = (y.join(x, (F.col("ddate") == F.col("ddate2"))
                      & (F.col("tx") != F.col("ty")))
               .filter(F.col("yp").isNotNull() & F.col("xp").isNotNull())
               .select("tx", "ty", "yt", "yp", "xp"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = (triples.groupBy("tx", "ty")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(dec("yt")).alias("sy"),
                F.sum(dec("yp")).alias("s1"),
                F.sum(dec("xp")).alias("s2"),
                F.sum(dec("yt") * F.col("yt")).alias("syy"),
                F.sum(dec("yp") * F.col("yp")).alias("s11"),
                F.sum(dec("xp") * F.col("xp")).alias("s22"),
                F.sum(dec("yp") * F.col("xp")).alias("s12"),
                F.sum(dec("yp") * F.col("yt")).alias("s1y"),
                F.sum(dec("xp") * F.col("yt")).alias("s2y"))
           .filter(F.col("n") >= 5))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = F.col("n")
    cyy = d("syy") - d("sy") * d("sy") / n
    c11 = d("s11") - d("s1") * d("s1") / n
    c22 = d("s22") - d("s2") * d("s2") / n
    c12 = d("s12") - d("s1") * d("s2") / n
    c1y = d("s1y") - d("s1") * d("sy") / n
    c2y = d("s2y") - d("s2") * d("sy") / n
    det = c11 * c22 - c12 * c12
    rss_r = cyy - c1y * c1y / c11
    rss_u = cyy - ((c22 * c1y - c12 * c2y) * c1y
                   + (c11 * c2y - c12 * c1y) * c2y) / det
    return (mom.filter((c11 > 0) & (det > 0))
            .select(F.col("tx").alias("cause"),
                    F.col("ty").alias("effect"),
                    n.cast("long").alias("n_days"),
                    F.round((rss_r - rss_u) / (rss_u / (n - 3)), 6)
                    .alias("f_stat"))
            .orderBy("cause", "effect"))


@query(
    "ccf_purchase_view",
    oracle=f"""
    WITH {_RET_BASE},
    px AS (SELECT ddate, r FROM rets WHERE event_type = 'purchase'),
    vw AS (SELECT ddate, r FROM rets WHERE event_type = 'view'),
    lags AS (SELECT unnest(range(-{_LAGS}, {_LAGS} + 1)) AS lag),
    aligned AS (
        SELECT l.lag, p.r AS x, v.r AS y
        FROM lags l
        JOIN px p ON TRUE
        JOIN vw v ON v.ddate = p.ddate + CAST(l.lag AS INT)
    ),
    m AS (
        SELECT lag, count(*) AS n,
               sum(CAST(x AS HUGEINT)) AS sx,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy,
               sum(CAST(x AS HUGEINT) * y) AS sxy
        FROM aligned GROUP BY lag HAVING count(*) >= 3
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS ccf
    FROM m ORDER BY lag
    """,
)
def ccf_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of purchase vs view daily returns at lags
    -3..+3: positive-lag peaks mean purchases LEAD views by that many
    days.  Per-lag Pearson r from exact integer moments over the dates
    where both series observe (a date join per lag, never a positional
    shift)."""
    rets = _rets(spark, sf_dir)
    px = (rets.filter(F.col("event_type") == "purchase")
          .select("ddate", F.col("r").alias("x")))
    vw = (rets.filter(F.col("event_type") == "view")
          .select(F.col("ddate").alias("vdate"), F.col("r").alias("y")))
    lags = _t(spark, sf_dir, "region").sparkSession.range(
        -_LAGS, _LAGS + 1).select(F.col("id").cast("int").alias("lag"))
    aligned = (px.crossJoin(F.broadcast(lags))
               .join(F.broadcast(vw),
                     F.expr("vdate = date_add(ddate, lag)"))
               .select("lag", "x", "y"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = (aligned.groupBy("lag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(dec("x")).alias("sx"), F.sum(dec("y")).alias("sy"),
              F.sum(dec("x") * F.col("x")).alias("sxx"),
              F.sum(dec("y") * F.col("y")).alias("syy"),
              F.sum(dec("x") * F.col("y")).alias("sxy"))
         .filter(F.col("n") >= 3))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt((d("n") * d("sxx") - d("sx") * d("sx"))
                 * (d("n") * d("syy") - d("sy") * d("sy")))
    return (m.select(F.col("lag").cast("long").alias("lag"),
                     F.col("n").cast("long").alias("n_days"),
                     F.round(num / den, 6).alias("ccf"))
            .orderBy("lag"))
