"""Catalog part — portfolio/return risk metrics (STAGED for r7).

Extends the portfolio-risk family (catalog_finance2.py: pairs spread,
max drawdown) with the three risk numbers every returns dashboard
carries (reference trading surface: tick simulator + strategy metrics,
predictor_plugins/common/trading.py):

- sharpe_sortino_by_type   Sharpe (1966) and Sortino (1994) ratios of
                           daily value returns per event type
- var_historical_95        95% historical value-at-risk: the exact
                           5th-percentile order statistic of daily
                           returns (Jorion 2006, the empirical method)
- capm_beta_by_type        CAPM beta/alpha (Sharpe 1964) of each event
                           type's daily returns against the all-type
                           "market" return
- drawdown_duration        underwater-spell statistics of the
                           integer-cent equity curve (spell count,
                           longest spell, total underwater days) — the
                           TIME dimension of max_drawdown_per_type's
                           depth number (Magdon-Ismail et al. 2004)

Determinism: daily bars are round(sum(value), 6) — identical doubles
on both engines at these magnitudes — and every return is immediately
quantized to integer micro-units (round(1e6 * (bar/prev - 1))), so all
moment sums (sum r, sum r^2, sum xy, downside sum) are exact integers
and each ratio is one closed-form double expression over them.  The
VaR quantile is a pure integer order statistic (row_number at rank
(n-1)*5//100 + 1), never an interpolated percentile.

Scale: one events scan -> groupBy(type, date) bars (fixed ~150 rows at
any SF beyond days x types); returns are a lag window per type; all
statistics are map-side partial aggregates over the tiny bar frame.
The heavy work — the daily rollup — is the same shuffle any daily
pipeline already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

# daily bars and micro-unit returns per event type (shared oracle CTE)
_RET_BASE = """
    bars AS MATERIALIZED (
        SELECT event_type, CAST(ts AS DATE) AS ddate,
               round(sum(value), 6) AS bar
        FROM events GROUP BY 1, 2
    ),
    rets AS MATERIALIZED (
        SELECT event_type, ddate,
               CAST(round(1000000.0 * (bar / prev - 1.0)) AS BIGINT) AS r
        FROM (SELECT event_type, ddate, bar,
                     lag(bar) OVER (PARTITION BY event_type
                                    ORDER BY ddate) AS prev
              FROM bars)
        WHERE prev IS NOT NULL AND prev > 0
    )"""


def _rets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, date) integer micro-unit daily returns."""
    bars = (_t(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("ddate"))
            .agg(F.round(F.sum("value"), 6).alias("bar")))
    prev = F.lag("bar").over(
        Window.partitionBy("event_type").orderBy("ddate"))
    return (bars.withColumn("prev", prev)
            .filter(F.col("prev").isNotNull() & (F.col("prev") > 0))
            .select("event_type", "ddate",
                    F.round(1000000.0 * (F.col("bar") / F.col("prev") - 1.0),
                            0).cast("long").alias("r")))


@query(
    "sharpe_sortino_by_type",
    oracle=f"""
    WITH {_RET_BASE},
    s AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(r AS HUGEINT)) AS s1,
               sum(CAST(r AS HUGEINT) * r) AS s2,
               sum(CASE WHEN r < 0 THEN CAST(r AS HUGEINT) * r
                        ELSE 0 END) AS d2
        FROM rets GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(CAST(s1 AS DOUBLE) / (n * 1000000.0), 6) AS mean_ret,
           round((CAST(s1 AS DOUBLE) / n)
                 / sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                        / (CAST(n AS DOUBLE) * (n - 1))), 6) AS sharpe,
           round(CASE WHEN d2 = 0 THEN NULL
                 ELSE (CAST(s1 AS DOUBLE) / n)
                      / sqrt(CAST(d2 AS DOUBLE) / n) END, 6) AS sortino
    FROM s
    """,
)
def sharpe_sortino_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Sharpe (mean/sample-std) and Sortino (mean/downside
    deviation) per event type, from exact integer micro-return moments.

    Scale: the moment sums are 5-group partial aggregates over the
    ~150-row return frame; the events scan is the only heavy stage."""
    r = _rets(spark, sf_dir)
    dec = F.col("r").cast("decimal(38,0)")
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("s1"),
        F.sum(dec * F.col("r")).alias("s2"),
        F.sum(F.when(F.col("r") < 0, dec * F.col("r"))
              .otherwise(F.lit(0).cast("decimal(38,0)"))).alias("d2"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(d("s1") / (F.col("n") * 1000000.0), 6).alias("mean_ret"),
        F.round((d("s1") / F.col("n"))
                / F.sqrt((d("n") * d("s2") - d("s1") * d("s1"))
                         / (d("n") * (F.col("n") - 1))), 6).alias("sharpe"),
        F.round(F.when(F.col("d2") == 0, F.lit(None))
                .otherwise((d("s1") / F.col("n"))
                           / F.sqrt(d("d2") / F.col("n"))), 6)
        .alias("sortino"))


@query(
    "var_historical_95",
    oracle=f"""
    WITH {_RET_BASE},
    ranked AS (
        SELECT event_type, r,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY r, ddate) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM rets
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(-CAST(r AS DOUBLE) / 1000000.0, 6) AS var_95
    FROM ranked
    WHERE rn = (n - 1) * 5 // 100 + 1
    """,
)
def var_historical_95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% historical VaR per event type: the exact ((n-1)*5//100 + 1)-th
    smallest daily return, sign-flipped to a loss magnitude — the
    order-statistic (not interpolated) empirical quantile, so the
    selection is pure integer arithmetic.

    Scale: rank within type over the tiny return frame; at any SF the
    window is |days| rows per type."""
    r = _rets(spark, sf_dir)
    w = Window.partitionBy("event_type")
    ranked = r.select(
        "event_type", "r",
        F.row_number().over(w.orderBy("r", "ddate")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"))
    return (ranked
            .filter(F.col("rn") == F.expr("((n - 1) * 5) div 100 + 1"))
            .select("event_type",
                    F.col("n").cast("long").alias("n_days"),
                    F.round(-F.col("r").cast("double") / 1000000.0, 6)
                    .alias("var_95")))


@query(
    "capm_beta_by_type",
    oracle=f"""
    WITH {_RET_BASE},
    mbars AS (
        SELECT CAST(ts AS DATE) AS ddate, round(sum(value), 6) AS bar
        FROM events GROUP BY 1
    ),
    mrets AS (
        SELECT ddate,
               CAST(round(1000000.0 * (bar / prev - 1.0)) AS BIGINT) AS m
        FROM (SELECT ddate, bar,
                     lag(bar) OVER (ORDER BY ddate) AS prev FROM mbars)
        WHERE prev IS NOT NULL AND prev > 0
    ),
    j AS (
        SELECT rets.event_type, rets.r AS y, mrets.m AS x
        FROM rets JOIN mrets ON rets.ddate = mrets.ddate
    ),
    s AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(x AS HUGEINT) * y) AS sxy
        FROM j GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
               AS beta,
           round((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * sx) / (n * 1000000.0), 6) AS alpha
    FROM s
    """,
)
def capm_beta_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM regression of each type's daily returns on the all-type
    market return: beta = cov(x,y)/var(x), alpha = mean residual —
    both closed-form over exact integer micro-return moments (the
    normal-equations shape of ols_price_qty_discount).

    Scale: market bars are a second tiny daily rollup of the same
    scan; the date join is |days| x |types| rows; moments are 5-group
    partials."""
    rets = _rets(spark, sf_dir)
    mbars = (_t(spark, sf_dir, "events")
             .groupBy(F.col("ts").cast("date").alias("ddate"))
             .agg(F.round(F.sum("value"), 6).alias("bar")))
    mprev = F.lag("bar").over(Window.orderBy("ddate"))
    mrets = (mbars.withColumn("prev", mprev)
             .filter(F.col("prev").isNotNull() & (F.col("prev") > 0))
             .select("ddate",
                     F.round(1000000.0 * (F.col("bar") / F.col("prev")
                                          - 1.0), 0)
                     .cast("long").alias("m")))
    j = rets.join(F.broadcast(mrets), "ddate").select(
        "event_type", F.col("r").alias("y"), F.col("m").alias("x"))
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    s = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"), F.sum(dy).alias("sy"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(dx * F.col("y")).alias("sxy"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    beta = ((d("n") * d("sxy") - d("sx") * d("sy"))
            / (d("n") * d("sxx") - d("sx") * d("sx")))
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(beta, 6).alias("beta"),
        F.round((d("sy") - beta * d("sx")) / (F.col("n") * 1000000.0), 6)
        .alias("alpha"))


@query(
    "drawdown_duration",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               sum(CAST(round(value * 100) AS BIGINT)) AS bar
        FROM events GROUP BY 1, 2
    ),
    dd AS (
        SELECT event_type, hr,
               max(bar) OVER w - bar AS drawdown,
               row_number() OVER w AS rn_all
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    ),
    uw AS (
        SELECT event_type,
               rn_all - row_number() OVER (PARTITION BY event_type
                                           ORDER BY hr) AS grp
        FROM dd WHERE drawdown > 0
    ),
    spells AS (
        SELECT event_type, grp, count(*) AS len
        FROM uw GROUP BY event_type, grp
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_spells,
           CAST(max(len) AS BIGINT) AS longest_spell_hours,
           CAST(sum(len) AS BIGINT) AS underwater_hours
    FROM spells GROUP BY event_type
    """,
)
def drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Underwater-spell statistics per event type on the hourly
    integer-cent bar curve: drawdown is the gap to the running peak bar
    (the time dimension of max drawdown, Magdon-Ismail et al. 2004); a
    spell is a maximal run of consecutive OBSERVED underwater bars.

    Re-grained in r8: the original per-day-of-month cumulative-sum curve
    was monotone at every SF (all-positive increments), so the r7 driver
    grade compared 0 rows to 0 rows (VERDICT r7 #1).  The rewrite also
    fixes a latent gaps-and-islands bug that grade could never see: both
    sides computed the anchor row_number AFTER the underwater filter, so
    the rank difference was constant and every type collapsed to one
    spell.  The anchor rank (rn_all) is now taken over ALL bars before
    filtering, the island rank over underwater bars only.

    Scale: one events scan -> (type, hour) rollup; the running max and
    anchor rank ride ONE (type ordered by hour) partitioning over the
    ~3.4k-row bar frame (bars per type ~= hours in range, independent of
    SF); spells are tiny grouped counts."""
    hourly = (_t(spark, sf_dir, "events")
              .groupBy("event_type",
                       F.date_trunc("hour", F.col("ts")).alias("hr"))
              .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                   .alias("bar")))
    w = Window.partitionBy("event_type").orderBy("hr")
    dd = (hourly
          .withColumn("drawdown", F.max("bar").over(w) - F.col("bar"))
          .withColumn("rn_all", F.row_number().over(w)))
    uw = (dd.filter(F.col("drawdown") > 0)
          .select("event_type",
                  (F.col("rn_all") - F.row_number().over(w)).alias("grp")))
    spells = uw.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("len"))
    return (spells.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_spells"),
                 F.max("len").cast("long").alias("longest_spell_hours"),
                 F.sum("len").cast("long").alias("underwater_hours")))
