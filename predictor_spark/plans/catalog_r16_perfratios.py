"""Catalog part — benchmark-relative performance ratios (STAGED r10).

The returns dashboard (catalog_r7_risk: Sharpe/Sortino/VaR/beta;
catalog_r12_risk3: Omega/Kelly/Ulcer) measures each series in
isolation or against zero. These rows complete the classic
BENCHMARK-RELATIVE battery (reference trading surface
predictor_plugins/common/trading.py consumes the same daily return
series), with the pooled all-types daily return as the market proxy:

- information_ratio_by_type  IR = mean(active)/std(active) over daily
                             active returns r_i - r_bench (Grinold &
                             Kahn) plus tracking error — the
                             active-management headline number
- treynor_m2_by_type         Treynor ratio mean(r)/beta (systematic-
                             risk-adjusted excess, rf=0) and the
                             Modigliani M² = Sharpe·sigma_bench
                             (risk-matched return, directly comparable
                             to the benchmark's mean)

Determinism: per-type returns are the exact integer micro-unit idiom;
the benchmark return derives from the summed daily bars (exact 6-dp
doubles), micro-quantized with the same half-away rounding, and every
moment (active mean/var, covariances for beta) accumulates in
HUGEINT/decimal(38,0) before one double division, rounded 6 dp.

Scale: ONE events scan -> the shared (type, date) daily rollup; the
benchmark series is a second tiny aggregate of the same bars frame
(cached); the join back is keyed on date over ~30 rows/type. The
moment aggregates are 5-group partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t  # noqa: F401

#: per-(type, date) micro returns JOINED to the pooled-benchmark micro
#: return of the same date — the shared base for both ratio rows.
#: Benchmark bars sum the per-type bars (exact 6-dp doubles), so the
#: market proxy weights every type by its daily mass.
_ACTIVE_BASE = """
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
    ),
    bbars AS (
        SELECT ddate, round(sum(bar), 6) AS bar
        FROM bars GROUP BY ddate
    ),
    brets AS MATERIALIZED (
        SELECT ddate,
               CAST(round(1000000.0 * (bar / prev - 1.0)) AS BIGINT) AS rb
        FROM (SELECT ddate, bar,
                     lag(bar) OVER (ORDER BY ddate) AS prev
              FROM bbars)
        WHERE prev IS NOT NULL AND prev > 0
    ),
    joined AS MATERIALIZED (
        SELECT r.event_type, r.ddate, r.r, b.rb
        FROM rets r JOIN brets b ON b.ddate = r.ddate
    )"""


def _joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, ddate, r, rb): per-type and benchmark micro returns,
    off one cached daily-bars frame."""
    bars = (_t(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("ddate"))
            .agg(F.round(F.sum("value"), 6).alias("bar"))
            .cache())
    wt = Window.partitionBy("event_type").orderBy("ddate")
    rets = (bars.withColumn("prev", F.lag("bar").over(wt))
            .filter(F.col("prev").isNotNull() & (F.col("prev") > 0))
            .select("event_type", "ddate",
                    F.round(1000000.0 * (F.col("bar") / F.col("prev") - 1.0),
                            0).cast("long").alias("r")))
    bbars = bars.groupBy("ddate").agg(F.round(F.sum("bar"), 6).alias("bar"))
    wb = Window.partitionBy().orderBy("ddate")
    brets = (bbars.withColumn("prev", F.lag("bar").over(wb))
             .filter(F.col("prev").isNotNull() & (F.col("prev") > 0))
             .select("ddate",
                     F.round(1000000.0
                             * (F.col("bar") / F.col("prev") - 1.0),
                             0).cast("long").alias("rb")))
    return rets.join(F.broadcast(brets), "ddate").select(
        "event_type", "ddate", "r", "rb")


@query(
    "information_ratio_by_type",
    oracle=f"""
    WITH {_ACTIVE_BASE},
    m AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(r - rb AS HUGEINT)) AS s,
               sum(CAST(r - rb AS HUGEINT) * (r - rb)) AS q
        FROM joined GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(CAST(s AS DOUBLE) / (n * 1e6), 6) AS mean_active,
           round(sqrt((CAST(q AS DOUBLE) * n - CAST(s AS DOUBLE) * s)
                      / (CAST(n AS DOUBLE) * (n - 1))) / 1e6, 6)
               AS tracking_error,
           round((CAST(s AS DOUBLE) / n)
                 / sqrt((CAST(q AS DOUBLE) * n - CAST(s AS DOUBLE) * s)
                        / (CAST(n AS DOUBLE) * (n - 1))), 6)
               AS information_ratio
    FROM m ORDER BY event_type
    """,
)
def information_ratio_by_type(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Daily information ratio per event type vs the pooled benchmark:
    mean active return over its sample std (tracking error), from exact
    integer active-return moments.

    Scale: one events scan; benchmark attach is a ~30-row broadcast."""
    j = _joined(spark, sf_dir)
    a = (F.col("r") - F.col("rb")).cast("decimal(38,0)")
    m = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a).alias("s"),
        F.sum(a * (F.col("r") - F.col("rb"))).alias("q"))
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    q = F.col("q").cast("double")
    te = F.sqrt((q * F.col("n") - s * s) / (n * (n - 1)))
    return (m.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.round(s / (n * 1e6), 6).alias("mean_active"),
        F.round(te / 1e6, 6).alias("tracking_error"),
        F.round((s / n) / te, 6).alias("information_ratio"))
        .orderBy("event_type"))


@query(
    "treynor_m2_by_type",
    oracle=f"""
    WITH {_ACTIVE_BASE},
    m AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(r AS HUGEINT)) AS sr,
               sum(CAST(r AS HUGEINT) * r) AS qr,
               sum(CAST(rb AS HUGEINT)) AS sb,
               sum(CAST(rb AS HUGEINT) * rb) AS qb,
               sum(CAST(r AS HUGEINT) * rb) AS srb
        FROM joined GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round((CAST(srb AS DOUBLE) * n - CAST(sr AS DOUBLE) * sb)
                 / (CAST(qb AS DOUBLE) * n - CAST(sb AS DOUBLE) * sb), 6)
               AS beta,
           round((CAST(sr AS DOUBLE) / n / 1e6)
                 / ((CAST(srb AS DOUBLE) * n - CAST(sr AS DOUBLE) * sb)
                    / (CAST(qb AS DOUBLE) * n - CAST(sb AS DOUBLE) * sb)),
                 6) AS treynor,
           round(((CAST(sr AS DOUBLE) / n)
                  / sqrt((CAST(qr AS DOUBLE) * n - CAST(sr AS DOUBLE) * sr)
                         / (CAST(n AS DOUBLE) * (n - 1))))
                 * sqrt((CAST(qb AS DOUBLE) * n - CAST(sb AS DOUBLE) * sb)
                        / (CAST(n AS DOUBLE) * (n - 1))) / 1e6, 6)
               AS m2_measure
    FROM m ORDER BY event_type
    """,
)
def treynor_m2_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treynor ratio (mean return over benchmark beta, rf=0 — reward per
    unit of SYSTEMATIC risk, where Sharpe uses total risk) and the
    Modigliani M² (Sharpe x benchmark sample std — the series' return
    re-levered to benchmark volatility), per event type. Beta from the
    same exact-integer covariance moments capm_beta_by_type uses, but
    against the pooled benchmark rather than a single anchor type.

    Scale: identical shape to information_ratio_by_type — 5-group moment
    partials off the shared scan."""
    j = _joined(spark, sf_dir)
    dr = F.col("r").cast("decimal(38,0)")
    db = F.col("rb").cast("decimal(38,0)")
    m = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dr).alias("sr"), F.sum(dr * F.col("r")).alias("qr"),
        F.sum(db).alias("sb"), F.sum(db * F.col("rb")).alias("qb"),
        F.sum(dr * F.col("rb")).alias("srb"))
    n = F.col("n").cast("double")
    sr, qr = F.col("sr").cast("double"), F.col("qr").cast("double")
    sb, qb = F.col("sb").cast("double"), F.col("qb").cast("double")
    srb = F.col("srb").cast("double")
    beta = (srb * F.col("n") - sr * sb) / (qb * F.col("n") - sb * sb)
    sharpe = (sr / n) / F.sqrt((qr * F.col("n") - sr * sr) / (n * (n - 1)))
    sigma_b = F.sqrt((qb * F.col("n") - sb * sb) / (n * (n - 1)))
    return (m.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.round(beta, 6).alias("beta"),
        F.round((sr / n / 1e6) / beta, 6).alias("treynor"),
        F.round(sharpe * sigma_b / 1e6, 6).alias("m2_measure"))
        .orderBy("event_type"))
