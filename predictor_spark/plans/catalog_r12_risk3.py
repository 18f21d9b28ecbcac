"""Catalog part — return/drawdown risk ratios, set 3 (STAGED for r9).

Completes the returns-dashboard stack (catalog_r7_risk: Sharpe/Sortino/
VaR/beta/underwater spells; catalog_r7_vol: range estimators;
catalog_finance2: max drawdown) with the three ratios those families
still lacked (reference trading surface:
predictor_plugins/common/trading.py strategy metrics):

- omega_ratio_by_type    Omega(0) (Keating & Shadwick 2002): the
                         probability-weighted gain/loss mass ratio
                         sum(max(r,0)) / sum(max(-r,0)) — the whole
                         return distribution, not just two moments
- kelly_fraction_by_type continuous Kelly criterion f* = mu/sigma^2
                         (Kelly 1956; Thorp 2006 eq. 7.3) over daily
                         micro-returns
- ulcer_index_by_type    Ulcer Index (Martin & McCann 1989): RMS of the
                         percentage drawdown from the running peak of
                         the daily value curve — depth x duration in
                         one number, where max_drawdown is depth only

Determinism: daily bars are round(sum(value), 6) — identical doubles on
both engines — and returns are the catalog_r7_risk integer micro-unit
idiom, so the gain/loss/moment sums are exact integers; the Ulcer
percentage-drawdown square is quantized per-row to integer nano-units
(round(1e9 * pd^2), pd <= 100 so each term <= 1e13 — bigint-safe at any
realistic day count) before summing.  Every ratio is one closed-form
double expression over exact sums, rounded in-query.

Scale: one events scan -> the same (type, date) daily rollup every bar
pipeline pays (~150 rows at any SF); returns/peaks are one lag/max
window per type; all ratios are map-side partials over the tiny frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.plans.catalog_r7_risk import _RET_BASE, _rets


@query(
    "omega_ratio_by_type",
    oracle=f"""
    WITH {_RET_BASE}
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN r > 0 THEN r ELSE 0 END) AS BIGINT)
               AS gain_micro,
           CAST(sum(CASE WHEN r < 0 THEN -r ELSE 0 END) AS BIGINT)
               AS loss_micro,
           round(CAST(sum(CASE WHEN r > 0 THEN r ELSE 0 END) AS DOUBLE)
                 / nullif(sum(CASE WHEN r < 0 THEN -r ELSE 0 END), 0),
                 6) AS omega
    FROM rets GROUP BY event_type
    """,
)
def omega_ratio_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Omega(0) per event type: total gain mass over total loss mass of
    daily returns (the zero-threshold Omega of Keating & Shadwick 2002
    — equivalently the discrete integral ratio of the CDF tails).  Both
    masses are exact integer micro-unit sums; NULL omega when a type
    never lost (loss mass 0).

    Scale: the shared daily rollup + one 5-group aggregate."""
    r = F.col("r")
    gain = F.sum(F.when(r > 0, r).otherwise(F.lit(0))).cast("long")
    loss = F.sum(F.when(r < 0, -r).otherwise(F.lit(0))).cast("long")
    return (_rets(spark, sf_dir)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                 gain.alias("gain_micro"), loss.alias("loss_micro"))
            .select("event_type", "n_days", "gain_micro", "loss_micro",
                    F.round(F.col("gain_micro").cast("double")
                            / F.nullif(F.col("loss_micro"), F.lit(0)), 6)
                    .alias("omega")))


@query(
    "kelly_fraction_by_type",
    oracle=f"""
    WITH {_RET_BASE},
    s AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(r AS HUGEINT)) AS s1,
               sum(CAST(r AS HUGEINT) * r) AS s2
        FROM rets GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(CAST(s1 AS DOUBLE) / (n * 1000000.0), 6) AS mean_ret,
           round((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                 / (CAST(n AS DOUBLE) * n) / 1e12, 6) AS var_ret,
           round(1000000.0 * CAST(s1 AS DOUBLE) * n
                 / (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1),
                 6) AS kelly_fraction
    FROM s
    """,
)
def kelly_fraction_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous Kelly fraction per event type: f* = mu / sigma^2 over
    daily returns (population variance — Thorp 2006 eq. 7.3), computed
    from exact integer micro-unit moment sums in closed form:
    f* = 1e6 * s1 * n / (n*s2 - s1^2).

    Scale: the shared daily rollup + one 5-group moment aggregate."""
    s = (_rets(spark, sf_dir)
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.col("r").cast("decimal(38,0)")).alias("s1"),
              F.sum(F.col("r").cast("decimal(38,0)") * F.col("r"))
              .alias("s2")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    var_num = d("n") * d("s2") - d("s1") * d("s1")
    return s.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.round(d("s1") / (F.col("n") * 1000000.0), 6).alias("mean_ret"),
        F.round(var_num / (d("n") * d("n")) / 1e12, 6).alias("var_ret"),
        F.round(F.lit(1000000.0) * d("s1") * d("n") / var_num, 6)
        .alias("kelly_fraction"))


@query(
    "ulcer_index_by_type",
    oracle="""
    WITH bars AS (
        SELECT event_type, CAST(ts AS DATE) AS ddate,
               round(sum(value), 6) AS bar
        FROM events GROUP BY 1, 2
    ),
    dd AS (
        SELECT event_type,
               CAST(round(1e9 * pow(100.0 * (peak - bar) / peak, 2))
                    AS BIGINT) AS pd2_nano
        FROM (SELECT event_type, bar,
                     max(bar) OVER (PARTITION BY event_type
                                    ORDER BY ddate) AS peak
              FROM bars)
        WHERE peak > 0
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(sqrt(CAST(sum(pd2_nano) AS DOUBLE) / (1e9 * count(*))),
                 6) AS ulcer_index,
           round(sqrt(CAST(max(pd2_nano) AS DOUBLE) / 1e9), 6)
               AS max_pct_drawdown
    FROM dd GROUP BY event_type
    """,
)
def ulcer_index_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer Index per event type (Martin & McCann 1989): the RMS of
    the percentage drawdown 100*(peak - bar)/peak from the running peak
    of the daily value curve, plus the max percentage drawdown (the
    depth readout of max_drawdown_per_type in percent terms).  Each
    squared drawdown is quantized per-row to integer nano-units so the
    sum is exact under any aggregation order.

    Scale: the shared daily rollup; the running peak rides one (type
    ordered by date) window over the tiny bar frame."""
    bars = (_t(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("ddate"))
            .agg(F.round(F.sum("value"), 6).alias("bar")))
    w = Window.partitionBy("event_type").orderBy("ddate")
    pd_pct = (F.lit(100.0) * (F.col("peak") - F.col("bar"))
              / F.col("peak"))
    dd = (bars.withColumn("peak", F.max("bar").over(w))
          .filter(F.col("peak") > 0)
          .select("event_type",
                  F.round(F.lit(1e9) * F.pow(pd_pct, 2), 0).cast("long")
                  .alias("pd2_nano")))
    return (dd.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                 F.round(F.sqrt(F.sum("pd2_nano").cast("double")
                                / (F.lit(1e9) * F.count(F.lit(1)))), 6)
                 .alias("ulcer_index"),
                 F.round(F.sqrt(F.max("pd2_nano").cast("double") / 1e9), 6)
                 .alias("max_pct_drawdown")))
