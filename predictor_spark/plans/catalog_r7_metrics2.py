"""Catalog part — forecast-accuracy battery and cumulative hazard
(STAGED for r7).

Completes the evaluation stack (pinball loss, ensemble eval,
conformal coverage: catalog_tsa; the classification battery:
catalog_eval) and the survival stack (Kaplan-Meier:
catalog_behavior) with:

- forecast_accuracy_battery  MAE / sMAPE / WAPE / MASE (Hyndman &
                             Koehler 2006) for TWO baseline
                             forecasters — persistence (previous bar)
                             and 7-day seasonal naive — per event
                             type on daily bars, train days 1-15 /
                             test days 16+
- nelson_aalen_hazard        the Nelson (1972) / Aalen (1978)
                             cumulative-hazard estimator H(t) =
                             sum d_i/n_i over the SAME signup->first-
                             purchase framing as survival_km_conversion
                             (72 h administrative censoring), with
                             exp(-H) as the Fleming-Harrington survival

Determinism: bars are exact integer cents; every per-row ratio
(sMAPE terms, d/n hazard increments) is quantized to a fixed-point
integer BEFORE any cross-row sum; MASE is one division of two exact
integer-sum means; the hazard cumsum is an exact bigint running sum.

Scale: the battery is one events scan -> (type, day) bar rollup ->
one lag window (both horizons in one sort) -> a 10-group aggregate
with the 5-row train-scale dim broadcast on; the hazard is the KM
plan shape — two user-key shuffles, then windows over <= 73 duration
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_SPLIT_DAY = 15  # train: day <= 15; test: day >= 16

# integer-cent daily bars + both forecast lags (oracle CTEs)
_BATTERY_SQL = f"""
    bars AS (
        SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS bar
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, day, bar,
               lag(bar, 1) OVER w AS f_pers,
               lag(bar, 7) OVER w AS f_seas
        FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    scale AS MATERIALIZED (
        SELECT event_type,
               sum(abs(bar - f_pers)) AS sdiff, count(f_pers) AS sn
        FROM lagged WHERE day <= {_SPLIT_DAY} AND f_pers IS NOT NULL
        GROUP BY event_type
    ),
    test AS (
        SELECT event_type, model, bar, f FROM (
            SELECT event_type, bar, 'persistence' AS model, f_pers AS f
            FROM lagged WHERE day > {_SPLIT_DAY}
            UNION ALL
            SELECT event_type, bar, 'seasonal_naive', f_seas
            FROM lagged WHERE day > {_SPLIT_DAY}
        ) WHERE f IS NOT NULL
    ),
    err AS (
        SELECT event_type, model, abs(bar - f) AS ae, abs(bar) AS aa,
               CAST(round(2000000.0 * abs(bar - f)
                          / (abs(f) + abs(bar))) AS BIGINT) AS smape_micro
        FROM test WHERE abs(f) + abs(bar) > 0
    )
"""


@query(
    "forecast_accuracy_battery",
    oracle=f"""
    WITH {_BATTERY_SQL}
    SELECT e.event_type, e.model,
           CAST(count(*) AS BIGINT) AS n_test,
           round(CAST(sum(e.ae) AS DOUBLE) / count(*) / 100, 4) AS mae,
           round(CAST(sum(e.smape_micro) AS DOUBLE) / count(*)
                 / 1000000.0, 6) AS smape,
           round(CAST(sum(e.ae) AS DOUBLE) / sum(e.aa), 6) AS wape,
           CASE WHEN s.sdiff > 0
                THEN round((CAST(sum(e.ae) AS DOUBLE) / count(*))
                           / (CAST(s.sdiff AS DOUBLE) / s.sn), 6)
           END AS mase
    FROM err e JOIN scale s ON s.event_type = e.event_type
    GROUP BY e.event_type, e.model, s.sdiff, s.sn
    """,
)
def forecast_accuracy_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE / sMAPE / WAPE / MASE (Hyndman & Koehler 2006) for the
    persistence and 7-day seasonal-naive forecasters per event type:
    train days 1-15 set the MASE scale (in-sample one-step naive MAE),
    days 16+ are scored.  sMAPE terms are micro-quantized per row;
    MASE divides two exact integer-sum means; NULL when the training
    series is constant (zero scale).

    Scale: one bar rollup, ONE lag window carrying both horizons (one
    partitioning, one sort), a stacked two-model error frame reduced
    by a 10-group aggregate with the 5-row scale dim broadcast on."""
    bars = (_t(spark, sf_dir, "events")
            .groupBy("event_type",
                     F.dayofmonth("ts").cast("long").alias("day"))
            .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                 .alias("bar")))
    w = Window.partitionBy("event_type").orderBy("day")
    # ~150-row bar frame referenced by BOTH the scale and test legs —
    # cached so the rollup + lag window run once, not twice
    lagged = bars.select(
        "event_type", "day", "bar",
        F.lag("bar", 1).over(w).alias("f_pers"),
        F.lag("bar", 7).over(w).alias("f_seas")).cache()
    scale = (lagged.filter((F.col("day") <= _SPLIT_DAY)
                           & F.col("f_pers").isNotNull())
             .groupBy("event_type")
             .agg(F.sum(F.abs(F.col("bar") - F.col("f_pers")))
                  .alias("sdiff"),
                  F.count("f_pers").alias("sn")))
    test = (lagged.filter(F.col("day") > _SPLIT_DAY)
            .select("event_type", "bar",
                    F.expr("stack(2, 'persistence', f_pers,"
                           " 'seasonal_naive', f_seas) AS (model, f)"))
            .filter(F.col("f").isNotNull()))
    err = (test.filter(F.abs("f") + F.abs("bar") > 0)
           .select("event_type", "model",
                   F.abs(F.col("bar") - F.col("f")).alias("ae"),
                   F.abs("bar").alias("aa"),
                   F.round(F.lit(2000000.0)
                           * F.abs(F.col("bar") - F.col("f"))
                           / (F.abs("f") + F.abs("bar")), 0)
                   .cast("long").alias("smape_micro")))
    agg = (err.join(F.broadcast(scale), "event_type")
           .groupBy("event_type", "model", "sdiff", "sn")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("ae").alias("sae"),
                F.sum("smape_micro").alias("ssm"),
                F.sum("aa").alias("saa")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return agg.select(
        "event_type", "model", F.col("n").cast("long").alias("n_test"),
        F.round(d("sae") / F.col("n") / 100, 4).alias("mae"),
        F.round(d("ssm") / F.col("n") / 1000000.0, 6).alias("smape"),
        F.round(d("sae") / F.col("saa"), 6).alias("wape"),
        F.when(F.col("sdiff") > 0,
               F.round((d("sae") / F.col("n"))
                       / (d("sdiff") / F.col("sn")), 6)).alias("mase"))


@query(
    "nelson_aalen_hazard",
    oracle="""
    WITH su AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT su.user_id, su.t0, min(e.ts) AS t1
        FROM su LEFT JOIN events e
          ON e.user_id = su.user_id AND e.event_type = 'purchase'
         AND e.ts > su.t0
        GROUP BY su.user_id, su.t0
    ),
    obs AS (
        SELECT user_id,
               CASE WHEN t1 IS NULL THEN CAST(72 AS BIGINT)
                    ELSE least(CAST(floor((epoch_us(t1) - epoch_us(t0))
                                          / 3600e6) AS BIGINT), 72) END AS t,
               t1 IS NOT NULL
                   AND floor((epoch_us(t1) - epoch_us(t0)) / 3600e6) <= 72
                   AS died
        FROM conv
    ),
    per_t AS (
        SELECT t, count(*) AS ucnt,
               CAST(count(*) FILTER (died) AS BIGINT) AS d
        FROM obs GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               CAST(sum(ucnt) OVER (ORDER BY t DESC ROWS UNBOUNDED
                                    PRECEDING) AS BIGINT) AS n_risk
        FROM per_t
    ),
    inc AS (
        SELECT t, d, n_risk,
               CAST(round(1e12 * d / n_risk) AS BIGINT) AS h_pico
        FROM risk WHERE d > 0
    )
    SELECT t AS dur_h, d AS n_died, n_risk,
           round(CAST(sum(h_pico) OVER (ORDER BY t ROWS UNBOUNDED
                                        PRECEDING) AS DOUBLE) / 1e12, 6)
               AS cum_hazard,
           round(exp(-CAST(sum(h_pico) OVER (ORDER BY t ROWS UNBOUNDED
                                             PRECEDING) AS DOUBLE)
                     / 1e12), 6) AS fh_survival
    FROM inc
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of signup->first-purchase
    conversion (72 h administrative censoring — the exact
    survival_km_conversion framing, so the two estimators plot on one
    axis): H(t) = sum_{t_i<=t} d_i/n_i, with the Fleming-Harrington
    survival exp(-H(t)).  Each hazard increment is pico-quantized so
    the running sum is an exact bigint.

    Scale: identical to the KM plan — two user-key shuffles, then the
    risk-set reverse cumsum and the hazard cumsum run over <= 73
    duration rows."""
    ev = _t(spark, sf_dir, "events")
    su = (ev.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t0")))
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts"))
    conv = (su.join(pur, (F.col("p_user") == F.col("user_id"))
                    & (F.col("pts") > F.col("t0")), "left")
            .groupBy("user_id", "t0").agg(F.min("pts").alias("t1")))
    hours = F.floor((F.unix_micros("t1") - F.unix_micros("t0"))
                    / 3600e6).cast("long")
    obs = conv.select(
        F.when(F.col("t1").isNull(), F.lit(72).cast("long"))
        .otherwise(F.least(hours, F.lit(72).cast("long"))).alias("t"),
        (F.col("t1").isNotNull() & (hours <= 72)).alias("died"))
    per_t = obs.groupBy("t").agg(
        F.count(F.lit(1)).alias("ucnt"),
        F.sum(F.col("died").cast("long")).alias("d"))
    wdesc = (Window.orderBy(F.col("t").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = per_t.select(
        "t", "d", F.sum("ucnt").over(wdesc).cast("long").alias("n_risk"))
    inc = (risk.filter(F.col("d") > 0)
           .select("t", "d", "n_risk",
                   F.round(F.lit(1e12) * F.col("d") / F.col("n_risk"), 0)
                   .cast("long").alias("h_pico")))
    wasc = (Window.orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("h_pico").over(wasc).cast("double") / 1e12
    return inc.select(
        F.col("t").alias("dur_h"), F.col("d").alias("n_died"), "n_risk",
        F.round(cum, 6).alias("cum_hazard"),
        F.round(F.exp(-cum), 6).alias("fh_survival"))
