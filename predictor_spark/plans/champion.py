"""Reference-shaped champion pipeline (VERDICT r3 #2).

The reference's production champion is a TCN over a SINGLE instrument
series at window_size=79, ~50 preprocessor feature columns, 19 filters,
3 stacked layers, kernel 3, multi-horizon heads
(examples/config/phase_1_daily/phase_1_tcn_neat_champion_1d_config.json:
window_size 79, tcn_filters 19, tcn_kernel_size 3, tcn_stack_layers 3,
predicted_horizons [9,12,15,18,21,24], use_log1p_features;
examples/results/phase_1_daily/..._optimization_parameters.json).

The synthetic events table has no single long instrument series, so the
engine's analog buckets events into fixed-width bars PER EVENT TYPE —
five parallel champion-shaped series of ~720 (1h bars, sf0.01) to ~4300
(10m bars, sf0.1) steps, the same order as the reference's
max_steps_train=7300 — and derives ~50 per-bar feature channels with
pure JVM expressions (rolling stats, returns, lags, cyclic encodings:
the engine's analog of phase2_6_preprocessor.py:615-617's ~54 columns).
Training runs through the SAME Estimator contract as every other model
row (models/estimator.fit_predict_per_series with feature_cols →
channels-last (N, 79, 50) input into the multi-channel TCN core).

Scale: feature derivation is one window pass per series (no extra
shuffle after the bar aggregation); training is one applyInPandas task
per instrument — the reference axis (one model per instrument) is
exactly the axis that fans out to 1000 executors when there are 1000
instruments. This is a bench + pytest surface, NOT an oracle row: the
hash gate cannot replay 15 epochs of AdamW at this size (VERDICT r3 #2
scopes it so).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query
from predictor_spark.sources.tables import load_table

CHAMPION_WINDOW = 79
CHAMPION_HORIZONS = (9, 12, 15, 18, 21, 24)
CHAMPION_FILTERS = 19
CHAMPION_LAYERS = 3
CHAMPION_KERNEL = 3

_ROLL_SPANS = (4, 8, 16, 32)
_MINMAX_SPANS = (8, 32)
_RET_LAGS = 24
_RET_ROLL_SPANS = (8, 32)


def champion_bar_series(
    spark: SparkSession,
    sf_dir: str,
    bar_seconds: int = 600,
) -> DataFrame:
    """Fixed-width bar series per event_type: avg(value) per bar on a
    complete time grid, gaps forward-filled (the reference consumes a
    regular hourly close series; normalized_d4.csv is gap-free).
    Columns: sid (event-type index), bts (bar timestamp), v (bar value).
    One shuffle (the bar aggregation); the grid join is a broadcast of a
    tiny per-series (min,max) frame exploded JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    sid = F.dense_rank().over(
        Window.orderBy("event_type")) - 1  # stable type -> 0..4 index
    bars = (
        ev.withColumn("bts", (F.floor(F.unix_timestamp("ts") / bar_seconds)
                              * bar_seconds).cast("timestamp"))
        .groupBy("event_type", "bts")
        .agg(F.avg("value").alias("raw_v"))
        # bars is TINY after aggregation (types x buckets rows) but its
        # lineage is the full events scan; it feeds three consumers (grid
        # derivation, the fill join, the sid map) — cache it so events is
        # scanned ONCE instead of once per consumer. At 100 TB this is
        # the difference between one pass and three.
        .cache()
    )
    # complete grid per type, then forward-fill bar gaps
    span = bars.groupBy("event_type").agg(
        F.min("bts").alias("lo"), F.max("bts").alias("hi"))
    grid = span.select(
        "event_type",
        F.explode(F.sequence(
            "lo", "hi", F.expr(f"INTERVAL {bar_seconds} SECONDS"))).alias("bts"),
    )
    w_fill = (Window.partitionBy("event_type").orderBy("bts")
              .rowsBetween(Window.unboundedPreceding, 0))
    filled = (
        grid.join(bars, ["event_type", "bts"], "left")
        .withColumn("v", F.last("raw_v", ignorenulls=True).over(w_fill))
        .filter(F.col("v").isNotNull())
    )
    # span already holds one row per type — no need to re-derive from
    # filled (which would replay the whole fill subtree for 5 rows)
    types = span.select("event_type").withColumn("sid", sid.cast("long"))
    return (
        filled.join(F.broadcast(types), "event_type")
        .select("sid", "bts", "v")
    )


def champion_features(bars: DataFrame) -> tuple[DataFrame, tuple[str, ...]]:
    """~50 per-bar feature channels, all whole-stage-codegen JVM
    expressions over ONE window spec (no Python in the feature path) —
    the engine analog of the reference preprocessor's feature frame
    (phase2_6_preprocessor.py:615-617; log1p per the champion's
    use_log1p_features). Returns (frame, feature column names)."""
    w = Window.partitionBy("sid").orderBy("bts")
    d = bars.withColumn("f_log1p", F.log1p(F.abs("v")) * F.signum("v"))
    d = d.withColumn("f_ret", F.coalesce(F.col("v") - F.lag("v", 1).over(w),
                                         F.lit(0.0)))
    d = d.withColumn(
        "f_logret",
        F.coalesce(F.col("f_log1p") - F.lag("f_log1p", 1).over(w), F.lit(0.0)))
    feats = ["f_log1p", "f_ret", "f_logret"]
    for s in _ROLL_SPANS:
        ws = w.rowsBetween(-(s - 1), 0)
        d = d.withColumn(f"f_mean{s}", F.avg("v").over(ws))
        d = d.withColumn(f"f_std{s}",
                         F.coalesce(F.stddev("v").over(ws), F.lit(0.0)))
        feats += [f"f_mean{s}", f"f_std{s}"]
    for s in _MINMAX_SPANS:
        ws = w.rowsBetween(-(s - 1), 0)
        d = d.withColumn(f"f_min{s}", F.min("v").over(ws))
        d = d.withColumn(f"f_max{s}", F.max("v").over(ws))
        feats += [f"f_min{s}", f"f_max{s}"]
    # cyclic time encodings (W11 family)
    two_pi = 2.0 * 3.141592653589793
    hour = F.hour("bts") + F.minute("bts") / 60.0
    dow = F.dayofweek("bts").cast("double")
    for nm, phase, period in (("hod", hour, 24.0), ("dow", dow, 7.0),
                              ("dom", F.dayofmonth("bts").cast("double"), 31.0)):
        d = d.withColumn(f"f_sin_{nm}", F.sin(F.lit(two_pi) * phase / period))
        d = d.withColumn(f"f_cos_{nm}", F.cos(F.lit(two_pi) * phase / period))
        feats += [f"f_sin_{nm}", f"f_cos_{nm}"]
    for k in range(1, _RET_LAGS + 1):
        d = d.withColumn(f"f_retlag{k}",
                         F.coalesce(F.lag("f_ret", k).over(w), F.lit(0.0)))
        feats.append(f"f_retlag{k}")
    for s in _RET_ROLL_SPANS:
        ws = w.rowsBetween(-(s - 1), 0)
        d = d.withColumn(f"f_retmean{s}", F.avg("f_ret").over(ws))
        d = d.withColumn(f"f_retstd{s}",
                         F.coalesce(F.stddev("f_ret").over(ws), F.lit(0.0)))
        feats += [f"f_retmean{s}", f"f_retstd{s}"]
    return d, tuple(feats)


def _champion_feature_oracle(bar_seconds: int = 3600) -> str:
    """DuckDB replay of champion_bar_series + champion_features, built
    from the SAME span/lag constants so the two can never drift. Every
    stage is ANSI-SQL: bucket-avg bars, complete grid (generate_series),
    forward fill (last_value IGNORE NULLS), then the ~50 feature
    expressions over one ordered window. dayofweek: DuckDB is 0=Sunday,
    Spark is 1=Sunday — the oracle adds 1."""
    two_pi = "6.283185307179586"
    w = "PARTITION BY sid ORDER BY bts"

    def out(c: str) -> str:
        # float32-collapse before rounding (the catalog_models recipe):
        # DuckDB evaluates sliding aggregates with a segment tree while
        # Spark keeps a running sum, so running means differ by ~1e-15
        # and flip .5-ulp rounding boundaries at 6 dp without the collapse
        return f"round(CAST(CAST({c} AS REAL) AS DOUBLE), 6) + 0.0 AS {c}"

    cols = ["sid", "bts", out("v"), out("f_log1p"), out("f_ret"),
            out("f_logret")]
    exprs = []
    for s in _ROLL_SPANS:
        win = f"OVER ({w} ROWS BETWEEN {s - 1} PRECEDING AND CURRENT ROW)"
        exprs.append(f"avg(v) {win} AS f_mean{s}")
        exprs.append(f"coalesce(stddev_samp(v) {win}, 0.0) AS f_std{s}")
        cols += [out(f"f_mean{s}"), out(f"f_std{s}")]
    for s in _MINMAX_SPANS:
        win = f"OVER ({w} ROWS BETWEEN {s - 1} PRECEDING AND CURRENT ROW)"
        exprs.append(f"min(v) {win} AS f_min{s}")
        exprs.append(f"max(v) {win} AS f_max{s}")
        cols += [out(f"f_min{s}"), out(f"f_max{s}")]
    phases = (("hod", "(hour(bts) + minute(bts) / 60.0)", "24.0"),
              ("dow", "CAST(dayofweek(bts) + 1 AS DOUBLE)", "7.0"),
              ("dom", "CAST(dayofmonth(bts) AS DOUBLE)", "31.0"))
    for nm, phase, period in phases:
        exprs.append(f"sin({two_pi} * {phase} / {period}) AS f_sin_{nm}")
        exprs.append(f"cos({two_pi} * {phase} / {period}) AS f_cos_{nm}")
        cols += [out(f"f_sin_{nm}"), out(f"f_cos_{nm}")]
    for k in range(1, _RET_LAGS + 1):
        exprs.append(f"coalesce(lag(f_ret, {k}) OVER ({w}), 0.0)"
                     f" AS f_retlag{k}")
        cols.append(out(f"f_retlag{k}"))
    for s in _RET_ROLL_SPANS:
        win = f"OVER ({w} ROWS BETWEEN {s - 1} PRECEDING AND CURRENT ROW)"
        exprs.append(f"avg(f_ret) {win} AS f_retmean{s}")
        exprs.append(f"coalesce(stddev_samp(f_ret) {win}, 0.0) AS f_retstd{s}")
        cols += [out(f"f_retmean{s}"), out(f"f_retstd{s}")]
    return f"""
    WITH bars AS (
        SELECT event_type,
               to_timestamp(floor(epoch(ts) / {bar_seconds}) * {bar_seconds})
                   ::TIMESTAMP AS bts,
               avg(value) AS raw_v
        FROM events GROUP BY event_type, bts
    ),
    span AS (
        SELECT event_type, min(bts) AS lo, max(bts) AS hi
        FROM bars GROUP BY event_type
    ),
    grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi,
                   INTERVAL {bar_seconds} SECOND)) AS bts
        FROM span
    ),
    filled AS (
        SELECT g.event_type, g.bts,
               last_value(b.raw_v IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.bts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        FROM grid g LEFT JOIN bars b USING (event_type, bts)
    ),
    sids AS (
        SELECT event_type,
               dense_rank() OVER (ORDER BY event_type) - 1 AS sid
        FROM (SELECT DISTINCT event_type FROM filled)
    ),
    base0 AS (
        SELECT s.sid, f.bts, f.v
        FROM filled f JOIN sids s USING (event_type)
        WHERE f.v IS NOT NULL
    ),
    base AS (
        SELECT sid, bts, v,
               ln(1.0 + abs(v)) * sign(v) AS f_log1p,
               coalesce(v - lag(v, 1) OVER ({w}), 0.0) AS f_ret,
               coalesce(ln(1.0 + abs(v)) * sign(v)
                        - lag(ln(1.0 + abs(v)) * sign(v), 1) OVER ({w}),
                        0.0) AS f_logret
        FROM base0
    ),
    feat AS (
        SELECT *, {', '.join(exprs)}
        FROM base
    )
    SELECT {', '.join(cols)} FROM feat
    """


@query("champion_feature_frame", oracle=_champion_feature_oracle())
def champion_feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The champion pipeline's full data path up to the model boundary —
    hourly bar series per event type (complete grid, forward-filled) with
    all ~50 feature channels — as a hard-gated oracle row: the training
    rows themselves are bench+pytest surfaces (the gate cannot replay 15
    epochs of AdamW), but every JVM expression FEEDING them is exactly
    SQL-replayable, so the feature frame gets the strong check. One
    shuffle (bar agg) + one window family; the grid explode never leaves
    the JVM."""
    bars, feats = champion_features(champion_bar_series(spark, sf_dir, 3600))
    return bars.select(
        "sid", "bts",
        *[(F.round(F.col(c).cast("float").cast("double"), 6) + F.lit(0.0))
          .alias(c) for c in ("v", *feats)],
    )


def champion_scored(
    spark: SparkSession,
    sf_dir: str,
    bar_seconds: int = 600,
    train_end: str = "2024-01-22 00:00:00",
    epochs: int = 15,
    seed: int = 0,
    use_champion_loss: bool = True,
) -> DataFrame:
    """Train the champion-shaped TCN per series and return the scored
    frame (one row per post-cutoff bar: v, baseline, per-horizon
    target/pred/unc) — the input to both the metrics aggregate and the
    trading leg."""
    from predictor_spark.models import tcn
    from predictor_spark.models.estimator import fit_predict_per_series

    train_kwargs = dict(layers=CHAMPION_LAYERS, channels=CHAMPION_FILTERS,
                        kernel=CHAMPION_KERNEL, epochs=epochs, lr=5e-3,
                        weight_decay=1e-2)
    if use_champion_loss:
        from predictor_spark.models.losses import combined_diff_loss

        train_kwargs["loss_fn"] = combined_diff_loss
    bars, feats = champion_features(
        champion_bar_series(spark, sf_dir, bar_seconds))
    return fit_predict_per_series(
        bars, tcn, value_col="v", ts_col="bts", series_col="sid",
        train_end=train_end, window=CHAMPION_WINDOW,
        horizons=CHAMPION_HORIZONS, feature_cols=feats,
        train_kwargs=train_kwargs,
        seed=seed,
    )


def champion_tcn_run(
    spark: SparkSession,
    sf_dir: str,
    bar_seconds: int = 600,
    train_end: str = "2024-01-22 00:00:00",
    epochs: int = 15,
    seed: int = 0,
    use_champion_loss: bool = True,
) -> DataFrame:
    """End-to-end champion-shaped run: bars -> ~50 features -> one
    multi-channel TCN (79 x 50 input, 19 filters, 3 layers, kernel 3)
    per event-type series, horizons {9..24}, scored on post-cutoff
    windows vs the persistence baseline. Trains under the champion
    config's ACTUAL objective — ``loss_type: combined_diff`` with
    diff_weight 1.0 (champion_1d_config.json) — through the pluggable
    loss seam; the estimator's time-sorted full-batch windows satisfy
    combined_diff's shuffle=False ordering contract. Returns one row per
    series: n test windows, mae, naive_mae, beats_floor (mae <= naive *
    1.05 — the reference's fitness floor, candidate_worker.py:344-359)."""
    from predictor_spark.models import tcn
    from predictor_spark.models.estimator import fit_predict_per_series

    scored = champion_scored(spark, sf_dir, bar_seconds, train_end, epochs,
                             seed, use_champion_loss)
    err = None
    nerr = None
    for h in CHAMPION_HORIZONS:
        e = F.abs(F.col(f"pred_h{h}") - F.col(f"target_h{h}"))
        ne = F.abs(F.col("baseline") - F.col(f"target_h{h}"))
        err = e if err is None else err + e
        nerr = ne if nerr is None else nerr + ne
    k = float(len(CHAMPION_HORIZONS))
    return (
        scored.groupBy("sid").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(err / k), 4).alias("mae"),
            F.round(F.avg(nerr / k), 4).alias("naive_mae"),
        )
        .withColumn("beats_floor",
                    F.col("mae") <= F.col("naive_mae") * 1.05)
        .orderBy("sid")
    )


def champion_full_pipeline(
    spark: SparkSession,
    sf_dir: str,
    bar_seconds: int = 600,
    train_end: str = "2024-01-22 00:00:00",
    epochs: int = 15,
    seed: int = 0,
) -> DataFrame:
    """The reference's COMPLETE phase-1 loop in one program (app/main.py:
    preprocess -> train champion -> write predictions ->
    heuristic_strategy backtest -> summary): bars -> ~50 features ->
    champion TCN under combined_diff -> multi-horizon price predictions
    -> model-driven strategy fold -> per-series forecast metrics JOINED
    with the trading summary. ONE training pass feeds both legs (the
    scored frame is cached — it is tiny, one row per post-cutoff bar).
    Returns per series: n, mae, naive_mae, beats_floor, n_trades,
    avg_pnl, final_balance."""
    from predictor_spark.operators.trading import (
        simulate_model_strategy,
        trading_summary,
    )

    scored = champion_scored(spark, sf_dir, bar_seconds, train_end, epochs,
                             seed).cache()
    err = None
    nerr = None
    for h in CHAMPION_HORIZONS:
        e = F.abs(F.col(f"pred_h{h}") - F.col(f"target_h{h}"))
        ne = F.abs(F.col("baseline") - F.col(f"target_h{h}"))
        err = e if err is None else err + e
        nerr = ne if nerr is None else nerr + ne
    k = float(len(CHAMPION_HORIZONS))
    metrics = (
        scored.groupBy("sid").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(err / k), 4).alias("mae"),
            F.round(F.avg(nerr / k), 4).alias("naive_mae"),
        )
        .withColumn("beats_floor", F.col("mae") <= F.col("naive_mae") * 1.05)
    )
    # the estimator's scored frame always emits the price as "value"
    trades = simulate_model_strategy(
        scored, CHAMPION_HORIZONS,
        price_col="value", ts_col="bts", series_col="sid",
    )
    summ = trading_summary(trades).select(
        F.col("user_id").alias("sid"), "n_trades", "avg_pnl", "final_balance")
    return (
        metrics.join(summ, "sid", "left")
        .fillna({"n_trades": 0})
        .orderBy("sid")
    )
