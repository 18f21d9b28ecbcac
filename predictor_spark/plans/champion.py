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
    types = filled.select("event_type").distinct() \
        .withColumn("sid", sid.cast("long"))
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


def champion_tcn_run(
    spark: SparkSession,
    sf_dir: str,
    bar_seconds: int = 600,
    train_end: str = "2024-01-22 00:00:00",
    epochs: int = 15,
    seed: int = 0,
) -> DataFrame:
    """End-to-end champion-shaped run: bars -> ~50 features -> one
    multi-channel TCN (79 x 50 input, 19 filters, 3 layers, kernel 3)
    per event-type series, horizons {9..24}, scored on post-cutoff
    windows vs the persistence baseline. Returns one row per series:
    n test windows, mae, naive_mae, beats_floor (mae <= naive * 1.05 —
    the reference's fitness floor, candidate_worker.py:344-359)."""
    from predictor_spark.models import tcn
    from predictor_spark.models.estimator import fit_predict_per_series

    bars, feats = champion_features(
        champion_bar_series(spark, sf_dir, bar_seconds))
    scored = fit_predict_per_series(
        bars, tcn, value_col="v", ts_col="bts", series_col="sid",
        train_end=train_end, window=CHAMPION_WINDOW,
        horizons=CHAMPION_HORIZONS, feature_cols=feats,
        train_kwargs=dict(layers=CHAMPION_LAYERS, channels=CHAMPION_FILTERS,
                          kernel=CHAMPION_KERNEL, epochs=epochs, lr=5e-3,
                          weight_decay=1e-2),
        seed=seed,
    )
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
