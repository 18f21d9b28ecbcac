"""Catalog part 6 — remaining SURVEY §2 surface: P7 correlation feature
ranking, W2 exclusive windows, W13 symmetric log1p, W18 positional
encoding, W20 EMA, A8 MMD, A11 trading aggregates, distinct/set-op/
quantile relational coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.operators import temporal
from predictor_spark.plans.catalog import query, _t


@query(
    "p7_corr_feature_rank",
    oracle="""
    WITH feats AS (
        SELECT value,
               CAST(hour(ts) AS DOUBLE) AS hod,
               CAST(dayofweek(ts) AS DOUBLE) AS dow,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS value_lag1
        FROM events
    ), cors AS (
        SELECT 'hod' AS feature, corr(value, hod) AS c FROM feats
        UNION ALL SELECT 'dow', corr(value, dow) FROM feats
        UNION ALL SELECT 'value_lag1', corr(value, value_lag1) FROM feats
    )
    SELECT feature, round(c, 6) AS corr_with_target,
           row_number() OVER (ORDER BY round(abs(c), 6) DESC, feature) AS rank
    FROM cors
    """,
)
def p7_corr_feature_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — feature ordering by |corr| with the target anchor
    (phase2_6_preprocessor.py:500-619): one aggregate pass computes all
    correlations, unpivot, rank. Driver sees O(#features) scalars only."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    feats = ev.select(
        "value",
        F.hour("ts").cast("double").alias("hod"),
        F.dayofweek("ts").cast("double").alias("dow"),
        F.lag("value").over(w).alias("value_lag1"),
    )
    agg = feats.agg(*[F.corr("value", c).alias(c) for c in ("hod", "dow", "value_lag1")])
    long = agg.selectExpr(
        "stack(3, 'hod', hod, 'dow', dow, 'value_lag1', value_lag1) AS (feature, c)"
    )
    return long.select(
        "feature",
        F.round("c", 6).alias("corr_with_target"),
        F.row_number().over(
            Window.orderBy(F.round(F.abs(F.col("c")), 6).desc(), F.col("feature"))
        ).alias("rank"),
    )


@query(
    "w2_window_exclusive",
    oracle="""
    SELECT event_id,
           round(w[1], 6) + 0.0 AS w0, round(w[2], 6) + 0.0 AS w1,
           round(w[3], 6) + 0.0 AS w2, round(w[4], 6) + 0.0 AS w3
    FROM (
        SELECT event_id,
               list(value) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS w,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
               lead(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS guard
        FROM events
    ) WHERE rn >= 5 AND guard IS NOT NULL
    """,
)
def w2_window_exclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — ANTI-LEAKAGE window: strictly-before-t rows [t-w, t-1] plus the
    t+max_h tail guard (phase2_6_preprocessor.py:154-161). The central
    no-leakage invariant is property-tested in tests/test_temporal.py.
    Flattened to scalar columns for the driver's hasher (see w1)."""
    ev = _t(spark, sf_dir, "events")
    out = temporal.window_tensorize(ev, ["value"], 4, series_col="user_id",
                                    inclusive=False, max_horizon=2)
    return out.select(
        "event_id",
        *[(F.round(F.element_at(F.element_at("window", i + 1), 1), 6) + F.lit(0.0)).alias(f"w{i}")
          for i in range(4)],
    )


@query(
    "w13_symmetric_log1p",
    oracle="""
    SELECT event_id,
           round(sign(value) * ln(1 + abs(value)), 6) + 0.0 AS value_slog1p
    FROM events
    """,
)
def w13_symmetric_log1p(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13 — sign(x)*log1p(|x|) feature compression
    (stl_preprocessor.py:122-165). `+ 0.0` canonicalizes signed zero
    (see w11_time_features)."""
    ev = _t(spark, sf_dir, "events")
    out = temporal.symmetric_log1p(ev, ["value"])
    return out.select("event_id", (F.round("value_slog1p", 6) + F.lit(0.0)).alias("value_slog1p"))


@query(
    "w18_positional_encoding",
    oracle="""
    SELECT pos,
           round(sin(pos / power(10000.0, 0.0 / 8.0)), 6) + 0.0 AS pe_sin_0,
           round(cos(pos / power(10000.0, 0.0 / 8.0)), 6) + 0.0 AS pe_cos_0,
           round(sin(pos / power(10000.0, 2.0 / 8.0)), 6) + 0.0 AS pe_sin_1,
           round(cos(pos / power(10000.0, 2.0 / 8.0)), 6) + 0.0 AS pe_cos_1,
           round(sin(pos / power(10000.0, 4.0 / 8.0)), 6) + 0.0 AS pe_sin_2,
           round(cos(pos / power(10000.0, 4.0 / 8.0)), 6) + 0.0 AS pe_cos_2
    FROM (SELECT unnest(range(0, 32)) AS pos)
    """,
)
def w18_positional_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W18 — sinusoidal positional encoding table
    (predictor_plugins/common/positional_encoding.py:15-32): pe[pos, 2k] =
    sin(pos/10000^(2k/d)). Generated as a relational table so the model
    boundary can join it instead of recomputing in TF. `+ 0.0`
    canonicalizes signed zero (see w11_time_features)."""
    pos = spark.range(0, 32).select(F.col("id").cast("bigint").alias("pos"))
    cols = [F.col("pos")]
    for k in range(3):
        denom = F.pow(F.lit(10000.0), F.lit(2.0 * k / 8.0))
        cols.append((F.round(F.sin(F.col("pos") / denom), 6) + F.lit(0.0)).alias(f"pe_sin_{k}"))
        cols.append((F.round(F.cos(F.col("pos") / denom), 6) + F.lit(0.0)).alias(f"pe_cos_{k}"))
    return pos.select(*cols)


@query(
    "w20_rolling_ema",
    oracle="""
    WITH w AS (
        SELECT event_id,
               list(value) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN 95 PRECEDING AND CURRENT ROW) AS l
        FROM events
    )
    SELECT event_id,
           round(list_sum(list_transform(range(0, len(l)), k -> l[len(l)-k] * power(7.0/9.0, k)))
                 / list_sum(list_transform(range(0, len(l)), k -> power(7.0/9.0, k))), 6) AS ema_8
    FROM w
    """,
)
def w20_rolling_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W20 — span-8 EMA (pandas ewm adjust=True semantics) as a pure
    window/array expression, truncated at 12n lags (weight < 1e-10).
    rolling_ema_24 of FIXTURES F2 is the n=24 instantiation."""
    ev = _t(spark, sf_dir, "events")
    out = temporal.rolling_ema(ev, "value", n=8, series_col="user_id")
    return out.select("event_id", F.round("ema_8", 6).alias("ema_8"))


@query(
    "a8_mmd",
    oracle="""
    WITH x AS (SELECT value FROM events WHERE event_type = 'click' AND event_id % 97 = 0),
    y AS (SELECT value FROM events WHERE event_type = 'purchase' AND event_id % 97 = 0),
    kxx AS (SELECT avg(exp(-((a.value - b.value)^2) / 200.0)) AS v FROM x a, x b),
    kyy AS (SELECT avg(exp(-((a.value - b.value)^2) / 200.0)) AS v FROM y a, y b),
    kxy AS (SELECT avg(exp(-((a.value - b.value)^2) / 200.0)) AS v FROM x a, y b)
    SELECT round(kxx.v + kyy.v - 2 * kxy.v, 6) + 0.0 AS mmd2
    FROM kxx, kyy, kxy
    """,
)
def a8_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — Gaussian-kernel maximum mean discrepancy between two
    distributions (losses.py:42-58; subsampled like the reference's
    sample_size=256). Deterministic subsample via event_id % 97; the
    pairwise kernel runs on the subsample only (crossJoin of two small
    broadcastable sides, never the full table).

    The two subsample frames are CACHED (r14 swap from
    plans/proto_r14.py): event_id % 97 is not a pushable predicate,
    so un-cached, the three pairwise-kernel aggregates each re-expand
    both sides — SIX full events scans at runtime for a <=1 % frame.
    Cached state is <= |events|/97 rows of one double column per side
    — bounded the way the reference's sample_size=256 subsample is.
    sf1 cold 3.12 -> 1.39 s; equality-pinned by
    tests/test_r14_prototypes.py against the archived uncached form."""
    ev = _t(spark, sf_dir, "events")
    sub = ev.filter(F.col("event_id") % 97 == 0)
    x = (sub.filter(F.col("event_type") == "click")
         .select(F.col("value").alias("xv")).cache())
    y = (sub.filter(F.col("event_type") == "purchase")
         .select(F.col("value").alias("yv")).cache())

    def k(a, b):
        return F.exp(-((a - b) * (a - b)) / F.lit(200.0))

    kxx = x.crossJoin(x.select(F.col("xv").alias("xv2"))).agg(F.avg(k(F.col("xv"), F.col("xv2"))).alias("v"))
    kyy = y.crossJoin(y.select(F.col("yv").alias("yv2"))).agg(F.avg(k(F.col("yv"), F.col("yv2"))).alias("v"))
    kxy = x.crossJoin(y).agg(F.avg(k(F.col("xv"), F.col("yv"))).alias("v"))
    return (
        kxx.select(F.col("v").alias("kxx"))
        .crossJoin(kyy.select(F.col("v").alias("kyy")))
        .crossJoin(kxy.select(F.col("v").alias("kxy")))
        .select((F.round(F.col("kxx") + F.col("kyy") - 2 * F.col("kxy"), 6) + F.lit(0.0)).alias("mmd2"))
    )


@query(
    "a11_trading_aggregates",
    oracle="""
    WITH sig AS (
        SELECT user_id, ts, value,
               avg(value) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS mu,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
               lead(value) OVER (PARTITION BY user_id ORDER BY ts) AS nxt
        FROM events
    ), pos AS (
        SELECT user_id, ts,
               CASE WHEN value < mu THEN 1.0 ELSE -1.0 END AS position,
               (nxt - value) AS move
        FROM sig WHERE rn >= 24 AND nxt IS NOT NULL
    ), pnl AS (
        SELECT user_id, ts, position * move AS pnl,
               sum(position * move) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS equity
        FROM pos
    ), dd AS (
        SELECT user_id, pnl, equity,
               max(equity) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) - equity AS drawdown
        FROM pnl
    )
    SELECT user_id, count(*) AS n_trades,
           round(sum(pnl), 6) AS total_pnl,
           round(avg(pnl), 6) AS avg_pnl,
           round(max(drawdown), 6) AS max_drawdown
    FROM dd GROUP BY user_id
    """,
)
def a11_trading_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — strategy-evaluation aggregates (heuristic_strategy.py:301-387
    stop() summary: trade count, profits, max drawdown): a deterministic
    mean-reversion signal over the rolling mean, per-user equity curve via
    running sum, drawdown = running-peak minus equity. One window pass +
    one groupBy; drawdown at 100 TB stays a window function, never a
    driver loop."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    sig = (
        ev.withColumn("mu", F.avg("value").over(w.rowsBetween(-23, 0)))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("nxt", F.lead("value").over(w))
        .filter((F.col("rn") >= 24) & F.col("nxt").isNotNull())
        .withColumn("position", F.when(F.col("value") < F.col("mu"), 1.0).otherwise(-1.0))
        .withColumn("pnl", F.col("position") * (F.col("nxt") - F.col("value")))
    )
    eq = sig.withColumn("equity", F.sum("pnl").over(run))
    dd = eq.withColumn("drawdown", F.max("equity").over(run) - F.col("equity"))
    return dd.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.round(F.sum("pnl"), 6).alias("total_pnl"),
        F.round(F.avg("pnl"), 6).alias("avg_pnl"),
        F.round(F.max("drawdown"), 6).alias("max_drawdown"),
    )


@query(
    "distinct_users_per_type",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation — countDistinct expands to a two-phase
    partial-distinct plan (no row ever reaches the driver)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "setops_user_segments",
    oracle="""
    SELECT 'both' AS segment, count(*) AS n FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'click_only', count(*) FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
)
def setops_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations — INTERSECT / EXCEPT as user segmentation.

    The two distinct user frames are cached (r14, guide §2.4): each set
    op references both, so un-cached the filtered events scan + distinct
    ran TWICE per side (4 corpus scans; plan census). Cached it is one
    pushed-predicate scan per side, and both set ops read the
    |users|-bounded caches."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id") \
        .distinct().cache()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id") \
        .distinct().cache()
    both = clicks.intersect(buys).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("segment"), "n")
    only = clicks.exceptAll(buys).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("click_only").alias("segment"), "n")
    return both.unionAll(only)


@query(
    "value_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90
    FROM events GROUP BY event_type
    """,
)
def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark percentile ==
    DuckDB quantile_cont, type-7 interpolation). At 100 TB switch to
    percentile_approx and drop the oracle to a tolerance check."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
    )


@query(
    "a10_masked_moments",
    oracle="""
    WITH m AS (
        SELECT event_type, value,
               CASE WHEN value > 50 THEN 0.0 ELSE 1.0 END AS gap_mask
        FROM events
    ), agg AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(gap_mask) AS mask_sum,
               SUM(gap_mask * value) AS sxm,
               SUM(gap_mask * value * value) AS sx2m
        FROM m GROUP BY event_type
    )
    SELECT event_type, n, mask_sum,
           round(sxm / (mask_sum + 1e-8), 6) AS masked_mean,
           round(sqrt(greatest((sx2m
                       - 2 * (sxm / (mask_sum + 1e-8)) * sxm
                       + (sxm / (mask_sum + 1e-8)) * (sxm / (mask_sum + 1e-8)) * mask_sum)
                      / (mask_sum + 1e-8), 0) + 1e-8), 6) AS masked_std
    FROM agg
    ORDER BY event_type
    """,
)
def a10_masked_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — weighted/masked moments (losses.py:61-131 _masked_mean /
    _weighted_std gap-mask semantics) as one distributed groupBy pass.
    The gap mask here marks extreme spikes (value > 50) as gaps, the same
    role the reference's is_gap_mask plays for holiday/missing bars."""
    from predictor_spark.operators.metrics import masked_moments

    ev = _t(spark, sf_dir, "events").withColumn(
        "gap_mask", F.when(F.col("value") > 50, F.lit(0.0)).otherwise(F.lit(1.0))
    )
    out = masked_moments(ev, "value", "gap_mask", ["event_type"])
    return out.select(
        "event_type", "n", "mask_sum",
        F.round("masked_mean", 6).alias("masked_mean"),
        F.round("masked_std", 6).alias("masked_std"),
    ).orderBy("event_type")
