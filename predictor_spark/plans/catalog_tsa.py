"""Catalog part — time-series analytics rows the reference's evaluation
layer computes around its forecasts: autocorrelation structure (the
reference inspects ACF when choosing AR orders — its AIC order selection
is `ar_order_select_aic`; this row exposes the raw ACF itself),
change-point location (regime shifts that break train/eval splits),
rolling-window anomaly flags (the reference's data_processor drops
non-finite / outlier rows before windowing), and the user-journey
transition matrix (the OLAP layer's event-flow dashboards).

All four rows are window-function + aggregate plans — no UDFs, no
collects; per-series state never leaves the executors.  The series axis
(event_type here, instrument/user in production) is the parallel axis at
100 TB: every row partitions by it first, so adding series adds tasks,
not per-task work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_MAX_LAG = 5


def _acf_union_branches() -> str:
    return "\n        UNION ALL ".join(
        f"SELECT event_type, mu, value, {k} AS lag, lag_{k} AS lagv FROM l"
        for k in range(1, _MAX_LAG + 1)
    )


@query(
    "acf_per_series",
    oracle=f"""
    WITH mu AS (
        SELECT event_type, avg(value) AS mu FROM events GROUP BY event_type
    ),
    l AS (
        SELECT e.event_type, e.value, mu.mu,
               {', '.join(f'lag(e.value, {k}) OVER w AS lag_{k}' for k in range(1, _MAX_LAG + 1))}
        FROM events e JOIN mu USING (event_type)
        WINDOW w AS (PARTITION BY e.event_type ORDER BY e.ts, e.event_id)
    ),
    den AS (
        SELECT event_type, sum((value - mu) * (value - mu)) AS den
        FROM l GROUP BY event_type
    ),
    num AS (
        SELECT event_type, lag, count(*) AS n,
               sum((value - mu) * (lagv - mu)) AS num
        FROM ({_acf_union_branches()})
        WHERE lagv IS NOT NULL
        GROUP BY event_type, lag
    )
    SELECT n.event_type, n.lag, n.n,
           round(n.num / d.den, 6) + 0.0 AS acf
    FROM num n JOIN den d USING (event_type)
    """,
)
def acf_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)²
    for lags 1..5, per series.

    Scale: ONE shuffle on the series key, then every lag comes from the
    same sorted window pass (5 lag columns over one WindowExec), and the
    denominator plus ALL lag numerators reduce in ONE groupBy (null
    lag products drop out of the sums natively, so no per-lag branch
    re-reads the window output).  The unpivot runs over the |series|-row
    aggregate, not the data.  Global per-series mean is a broadcast join
    of a |series|-row aggregate.  Adding lags widens the projection; it
    never adds passes.
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    mu = ev.groupBy("event_type").agg(F.avg("value").alias("mu"))
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = ev.join(F.broadcast(mu), "event_type").select(
        "event_type", "value", "mu",
        *[F.lag("value", k).over(w).alias(f"lag_{k}") for k in range(1, _MAX_LAG + 1)],
    )
    dev = F.col("value") - F.col("mu")
    aggs = lagged.groupBy("event_type").agg(
        F.sum(dev * dev).alias("den"),
        *[a for k in range(1, _MAX_LAG + 1) for a in (
            F.sum(dev * (F.col(f"lag_{k}") - F.col("mu"))).alias(f"num_{k}"),
            F.count(f"lag_{k}").alias(f"n_{k}"),
        )],
    )
    stack_args = ", ".join(f"{k}, n_{k}, num_{k}" for k in range(1, _MAX_LAG + 1))
    return aggs.select(
        "event_type", "den",
        F.expr(f"stack({_MAX_LAG}, {stack_args}) AS (lag, n, num)"),
    ).select(
        "event_type", "lag", "n",
        (F.round(F.col("num") / F.col("den"), 6) + F.lit(0.0)).alias("acf"),
    )


@query(
    "cusum_changepoint",
    oracle="""
    WITH b AS (
        SELECT event_type, value,
               row_number() OVER w AS i,
               sum(value)   OVER (PARTITION BY event_type ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS cs,
               avg(value)   OVER (PARTITION BY event_type) AS mu,
               count(*)     OVER (PARTITION BY event_type) AS n
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    s AS (
        SELECT event_type, n, i, cs - i * mu AS dev,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY round(abs(cs - i * mu), 6) DESC, i)
                   AS rk
        FROM b
    )
    SELECT event_type, n, CAST(i AS INTEGER) AS cp_index,
           round(abs(dev), 4) + 0.0 AS cp_stat,
           round(dev, 4) + 0.0 AS cp_dev
    FROM s WHERE rk = 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per series: S_i = Σ_{t≤i} x_t − i·x̄ (cumulative
    deviation from the global mean); the change point is the position
    maximising |S_i| (Page 1954 / Pettitt-style location estimate), ties
    broken to the earliest index over the 6-dp-rounded statistic so both
    engines rank identically.

    Scale: one shuffle on the series key; the running sum, the per-series
    mean, and the argmax are all window passes over that one sort.  The
    result is |series| rows — nothing wide ever materializes.
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    ws = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wall = Window.partitionBy("event_type")
    b = ev.select(
        "event_type",
        F.row_number().over(ws).alias("i"),
        F.sum("value").over(ws.rowsBetween(Window.unboundedPreceding, 0)).alias("cs"),
        F.avg("value").over(wall).alias("mu"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).withColumn("dev", F.col("cs") - F.col("i") * F.col("mu"))
    rk = Window.partitionBy("event_type").orderBy(
        F.round(F.abs(F.col("dev")), 6).desc(), F.col("i"))
    return (
        b.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type", "n",
            F.col("i").cast("int").alias("cp_index"),
            (F.round(F.abs(F.col("dev")), 4) + F.lit(0.0)).alias("cp_stat"),
            (F.round(F.col("dev"), 4) + F.lit(0.0)).alias("cp_dev"),
        )
    )


@query(
    "anomaly_rolling_zscore",
    oracle="""
    WITH b AS (
        SELECT event_type, event_id, value,
               sum(value)         OVER w AS s1,
               sum(value * value) OVER w AS s2,
               count(value)       OVER w AS cnt
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    z AS (
        SELECT event_type, event_id,
               (value - s1 / cnt)
                   / sqrt(greatest((s2 - s1 * s1 / cnt) / (cnt - 1), 0)) AS z
        FROM b
        WHERE cnt >= 12 AND (s2 - s1 * s1 / cnt) / (cnt - 1) > 1e-12
    )
    SELECT event_type, event_id, round(z, 4) + 0.0 AS z
    FROM z WHERE abs(z) > 3
    """,
)
def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly flags: z-score of each point against the
    PRECEDING 24 points only (causal — the point never sees itself or the
    future, mirroring the reference data_processor's outlier screen that
    must not leak eval data into train statistics).  Variance comes from
    the (s1, s2, n) sufficient statistics so both engines run the same
    closed form; windows with <12 points or ~zero variance are skipped.

    Scale: one shuffle on the series key, one sliding-window pass
    computing both running sums; the flag filter is a map-side predicate.
    The output is only the anomalous rows — sparse by construction.
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, -1)
    )
    b = ev.select(
        "event_type", "event_id", "value",
        F.sum("value").over(w).alias("s1"),
        F.sum(F.col("value") * F.col("value")).over(w).alias("s2"),
        F.count("value").over(w).alias("cnt"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("cnt")) / (F.col("cnt") - 1)
    z = (F.col("value") - F.col("s1") / F.col("cnt")) / F.sqrt(F.greatest(var, F.lit(0.0)))
    # threshold on the UNROUNDED z, exactly like the oracle (whose WHERE
    # resolves the CTE column, not the rounded output alias) — filtering
    # the rounded value would drop boundary rows with z in (3, 3.00005]
    return (
        b.filter((F.col("cnt") >= 12) & (var > 1e-12))
        .withColumn("__z", z)
        .filter(F.abs(F.col("__z")) > 3)
        .select("event_type", "event_id",
                (F.round(F.col("__z"), 4) + F.lit(0.0)).alias("z"))
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH p AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ),
    c AS (
        SELECT src, dst, count(*) AS n FROM p
        WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS prob
    FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event journeys:
    P(next = dst | current = src), transitions read within each user's
    timeline (the OLAP layer's event-flow view).  Counts are exact
    integers, so the probabilities are bit-identical across engines.

    Scale: one shuffle on user_id for the lead() pass (per-user
    timelines are short — no skew), one |types|² aggregate after.  The
    normalizing sum is a window over the tiny aggregated frame.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wu).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wsrc = Window.partitionBy("src")
    return c.select(
        "src", "dst", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wsrc), 6).alias("prob"),
    )


_HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M = 0.3, 0.1, 0.1, 24


@query(
    "holt_winters_per_series",
    oracle=f"""
    WITH RECURSIVE base AS (
        SELECT event_type AS sid, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) - 1 AS i,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    series AS (
        SELECT sid, max(n) AS n, list(value ORDER BY i) AS xs
        FROM base GROUP BY sid HAVING max(n) >= {2 * _HW_M + 1}
    ),
    seeds AS (
        SELECT sid, n, xs, list_sum(xs[1:{_HW_M}]) / {_HW_M}.0 AS l0
        FROM series
    ),
    hw AS (
        SELECT sid, n, CAST({_HW_M - 1} AS BIGINT) AS i,
               l0 AS level,
               (list_sum(xs[{_HW_M + 1}:{2 * _HW_M}]) / {_HW_M}.0 - l0)
                   / {_HW_M}.0 AS trend,
               list_transform(xs[1:{_HW_M}], v -> v - l0) AS svec,
               CAST(0.0 AS DOUBLE) AS abs_sum
        FROM seeds
        UNION ALL
        SELECT sid, n, i,
               new_level AS level,
               {_HW_BETA} * (new_level - level) + {1 - _HW_BETA} * trend AS trend,
               list_transform(range(1, {_HW_M + 1}),
                   j -> CASE WHEN j = ph
                             THEN {_HW_GAMMA} * (xv - new_level)
                                  + {1 - _HW_GAMMA} * sm
                             ELSE svec[CAST(j AS INTEGER)] END) AS svec,
               abs_sum + abs(level + trend + sm - xv) AS abs_sum
        FROM (
            SELECT z.*, {_HW_ALPHA} * (xv - sm)
                        + {1 - _HW_ALPHA} * (level + trend) AS new_level
            FROM (
                SELECT h.sid, h.n, h.i + 1 AS i, h.level, h.trend, h.svec,
                       h.abs_sum, b.value AS xv,
                       CAST((h.i + 1) % {_HW_M} AS INTEGER) + 1 AS ph,
                       h.svec[CAST((h.i + 1) % {_HW_M} AS INTEGER) + 1] AS sm
                FROM hw h JOIN base b ON b.sid = h.sid AND b.i = h.i + 1
                WHERE h.i + 1 < h.n
            ) z
        )
    )
    SELECT sid AS event_type, n,
           round(level, 6) + 0.0 AS level,
           round(trend, 6) + 0.0 AS trend,
           round(abs_sum / (n - {_HW_M}), 6) + 0.0 AS mae,
           round(level + 1 * trend
                 + svec[CAST(n % {_HW_M} AS INTEGER) + 1], 6) + 0.0 AS fc1,
           round(level + 2 * trend
                 + svec[CAST((n + 1) % {_HW_M} AS INTEGER) + 1], 6) + 0.0 AS fc2,
           round(level + 3 * trend
                 + svec[CAST((n + 2) % {_HW_M} AS INTEGER) + 1], 6) + 0.0 AS fc3
    FROM hw WHERE i = n - 1
    """,
)
def holt_winters_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing, Winters 1960)
    per series: level/trend/seasonal recursion with tick seasonality
    m=24 (same phase convention as stl_per_series), standard first/second-
    season initialization, one-step-ahead in-sample MAE, and h in {1,2,3}
    out-of-sample forecasts.  α=0.3, β=γ=0.1; series shorter than 2m+1
    are dropped on both sides.

    The DuckDB oracle replays the recursion bit-for-bit as a recursive
    CTE (the engine's pandas fold and the CTE execute the same float64
    operations in the same order — the trading-sim fold proved this
    pattern exact), carrying only the 24-slot seasonal vector per step.

    Scale: one applyInPandas fold per series — state is O(m), the fold is
    O(n), and series are the parallel axis exactly like trading/prophet;
    nothing returns to the driver but the per-series summary row.
    """
    import numpy as np
    import pandas as pd

    from predictor_spark.sources.tables import load_table

    m, al, be, ga = _HW_M, _HW_ALPHA, _HW_BETA, _HW_GAMMA
    cols = ["event_type", "n", "level", "trend", "mae", "fc1", "fc2", "fc3"]

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        x = pdf["value"].to_numpy(dtype=np.float64)
        n = len(x)
        if n < 2 * m + 1:
            return pd.DataFrame(columns=cols)
        acc = 0.0
        for v in x[:m]:          # sequential seed sums — same fold order
            acc += float(v)      # as the oracle's list_sum
        l0 = acc / float(m)
        acc2 = 0.0
        for v in x[m:2 * m]:
            acc2 += float(v)
        level, trend = l0, (acc2 / float(m) - l0) / float(m)
        svec = [float(v) - l0 for v in x[:m]]
        abs_sum = 0.0
        for i in range(m, n):
            ph = i % m
            sm = svec[ph]
            xv = float(x[i])
            abs_sum += abs(level + trend + sm - xv)
            new_level = al * (xv - sm) + (1 - al) * (level + trend)
            trend = be * (new_level - level) + (1 - be) * trend
            svec[ph] = ga * (xv - new_level) + (1 - ga) * sm
            level = new_level
        r6 = lambda v: round(v, 6) + 0.0  # noqa: E731
        return pd.DataFrame([{
            "event_type": pdf["event_type"].iloc[0],
            "n": n,
            "level": r6(level), "trend": r6(trend),
            "mae": r6(abs_sum / (n - m)),
            **{f"fc{h}": r6(level + h * trend + svec[(n - 1 + h) % m])
               for h in (1, 2, 3)},
        }])

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value")
    return ev.groupBy("event_type").applyInPandas(
        fold,
        "event_type string, n long, level double, trend double, mae double,"
        " fc1 double, fc2 double, fc3 double",
    )


@query(
    "winsorize_values",
    oracle="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n,
           round(avg(e.value), 4) AS mean_raw,
           round(avg(least(greatest(e.value, q.p05), q.p95)), 4)
               AS mean_winsorized,
           round(any_value(q.p05), 6) AS p05,
           round(any_value(q.p95), 6) AS p95
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized means per series — clip at the exact p05/p95
    (interpolated percentiles, same definition in both engines, proven
    by value_quantiles) and compare against the raw mean: the
    data_processor-style outlier treatment that bounds, rather than
    drops, extreme ticks.

    Scale: percentiles are one exact-percentile aggregate per series
    (at 100 TB swap in approx_percentile and document the error bound);
    the clip is a broadcast join of the |series|-row threshold frame +
    map-side conditional aggregate.
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg(clipped), 4).alias("mean_winsorized"),
            F.round(F.first("p05"), 6).alias("p05"),
            F.round(F.first("p95"), 6).alias("p95"),
        )
    )


@query(
    "rolling_corr_click_purchase",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hr, event_type, sum(value) AS v
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT c.hr, c.v AS x, p.v AS y
        FROM hourly c JOIN hourly p ON c.hr = p.hr
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ),
    s AS (
        SELECT hr, count(*) OVER w AS cnt,
               sum(x) OVER w AS sx, sum(y) OVER w AS sy,
               sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
               sum(x * y) OVER w AS sxy
        FROM grid
        WINDOW w AS (ORDER BY hr ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT hr,
           round((cnt * sxy - sx * sy)
                 / sqrt((cnt * sxx - sx * sx) * (cnt * syy - sy * sy)), 4)
               + 0.0 AS corr24
    FROM s
    WHERE cnt >= 12 AND (cnt * sxx - sx * sx) > 1e-9
      AND (cnt * syy - sy * sy) > 1e-9
    """,
)
def rolling_corr_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour Pearson correlation between the hourly click and
    purchase value series — the cross-series co-movement diagnostic
    (reference A9 computes static feature correlation; this is its
    windowed, time-resolved form).  Computed from the windowed
    sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) so both engines
    run one closed form.

    Scale: two partial aggregates to the hour grid, a self-join on the
    hour key (tiny), ONE ordered window pass carrying all six sums.
    The single global window rides on the hour-grid frame (|hours|
    rows), not the event fact — at 100 TB the grid is still ~10⁴ rows
    per month.
    """
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase"))
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hr"), "event_type"
    ).agg(F.sum("value").alias("v"))
    c = hourly.filter(F.col("event_type") == "click").select(
        "hr", F.col("v").alias("x"))
    p = hourly.filter(F.col("event_type") == "purchase").select(
        F.col("hr").alias("p_hr"), F.col("v").alias("y"))
    grid = c.join(p, F.col("hr") == F.col("p_hr")).select("hr", "x", "y")
    w = Window.orderBy("hr").rowsBetween(-23, 0)
    s = grid.select(
        "hr",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum("x").over(w).alias("sx"), F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    vx = F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("cnt") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (F.col("cnt") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        / F.sqrt(vx * vy)
    return (
        s.filter((F.col("cnt") >= 12) & (vx > 1e-9) & (vy > 1e-9))
        .select("hr", (F.round(corr, 4) + F.lit(0.0)).alias("corr24"))
    )


_CONF_CUTOFF = "2024-01-22 00:00:00"


@query(
    "conformal_interval_coverage",
    oracle=f"""
    WITH pairs AS (
        SELECT event_type, ts, value,
               lead(value) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS target
        FROM events
    ),
    train AS (
        SELECT event_type,
               quantile_cont(target - value, 0.05) AS q_lo,
               quantile_cont(target - value, 0.95) AS q_hi,
               count(*) AS n_train
        FROM pairs
        WHERE target IS NOT NULL AND ts < TIMESTAMP '{_CONF_CUTOFF}'
        GROUP BY event_type
    )
    SELECT p.event_type, any_value(t.n_train) AS n_train,
           count(*) AS n_eval,
           round(any_value(t.q_lo), 6) AS q_lo,
           round(any_value(t.q_hi), 6) AS q_hi,
           round(avg(CASE WHEN p.target >= p.value + t.q_lo
                           AND p.target <= p.value + t.q_hi
                          THEN 1.0 ELSE 0.0 END), 4) AS coverage
    FROM pairs p JOIN train t USING (event_type)
    WHERE p.target IS NOT NULL AND p.ts >= TIMESTAMP '{_CONF_CUTOFF}'
    GROUP BY p.event_type
    """,
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals around the persistence
    forecast (Vovk et al. / split-conformal): calibration residual
    quantiles [q05, q95] from the pre-cutoff pairs, then the EMPIRICAL
    coverage of value+[q_lo, q_hi] on the post-cutoff pairs — the
    distribution-free uncertainty wrapper the reference's MC-dropout
    metrics (A4/A5) approximate parametrically.

    Scale: one window pass for the per-series leads, one exact-quantile
    calibration aggregate per series (approx_percentile at 100 TB), and
    a broadcast join of the |series|-row interval table into the eval
    scan.  Nothing driver-side.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    pairs = ev.select(
        "event_type", "ts", "value",
        F.lead("value").over(w).alias("target"),
    ).filter(F.col("target").isNotNull())
    cutoff = F.lit(_CONF_CUTOFF).cast("timestamp")
    train = (
        pairs.filter(F.col("ts") < cutoff)
        .groupBy("event_type")
        .agg(
            F.expr("percentile(target - value, 0.05)").alias("q_lo"),
            F.expr("percentile(target - value, 0.95)").alias("q_hi"),
            F.count(F.lit(1)).alias("n_train"),
        )
    )
    covered = F.when(
        (F.col("target") >= F.col("value") + F.col("q_lo"))
        & (F.col("target") <= F.col("value") + F.col("q_hi")), 1.0).otherwise(0.0)
    return (
        pairs.filter(F.col("ts") >= cutoff)
        .join(F.broadcast(train), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n_train").alias("n_train"),
            F.count(F.lit(1)).alias("n_eval"),
            F.round(F.first("q_lo"), 6).alias("q_lo"),
            F.round(F.first("q_hi"), 6).alias("q_hi"),
            F.round(F.avg(covered), 4).alias("coverage"),
        )
    )


@query(
    "pinball_loss_eval",
    oracle="""
    WITH pairs AS (
        SELECT event_type, value,
               lead(value) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS target
        FROM events
    )
    SELECT event_type, tau, count(*) AS n,
           round(avg(CASE WHEN target >= value
                          THEN tau * (target - value)
                          ELSE (tau - 1.0) * (target - value) END), 4)
               AS pinball
    FROM pairs CROSS JOIN (VALUES (0.1), (0.5), (0.9)) AS t(tau)
    WHERE target IS NOT NULL
    GROUP BY event_type, tau
    """,
)
def pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the persistence forecast at
    τ ∈ {0.1, 0.5, 0.9} per series — the quantile-forecast counterpart
    of the MAE rows (τ=0.5 pinball ≡ MAE/2), scoring whether a forecast
    used as a τ-quantile estimate is biased high or low.

    Scale: one window pass for the leads, then a 3× literal expansion
    and a partial-agg groupBy — the tau axis rides in the projection,
    not in extra passes.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    pairs = ev.select(
        "event_type", "value",
        F.lead("value").over(w).alias("target"),
    ).filter(F.col("target").isNotNull())
    taus = F.explode(F.array(*[F.lit(t) for t in (0.1, 0.5, 0.9)])).alias("tau")
    d = F.col("target") - F.col("value")
    loss = F.when(d >= 0, F.col("tau") * d).otherwise((F.col("tau") - 1.0) * d)
    return (
        pairs.select("event_type", "value", "target", taus)
        .groupBy("event_type", "tau")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg(loss), 4).alias("pinball"))
    )


@query(
    "ensemble_forecast_eval",
    oracle=f"""
    WITH pairs AS (
        SELECT event_type, ts, value,
               lead(value) OVER w AS target,
               avg(value) OVER (w ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
                   AS sma
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    train AS (SELECT * FROM pairs
              WHERE target IS NOT NULL AND ts < TIMESTAMP '{_CONF_CUTOFF}'),
    eval_ AS (SELECT * FROM pairs
              WHERE target IS NOT NULL AND ts >= TIMESTAMP '{_CONF_CUTOFF}'),
    fit AS (
        SELECT event_type,
               regr_slope(target, value) AS b, regr_intercept(target, value) AS a,
               avg(abs(value - target)) AS mae_p,
               avg(abs(sma - target)) AS mae_s
        FROM train GROUP BY event_type
    ),
    fit2 AS (
        SELECT f.event_type, f.a, f.b, f.mae_p, f.mae_s,
               avg(abs(f.a + f.b * t.value - t.target)) AS mae_r
        FROM train t JOIN fit f USING (event_type)
        GROUP BY f.event_type, f.a, f.b, f.mae_p, f.mae_s
    ),
    wts AS (
        SELECT event_type, a, b,
               (1.0 / mae_p) / (1.0 / mae_p + 1.0 / mae_r + 1.0 / mae_s) AS wp,
               (1.0 / mae_r) / (1.0 / mae_p + 1.0 / mae_r + 1.0 / mae_s) AS wr,
               (1.0 / mae_s) / (1.0 / mae_p + 1.0 / mae_r + 1.0 / mae_s) AS ws
        FROM fit2
    )
    SELECT e.event_type, count(*) AS n_eval,
           round(any_value(w.wp), 4) AS w_persist,
           round(any_value(w.wr), 4) AS w_ar1,
           round(any_value(w.ws), 4) AS w_sma,
           round(avg(abs(e.value - e.target)), 4) AS mae_persist,
           round(avg(abs(w.a + w.b * e.value - e.target)), 4) AS mae_ar1,
           round(avg(abs(e.sma - e.target)), 4) AS mae_sma,
           round(avg(abs(w.wp * e.value + w.wr * (w.a + w.b * e.value)
                         + w.ws * e.sma - e.target)), 4) AS mae_ensemble
    FROM eval_ e JOIN wts w USING (event_type)
    GROUP BY e.event_type
    """,
)
def ensemble_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-MAE-weighted forecast combination (the classic Bates-
    Granger 1969 law): persistence, pooled AR(1), and SMA-12 components
    fitted/weighted on the pre-cutoff slice, combined and scored on the
    post-cutoff slice — the model-combination capstone over the
    classical family (ar1 / walk-forward / holt-winters rows).

    Scale: ONE window pass produces both the lead target and the SMA
    feature; fitting is two per-series aggregates (the second re-scans
    train with the broadcast coefficients — AR1's MAE needs the fit);
    evaluation is one scan with the broadcast |series|-row weight table.
    Three passes total, no driver math.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    pairs = ev.select(
        "event_type", "ts", "value",
        F.lead("value").over(w).alias("target"),
        F.avg("value").over(w.rowsBetween(-11, 0)).alias("sma"),
    ).filter(F.col("target").isNotNull())
    cutoff = F.lit(_CONF_CUTOFF).cast("timestamp")
    train = pairs.filter(F.col("ts") < cutoff)
    evl = pairs.filter(F.col("ts") >= cutoff)
    fit = train.groupBy("event_type").agg(
        F.expr("regr_slope(target, value)").alias("b"),
        F.expr("regr_intercept(target, value)").alias("a"),
        F.avg(F.abs(F.col("value") - F.col("target"))).alias("mae_p"),
        F.avg(F.abs(F.col("sma") - F.col("target"))).alias("mae_s"),
    )
    fit2 = (
        train.join(F.broadcast(fit), "event_type")
        .groupBy("event_type", "a", "b", "mae_p", "mae_s")
        .agg(F.avg(F.abs(F.col("a") + F.col("b") * F.col("value")
                         - F.col("target"))).alias("mae_r"))
    )
    inv_sum = 1.0 / F.col("mae_p") + 1.0 / F.col("mae_r") + 1.0 / F.col("mae_s")
    wts = fit2.select(
        "event_type", "a", "b",
        ((1.0 / F.col("mae_p")) / inv_sum).alias("wp"),
        ((1.0 / F.col("mae_r")) / inv_sum).alias("wr"),
        ((1.0 / F.col("mae_s")) / inv_sum).alias("ws"),
    )
    ar1 = F.col("a") + F.col("b") * F.col("value")
    ens = (F.col("wp") * F.col("value") + F.col("wr") * ar1
           + F.col("ws") * F.col("sma"))
    return (
        evl.join(F.broadcast(wts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.round(F.first("wp"), 4).alias("w_persist"),
            F.round(F.first("wr"), 4).alias("w_ar1"),
            F.round(F.first("ws"), 4).alias("w_sma"),
            F.round(F.avg(F.abs(F.col("value") - F.col("target"))), 4)
            .alias("mae_persist"),
            F.round(F.avg(F.abs(ar1 - F.col("target"))), 4).alias("mae_ar1"),
            F.round(F.avg(F.abs(F.col("sma") - F.col("target"))), 4)
            .alias("mae_sma"),
            F.round(F.avg(F.abs(ens - F.col("target"))), 4)
            .alias("mae_ensemble"),
        )
    )


_SEL_CUT1, _SEL_CUT2 = "2024-01-15 00:00:00", "2024-01-22 00:00:00"


@query(
    "model_select_per_series",
    oracle=f"""
    WITH pairs AS (
        SELECT event_type, ts, value,
               lead(value) OVER w AS target,
               avg(value) OVER (w ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
                   AS sma
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    train AS (SELECT * FROM pairs
              WHERE target IS NOT NULL AND ts < TIMESTAMP '{_SEL_CUT1}'),
    val AS (SELECT * FROM pairs
            WHERE target IS NOT NULL AND ts >= TIMESTAMP '{_SEL_CUT1}'
              AND ts < TIMESTAMP '{_SEL_CUT2}'),
    test AS (SELECT * FROM pairs
             WHERE target IS NOT NULL AND ts >= TIMESTAMP '{_SEL_CUT2}'),
    fit AS (
        SELECT event_type, regr_slope(target, value) AS b,
               regr_intercept(target, value) AS a
        FROM train GROUP BY event_type
    ),
    vs AS (
        SELECT v.event_type, f.a, f.b,
               round(avg(abs(v.value - v.target)), 6) AS mae_p,
               round(avg(abs(f.a + f.b * v.value - v.target)), 6) AS mae_r,
               round(avg(abs(v.sma - v.target)), 6) AS mae_s
        FROM val v JOIN fit f USING (event_type)
        GROUP BY v.event_type, f.a, f.b
    ),
    pick AS (
        SELECT event_type, a, b, mae_p, mae_r, mae_s,
               (list_sort([
                   {{'m': mae_p, 'pri': 1, 'name': 'persistence'}},
                   {{'m': mae_r, 'pri': 2, 'name': 'ar1'}},
                   {{'m': mae_s, 'pri': 3, 'name': 'sma12'}}]))[1] AS win
        FROM vs
    )
    SELECT t.event_type, any_value(p.win.name) AS winner,
           any_value(p.mae_p) AS val_mae_persist,
           any_value(p.mae_r) AS val_mae_ar1,
           any_value(p.mae_s) AS val_mae_sma,
           count(*) AS n_test,
           round(avg(abs(CASE p.win.name
                         WHEN 'persistence' THEN t.value
                         WHEN 'ar1' THEN p.a + p.b * t.value
                         ELSE t.sma END - t.target)), 4) AS test_mae
    FROM test t JOIN pick p USING (event_type)
    GROUP BY t.event_type
    """,
)
def model_select_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hold-out model selection per series (the protocol the reference's
    optimizer applies to its candidates, candidate_worker §3.2, here over
    the closed-form family): fit on train (< Jan 15), pick the
    val-MAE (Jan 15-22) winner among persistence / pooled AR(1) / SMA-12
    — argmin over the 6-dp-ROUNDED val scores with a fixed priority
    tie-break so both engines select identically — and report the
    winner's test MAE (≥ Jan 22).

    Scale: the same one-window-pass pairs frame as the ensemble row,
    three range slices of it, two fit aggregates, and a broadcast of the
    |series|-row decision table into the test scan.  The candidate axis
    is columnar (more candidates widen the struct array, not the plan).
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    pairs = ev.select(
        "event_type", "ts", "value",
        F.lead("value").over(w).alias("target"),
        F.avg("value").over(w.rowsBetween(-11, 0)).alias("sma"),
    ).filter(F.col("target").isNotNull())
    c1 = F.lit(_SEL_CUT1).cast("timestamp")
    c2 = F.lit(_SEL_CUT2).cast("timestamp")
    train = pairs.filter(F.col("ts") < c1)
    val = pairs.filter((F.col("ts") >= c1) & (F.col("ts") < c2))
    test = pairs.filter(F.col("ts") >= c2)
    fit = train.groupBy("event_type").agg(
        F.expr("regr_slope(target, value)").alias("b"),
        F.expr("regr_intercept(target, value)").alias("a"),
    )
    vs = (
        val.join(F.broadcast(fit), "event_type")
        .groupBy("event_type", "a", "b")
        .agg(
            F.round(F.avg(F.abs(F.col("value") - F.col("target"))), 6)
            .alias("mae_p"),
            F.round(F.avg(F.abs(F.col("a") + F.col("b") * F.col("value")
                                - F.col("target"))), 6).alias("mae_r"),
            F.round(F.avg(F.abs(F.col("sma") - F.col("target"))), 6)
            .alias("mae_s"),
        )
    )
    cand = F.array_sort(F.array(
        F.struct(F.col("mae_p").alias("m"), F.lit(1).alias("pri"),
                 F.lit("persistence").alias("name")),
        F.struct(F.col("mae_r").alias("m"), F.lit(2).alias("pri"),
                 F.lit("ar1").alias("name")),
        F.struct(F.col("mae_s").alias("m"), F.lit(3).alias("pri"),
                 F.lit("sma12").alias("name")),
    ))
    pick = vs.withColumn("win", cand.getItem(0))
    pred = F.when(F.col("win.name") == "persistence", F.col("value")) \
        .when(F.col("win.name") == "ar1",
              F.col("a") + F.col("b") * F.col("value")) \
        .otherwise(F.col("sma"))
    return (
        test.join(F.broadcast(pick), "event_type")
        .groupBy("event_type")
        .agg(
            F.first(F.col("win.name")).alias("winner"),
            F.first("mae_p").alias("val_mae_persist"),
            F.first("mae_r").alias("val_mae_ar1"),
            F.first("mae_s").alias("val_mae_sma"),
            F.count(F.lit(1)).alias("n_test"),
            F.round(F.avg(F.abs(pred - F.col("target"))), 4).alias("test_mae"),
        )
    )


@query(
    "distribution_metrics_per_type",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS i
        FROM events
    ),
    gini AS (
        SELECT event_type, count(*) AS n,
               round(2.0 * sum(i * value) / (count(*) * sum(value))
                     - (count(*) + 1.0) / count(*), 6) AS gini
        FROM ranked GROUP BY event_type
    ),
    uc AS (
        SELECT event_type, user_id, count(*) AS cnt
        FROM events GROUP BY event_type, user_id
    ),
    ent AS (
        SELECT event_type, count(*) AS n_users,
               round(-sum(p * ln(p)), 6) AS user_entropy
        FROM (
            SELECT event_type,
                   CAST(cnt AS DOUBLE)
                       / sum(cnt) OVER (PARTITION BY event_type) AS p
            FROM uc
        ) GROUP BY event_type
    )
    SELECT g.event_type, g.n, g.gini, e.n_users, e.user_entropy
    FROM gini g JOIN ent e USING (event_type)
    """,
)
def distribution_metrics_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape metrics per series: the Gini coefficient of the
    value distribution (rank-weighted form G = 2Σᵢ i·x₍ᵢ₎/(nΣx) − (n+1)/n,
    deterministic tie-break on event_id) and the Shannon entropy of the
    per-user activity share — concentration diagnostics for skew-aware
    planning (a high Gini/low entropy key is a salting candidate;
    operators/skew.py is the treatment).

    Scale: the Gini rank is one window pass per series; entropy runs on
    the (type, user) aggregate — both shuffles are on the series key, and
    the entropy normalizer is a window over the aggregated frame, not
    the events.
    """
    ev = _t(spark, sf_dir, "events")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    gini = (
        ev.withColumn("i", F.row_number().over(wr))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("value"))
                / (F.count(F.lit(1)) * F.sum("value"))
                - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)), 6)
            .alias("gini"),
        )
    )
    uc = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    wtot = Window.partitionBy("event_type")
    p = F.col("cnt").cast("double") / F.sum("cnt").over(wtot)
    ent = (
        uc.withColumn("plogp", p * F.log(p))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(-F.sum("plogp"), 6).alias("user_entropy"),
        )
    )
    return gini.join(ent, "event_type").select(
        "event_type", "n", "gini", "n_users", "user_entropy")
