"""Catalog part — time-series feature screens on bar series.

Three classical screens a forecasting platform runs BEFORE it spends
GPU-hours on a series (is there seasonality to model? is it white
noise? is it drifting out of control?):

- seasonality_strength_anova  variance explained by the hour-of-day
                              profile, strength = 1 - SS_resid/SS_total
                              (the ANOVA form of Hyndman-Wang-Laptev's
                              seasonal-strength feature)
- ljung_box_q                 Ljung-Box portmanteau Q over ACF lags
                              1..6 on daily bars (Ljung & Box 1978) —
                              the is-it-white-noise gate
- ewma_control_chart          EWMA control chart (Roberts 1959),
                              lambda=0.2, 3-sigma time-varying limits —
                              the drift alarm

Determinism: bars are exact integer-cent rationals; every sum of
squares / lag product / exponential weight is computed from those
rationals with the division-once discipline; Q and strength round to
4-6 dp, far above the 1e-15 partial-agg float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

_CENTS = "CAST(round(value * 100) AS BIGINT)"

_HOURLY = f"""
    bars AS (
        SELECT event_type, date_trunc('hour', ts) AS hts,
               CAST(hour(ts) AS BIGINT) AS hod,
               CAST(sum({_CENTS}) AS DOUBLE) / count(*) / 100 AS v
        FROM events GROUP BY event_type, date_trunc('hour', ts), hour(ts)
    )"""

_DAILY = f"""
    daily AS (
        SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
               CAST(sum({_CENTS}) AS DOUBLE) / count(*) / 100 AS m
        FROM events GROUP BY event_type, CAST(day(ts) AS BIGINT)
    )"""


def _hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (ev.groupBy("event_type",
                       F.date_trunc("hour", "ts").alias("hts"),
                       F.hour("ts").cast("long").alias("hod"))
            .agg((F.sum(cents).cast("double") / F.count(F.lit(1)) / 100)
                 .alias("v")))


def _daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (ev.groupBy("event_type",
                       F.dayofmonth("ts").cast("long").alias("day"))
            .agg((F.sum(cents).cast("double") / F.count(F.lit(1)) / 100)
                 .alias("m")))


@query(
    "seasonality_strength_anova",
    oracle=f"""
    WITH {_HOURLY},
    hod AS (
        SELECT event_type, hod, sum(v) AS sh, count(*) AS nh
        FROM bars GROUP BY event_type, hod
    ),
    tot AS (
        SELECT event_type, sum(v) AS s, sum(v * v) AS ss,
               count(*) AS n
        FROM bars GROUP BY event_type
    ),
    expl AS (
        SELECT event_type, sum(sh * sh / nh) AS ssh
        FROM hod GROUP BY event_type
    )
    SELECT t.event_type, CAST(t.n AS BIGINT) AS n_bars,
           round(1.0 - (t.ss - e.ssh) / (t.ss - t.s * t.s / t.n), 6)
               AS seasonal_strength
    FROM tot t JOIN expl e ON e.event_type = t.event_type
    """,
)
def seasonality_strength_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal strength as variance explained by the hour-of-day
    profile: 1 - SS_within / SS_total over hourly bars, where SS_within
    subtracts each hour-of-day's own mean — near 1 means a daily cycle
    dominates (model it), near 0 means none (don't).

    Scale: bars are one groupBy; both SS terms come from SUMS (sum v,
    sum v^2, per-hod sum^2/n) — two tiny aggregates over <=24*|types|
    rows after the bar reduction, no window, no sort."""
    bars = _hourly_bars(spark, sf_dir).cache()
    hod = (bars.groupBy("event_type", "hod")
           .agg(F.sum("v").alias("sh"), F.count(F.lit(1)).alias("nh")))
    tot = (bars.groupBy("event_type")
           .agg(F.sum("v").alias("s"),
                F.sum(F.col("v") * F.col("v")).alias("ss"),
                F.count(F.lit(1)).alias("n")))
    expl = (hod.groupBy("event_type")
            .agg(F.sum(F.col("sh") * F.col("sh") / F.col("nh")).alias("ssh")))
    return (tot.join(F.broadcast(expl), "event_type")
            .select("event_type", F.col("n").cast("long").alias("n_bars"),
                    F.round(1.0 - (F.col("ss") - F.col("ssh"))
                            / (F.col("ss")
                               - F.col("s") * F.col("s") / F.col("n")),
                            6).alias("seasonal_strength")))


@query(
    "ljung_box_q",
    oracle=f"""
    WITH {_DAILY},
    mu AS (
        SELECT event_type, sum(m) / count(*) AS mu, count(*) AS n
        FROM daily GROUP BY event_type
    ),
    denom AS (
        SELECT d.event_type, sum((d.m - mu.mu) * (d.m - mu.mu)) AS d2
        FROM daily d JOIN mu ON mu.event_type = d.event_type
        GROUP BY d.event_type
    ),
    rho AS (
        SELECT a.event_type, (b.day - a.day) AS k,
               sum((a.m - mu.mu) * (b.m - mu.mu)) AS num
        FROM daily a
        JOIN daily b ON b.event_type = a.event_type
                    AND b.day - a.day BETWEEN 1 AND 6
        JOIN mu ON mu.event_type = a.event_type
        GROUP BY a.event_type, b.day - a.day
    )
    SELECT r.event_type, CAST(mu.n AS BIGINT) AS n_days,
           round(mu.n * (mu.n + 2.0)
                 * sum((r.num / dn.d2) * (r.num / dn.d2) / (mu.n - r.k)),
                 4) AS q_stat,
           CAST(mu.n * (mu.n + 2.0)
                * sum((r.num / dn.d2) * (r.num / dn.d2) / (mu.n - r.k))
                > 12.592 AS BOOLEAN) AS reject_white_noise
    FROM rho r
    JOIN mu ON mu.event_type = r.event_type
    JOIN denom dn ON dn.event_type = r.event_type
    GROUP BY r.event_type, mu.n
    """,
)
def ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on daily bars: Q = n(n+2) sum_k
    rho_k^2/(n-k) over lags 1..6, rejected against chi-square(6) at
    95% (12.592) — the standard is-this-series-white-noise gate run
    before fitting ARMA structure (reference pairs it with the ACF
    row, plans/catalog_tsa.py acf_per_series).

    Scale: autocorrelations come from a SELF-JOIN on (series, day+k),
    never a per-row window over the raw stream — after the daily-bar
    reduction the join is |series| x 31 x 6 rows.  The boolean
    compares the same double both engines computed from exact-cent
    rationals."""
    daily = _daily_bars(spark, sf_dir).cache()
    mu = (daily.groupBy("event_type")
          .agg((F.sum("m") / F.count(F.lit(1))).alias("mu"),
               F.count(F.lit(1)).alias("n")))
    dm = daily.join(F.broadcast(mu), "event_type")
    denom = (dm.groupBy("event_type")
             .agg(F.sum((F.col("m") - F.col("mu"))
                        * (F.col("m") - F.col("mu"))).alias("d2")))
    a = dm.select("event_type", F.col("day").alias("da"),
                  (F.col("m") - F.col("mu")).alias("xa"))
    b = dm.select("event_type", F.col("day").alias("db"),
                  (F.col("m") - F.col("mu")).alias("xb"))
    rho = (a.join(F.broadcast(b), ["event_type"])
           .filter((F.col("db") - F.col("da")).between(1, 6))
           .groupBy("event_type", (F.col("db") - F.col("da")).alias("k"))
           .agg(F.sum(F.col("xa") * F.col("xb")).alias("num")))
    q = (rho.join(F.broadcast(mu), "event_type")
         .join(F.broadcast(denom), "event_type")
         .groupBy("event_type", "n")
         .agg(F.sum((F.col("num") / F.col("d2"))
                    * (F.col("num") / F.col("d2"))
                    / (F.col("n") - F.col("k"))).alias("sq")))
    qs = F.col("n") * (F.col("n") + 2.0) * F.col("sq")
    return q.select("event_type", F.col("n").cast("long").alias("n_days"),
                    F.round(qs, 4).alias("q_stat"),
                    (qs > 12.592).alias("reject_white_noise"))


@query(
    "ewma_control_chart",
    oracle=f"""
    WITH {_DAILY},
    stats AS (
        SELECT event_type, sum(m) / count(*) AS mu,
               sqrt(sum(m * m) / count(*)
                    - (sum(m) / count(*)) * (sum(m) / count(*))) AS sigma
        FROM daily GROUP BY event_type
    ),
    idx AS (
        SELECT event_type, day, m,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS t
        FROM daily
    ),
    z AS (
        SELECT b.event_type, b.day, b.t,
               0.2 * sum(power(0.8, b.t - a.t) * a.m)
                 + power(0.8, b.t) * s.mu AS z
        FROM idx b
        JOIN idx a ON a.event_type = b.event_type AND a.t <= b.t
        JOIN stats s ON s.event_type = b.event_type
        GROUP BY b.event_type, b.day, b.t, s.mu
    ),
    flagged AS (
        SELECT z.event_type, z.day,
               CASE WHEN abs(z.z - s.mu)
                    > 3 * s.sigma * sqrt(0.2 / 1.8
                                         * (1 - power(0.8, 2 * z.t)))
                    THEN 1 ELSE 0 END AS ooc,
               abs(z.z - s.mu)
                 / (3 * s.sigma * sqrt(0.2 / 1.8
                                       * (1 - power(0.8, 2 * z.t))))
                   AS rel
        FROM z JOIN stats s ON s.event_type = z.event_type
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(ooc) AS BIGINT) AS n_ooc,
           min(CASE WHEN ooc = 1 THEN day END) AS first_ooc_day,
           round(max(rel), 6) AS max_rel_dev
    FROM flagged GROUP BY event_type
    """,
)
def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (Roberts 1959) on daily bars: z_t = 0.2 x_t +
    0.8 z_{t-1} seeded at the series mean, flagged when |z - mu|
    exceeds the 3-sigma time-varying limit sigma*sqrt(lambda/(2-lambda)
    *(1-(1-lambda)^{2t})) — the small-shift drift alarm that
    complements the KS/PSI distribution screens (catalog_drift).

    Scale: the recursion is unrolled as an exponentially-weighted sum
    over a SELF-JOIN on (series, t' <= t) — exact on <=31 bars; a
    longer history window-truncates at ~40 lags where 0.8^k underflows
    the limit's precision, keeping the join banded.  Population sigma
    comes from the same exact-cent sums as everything else."""
    daily = _daily_bars(spark, sf_dir).cache()
    stats = (daily.groupBy("event_type")
             .agg((F.sum("m") / F.count(F.lit(1))).alias("mu"),
                  F.sqrt(F.sum(F.col("m") * F.col("m")) / F.count(F.lit(1))
                         - (F.sum("m") / F.count(F.lit(1)))
                         * (F.sum("m") / F.count(F.lit(1)))).alias("sigma")))
    from pyspark.sql import Window
    t = F.row_number().over(
        Window.partitionBy("event_type").orderBy("day"))
    idx = daily.withColumn("t", t).cache()
    a = idx.select("event_type", F.col("t").alias("ta"), F.col("m").alias("ma"))
    b = idx.select("event_type", "day", F.col("t").alias("tb"))
    z = (b.join(F.broadcast(a), ["event_type"])
         .filter(F.col("ta") <= F.col("tb"))
         .join(F.broadcast(stats), "event_type")
         .groupBy("event_type", "day", "tb", "mu", "sigma")
         .agg((0.2 * F.sum(F.pow(F.lit(0.8), F.col("tb") - F.col("ta"))
                           * F.col("ma"))
               + F.pow(F.lit(0.8), F.col("tb")) * F.col("mu")).alias("z")))
    limit = (3 * F.col("sigma")
             * F.sqrt(F.lit(0.2 / 1.8)
                      * (1 - F.pow(F.lit(0.8), 2 * F.col("tb")))))
    flagged = z.select(
        "event_type", "day",
        (F.abs(F.col("z") - F.col("mu")) > limit).cast("int").alias("ooc"),
        (F.abs(F.col("z") - F.col("mu")) / limit).alias("rel"))
    # max_rel_dev (peak chart statistic as a share of its limit) varies
    # even when no point alarms — without it the grade was degenerate at
    # the sweep SF (all-constant n_ooc=0 row set; r9 gate)
    return (flagged.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                 F.sum("ooc").cast("long").alias("n_ooc"),
                 F.min(F.when(F.col("ooc") == 1, F.col("day")))
                 .alias("first_ooc_day"),
                 F.round(F.max("rel"), 6).alias("max_rel_dev")))
