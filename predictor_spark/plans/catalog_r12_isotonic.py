"""Catalog part — isotonic (PAV) calibration (STAGED for r9).

The evaluation stack (calibration_reliability_bins, brier_decomposition,
lift_gain_deciles) gains the calibrator itself — isotonic regression
(Ayer et al. 1955; Barlow & Brunk 1972), the standard monotone
recalibration step between a raw score and a usable probability:

- isotonic_conversion_curve  raw vs isotonic-fitted conversion rate per
                             activity bin: users binned by event count
                             (decile thresholds), outcome = converted
                             (>= 1 purchase); the isotonic fit is the
                             weighted PAV solution
- isotonic_fit_summary       monotonicity-violation count of the raw
                             curve, pooled-block count of the fit, and
                             the weighted SSE between raw and fit

The fit uses the minimax characterization of weighted isotonic
regression — iso_i = max_{j<=i} min_{k>=i} (Y_k - Y_{j-1})/(W_k -
W_{j-1}) over prefix sums (Barlow et al. 1972, eq. 1.9 — identical to
the PAV pool result) — which is pure relational algebra over the <= 10
bins x 10 x 10 index triples: no sequential pooling loop, so both
engines evaluate the SAME integer-prefix-sum ratios and pick extrema
over bit-identical doubles.

Determinism: bin thresholds are exact interpolated deciles of integer
event counts (Spark `percentile` == DuckDB `quantile_cont`); bin
membership is integer-vs-double comparison; Y/W prefix sums are exact
integers; every reported rate is rounded in-query (6 dp).

Scale: one events scan -> per-user aggregate (the heavy shuffle any
user rollup pays), one aggregate for thresholds (broadcast back), then
everything collapses to <= 10 bin rows before the cubic minimax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_NBINS = 10
_QS = [i / _NBINS for i in range(1, _NBINS)]  # 0.1 .. 0.9

#: shared oracle prelude: per-bin (weight, conversions) + prefix sums
_BINS_SQL = f"""
    users AS (
        SELECT user_id, count(*) AS n_events,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    thr AS (
        SELECT quantile_cont(n_events, {_QS!r}) AS ts FROM users
    ),
    binned AS (
        SELECT u.user_id, u.converted,
               ({" + ".join(f"(CASE WHEN u.n_events > thr.ts[{i + 1}] "
                            "THEN 1 ELSE 0 END)" for i in range(_NBINS - 1))})
                   AS bin
        FROM users u, thr
    ),
    bins AS MATERIALIZED (
        SELECT bin, count(*) AS w, sum(converted) AS y
        FROM binned GROUP BY bin
    ),
    pre AS MATERIALIZED (
        SELECT bin, w, y,
               sum(w) OVER (ORDER BY bin) AS cw,
               sum(y) OVER (ORDER BY bin) AS cy
        FROM bins
    ),
    iso AS MATERIALIZED (
        SELECT i.bin, i.w, i.y, max(mn.m) AS iso_rate
        FROM pre i
        JOIN (
            SELECT i.bin AS ibin, j.bin AS jbin,
                   min(CAST(k.cy - (j.cy - j.y) AS DOUBLE)
                       / (k.cw - (j.cw - j.w))) AS m
            FROM pre i
            JOIN pre j ON j.bin <= i.bin
            JOIN pre k ON k.bin >= i.bin
            GROUP BY i.bin, j.bin
        ) mn ON mn.ibin = i.bin
        GROUP BY i.bin, i.w, i.y
    )
"""


def _bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, w, y): users per activity bin and converters among them."""
    ev = _t(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("converted")))
    thr = users.agg(F.expr(
        f"percentile(n_events, array({', '.join(map(str, _QS))}))")
        .alias("ts"))
    bin_expr = None
    for i in range(_NBINS - 1):
        t = F.when(F.col("n_events") > F.element_at("ts", i + 1), 1) \
            .otherwise(0)
        bin_expr = t if bin_expr is None else bin_expr + t
    return (users.crossJoin(F.broadcast(thr))
            .select(bin_expr.alias("bin"), "converted")
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("w"),
                 F.sum("converted").alias("y")))


def _iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, w, y, iso_rate): the weighted isotonic fit via the minimax
    form over integer prefix sums — three self-joins of the <= 10-row
    bin frame (each side broadcast), extrema over identical doubles."""
    # the <= 10-row bin frame feeds the prefix window AND three
    # minimax self-joins — cache it so the user rollup + threshold
    # binning runs once (the audit caught 6 parquet scans uncached)
    bins = _bins(spark, sf_dir).cache()
    wnd = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = (bins
           .withColumn("cw", F.sum("w").over(wnd))
           .withColumn("cy", F.sum("y").over(wnd)))
    i = pre.select(F.col("bin").alias("ibin"), "w", "y")
    j = pre.select(F.col("bin").alias("jbin"),
                   (F.col("cy") - F.col("y")).alias("pjy"),
                   (F.col("cw") - F.col("w")).alias("pjw"))
    k = pre.select(F.col("bin").alias("kbin"), F.col("cy").alias("kcy"),
                   F.col("cw").alias("kcw"))
    ratio = ((F.col("kcy") - F.col("pjy")).cast("double")
             / (F.col("kcw") - F.col("pjw")))
    mn = (i.join(F.broadcast(j), F.col("jbin") <= F.col("ibin"))
          .join(F.broadcast(k), F.col("kbin") >= F.col("ibin"))
          .groupBy("ibin", "jbin", "w", "y")
          .agg(F.min(ratio).alias("m")))
    return (mn.groupBy("ibin", "w", "y")
            .agg(F.max("m").alias("iso_rate"))
            .select(F.col("ibin").alias("bin"), "w", "y", "iso_rate"))


@query(
    "isotonic_conversion_curve",
    oracle=f"""
    WITH {_BINS_SQL}
    SELECT bin, CAST(w AS BIGINT) AS n_users,
           round(CAST(y AS DOUBLE) / w, 6) AS raw_rate,
           round(iso_rate, 6) AS iso_rate
    FROM iso ORDER BY bin
    """,
)
def isotonic_conversion_curve(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Raw vs isotonic conversion rate per activity bin — the curve a
    calibrated propensity consumer actually reads.  iso_rate is
    non-decreasing in bin by construction; where the raw curve already
    rises it passes through unchanged, dips get pooled."""
    iso = _iso(spark, sf_dir)
    return (iso.select(
        "bin", F.col("w").cast("long").alias("n_users"),
        F.round(F.col("y").cast("double") / F.col("w"), 6)
        .alias("raw_rate"),
        F.round("iso_rate", 6).alias("iso_rate"))
        .orderBy("bin"))


@query(
    "isotonic_fit_summary",
    oracle=f"""
    WITH {_BINS_SQL},
    curve AS (
        SELECT bin, w, y, iso_rate,
               CAST(y AS DOUBLE) / w AS raw_rate,
               lag(CAST(y AS DOUBLE) / w) OVER (ORDER BY bin) AS prev_raw,
               lag(round(iso_rate, 9)) OVER (ORDER BY bin) AS prev_iso
        FROM iso
    )
    SELECT CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(CASE WHEN prev_raw IS NOT NULL AND raw_rate < prev_raw
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_raw_violations,
           CAST(1 + sum(CASE WHEN prev_iso IS NOT NULL
                             AND round(iso_rate, 9) <> prev_iso
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_iso_blocks,
           round(sum(w * (CAST(y AS DOUBLE) / w - iso_rate)
                       * (CAST(y AS DOUBLE) / w - iso_rate)), 6)
               AS weighted_sse
    FROM curve
    """,
)
def isotonic_fit_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row diagnosis of the fit: how non-monotone the raw curve was
    (adjacent-dip count), how many pooled blocks the isotonic solution
    has (distinct consecutive fitted values, 9-dp comparison), and the
    weighted SSE the pooling paid."""
    iso = _iso(spark, sf_dir)
    w = Window.orderBy("bin")
    raw = F.col("y").cast("double") / F.col("w")
    curve = (iso
             .withColumn("raw_rate", raw)
             .withColumn("prev_raw", F.lag(raw).over(w))
             .withColumn("iso9", F.round("iso_rate", 9))
             .withColumn("prev_iso", F.lag(F.round("iso_rate", 9)).over(w)))
    return curve.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(F.when(F.col("prev_raw").isNotNull()
                     & (F.col("raw_rate") < F.col("prev_raw")), 1)
              .otherwise(0)).cast("long").alias("n_raw_violations"),
        (F.lit(1) + F.sum(F.when(F.col("prev_iso").isNotNull()
                                 & (F.col("iso9") != F.col("prev_iso")), 1)
                          .otherwise(0))).cast("long")
        .alias("n_iso_blocks"),
        F.round(F.sum(F.col("w") * (F.col("raw_rate") - F.col("iso_rate"))
                      * (F.col("raw_rate") - F.col("iso_rate"))), 6)
        .alias("weighted_sse"))
