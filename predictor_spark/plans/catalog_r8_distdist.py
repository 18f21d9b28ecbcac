"""Catalog part — distribution distances for drift (STAGED for r8).

Completes the drift-monitoring surface (catalog_drift.py: KS, PSI,
JS divergence, mutual information) with the three distances the
modern drift literature prefers when the SHAPE of the gap matters,
not just its existence:

- wasserstein_value_drift   1-Wasserstein / earth-mover distance
                            (Kantorovich 1942; Vaserstein 1969) —
                            the area between the two empirical CDFs,
                            in value units (KS only sees the sup)
- cramer_von_mises_drift    two-sample Cramér-von Mises criterion
                            (Cramér 1928; von Mises 1931; two-sample
                            form Anderson 1962) — the mean-squared
                            CDF gap, weighted by the pooled sample
- energy_distance_drift     energy distance (Székely & Rizzo 2004)
                            2E|X−Y| − E|X−X'| − E|Y−Y'| — zero iff
                            the distributions coincide, metric on
                            distributions

Same early/late split as the rest of the drift family (< Jan 16 vs
>= Jan 16), so the four distances are directly comparable screens
over the same pair of slices (reference analog: the cross-iteration
distribution stats of data_processor.py drive its retrain loop).

Determinism: values ride as exact integer CENTS; every pairwise /
CDF statistic reduces to sums of integer products (DECIMAL(38,0) on
Spark, HUGEINT on DuckDB) via prefix sums over the grouped value
support — the single double division and sqrt-free formulas happen
once, at the very end, with the same operation tree on both engines.

Scale: one events scan groupBy(cents) reduces the stream to its
support (|distinct| ~ 1e4 rows regardless of fact size); the three
statistics are window prefix sums over that reduced frame.  The
single-partition window is aggregate-sized (same trade as
ks_test_value_drift); for a dense support, pre-bin to a quantile
grid first.  At 100 TB nothing but the support histogram ever
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_SPLIT = "DATE '2024-01-16'"
_CENTS = "CAST(round(value * 100) AS BIGINT)"

#: shared oracle prelude: the pooled support histogram with per-side
#: counts and side totals, all exact integers
_SUPPORT = f"""
    pts AS MATERIALIZED (
        SELECT {_CENTS} AS x,
               CAST(count(*) FILTER (WHERE ts < {_SPLIT}) AS HUGEINT) AS ca,
               CAST(count(*) FILTER (WHERE ts >= {_SPLIT}) AS HUGEINT) AS cb
        FROM events GROUP BY 1
    ),
    tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pts)
"""


def _support(spark: SparkSession, sf_dir: str):
    """Spark twin of the oracle's `pts`/`tot`: ONE events scan grouped
    to the cents support with per-side counts (decimal-exact)."""
    ev = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("date")
    pts = (ev.select(
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("ia"))
        .groupBy("x")
        .agg(F.sum("ia").cast("decimal(38,0)").alias("ca"),
             F.sum(1 - F.col("ia")).cast("decimal(38,0)").alias("cb"))
        .cache())  # |distinct cents| rows — bounded; feeds stat + totals
    tot = pts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    return pts, tot


@query(
    "wasserstein_value_drift",
    oracle=f"""
    WITH {_SUPPORT},
    cdf AS (
        SELECT sum(ca) OVER w AS fa, sum(cb) OVER w AS fb,
               lead(x) OVER (ORDER BY x) - x AS dx
        FROM pts WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)
    ),
    s AS (
        SELECT sum(abs(fa * nb - fb * na) * dx) AS num
        FROM cdf, tot WHERE dx IS NOT NULL
    )
    SELECT CAST(na AS BIGINT) AS n_early, CAST(nb AS BIGINT) AS n_late,
           round(CAST(num AS DOUBLE)
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 100.0), 6)
               AS wasserstein_1
    FROM s, tot
    """,
)
def wasserstein_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 = ∫|F_early − F_late| dx over the pooled support: each gap
    segment contributes |cum_a·nb − cum_b·na| · Δx exactly (integer),
    normalized by na·nb·100 (cents → value units) once at the end.

    Scale: prefix sums + one lead over the support histogram; the fact
    stream is reduced to |distinct cents| rows in the single scan."""
    pts, tot = _support(spark, sf_dir)
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cdf = pts.select(
        F.sum("ca").over(w).alias("fa"),
        F.sum("cb").over(w).alias("fb"),
        (F.lead("x", 1).over(Window.orderBy("x")) - F.col("x")).alias("dx"))
    num = (cdf.where(F.col("dx").isNotNull())
           .crossJoin(F.broadcast(tot))
           .agg(F.sum(F.abs(F.col("fa") * F.col("nb")
                            - F.col("fb") * F.col("na"))
                      * F.col("dx")).alias("num"),
                F.first("na").alias("na"), F.first("nb").alias("nb")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return num.select(
        F.col("na").cast("long").alias("n_early"),
        F.col("nb").cast("long").alias("n_late"),
        F.round(d("num") / (d("na") * d("nb") * 100.0), 6)
        .alias("wasserstein_1"))


@query(
    "cramer_von_mises_drift",
    oracle=f"""
    WITH {_SUPPORT},
    cdf AS (
        SELECT ca + cb AS c,
               sum(ca) OVER w AS fa, sum(cb) OVER w AS fb
        FROM pts WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)
    ),
    s AS (
        SELECT sum(c * (fa * nb - fb * na) * (fa * nb - fb * na)) AS num
        FROM cdf, tot
    )
    SELECT CAST(na AS BIGINT) AS n_early, CAST(nb AS BIGINT) AS n_late,
           round(CAST(num AS DOUBLE)
                 / (CAST(na AS DOUBLE) * nb * (na + nb) * (na + nb)), 6)
               AS cvm_t
    FROM s, tot
    """,
)
def cramer_von_mises_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises criterion, CDF form:
    T = na·nb/N² · Σ_k w_k (F_a(z_k) − F_b(z_k))² with the pooled
    empirical weight w_k = c_k/N — i.e. Σ c_k·(cum_a·nb − cum_b·na)²
    / (na·nb·N²), an exact-integer numerator.

    Scale: identical shape to W1 — one support histogram, one prefix
    window, a 1-row division."""
    pts, tot = _support(spark, sf_dir)
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cdf = pts.select(
        (F.col("ca") + F.col("cb")).alias("c"),
        F.sum("ca").over(w).alias("fa"),
        F.sum("cb").over(w).alias("fb"))
    gap = F.col("fa") * F.col("nb") - F.col("fb") * F.col("na")
    s = (cdf.crossJoin(F.broadcast(tot))
         .agg(F.sum(F.col("c") * gap * gap).alias("num"),
              F.first("na").alias("na"), F.first("nb").alias("nb")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = F.col("na") + F.col("nb")
    return s.select(
        F.col("na").cast("long").alias("n_early"),
        F.col("nb").cast("long").alias("n_late"),
        F.round(d("num") / (d("na") * F.col("nb") * n * n), 6)
        .alias("cvm_t"))


@query(
    "energy_distance_drift",
    oracle=f"""
    WITH {_SUPPORT},
    pre AS (
        SELECT x, ca, cb,
               sum(ca) OVER w - ca AS pa,  sum(cb) OVER w - cb AS pb,
               sum(ca * x) OVER w - ca * x AS ta,
               sum(cb * x) OVER w - cb * x AS tb
        FROM pts WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)
    ),
    s AS (
        SELECT sum(ca * (x * pa - ta)) AS saa,
               sum(cb * (x * pb - tb)) AS sbb,
               sum(cb * (x * pa - ta) + ca * (x * pb - tb)) AS sab
        FROM pre
    )
    SELECT CAST(na AS BIGINT) AS n_early, CAST(nb AS BIGINT) AS n_late,
           round((2.0 * CAST(sab AS DOUBLE) / (CAST(na AS DOUBLE) * nb)
                  - 2.0 * CAST(saa AS DOUBLE) / (CAST(na AS DOUBLE) * na)
                  - 2.0 * CAST(sbb AS DOUBLE) / (CAST(nb AS DOUBLE) * nb))
                 / 100.0, 6) AS energy_distance
    FROM s, tot
    """,
)
def energy_distance_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance 2E|X−Y| − E|X−X'| − E|Y−Y'| with every pairwise
    E|·| computed in O(|support|) from prefix sums over the sorted
    support: Σ_{i<j} c_i d_j (x_j − x_i) = Σ_j d_j·(x_j·C_<j − T_<j),
    all exact integers; three V-statistic divisions at the end.

    Scale: the naive form is O(n²) pairs — this is the sorted-prefix
    identity that makes it one linear window pass over the support."""
    pts, tot = _support(spark, sf_dir)
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    x = F.col("x").cast("decimal(38,0)")
    pre = pts.select(
        "x", "ca", "cb",
        (F.sum("ca").over(w) - F.col("ca")).alias("pa"),
        (F.sum("cb").over(w) - F.col("cb")).alias("pb"),
        (F.sum(F.col("ca") * x).over(w) - F.col("ca") * x).alias("ta"),
        (F.sum(F.col("cb") * x).over(w) - F.col("cb") * x).alias("tb"))
    xd = F.col("x").cast("decimal(38,0)")
    s = (pre.agg(
        F.sum(F.col("ca") * (xd * F.col("pa") - F.col("ta"))).alias("saa"),
        F.sum(F.col("cb") * (xd * F.col("pb") - F.col("tb"))).alias("sbb"),
        F.sum(F.col("cb") * (xd * F.col("pa") - F.col("ta"))
              + F.col("ca") * (xd * F.col("pb") - F.col("tb"))).alias("sab"))
        .crossJoin(F.broadcast(tot)))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return s.select(
        F.col("na").cast("long").alias("n_early"),
        F.col("nb").cast("long").alias("n_late"),
        F.round((2.0 * d("sab") / (d("na") * F.col("nb"))
                 - 2.0 * d("saa") / (d("na") * F.col("na"))
                 - 2.0 * d("sbb") / (d("nb") * F.col("nb"))) / 100.0, 6)
        .alias("energy_distance"))
