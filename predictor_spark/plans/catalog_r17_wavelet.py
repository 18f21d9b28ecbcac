"""Catalog part — Haar wavelet decomposition (STAGED r10).

The frequency-domain rows (catalog_r16_spectral) localize variance in
FREQUENCY; the Haar discrete wavelet transform localizes it in both
scale AND time — the missing multi-resolution view, per event type over
the daily cents bars:

- haar_energy_levels  orthonormal detail energy per dyadic level
                      k = 1..3 (Σ d² / 2^k over raw pair differences)
                      with each level's share of total detail energy —
                      "is the variance day-to-day, 2-day, or 4-day?"
- haar_top_details    the top-2 |level-1 detail| per type with the
                      pair's start date — WHERE the sharpest
                      day-over-day breaks sit (the time localization
                      Fourier cannot give)

Cascade convention: only COMPLETE pairs propagate (an odd tail at any
level is dropped from that level's coefficients and from the cascade),
identical on both engines.

Determinism: bars are exact integer cents; every raw sum/difference in
the cascade stays an exact integer; energies are integer sums divided
by the dyadic 2^k — exact doubles, rounded 6 dp (shares likewise).

Scale: one events scan -> daily rollup; the cascade is three grouped
aggregations over frames that HALVE each level — a map-side reduction
tree, the textbook log-depth design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: the 3-level cascade: l{k} tables of (event_type, j, d, s, pstart)
_HAAR_BASE = """
    bars AS (
        SELECT event_type, CAST(ts AS DATE) AS ddate,
               sum(CAST(round(value * 100) AS BIGINT)) AS x
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, ddate, x,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ddate) - 1 AS t
        FROM bars
    ),
    l1 AS (
        SELECT event_type, t // 2 AS j,
               sum(CASE WHEN t % 2 = 0 THEN x ELSE -x END) AS d,
               sum(x) AS s, min(ddate) AS pstart, count(*) AS c
        FROM idx GROUP BY event_type, t // 2
    ),
    l2 AS (
        SELECT event_type, j // 2 AS j,
               sum(CASE WHEN j % 2 = 0 THEN s ELSE -s END) AS d,
               sum(s) AS s, min(pstart) AS pstart, count(*) AS c
        FROM l1 WHERE c = 2 GROUP BY event_type, j // 2
    ),
    l3 AS (
        SELECT event_type, j // 2 AS j,
               sum(CASE WHEN j % 2 = 0 THEN s ELSE -s END) AS d,
               sum(s) AS s, min(pstart) AS pstart, count(*) AS c
        FROM l2 WHERE c = 2 GROUP BY event_type, j // 2
    )"""


def _cascade(spark: SparkSession, sf_dir: str):
    """[(level, frame of (event_type, j, d, s, pstart))] complete pairs
    only; frames halve per level."""
    bars = (_t(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("ddate"))
            .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                 .alias("x")))
    idx = bars.withColumn(
        "t", F.row_number().over(
            Window.partitionBy("event_type").orderBy("ddate")) - 1)

    def level(df, pos, val, start):
        g = (df.groupBy("event_type", (F.col(pos) / 2).cast("long")
                        .alias("j"))
             .agg(F.sum(F.when(F.col(pos) % 2 == 0, F.col(val))
                        .otherwise(-F.col(val))).alias("d"),
                  F.sum(val).alias("s"),
                  F.min(start).alias("pstart"),
                  F.count(F.lit(1)).alias("c")))
        return g.filter(F.col("c") == 2)

    # l1/l2 cached: the energy union references all three levels, and
    # each level derives from the previous — without the caches the
    # events scan runs once per level (plan audit pins one FileScan)
    l1 = level(idx, "t", "x", "ddate").cache()
    l2 = level(l1, "j", "s", "pstart").cache()
    l3 = level(l2, "j", "s", "pstart")
    return [(1, l1), (2, l2), (3, l3)]


@query(
    "haar_energy_levels",
    oracle=f"""
    WITH {_HAAR_BASE},
    lev AS (
        SELECT event_type, 1 AS level, count(*) AS n_coeffs,
               sum(CAST(d AS HUGEINT) * d) / 2.0 AS energy
        FROM l1 WHERE c = 2 GROUP BY event_type
        UNION ALL
        SELECT event_type, 2, count(*),
               sum(CAST(d AS HUGEINT) * d) / 4.0
        FROM l2 WHERE c = 2 GROUP BY event_type
        UNION ALL
        SELECT event_type, 3, count(*),
               sum(CAST(d AS HUGEINT) * d) / 8.0
        FROM l3 WHERE c = 2 GROUP BY event_type
    )
    SELECT event_type, CAST(level AS BIGINT) AS level,
           CAST(n_coeffs AS BIGINT) AS n_coeffs,
           round(energy / 1e4, 6) AS energy,
           round(energy / sum(energy)
                         OVER (PARTITION BY event_type), 6) AS share
    FROM lev ORDER BY event_type, level
    """,
)
def haar_energy_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar detail energy per dyadic level (1 = day-over-day, 2 =
    2-day, 3 = 4-day blocks) and its share of total detail energy, per
    event type. Energy in value units² (cents² / 1e4), orthonormal
    scaling Σd²/2^k.

    Scale: three grouped aggregations over halving frames."""
    levels = _cascade(spark, sf_dir)
    parts = []
    for k, df in levels:
        dd = F.col("d").cast("decimal(38,0)")
        parts.append(df.groupBy("event_type").agg(
            F.lit(k).cast("long").alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_coeffs"),
            (F.sum(dd * F.col("d")).cast("double")
             / float(2 ** k)).alias("energy_raw")))
    lev = parts[0].unionByName(parts[1]).unionByName(parts[2])
    w = Window.partitionBy("event_type")
    return (lev.select(
        "event_type", "level", "n_coeffs",
        F.round(F.col("energy_raw") / 1e4, 6).alias("energy"),
        F.round(F.col("energy_raw") / F.sum("energy_raw").over(w), 6)
        .alias("share"))
        .orderBy("event_type", "level"))


@query(
    "haar_top_details",
    oracle=f"""
    WITH {_HAAR_BASE},
    ranked AS (
        SELECT event_type, pstart, d,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(CAST(d AS HUGEINT)) DESC,
                                           pstart) AS rnk
        FROM l1 WHERE c = 2
    )
    SELECT event_type, CAST(rnk AS BIGINT) AS rnk,
           strftime(pstart, '%Y-%m-%d') AS pair_start,
           round(CAST(d AS DOUBLE) / 100.0 / 2.0, 6) AS detail_value
    FROM ranked WHERE rnk <= 2 ORDER BY event_type, rnk
    """,
)
def haar_top_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 |level-1 Haar detail| per event type with the pair's start
    date — the sharpest day-over-day half-differences (detail_value =
    (x_even - x_odd)/2 in value units), time-localized. Ties break on
    the earlier date.

    Scale: one grouped pass + a rank window over ~15 rows/type."""
    l1 = _cascade(spark, sf_dir)[0][1]
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("d").cast("decimal(38,0)")).desc(), F.col("pstart"))
    return (l1.withColumn("rnk", F.row_number().over(wr).cast("long"))
            .filter(F.col("rnk") <= 2)
            .select("event_type", "rnk",
                    F.date_format("pstart", "yyyy-MM-dd")
                    .alias("pair_start"),
                    F.round(F.col("d").cast("double") / 100.0 / 2.0, 6)
                    .alias("detail_value"))
            .orderBy("event_type", "rnk"))
