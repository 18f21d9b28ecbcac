"""Catalog part — robust outlier tests, set 2 (STAGED for r9).

Extends the anomaly stack (anomaly_rolling_zscore, outlier_iqr_flags,
ewma_control_chart, kalman_innovation_summary) with the two classical
identification tests it still lacked:

- modified_zscore_outliers  Iglewicz & Hoaglin (1993) modified z-score
                            M_i = 0.6745 (x - median) / MAD per event
                            type's daily cents bars — the robust
                            replacement for mean/sd z-scores (50%
                            breakdown point vs 0%)
- generalized_esd_stats     Rosner's (1983) generalized ESD, the first
                            3 rounds UNROLLED: each round reports the
                            most extreme remaining day and its test
                            statistic R_i = max|x - mean| / sd, then
                            removes it — the masking-proof form of
                            Grubbs' test (the statistics are reported;
                            the t-quantile decision thresholds live in
                            the caller's lookup table, as in Rosner's
                            own presentation)

Determinism: bars are exact integer cents.  median/MAD use exact
interpolated order statistics (Spark `percentile`, DuckDB
`quantile_cont` — both return the average of the two central values,
exactly representable for integer/half-integer inputs); every reported
double is quantized in-query (6 dp) before any threshold comparison so
a 1-ulp engine difference can never flip a count.  ESD moments are
exact integer sums; each round's argmax ties break on the earliest day.

Scale: one events scan -> the shared (type, date) rollup (~150 rows at
any SF); the ESD unroll is 3 grouped aggregates + 3 broadcast joins
over that tiny frame — static plan, no driver-side loop state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_MZ_THRESH = 3.5   # Iglewicz & Hoaglin's recommended cutoff
_ESD_ROUNDS = 3

#: shared oracle prelude: (type, date) integer-cent daily bars
_BARS_SQL = """
    bars AS MATERIALIZED (
        SELECT event_type, CAST(ts AS DATE) AS ddate,
               sum(CAST(round(value * 100) AS BIGINT)) AS c
        FROM events GROUP BY 1, 2
    )
"""


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type",
                       F.col("ts").cast("date").alias("ddate"))
            .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                 .alias("c")))


@query(
    "modified_zscore_outliers",
    oracle=f"""
    WITH {_BARS_SQL},
    med AS (
        SELECT event_type, quantile_cont(c, 0.5) AS med
        FROM bars GROUP BY event_type
    ),
    mad AS (
        SELECT b.event_type,
               quantile_cont(abs(b.c - m.med), 0.5) AS mad, m.med
        FROM bars b JOIN med m USING (event_type)
        GROUP BY b.event_type, m.med
    ),
    mz AS (
        SELECT b.event_type,
               round(0.6745 * (b.c - m.med) / m.mad, 6) AS mi
        FROM bars b JOIN mad m USING (event_type)
        WHERE m.mad > 0
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN abs(mi) > {_MZ_THRESH} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           round(max(abs(mi)), 6) AS max_abs_mz
    FROM mz GROUP BY event_type
    """,
)
def modified_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified z-score outlier summary per event type: count of days
    with |M_i| > 3.5 and the max |M_i|, M_i = 0.6745 (x - median)/MAD
    over the daily cents bars.  M_i is rounded to 6 dp BEFORE the
    threshold compare on both engines."""
    bars = _bars(spark, sf_dir)
    med = bars.groupBy("event_type").agg(
        F.expr("percentile(c, 0.5)").alias("med"))
    mad = (bars.join(F.broadcast(med), "event_type")
           .groupBy("event_type", "med")
           .agg(F.expr("percentile(abs(c - med), 0.5)").alias("mad")))
    mi = F.round(F.lit(0.6745) * (F.col("c") - F.col("med"))
                 / F.col("mad"), 6)
    mz = (bars.join(F.broadcast(mad), "event_type")
          .filter(F.col("mad") > 0)
          .select("event_type", mi.alias("mi")))
    return (mz.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                 F.sum(F.when(F.abs("mi") > _MZ_THRESH, 1).otherwise(0))
                 .cast("long").alias("n_outliers"),
                 F.round(F.max(F.abs("mi")), 6).alias("max_abs_mz")))


def _esd_oracle() -> str:
    """Unrolled CTE chain: round i computes exact moments over bars
    minus the i-1 previously removed days, then picks the max-deviation
    day (earliest-day tie-break) with its R statistic."""
    ctes = [_BARS_SQL.strip()]
    prev_excl = ""
    picks = []
    for i in range(1, _ESD_ROUNDS + 1):
        ctes.append(f"""
    s{i} AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(c AS HUGEINT)) AS s1,
               sum(CAST(c AS HUGEINT) * c) AS s2
        FROM bars {prev_excl}
        GROUP BY event_type HAVING count(*) >= 3
    ),
    p{i} AS (
        SELECT event_type, ddate, c, r_stat FROM (
            SELECT b.event_type, b.ddate, b.c,
                   round(abs(b.c - CAST(st.s1 AS DOUBLE) / st.n)
                         / sqrt((CAST(st.n AS DOUBLE) * st.s2
                                 - CAST(st.s1 AS DOUBLE) * st.s1)
                                / (CAST(st.n AS DOUBLE) * (st.n - 1))),
                         6) AS r_stat,
                   row_number() OVER (
                       PARTITION BY b.event_type
                       ORDER BY abs(b.c - CAST(st.s1 AS DOUBLE) / st.n)
                                DESC, b.ddate) AS rn
            FROM (SELECT * FROM bars {prev_excl}) b
            JOIN s{i} st USING (event_type)
        ) WHERE rn = 1
    )""")
        picks.append(
            f"SELECT event_type, {i} AS round,"
            f" strftime(ddate, '%Y-%m-%d') AS ddate,"
            f" round(c / 100.0, 6) AS value, r_stat FROM p{i}")
        prev_excl = "WHERE " + " AND ".join(
            f"NOT EXISTS (SELECT 1 FROM p{j} x WHERE "
            f"x.event_type = bars.event_type AND x.ddate = bars.ddate)"
            for j in range(1, i + 1))
    return ("WITH " + ",".join(ctes) + "\n"
            + " UNION ALL ".join(picks)
            + "\nORDER BY event_type, round")


@query("generalized_esd_stats", oracle=_esd_oracle())
def generalized_esd_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD (Rosner 1983), 3 unrolled rounds per event type:
    round i reports the most extreme remaining day (earliest-day
    tie-break on equal deviations) and R_i = max|x - mean|/sd (sample
    sd from exact integer moments), then excludes it from round i+1.
    The R_i sequence is what the test's lambda_i thresholds are
    compared against; reporting the statistics keeps the row decision-
    free and SQL-exact."""
    bars = _bars(spark, sf_dir).cache()
    removed: DataFrame | None = None
    outs = []
    cur = bars
    for i in range(1, _ESD_ROUNDS + 1):
        st = (cur.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("c").cast("decimal(38,0)")).alias("s1"),
                   F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
                   .alias("s2"))
              .filter(F.col("n") >= 3))
        d = lambda c: F.col(c).cast("double")  # noqa: E731
        mean = d("s1") / F.col("n")
        sd = F.sqrt((d("n") * d("s2") - d("s1") * d("s1"))
                    / (d("n") * (F.col("n") - 1)))
        j = cur.join(F.broadcast(st), "event_type")
        dev = F.abs(F.col("c") - mean)
        w = Window.partitionBy("event_type").orderBy(
            dev.desc(), F.col("ddate").asc())
        pick = (j.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("event_type", "ddate", "c",
                        F.round(dev / sd, 6).alias("r_stat")))
        outs.append(pick.select(
            "event_type", F.lit(i).alias("round"),
            F.date_format("ddate", "yyyy-MM-dd").alias("ddate"),
            F.round(F.col("c") / 100.0, 6).alias("value"), "r_stat"))
        picked = pick.select("event_type", "ddate")
        removed = picked if removed is None \
            else removed.unionByName(picked)
        cur = bars.join(removed, ["event_type", "ddate"], "left_anti")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("event_type", "round")
