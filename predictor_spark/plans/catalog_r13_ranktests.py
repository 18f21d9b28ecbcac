"""Catalog part — two-sample rank tests (STAGED for r9).

The nonparametric stack (kruskal_wallis: k groups; spearman/kendall:
correlation) gains the TWO-SAMPLE workhorse and its effect size:

- mann_whitney_value    Mann-Whitney U (Wilcoxon rank-sum) comparing
                        purchase vs view event values: U from
                        average-rank sums, z with the tie-corrected
                        variance — the location test that needs no
                        normality
- cliffs_delta_value    Cliff's (1993) delta = 2U/(n1 n2) - 1 and the
                        common-language effect size U/(n1 n2) — the
                        ordinal effect size reviewers ask for next to
                        any U test

Determinism: values are exact integer cents; pooled average ranks are
computed per DISTINCT value from cumulative tie counts and kept in
exact half-units (2*cum - cnt + 1 is an exact integer), so the rank
sum R1 is an exact integer in half-units; the tie-correction term
sum(t^3 - t) is an exact integer.  Everything downstream is one
closed-form double, rounded in-query (6 dp).

Scale: one events scan -> per-distinct-value counts (the only real
shuffle, bounded by |distinct cents|); ranks ride ONE ordered window
over that aggregated frame — no row-level sort of the raw stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_A, _B = "purchase", "view"

#: oracle prelude: per-distinct-cents counts with half-unit avg ranks
_RANKS_SQL = f"""
    vals AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS v,
               CASE WHEN event_type = '{_A}' THEN 1 ELSE 0 END AS ga
        FROM events WHERE event_type IN ('{_A}', '{_B}')
    ),
    per_v AS MATERIALIZED (
        SELECT v, count(*) AS cnt, sum(ga) AS na
        FROM vals GROUP BY v
    ),
    ranked AS (
        SELECT v, cnt, na,
               2 * sum(cnt) OVER (ORDER BY v) - cnt + 1 AS avg_rank_x2
        FROM per_v
    ),
    agg AS (
        SELECT sum(na) AS n1, sum(cnt - na) AS n2,
               sum(CAST(na AS HUGEINT) * avg_rank_x2) AS r1_x2,
               sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_term
        FROM ranked
    )
"""


def _rank_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n1, n2, r1_x2, tie_term) exact integers — mirrors the
    oracle prelude."""
    ev = _t(spark, sf_dir, "events")
    vals = (ev.filter(F.col("event_type").isin(_A, _B))
            .select(F.round(F.col("value") * 100, 0).cast("long")
                    .alias("v"),
                    F.when(F.col("event_type") == _A, 1).otherwise(0)
                    .alias("ga")))
    per_v = vals.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"),
                                  F.sum("ga").alias("na"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_v.withColumn(
        "avg_rank_x2",
        F.lit(2) * F.sum("cnt").over(w) - F.col("cnt") + 1)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return ranked.agg(
        F.sum("na").alias("n1"),
        F.sum(F.col("cnt") - F.col("na")).alias("n2"),
        F.sum(dec("na") * F.col("avg_rank_x2")).alias("r1_x2"),
        F.sum(dec("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .alias("tie_term"))


@query(
    "mann_whitney_value",
    oracle=f"""
    WITH {_RANKS_SQL}
    SELECT CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n2 AS BIGINT) AS n_view,
           round(CAST(r1_x2 AS DOUBLE) / 2.0
                 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0, 1) AS u_stat,
           round((CAST(r1_x2 AS DOUBLE) / 2.0
                  - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
                  - CAST(n1 AS DOUBLE) * n2 / 2.0)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                        * ((n1 + n2 + 1.0)
                           - CAST(tie_term AS DOUBLE)
                             / ((n1 + n2) * (n1 + n2 - 1.0)))), 6)
               AS z_stat
    FROM agg
    """,
)
def mann_whitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U of purchase vs view values: U1 = R1 - n1(n1+1)/2
    from exact half-unit average-rank sums, z with the tie-corrected
    normal approximation (the large-sample form every stats package
    reports at these n)."""
    a = _rank_agg(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r1 = d("r1_x2") / 2.0
    u1 = r1 - d("n1") * (F.col("n1") + 1) / 2.0
    var = (d("n1") * d("n2") / 12.0
           * ((F.col("n1") + F.col("n2") + F.lit(1.0))
              - d("tie_term") / ((F.col("n1") + F.col("n2"))
                                 * (F.col("n1") + F.col("n2")
                                    - F.lit(1.0)))))
    return a.select(
        F.col("n1").cast("long").alias("n_purchase"),
        F.col("n2").cast("long").alias("n_view"),
        F.round(u1, 1).alias("u_stat"),
        F.round((u1 - d("n1") * d("n2") / 2.0) / F.sqrt(var), 6)
        .alias("z_stat"))


@query(
    "cliffs_delta_value",
    oracle=f"""
    WITH {_RANKS_SQL}
    SELECT round((CAST(r1_x2 AS DOUBLE) / 2.0
                  - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0)
                 / (CAST(n1 AS DOUBLE) * n2), 6) AS common_language,
           round(2.0 * (CAST(r1_x2 AS DOUBLE) / 2.0
                        - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0)
                 / (CAST(n1 AS DOUBLE) * n2) - 1.0, 6) AS cliffs_delta
    FROM agg
    """,
)
def cliffs_delta_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta and the common-language effect size from the same
    exact rank moments: CL = U1/(n1 n2) = P(purchase > view) + 0.5
    P(tie); delta = 2 CL - 1 in [-1, 1]."""
    a = _rank_agg(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    u1 = d("r1_x2") / 2.0 - d("n1") * (F.col("n1") + 1) / 2.0
    cl = u1 / (d("n1") * d("n2"))
    return a.select(
        F.round(cl, 6).alias("common_language"),
        F.round(F.lit(2.0) * cl - 1.0, 6).alias("cliffs_delta"))
