"""Catalog part — experiment-analysis statistics.

The readout battery around ab_test_cuped (catalog_experiment): given a
hash-bucket assignment, a platform answers (1) is the assignment
itself healthy, (2) is the effect real under normal assumptions,
(3) is it real without them:

- srm_check_chi2        sample-ratio-mismatch guard: chi-square of the
                        observed arm counts against 50/50 (the FIRST
                        check any experiment readout runs — a biased
                        splitter invalidates everything downstream)
- welch_t_arms          Welch's unequal-variance t with
                        Welch-Satterthwaite df (Welch 1947)
- mann_whitney_arms     Mann-Whitney U via midranks with the exact tie
                        correction (Mann & Whitney 1947) — the
                        rank-based alternative robust to heavy tails
- jackknife_mean_se     delete-one-group jackknife SE of the mean
                        (Quenouille/Tukey) — the clustered-data SE a
                        platform uses when rows within a user correlate

Determinism: arms come from the md5-prefix of user_id (hash-stable,
no RNG); every moment is built from exact integer-cent sums; midranks
are exact .5 rationals from grouped counts; each output statistic
divides once, then rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_CENTS = "CAST(round(value * 100) AS BIGINT)"

# per-user outcome + md5-hash arm: the shared experiment frame
_ARMS = f"""
    arms AS (
        SELECT user_id,
               CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))
                         AS BIGINT) % 2 AS BIGINT) AS arm,
               sum({_CENTS}) AS y
        FROM events GROUP BY user_id
    )"""


def _arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user total outcome (exact cents) + md5-bucket arm — one
    groupBy(user); the arm is a map-side hash of the grouping key."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    arm = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 7),
                  16, 10).cast("long") % 2).alias("arm")
    return ev.groupBy("user_id", arm).agg(F.sum(cents).alias("y"))


@query(
    "srm_check_chi2",
    oracle=f"""
    WITH {_ARMS},
    cnt AS (SELECT arm, count(*) AS n FROM arms GROUP BY arm),
    tot AS (SELECT sum(n) AS nt FROM cnt)
    SELECT CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_arm0,
           CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_arm1,
           round(sum((n - nt / 2.0) * (n - nt / 2.0) / (nt / 2.0)), 4)
               AS chi2,
           CAST(sum((n - nt / 2.0) * (n - nt / 2.0) / (nt / 2.0)) > 3.841
                AS BOOLEAN) AS srm_detected
    FROM cnt, tot
    """,
)
def srm_check_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check: chi-square(1) of observed arm
    counts against the designed 50/50 split, alarmed at 95% (3.841).
    An SRM means the assignment or logging pipeline is biased and the
    experiment readout is untrustworthy — platforms run this before
    any effect estimate.

    Scale: one groupBy(user) then a 2-row aggregate; exact integer
    counts all the way to the single division."""
    cnt = (_arms(spark, sf_dir).groupBy("arm")
           .agg(F.count(F.lit(1)).alias("n"))
           # read by the total and the chi-square assembly
           .cache())
    tot = cnt.agg(F.sum("n").alias("nt"))
    chi = F.sum((F.col("n") - F.col("nt") / 2.0)
                * (F.col("n") - F.col("nt") / 2.0) / (F.col("nt") / 2.0))
    return (cnt.crossJoin(F.broadcast(tot))
            .agg(F.sum(F.when(F.col("arm") == 0, F.col("n")))
                 .cast("long").alias("n_arm0"),
                 F.sum(F.when(F.col("arm") == 1, F.col("n")))
                 .cast("long").alias("n_arm1"),
                 F.round(chi, 4).alias("chi2"),
                 (chi > 3.841).alias("srm_detected")))


@query(
    "welch_t_arms",
    oracle=f"""
    WITH {_ARMS},
    g AS (
        SELECT arm, count(*) AS n,
               CAST(sum(y) AS DOUBLE) / count(*) AS m,
               (sum(CAST(y AS DOUBLE) * y)
                - CAST(sum(y) AS DOUBLE) * sum(y) / count(*))
                 / (count(*) - 1) AS v
        FROM arms GROUP BY arm
    ),
    w AS (
        SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
               max(CASE WHEN arm = 1 THEN n END) AS n1,
               max(CASE WHEN arm = 0 THEN m END) AS m0,
               max(CASE WHEN arm = 1 THEN m END) AS m1,
               max(CASE WHEN arm = 0 THEN v END) AS v0,
               max(CASE WHEN arm = 1 THEN v END) AS v1
        FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_arm0, CAST(n1 AS BIGINT) AS n_arm1,
           round((m0 - m1) / 100, 4) AS mean_diff,
           round((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 4) AS t_stat,
           round(power(v0 / n0 + v1 / n1, 2)
                 / (power(v0 / n0, 2) / (n0 - 1)
                    + power(v1 / n1, 2) / (n1 - 1)), 2) AS df,
           CAST(abs((m0 - m1) / sqrt(v0 / n0 + v1 / n1)) > 1.96
                AS BOOLEAN) AS significant
    FROM w
    """,
)
def welch_t_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the two hash arms on
    per-user outcomes, with the Welch-Satterthwaite effective df — the
    default parametric readout (never the pooled-variance Student t:
    arm variances are rarely equal in practice).

    Scale: per-arm moments are ONE aggregate of exact integer sums
    (sum y, sum y^2, n); the test statistic assembles from a 2-row
    frame.  Sample variance uses the sum-of-squares identity —
    numerically safe here because cents are integers (no catastrophic
    cancellation against a far-off mean)."""
    arms = _arms(spark, sf_dir)
    g = (arms.groupBy("arm")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("y").alias("s"),
              F.sum(F.col("y").cast("double") * F.col("y")).alias("ss"))
         .select("arm", "n",
                 (F.col("s").cast("double") / F.col("n")).alias("m"),
                 ((F.col("ss") - F.col("s").cast("double") * F.col("s")
                   / F.col("n")) / (F.col("n") - 1)).alias("v")))
    w = g.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("m"))).alias("m0"),
        F.max(F.when(F.col("arm") == 1, F.col("m"))).alias("m1"),
        F.max(F.when(F.col("arm") == 0, F.col("v"))).alias("v0"),
        F.max(F.when(F.col("arm") == 1, F.col("v"))).alias("v1"))
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    t = (F.col("m0") - F.col("m1")) / F.sqrt(se2)
    df = (se2 * se2
          / (F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
             + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)))
    return w.select(
        F.col("n0").cast("long").alias("n_arm0"),
        F.col("n1").cast("long").alias("n_arm1"),
        F.round((F.col("m0") - F.col("m1")) / 100, 4).alias("mean_diff"),
        F.round(t, 4).alias("t_stat"),
        F.round(df, 2).alias("df"),
        (F.abs(t) > 1.96).alias("significant"))


@query(
    "mann_whitney_arms",
    oracle=f"""
    WITH {_ARMS},
    grp AS (
        SELECT y, count(*) AS c, sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
               AS c0
        FROM arms GROUP BY y
    ),
    mid AS (
        SELECT c, c0,
               (2 * (sum(c) OVER (ORDER BY y) - c) + c + 1) / 2.0
                   AS midrank
        FROM grp
    ),
    agg AS (
        SELECT sum(c0) AS n0, sum(c - c0) AS n1,
               sum(c0 * midrank) AS r0,
               sum(CAST(c AS DOUBLE) * c * c - c) AS ties
        FROM mid
    )
    SELECT CAST(n0 AS BIGINT) AS n_arm0, CAST(n1 AS BIGINT) AS n_arm1,
           round(r0 - n0 * (n0 + 1) / 2.0, 1) AS u_stat,
           round((r0 - n0 * (n0 + 1) / 2.0 - n0 * n1 / 2.0)
                 / sqrt(n0 * n1 / 12.0
                        * ((n0 + n1 + 1)
                           - ties / ((n0 + n1) * (n0 + n1 - 1.0)))),
                 4) AS z_stat
    FROM agg
    """,
)
def mann_whitney_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the hash arms with midrank ties and the
    exact tie-corrected normal approximation — the rank test that
    survives the heavy-tailed per-user outcome distributions where the
    t-test's normality assumption fails.

    Scale: ranks come from GROUPED outcome values (groupBy(y) then a
    window over distinct values), the same never-sort-rows discipline
    as roc_auc_rank; the tie term sum(t^3 - t) falls out of the same
    grouped frame.  One final 1-row reduction."""
    arms = _arms(spark, sf_dir)
    grp = (arms.groupBy("y")
           .agg(F.count(F.lit(1)).alias("c"),
                F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("c0")))
    cum = F.sum("c").over(
        Window.orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    mid = grp.select(
        "c", "c0",
        ((2 * (cum - F.col("c")) + F.col("c") + 1) / 2.0).alias("midrank"))
    agg = mid.agg(
        F.sum("c0").alias("n0"),
        F.sum(F.col("c") - F.col("c0")).alias("n1"),
        F.sum(F.col("c0") * F.col("midrank")).alias("r0"),
        F.sum(F.col("c").cast("double") * F.col("c") * F.col("c")
              - F.col("c")).alias("ties"))
    u = F.col("r0") - F.col("n0") * (F.col("n0") + 1) / 2.0
    n = F.col("n0") + F.col("n1")
    var = (F.col("n0") * F.col("n1") / 12.0
           * ((n + 1) - F.col("ties") / (n * (n - 1.0))))
    return agg.select(
        F.col("n0").cast("long").alias("n_arm0"),
        F.col("n1").cast("long").alias("n_arm1"),
        F.round(u, 1).alias("u_stat"),
        F.round((u - F.col("n0") * F.col("n1") / 2.0) / F.sqrt(var), 4)
        .alias("z_stat"))


@query(
    "jackknife_mean_se",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, user_id % 20 AS grp, sum({_CENTS}) AS y
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT grp, sum(y) AS sg, count(*) AS ng FROM per_user GROUP BY grp
    ),
    tot AS (SELECT sum(sg) AS s, sum(ng) AS n, count(*) AS k FROM g),
    loo AS (
        SELECT (CAST(s - sg AS DOUBLE) / (n - ng)) AS mi, k FROM g, tot
    ),
    jk AS (
        SELECT k, sum(mi) / k AS mbar,
               sum(mi * mi) - sum(mi) * sum(mi) / k AS ssq
        FROM loo GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           round((SELECT CAST(s AS DOUBLE) / n FROM tot) / 100, 4)
               AS mean_value,
           round(sqrt((k - 1.0) / k * ssq) / 100, 4) AS jackknife_se
    FROM jk
    """,
)
def jackknife_mean_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife standard error of the mean per-user
    outcome, over 20 user-hash groups: SE^2 = (g-1)/g * sum_i (m_(i) -
    mbar)^2 with m_(i) the mean after dropping group i.  This is the
    clustered SE an experimentation platform reports when independence
    across rows fails (rows cluster by user) — and the shape is ONE
    aggregation pass, not g re-scans.

    Scale: leave-one-out means are algebra on the per-group (sum,
    count) frame: m_(i) = (S - S_i)/(N - n_i), so the jackknife costs
    one groupBy + a 20-row reduction regardless of data size; every
    m_(i) is a ratio of exact integers."""
    per_user = (_t(spark, sf_dir, "events")
                .groupBy("user_id",
                         (F.col("user_id") % 20).alias("grp"))
                .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                     .alias("y"))
                .groupBy("grp")
                .agg(F.sum("y").alias("sg"), F.count(F.lit(1)).alias("ng"))
                # 20-row frame read by the total and the LOO assembly
                .cache())
    tot = per_user.agg(F.sum("sg").alias("s"), F.sum("ng").alias("n"),
                       F.count(F.lit(1)).alias("k"))
    loo = (per_user.crossJoin(F.broadcast(tot))
           .select(((F.col("s") - F.col("sg")).cast("double")
                    / (F.col("n") - F.col("ng"))).alias("mi"),
                   "k", "s", "n"))
    jk = loo.groupBy("k", "s", "n").agg(
        (F.sum(F.col("mi") * F.col("mi"))
         - F.sum("mi") * F.sum("mi") / F.col("k")).alias("ssq"))
    return jk.select(
        F.col("k").cast("long").alias("n_groups"),
        F.round(F.col("s").cast("double") / F.col("n") / 100, 4)
        .alias("mean_value"),
        F.round(F.sqrt((F.col("k") - 1.0) / F.col("k") * F.col("ssq"))
                / 100, 4).alias("jackknife_se"))
