"""Catalog part — corpus keyness / distinctive terms (STAGED for r9).

The text stack (tfidf_top_terms: within-corpus weighting;
trigram_hapax_share: novelty mass; zipf_rank_slope) gains the
source-vs-rest KEYNESS statistics corpus linguistics and training-data
curation use to answer "which words make this slice different":

- dunning_g2_terms     Dunning's (1993) log-likelihood ratio G^2 per
                       (source, word) against the rest of the corpus,
                       top-5 overused terms per source
- log_odds_ratio_terms Monroe, Colaresi & Quinn (2008) smoothed
                       log-odds ratio z-score (+0.5 Haldane prior),
                       top-5 per source — the variance-normalized form
                       that does not over-reward frequent words

Both use the lexical family's tokenizer (whitespace split, empties
dropped) and a min-count floor so the statistics are defined.

Determinism: all eight contingency inputs per (source, word) are exact
integer counts off ONE aggregated (source, word, count) frame; each
statistic is a closed-form double over those integers, rounded (6 dp)
BEFORE the top-k rank, with the word as the tie-break.

Scale: one documents scan -> explode -> ONE (source, word) pre-
aggregation shuffle; word totals and source totals are window sums
over the aggregated frame (the trigram_hapax_share lesson — never
re-join the raw token stream); top-k is a per-source rank over rows
that already passed the count floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_MIN_COUNT = 5
_TOPK = 5

#: oracle prelude: (source, word, a, wtot, stot, n) exact counts
_COUNTS_SQL = f"""
    toks AS (
        SELECT source, unnest(list_filter(
            string_split_regex(trim(text), '\\s+'), w -> w <> '')) AS w
        FROM documents
    ),
    sw AS MATERIALIZED (
        SELECT source, w, count(*) AS a FROM toks GROUP BY source, w
    ),
    ext AS MATERIALIZED (
        SELECT source, w, a,
               sum(a) OVER (PARTITION BY w) AS wtot,
               sum(a) OVER (PARTITION BY source) AS stot,
               sum(a) OVER () AS n
        FROM sw
    ),
    filtered AS (
        SELECT source, w, a, wtot - a AS b, stot, n - stot AS rest
        FROM ext WHERE a >= {_MIN_COUNT}
    )
"""


def _counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, w, a, b, stot, rest): contingency counts per (source,
    word), count floor applied — same shapes as the oracle prelude."""
    toks = (_t(spark, sf_dir, "documents")
            .select("source",
                    F.explode(F.expr(
                        "filter(split(trim(text), '\\\\s+'),"
                        " w -> w <> '')")).alias("w")))
    # vocabulary-bounded aggregate, referenced by the totals AND the
    # windowed extension — cache so the scan+explode runs once
    sw = (toks.groupBy("source", "w")
          .agg(F.count(F.lit(1)).alias("a")).cache())
    # the corpus total joins as a broadcast SCALAR — a partition-less
    # global window would drag the whole aggregated frame through one
    # partition at real vocabulary sizes
    tot = sw.agg(F.sum("a").alias("n"))
    ext = (sw
           .withColumn("wtot", F.sum("a").over(Window.partitionBy("w")))
           .withColumn("stot",
                       F.sum("a").over(Window.partitionBy("source")))
           .crossJoin(F.broadcast(tot)))
    return (ext.filter(F.col("a") >= _MIN_COUNT)
            .select("source", "w", "a",
                    (F.col("wtot") - F.col("a")).alias("b"),
                    "stot", (F.col("n") - F.col("stot")).alias("rest")))


@query(
    "dunning_g2_terms",
    oracle=f"""
    WITH {_COUNTS_SQL},
    g AS (
        SELECT source, w, a,
               round(2.0 * (
                   a * ln(CAST(a AS DOUBLE)
                          / (CAST(stot AS DOUBLE) * (a + b)
                             / (stot + rest)))
                   + CASE WHEN b = 0 THEN 0.0
                          ELSE b * ln(CAST(b AS DOUBLE)
                                      / (CAST(rest AS DOUBLE) * (a + b)
                                         / (stot + rest))) END), 6) AS g2,
               CAST(a AS DOUBLE) / stot
                   - CAST(a + b AS DOUBLE) / (stot + rest) AS lift
        FROM filtered
    )
    SELECT source, w AS term, CAST(a AS BIGINT) AS n_in_source, g2
    FROM (
        SELECT source, w, a, g2,
               row_number() OVER (PARTITION BY source
                                  ORDER BY g2 DESC, w) AS rn
        FROM g WHERE lift > 0
    ) WHERE rn <= {_TOPK}
    ORDER BY source, g2 DESC, term
    """,
)
def dunning_g2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 OVERUSED terms per source by Dunning's G^2 = 2 (a ln(a/E_a)
    + b ln(b/E_b)) against the rest of the corpus (E from the pooled
    rate; underused terms excluded via the positive-lift filter; b = 0
    contributes 0 by the x ln x -> 0 convention).  G^2 is rounded
    before the rank; word breaks ties."""
    c = _counts(spark, sf_dir)
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    n = F.col("stot") + F.col("rest")
    ea = d("stot") * (F.col("a") + F.col("b")) / n
    eb = d("rest") * (F.col("a") + F.col("b")) / n
    g2 = F.round(F.lit(2.0) * (
        F.col("a") * F.log(d("a") / ea)
        + F.when(F.col("b") == 0, F.lit(0.0))
        .otherwise(F.col("b") * F.log(d("b") / eb))), 6)
    lift = d("a") / F.col("stot") - (d("a") + F.col("b")) / n
    scored = c.select("source", "w", "a", g2.alias("g2"),
                      lift.alias("lift"))
    w = Window.partitionBy("source").orderBy(F.col("g2").desc(),
                                             F.col("w"))
    return (scored.filter(F.col("lift") > 0)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _TOPK)
            .select("source", F.col("w").alias("term"),
                    F.col("a").cast("long").alias("n_in_source"), "g2")
            .orderBy("source", F.col("g2").desc(), "term"))


@query(
    "log_odds_ratio_terms",
    oracle=f"""
    WITH {_COUNTS_SQL},
    z AS (
        SELECT source, w, a,
               round((ln((a + 0.5) / (stot - a + 0.5))
                      - ln((b + 0.5) / (rest - b + 0.5)))
                     / sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)), 6)
                   AS z_logodds
        FROM filtered
    )
    SELECT source, w AS term, CAST(a AS BIGINT) AS n_in_source,
           z_logodds
    FROM (
        SELECT source, w, a, z_logodds,
               row_number() OVER (PARTITION BY source
                                  ORDER BY z_logodds DESC, w) AS rn
        FROM z
    ) WHERE rn <= {_TOPK}
    ORDER BY source, z_logodds DESC, term
    """,
)
def log_odds_ratio_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per source by the Haldane-smoothed log-odds-ratio
    z-score (Monroe et al. 2008 eq. 15-16 with a flat 0.5 prior):
    delta = ln((a+.5)/(stot-a+.5)) - ln((b+.5)/(rest-b+.5)),
    z = delta / sqrt(1/(a+.5) + 1/(b+.5))."""
    c = _counts(spark, sf_dir)
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    delta = (F.log((d("a") + 0.5) / (d("stot") - F.col("a") + 0.5))
             - F.log((d("b") + 0.5) / (d("rest") - F.col("b") + 0.5)))
    z = F.round(delta / F.sqrt(1.0 / (d("a") + 0.5)
                               + 1.0 / (d("b") + 0.5)), 6)
    w = Window.partitionBy("source").orderBy(F.col("z_logodds").desc(),
                                             F.col("w"))
    return (c.select("source", "w", "a", z.alias("z_logodds"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _TOPK)
            .select("source", F.col("w").alias("term"),
                    F.col("a").cast("long").alias("n_in_source"),
                    "z_logodds")
            .orderBy("source", F.col("z_logodds").desc(), "term"))
