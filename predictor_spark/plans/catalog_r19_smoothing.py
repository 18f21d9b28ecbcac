"""Catalog part — frequency smoothing / unseen-mass estimation (STAGED
r11).

The corpus-LM rows (perplexity_unigram: add-1; bigram_logprob_per_doc)
use Laplace smoothing, the bluntest instrument. These rows add the
estimator production LMs actually start from — Good-Turing (Good 1953)
over the corpus word-BIGRAM counts (the synthetic corpus's unigram
vocabulary is tiny and saturated — every word occurs hundreds of times,
so no low-frequency classes exist; bigrams are where the sparse tail
lives, exactly the n-gram-LM setting Good-Turing was built for):

- good_turing_counts   the bigram count-of-counts table N_r for the
                       lowest frequencies r = 1..10 with the Turing
                       re-estimate r* = (r+1)·N_{r+1}/N_r and each
                       class's smoothed probability mass — the
                       "how much do singletons really weigh" view
- unseen_mass_estimate the headline scalars: Good-Turing unseen mass
                       P0 = N_1/N vs the add-1 unseen estimate
                       1/(N+V+1), plus vocabulary/token totals —
                       how much probability the corpus says belongs
                       to words it has never seen

Determinism: word counts, count-of-counts and totals are exact
integers off one tokenize pass; the re-estimates are single divisions
rounded 6 dp.

Scale: one corpus scan -> word-count frame -> count-of-counts
aggregate (map-side partials throughout); the N_{r+1} lookup is a
1-row-offset self-join on the ≤|distinct counts| frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

#: bigram counts -> count-of-counts N_r
_COC_SQL = """
    toks AS (
        SELECT list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> '') AS arr
        FROM documents
    ),
    words AS (
        SELECT g AS w, CAST(count(*) AS BIGINT) AS r FROM (
            SELECT arr[CAST(i AS INT)] || ' '
                   || arr[CAST(i AS INT) + 1] AS g
            FROM toks, LATERAL (SELECT unnest(range(1, len(arr))) AS i)
        ) GROUP BY g
    ),
    coc AS (
        SELECT r, CAST(count(*) AS BIGINT) AS n_r
        FROM words GROUP BY r
    ),
    tot AS (
        SELECT sum(r * n_r) AS n_tokens, sum(n_r) AS vocab FROM coc
    )"""


def _coc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    arr = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    bigrams = F.expr(
        "transform(sequence(0, size(arr) - 2),"
        " i -> concat(arr[i], ' ', arr[i + 1]))")
    words = (docs.select(arr.alias("arr"))
             .filter(F.size("arr") >= 2)
             .select(F.explode(bigrams).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("r")))
    return (words.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
            .cache())


@query(
    "good_turing_counts",
    oracle=f"""
    WITH {_COC_SQL}
    SELECT a.r, a.n_r,
           round((a.r + 1.0) * b.n_r / a.n_r, 6) AS r_star,
           round((a.r + 1.0) * b.n_r / a.n_r * a.n_r
                 / (SELECT n_tokens FROM tot), 6) AS smoothed_mass,
           round(CAST(a.r AS DOUBLE) * a.n_r
                 / (SELECT n_tokens FROM tot), 6) AS raw_mass
    FROM coc a JOIN coc b ON b.r = a.r + 1
    WHERE a.r <= 10 ORDER BY a.r
    """,
)
def good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Good-Turing table for r = 1..10: N_r, the re-estimate
    r* = (r+1)·N_{r+1}/N_r, and each class's smoothed vs raw
    probability mass. r* < r at the low end is the hallmark — observed
    singletons are over-counted relative to their true probability.

    Scale: count-of-counts aggregate + a 1-offset self-join on the
    tiny N_r frame."""
    coc = _coc(spark, sf_dir)
    tot = coc.agg(F.sum(F.col("r") * F.col("n_r")).alias("n_tokens"))
    a = coc.select(F.col("r"), F.col("n_r"))
    b = coc.select((F.col("r") - 1).alias("r"),
                   F.col("n_r").alias("n_next"))
    r_star = (F.col("r") + 1.0) * F.col("n_next") / F.col("n_r")
    return (a.join(b, "r")
            .filter(F.col("r") <= 10)
            .crossJoin(F.broadcast(tot))
            .select("r", "n_r",
                    F.round(r_star, 6).alias("r_star"),
                    F.round(r_star * F.col("n_r") / F.col("n_tokens"), 6)
                    .alias("smoothed_mass"),
                    F.round(F.col("r").cast("double") * F.col("n_r")
                            / F.col("n_tokens"), 6).alias("raw_mass"))
            .orderBy("r"))


@query(
    "unseen_mass_estimate",
    oracle=f"""
    WITH {_COC_SQL}
    SELECT CAST(tot.n_tokens AS BIGINT) AS n_tokens,
           CAST(tot.vocab AS BIGINT) AS vocab,
           CAST(coalesce((SELECT n_r FROM coc WHERE r = 1), 0)
                AS BIGINT) AS n_singletons,
           round(CAST(coalesce((SELECT n_r FROM coc WHERE r = 1), 0)
                      AS DOUBLE) / tot.n_tokens, 6) AS gt_unseen_mass,
           round(1.0 / (tot.n_tokens + tot.vocab + 1.0), 6)
               AS addone_unseen_prob
    FROM tot
    """,
)
def unseen_mass_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unseen-word probability budget: Good-Turing total OOV mass
    N_1/N (what the corpus itself says it hasn't seen) next to the
    add-1 estimate for a single unseen type 1/(N+V+1). One row.

    Scale: two scalars off the cached count-of-counts frame."""
    coc = _coc(spark, sf_dir)
    agg = coc.agg(
        F.sum(F.col("r") * F.col("n_r")).alias("n_tokens"),
        F.sum("n_r").alias("vocab"),
        F.coalesce(F.sum(F.when(F.col("r") == 1, F.col("n_r"))),
                   F.lit(0)).alias("n1"))
    return agg.select(
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        F.col("n1").cast("long").alias("n_singletons"),
        F.round(F.col("n1").cast("double") / F.col("n_tokens"), 6)
        .alias("gt_unseen_mass"),
        F.round(1.0 / (F.col("n_tokens") + F.col("vocab") + 1.0), 6)
        .alias("addone_unseen_prob"))
