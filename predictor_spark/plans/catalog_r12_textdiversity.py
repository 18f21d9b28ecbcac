"""Catalog part — generation-diversity text metrics (STAGED for r9).

The text-quality stack (type_token_ratio, heaps_vocab_growth,
text_repetition, perplexity_unigram) gains the two readouts LLM data
curation quotes when asking "is this slice diverse or degenerate":

- distinct_ngram_ratios  Distinct-1/2/3 (Li et al. 2016, "A Diversity-
                         Promoting Objective Function"): distinct
                         n-grams over total n-gram instances per
                         source — THE standard degeneracy metric for
                         generated text
- token_burstiness       Church & Gale (1995) burstiness: the
                         variance-to-mean ratio (index of dispersion)
                         of per-document counts for each word with
                         corpus count >= 5, top-10 burstiest — VMR ~ 1
                         is Poisson scatter, VMR >> 1 marks topical
                         words that clump into few documents

Determinism: every ratio's numerator and denominator is an exact
integer count; VMR moments are exact integer sums over per-document
counts (absent documents contribute exact zeros through the totals);
each statistic is one closed-form double rounded in-query (6 dp),
ranked with the word as tie-break.

Scale: each row is ONE documents scan — distinct-n explodes all three
gram lengths in a single generator pass then pre-aggregates to
(source, n, gram) before any shuffle; burstiness pre-aggregates to
(doc, word) then (word) — the trigram_hapax_share lesson (never carry
the raw token stream through two shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_BURST_MIN = 5
_BURST_TOPK = 10

#: one-pass n-gram stream for n = 1, 2, 3 (oracle form): each token
#: array emits all its grams tagged with their length
_GRAMS_SQL = """
    toks AS (
        SELECT source, list_filter(string_split_regex(trim(text), '\\s+'),
                                   w -> w <> '') AS t
        FROM documents
    ),
    grams AS (
        SELECT source, g.n AS n, g.gram AS gram
        FROM toks, LATERAL (
            SELECT 1 AS n, unnest(t) AS gram
            UNION ALL
            SELECT 2, unnest(list_transform(range(1, len(t)),
                i -> t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]))
            UNION ALL
            SELECT 3, unnest(list_transform(range(1, len(t) - 1),
                i -> t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]
                     || ' ' || t[CAST(i AS INT) + 2]))
        ) g
    ),
    gcounts AS MATERIALIZED (
        SELECT source, n, gram, count(*) AS c
        FROM grams GROUP BY source, n, gram
    )
"""


@query(
    "distinct_ngram_ratios",
    oracle=f"""
    WITH {_GRAMS_SQL}
    SELECT source, n,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(c) AS BIGINT) AS n_total,
           round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS distinct_ratio
    FROM gcounts GROUP BY source, n
    ORDER BY source, n
    """,
)
def distinct_ngram_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1/2/3 per source: unique n-grams over n-gram instances.
    All three gram lengths come out of ONE scan (a single generator
    projection emits every gram tagged with n) and are pre-aggregated
    to (source, n, gram) before the only shuffle."""
    toks = (_t(spark, sf_dir, "documents")
            .select("source",
                    F.expr("filter(split(trim(text), '\\\\s+'),"
                           " w -> w <> '')").alias("t")))
    gram_arrays = F.concat(
        F.transform(F.col("t"), lambda w: F.struct(
            F.lit(1).alias("n"), w.alias("gram"))),
        F.expr("transform(sequence(0, greatest(size(t) - 2, -1)),"
               " i -> struct(2 as n,"
               " concat_ws(' ', t[i], t[i + 1]) as gram))"),
        F.expr("transform(sequence(0, greatest(size(t) - 3, -1)),"
               " i -> struct(3 as n,"
               " concat_ws(' ', t[i], t[i + 1], t[i + 2]) as gram))"))
    grams = (toks.filter(F.size("t") >= 1)
             .select("source", F.explode(gram_arrays).alias("g"))
             .select("source", F.col("g.n").alias("n"),
                     F.col("g.gram").alias("gram")))
    gcounts = grams.groupBy("source", "n", "gram").agg(
        F.count(F.lit(1)).alias("c"))
    return (gcounts.groupBy("source", "n")
            .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"),
                 F.sum("c").cast("long").alias("n_total"))
            .select("source", "n", "n_distinct", "n_total",
                    F.round(F.col("n_distinct").cast("double")
                            / F.col("n_total"), 6)
                    .alias("distinct_ratio"))
            .orderBy("source", "n"))


@query(
    "token_burstiness",
    oracle=f"""
    WITH dw AS MATERIALIZED (
        SELECT doc_id, w, count(*) AS c
        FROM (
            SELECT doc_id, unnest(list_filter(
                string_split_regex(trim(text), '\\s+'),
                w -> w <> '')) AS w
            FROM documents
        ) GROUP BY doc_id, w
    ),
    d AS (SELECT count(*) AS n_docs FROM documents),
    wm AS (
        SELECT w, sum(c) AS tot, sum(CAST(c AS HUGEINT) * c) AS ss
        FROM dw GROUP BY w HAVING sum(c) >= {_BURST_MIN}
    ),
    scored AS (
        SELECT w, tot,
               round((CAST(ss AS DOUBLE) / n_docs
                      - (CAST(tot AS DOUBLE) / n_docs)
                        * (CAST(tot AS DOUBLE) / n_docs))
                     / (CAST(tot AS DOUBLE) / n_docs), 6) AS vmr
        FROM wm, d
    )
    SELECT w AS term, CAST(tot AS BIGINT) AS n_occurrences, vmr
    FROM (
        SELECT w, tot, vmr,
               row_number() OVER (ORDER BY vmr DESC, w) AS rn
        FROM scored
    ) WHERE rn <= {_BURST_TOPK}
    ORDER BY vmr DESC, term
    """,
)
def token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 burstiest words: index of dispersion (variance/mean) of
    per-document counts, zeros included through the totals — VMR =
    (E[x^2] - E[x]^2) / E[x] with E over ALL documents.  Exact integer
    (doc, word) pre-aggregation; one word-keyed shuffle."""
    docs = _t(spark, sf_dir, "documents")
    dw = (docs.select("doc_id",
                      F.explode(F.expr(
                          "filter(split(trim(text), '\\\\s+'),"
                          " w -> w <> '')")).alias("w"))
          .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c")))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    wm = (dw.groupBy("w")
          .agg(F.sum("c").alias("tot"),
               F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
               .alias("ss"))
          .filter(F.col("tot") >= _BURST_MIN)
          .crossJoin(F.broadcast(n_docs)))
    mean = F.col("tot").cast("double") / F.col("n_docs")
    vmr = F.round((F.col("ss").cast("double") / F.col("n_docs")
                   - mean * mean) / mean, 6)
    # global top-k as orderBy+limit -> TakeOrderedAndProject (map-side
    # per-partition top-10, no single-partition window over the vocab)
    return (wm.select("w", "tot", vmr.alias("vmr"))
            .orderBy(F.col("vmr").desc(), "w")
            .limit(_BURST_TOPK)
            .select(F.col("w").alias("term"),
                    F.col("tot").cast("long").alias("n_occurrences"),
                    "vmr"))
