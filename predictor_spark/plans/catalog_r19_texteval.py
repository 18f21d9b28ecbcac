"""Catalog part — reference-based text-similarity metrics (STAGED r11).

The text stack measures corpora (quality scores, diversity,
fingerprints) and retrieval (BM25, nDCG) but not the metric pair every
generation/translation eval reports: BLEU and ROUGE between a candidate
and a reference. Evaluated over 32 deterministic document pairs (the 64
md5-lowest docs paired by adjacent md5 rank — doc 1&2, 3&4, ...):

- rouge_doc_pairs  ROUGE-1 and ROUGE-2 F1 (Lin 2004): clipped n-gram
                   overlap Σ_g min(c_ref, c_cand) over recall
                   (reference counts) and precision (candidate counts)
                   denominators
- bleu_doc_pairs   BLEU-2 (Papineni et al. 2002): geometric mean of
                   clipped unigram/bigram precisions times the brevity
                   penalty min(1, exp(1 - len_ref/len_cand)); 0 when a
                   precision is 0 (no smoothing — documented)

Determinism: token/n-gram counts and clipped overlaps are exact
integers; the md5-rank pairing is the established sample idiom; final
scores are single double expressions rounded 6 dp.

Scale: one corpus scan -> the bounded 64-doc sample; n-gram explosion
is 32 pairs × doc length (constant); every overlap is a grouped
min-sum on (pair, gram) — the candidates-only design, never
corpus×corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_M = 64  # sample size -> 32 pairs

#: (pair_id, side a/b, gram, n) for unigrams and bigrams + lengths
_GRAM_SQL = f"""
    sample AS (
        SELECT doc_id, text,
               row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)))
                   AS rk
        FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT {_M}
    ),
    docpairs AS (
        SELECT a.doc_id AS doc_ref, b.doc_id AS doc_cand,
               a.text AS t_ref, b.text AS t_cand
        FROM sample a JOIN sample b ON b.rk = a.rk + 1
        WHERE a.rk % 2 = 1
    ),
    toks AS (
        SELECT doc_ref, side,
               list_filter(regexp_split_to_array(trim(t), '\\s+'),
                           x -> x <> '') AS arr
        FROM (SELECT doc_ref, 'ref' AS side, t_ref AS t FROM docpairs
              UNION ALL
              SELECT doc_ref, 'cand', t_cand FROM docpairs)
    ),
    grams AS (
        SELECT doc_ref, side, 1 AS n_order,
               unnest(arr) AS gram
        FROM toks
        UNION ALL
        SELECT doc_ref, side, 2,
               arr[CAST(i AS INT)] || ' ' || arr[CAST(i AS INT) + 1]
        FROM toks, LATERAL (SELECT unnest(range(1, len(arr))) AS i)
    ),
    gcnt AS (
        SELECT doc_ref, n_order, gram,
               CAST(count(*) FILTER (side = 'ref') AS BIGINT) AS c_ref,
               CAST(count(*) FILTER (side = 'cand') AS BIGINT) AS c_cand
        FROM grams GROUP BY 1, 2, 3
    ),
    ov AS (
        SELECT doc_ref, n_order,
               sum(least(c_ref, c_cand)) AS clipped,
               sum(c_ref) AS tot_ref, sum(c_cand) AS tot_cand
        FROM gcnt GROUP BY 1, 2
    )"""


def _ov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_ref, n_order, clipped, tot_ref, tot_cand)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")))
    sample = (docs.select("doc_id", "text")
              .orderBy(F.md5(F.col("doc_id").cast("string")))
              .limit(_M)
              .withColumn("rk", F.row_number().over(w))
              .cache())
    a = sample.select(F.col("doc_id").alias("doc_ref"),
                      F.col("text").alias("t_ref"), F.col("rk"))
    b = sample.select(F.col("text").alias("t_cand"),
                      (F.col("rk") - 1).alias("rk"))
    docpairs = (a.filter(F.col("rk") % 2 == 1).join(b, "rk")
                .select("doc_ref", "t_ref", "t_cand"))
    sides = (docpairs.select("doc_ref", F.lit("ref").alias("side"),
                             F.col("t_ref").alias("t"))
             .unionByName(docpairs.select(
                 "doc_ref", F.lit("cand").alias("side"),
                 F.col("t_cand").alias("t"))))
    arr = F.filter(F.split(F.trim("t"), r"\s+"), lambda x: x != "")
    toks = sides.select("doc_ref", "side", arr.alias("arr")).cache()
    uni = toks.select("doc_ref", "side", F.lit(1).alias("n_order"),
                      F.explode("arr").alias("gram"))
    bigr = F.expr("transform(sequence(0, size(arr) - 2),"
                  " i -> concat(arr[i], ' ', arr[i + 1]))")
    bi = (toks.filter(F.size("arr") >= 2)
          .select("doc_ref", "side", F.lit(2).alias("n_order"),
                  F.explode(bigr).alias("gram")))
    grams = uni.unionByName(bi)
    gcnt = (grams.groupBy("doc_ref", "n_order", "gram")
            .agg(F.sum(F.when(F.col("side") == "ref", 1).otherwise(0))
                 .alias("c_ref"),
                 F.sum(F.when(F.col("side") == "cand", 1).otherwise(0))
                 .alias("c_cand")))
    return (gcnt.groupBy("doc_ref", "n_order")
            .agg(F.sum(F.least("c_ref", "c_cand")).alias("clipped"),
                 F.sum("c_ref").alias("tot_ref"),
                 F.sum("c_cand").alias("tot_cand")))


@query(
    "rouge_doc_pairs",
    oracle=f"""
    WITH {_GRAM_SQL}
    SELECT doc_ref,
           CAST(max(CASE WHEN n_order = 1 THEN clipped END) AS BIGINT)
               AS overlap_1,
           round(max(CASE WHEN n_order = 1 THEN
                 2.0 * clipped / (tot_ref + tot_cand) END), 6)
               AS rouge1_f1,
           round(max(CASE WHEN n_order = 2 THEN
                 2.0 * clipped / (tot_ref + tot_cand) END), 6)
               AS rouge2_f1
    FROM ov GROUP BY doc_ref ORDER BY doc_ref
    """,
)
def rouge_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/ROUGE-2 F1 per md5-adjacent doc pair: F1 =
    2·clip/(|ref grams| + |cand grams|) — the harmonic mean of clipped
    recall and precision collapses to this one-term form.

    Scale: bounded 32-pair gram frames; grouped min-sums."""
    ov = _ov(spark, sf_dir)

    def f1(order):
        return F.max(F.when(
            F.col("n_order") == order,
            2.0 * F.col("clipped")
            / (F.col("tot_ref") + F.col("tot_cand"))))

    return (ov.groupBy("doc_ref")
            .agg(F.max(F.when(F.col("n_order") == 1, F.col("clipped")))
                 .cast("long").alias("overlap_1"),
                 F.round(f1(1), 6).alias("rouge1_f1"),
                 F.round(f1(2), 6).alias("rouge2_f1"))
            .orderBy("doc_ref"))


@query(
    "bleu_doc_pairs",
    oracle=f"""
    WITH {_GRAM_SQL},
    wide AS (
        SELECT doc_ref,
               max(CASE WHEN n_order = 1 THEN clipped END) AS c1,
               max(CASE WHEN n_order = 1 THEN tot_cand END) AS t1,
               max(CASE WHEN n_order = 1 THEN tot_ref END) AS len_ref,
               max(CASE WHEN n_order = 2 THEN clipped END) AS c2,
               max(CASE WHEN n_order = 2 THEN tot_cand END) AS t2
        FROM ov GROUP BY doc_ref
    )
    SELECT doc_ref,
           round(CAST(c1 AS DOUBLE) / t1, 6) AS p1,
           round(CAST(c2 AS DOUBLE) / t2, 6) AS p2,
           round(least(1.0, exp(1.0 - CAST(len_ref AS DOUBLE) / t1)), 6)
               AS brevity_penalty,
           round(CASE WHEN c1 > 0 AND c2 > 0 THEN
                 least(1.0, exp(1.0 - CAST(len_ref AS DOUBLE) / t1))
                 * sqrt((CAST(c1 AS DOUBLE) / t1)
                        * (CAST(c2 AS DOUBLE) / t2))
                 ELSE 0.0 END, 6) AS bleu2
    FROM wide ORDER BY doc_ref
    """,
)
def bleu_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 per md5-adjacent doc pair (first doc = reference, second
    = candidate): clipped unigram/bigram precisions, brevity penalty
    off unigram lengths, geometric mean; 0 when either precision is 0
    (unsmoothed, documented).

    Scale: same bounded gram frames pivoted to one row per pair."""
    ov = _ov(spark, sf_dir)

    def pick(order, col):
        return F.max(F.when(F.col("n_order") == order, F.col(col)))

    wide = ov.groupBy("doc_ref").agg(
        pick(1, "clipped").alias("c1"), pick(1, "tot_cand").alias("t1"),
        pick(1, "tot_ref").alias("len_ref"),
        pick(2, "clipped").alias("c2"), pick(2, "tot_cand").alias("t2"))
    p1 = F.col("c1").cast("double") / F.col("t1")
    p2 = F.col("c2").cast("double") / F.col("t2")
    bp = F.least(F.lit(1.0),
                 F.exp(1.0 - F.col("len_ref").cast("double")
                       / F.col("t1")))
    return (wide.select(
        "doc_ref",
        F.round(p1, 6).alias("p1"), F.round(p2, 6).alias("p2"),
        F.round(bp, 6).alias("brevity_penalty"),
        F.round(F.when((F.col("c1") > 0) & (F.col("c2") > 0),
                       bp * F.sqrt(p1 * p2)).otherwise(F.lit(0.0)), 6)
        .alias("bleu2"))
        .orderBy("doc_ref"))
