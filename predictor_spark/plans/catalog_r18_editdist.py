"""Catalog part — edit-distance near-duplicate analysis (STAGED r11).

The dedup ladder (exact md5, MinHash/LSH Jaccard, SimHash, n-gram
Jaccard, embedding cosine, ExactSubstr spans) lacks the CHARACTER-level
metric record-linkage systems verify with: Levenshtein distance —
built-in on BOTH engines (Spark ``F.levenshtein``, DuckDB
``levenshtein``), so the verify leg runs JVM-side with no UDF.

- editdist_near_pairs    top-10 most-similar document pairs among the
                         64 lowest-md5 docs by normalized edit
                         similarity 1 - lev(a,b)/max(len) over each
                         doc's first 120 characters — the post-LSH
                         verify leg as a standalone, inspectable result
- editdist_histogram     the full similarity histogram of those
                         64·63/2 pairs in 10 equal bins — the
                         separation picture (near-dup shoulder vs
                         random-text bulk) a threshold is tuned on

Determinism: the sample is the md5-lowest idiom; Levenshtein is an
exact integer; similarities are rationals of exact integers rounded
6 dp; pair ties break on (doc_id_a, doc_id_b), bins are half-open
[i/10, (i+1)/10) with 1.0 clamped to the top bin.

Scale: the corpus scans once to build the bounded 64-doc sample (a
TakeOrdered over md5); the 2016-pair frame is a broadcast self-join of
the truncated prefixes — at 100 TB this is exactly the post-blocking
verify shape (candidates only, never all-pairs over the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_M = 64     # md5-sample size
_PFX = 120  # compared prefix length

_PAIR_SQL = f"""
    sample AS (
        SELECT doc_id, substr(text, 1, {_PFX}) AS pfx
        FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT {_M}
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(a.pfx, b.pfx) AS dist,
               greatest(len(a.pfx), len(b.pfx)) AS maxlen
        FROM sample a JOIN sample b ON a.doc_id < b.doc_id
    ),
    sims AS (
        SELECT doc_a, doc_b, dist,
               1.0 - CAST(dist AS DOUBLE) / maxlen AS sim
        FROM pairs WHERE maxlen > 0
    )"""


def _sims(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # cached: both pair legs reuse the 64-doc sample (one corpus scan)
    sample = (docs.select("doc_id",
                          F.substring("text", 1, _PFX).alias("pfx"))
              .orderBy(F.md5(F.col("doc_id").cast("string")))
              .limit(_M)
              .cache())
    a = sample.select(F.col("doc_id").alias("doc_a"),
                      F.col("pfx").alias("pa"))
    b = sample.select(F.col("doc_id").alias("doc_b"),
                      F.col("pfx").alias("pb"))
    pairs = (a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b",
                     F.levenshtein("pa", "pb").alias("dist"),
                     F.greatest(F.length("pa"), F.length("pb"))
                     .alias("maxlen")))
    return (pairs.filter(F.col("maxlen") > 0)
            .select("doc_a", "doc_b", "dist",
                    (1.0 - F.col("dist").cast("double")
                     / F.col("maxlen")).alias("sim")))


@query(
    "editdist_near_pairs",
    oracle=f"""
    WITH {_PAIR_SQL},
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY sim DESC, doc_a, doc_b)
                   AS rnk
        FROM sims
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, doc_a, doc_b,
           CAST(dist AS BIGINT) AS edit_distance,
           round(sim, 6) AS similarity
    FROM ranked WHERE rnk <= 10 ORDER BY rnk
    """,
)
def editdist_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-similar doc pairs (normalized Levenshtein over
    120-char prefixes) among the 64 md5-lowest docs — the character-
    level verify leg of the dedup ladder, JVM-side via the built-in.

    Scale: one corpus scan -> bounded sample; 2016 broadcast pairs."""
    sims = _sims(spark, sf_dir)
    wr = Window.orderBy(F.col("sim").desc(), "doc_a", "doc_b")
    return (sims.withColumn("rnk", F.row_number().over(wr).cast("long"))
            .filter(F.col("rnk") <= 10)
            .select("rnk", "doc_a", "doc_b",
                    F.col("dist").cast("long").alias("edit_distance"),
                    F.round("sim", 6).alias("similarity"))
            .orderBy("rnk"))


@query(
    "editdist_histogram",
    oracle=f"""
    WITH {_PAIR_SQL}
    SELECT CAST(least(CAST(floor(sim * 10) AS BIGINT), 9) AS BIGINT)
               AS bin,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(min(sim), 6) AS min_sim,
           round(max(sim), 6) AS max_sim
    FROM sims GROUP BY 1 ORDER BY 1
    """,
)
def editdist_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity histogram of all sample pairs in 10 equal bins
    (sim = 1.0 clamps to bin 9) with each bin's min/max — the
    threshold-tuning view: near-dups shoulder at the top bins, the
    random-text bulk at the bottom.

    Scale: same bounded pair frame, one aggregate."""
    sims = _sims(spark, sf_dir)
    return (sims.select(
        F.least(F.floor(F.col("sim") * 10).cast("long"), F.lit(9))
        .cast("long").alias("bin"), "sim")
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
             F.round(F.min("sim"), 6).alias("min_sim"),
             F.round(F.max("sim"), 6).alias("max_sim"))
        .orderBy("bin"))
