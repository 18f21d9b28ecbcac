"""BM25 ranked retrieval over the documents corpus — keyword search as a
distributed aggregation (Robertson & Sparck Jones probabilistic
relevance; the Okapi BM25 form with the +1 idf smoothing used by Lucene).

Spark-first shape — no inverted index is materialized, the score is three
aggregations over one corpus scan:

- per-doc term frequencies are computed AFTER filtering the exploded
  token stream to the query's terms, so the shuffle carries only
  |docs-with-query-terms| x |query| rows, not the full token stream;
- corpus stats (N, avgdl) are a 1-row aggregate broadcast back via
  crossJoin;
- document-frequency/idf per query term is an O(|query|)-row frame,
  also broadcast.

At 100 TB this is scan-bound with tiny shuffles. For repeated query
workloads a real deployment would persist the (term -> postings)
aggregate bucketed by term — the same plan with stage one cached.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from predictor_spark.operators.text import tokens_col


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a bag of query terms.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))

    Returns (id, score) for every document matching >= 1 query term.
    """
    terms = [str(t) for t in query_terms]
    toks = tokens_col(text_col)
    lengths = docs.select(F.col(id_col), F.size(toks).cast("double").alias("dl"))
    corpus = lengths.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = df_t.crossJoin(broadcast(corpus)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    partial = (
        tf.join(broadcast(idf), "term")
        .join(lengths, id_col)
        .select(
            F.col(id_col),
            (
                F.col("idf")
                * F.col("tf") * (k1 + 1.0)
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
    )
    return partial.groupBy(id_col).agg(F.sum("s").alias("score"))
