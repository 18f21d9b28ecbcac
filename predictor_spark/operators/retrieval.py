"""BM25 ranked retrieval over the documents corpus — keyword search as a
distributed aggregation (Robertson & Sparck Jones probabilistic
relevance; the Okapi BM25 form with the +1 idf smoothing used by Lucene).

Spark-first shape — no inverted index is materialized, no shuffle ever
carries a token row:

- ONE map-side projection computes each document's length and its exact
  per-query-term frequencies straight off the token array
  (size(t) - size(array_remove(t, term))), so the token stream is never
  exploded;
- corpus stats (N, avgdl) and per-term document frequencies are a single
  1-row aggregate of that projection, broadcast back via crossJoin;
- the per-document score is then a pure map-side expression over the
  matched docs.

At 100 TB this is scan-bound: two corpus scans (the 1-row stats
aggregate + the scoring pass), zero data shuffles. For repeated query
workloads a real deployment would persist the per-doc (dl, tf) frame
bucketed by id — the same plan with stage one cached.
"""

from __future__ import annotations

import functools
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
    # dedupe while preserving order: the per-term tf columns below would
    # double-count a repeated query term, whereas the former exploded
    # groupBy(id, term) counted each distinct term once
    terms = list(dict.fromkeys(str(t) for t in query_terms))
    toks = tokens_col(text_col)
    # ONE map-side projection carries dl and every per-term tf:
    # tf_t = size(t) - size(array_remove(t, term)) counts exact
    # occurrences without exploding the token stream (the former shape
    # tokenized the corpus in five separate subtrees — lengths three
    # times, the exploded tf twice — and shuffled (id, term) rows;
    # guide §2.3/§2.4: aggregate before you shuffle / don't recompute).
    per_doc = docs.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("dl"),
        *[
            (F.size(toks) - F.size(F.array_remove(toks, t)))
            .cast("double")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    # corpus stats AND per-term document frequencies in one 1-row aggregate
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    matched = per_doc.filter(
        functools.reduce(
            lambda a, c: a | c, [F.col(f"tf_{i}") > 0 for i in range(len(terms))]
        )
    )
    denom_tail = k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    score = None
    for i in range(len(terms)):
        tf_i, df_i = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf_i = F.log(
            F.lit(1.0) + (F.col("n_docs") - df_i + 0.5) / (df_i + 0.5)
        )
        s_i = F.when(
            tf_i > 0,
            idf_i * tf_i * (k1 + 1.0) / (tf_i + denom_tail),
        ).otherwise(F.lit(0.0))
        score = s_i if score is None else score + s_i
    return matched.crossJoin(broadcast(stats)).select(
        F.col(id_col), score.alias("score")
    )
