"""Catalog part — training-data-pipeline curation rows beyond the
reference surface (operators/datapipe.py): sequence packing, benchmark
contamination screening, mixture-targeted stratified sampling. These are
the steps an LLM data pipeline runs between dedup/quality filtering and
tokenizer sharding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.operators import datapipe, text
from predictor_spark.plans.catalog import query, _t

_NTOK = r"CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)"


@query(
    "pack_sequences_summary",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, {_NTOK} AS n_tokens FROM documents
    ), packed AS (
        SELECT lang, doc_id, n_tokens,
               CAST(floor(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 200.0) AS BIGINT) AS seq_id
        FROM toks
    )
    SELECT lang, seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
    FROM packed GROUP BY lang, seq_id ORDER BY lang, seq_id
    """,
)
def pack_sequences_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential greedy packing of documents into 200-token training
    sequences, sharded by language: doc -> bin floor(cum_tokens_before /
    budget). One window shuffle; the summary is the per-(shard, bin) fill
    profile a tokenizer-sharding stage would consume."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(text.tokens_col("text")).cast("bigint").alias("n_tokens")
    )
    packed = datapipe.pack_sequences(docs, "doc_id", "n_tokens", "lang", budget=200)
    return (
        packed.groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .orderBy("lang", "seq_id")
    )


@query(
    "contamination_ngram_overlap",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(a) - 1),
                          i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
            FROM toks
        )
    ),
    csh AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
    bsh AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
    sizes AS (SELECT doc_id, count(*) AS set_size FROM csh GROUP BY doc_id),
    common AS (
        SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id, count(*) AS n_common
        FROM csh c JOIN bsh b ON c.shingle = b.shingle
        GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT corpus_id, bench_id, n_common,
           round(CAST(n_common AS DOUBLE) / set_size, 6) AS overlap_frac
    FROM common JOIN sizes ON sizes.doc_id = corpus_id
    ORDER BY corpus_id, bench_id
    """,
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination screen: corpus docs sharing >= 2 distinct
    word 3-grams with a benchmark doc (here: every 50th doc plays the
    benchmark). Benchmark side broadcast — at 100 TB the corpus streams
    through one scan; the only shuffle is keyed on (corpus, bench) pairs."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    out = datapipe.contamination_pairs(corpus, bench, "doc_id", "text",
                                       n=3, min_common=2)
    return out.select(
        "corpus_id", "bench_id", "n_common",
        F.round("overlap_frac", 6).alias("overlap_frac"),
    ).orderBy("corpus_id", "bench_id")


@query(
    "mixture_stratified_sample",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, {_NTOK} AS n_tokens FROM documents
    ), totals AS (
        SELECT lang, COUNT(*) AS total_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM toks GROUP BY lang
    ), rates AS (
        SELECT lang, total_docs, total_tokens,
               CAST(floor(CAST((SELECT MIN(total_tokens) FROM totals) AS DOUBLE)
                          / total_tokens * 1000) AS BIGINT) AS keep_permille
        FROM totals
    ), kept AS (
        SELECT t.lang, t.n_tokens FROM toks t
        JOIN rates r ON r.lang = t.lang
        WHERE (t.doc_id * 2654435761) % 4294967296 % 1000 < r.keep_permille
    )
    SELECT r.lang, r.total_docs, r.total_tokens, r.keep_permille,
           COUNT(*) AS kept_docs,
           CAST(SUM(k.n_tokens) AS BIGINT) AS kept_tokens
    FROM kept k JOIN rates r ON r.lang = k.lang
    GROUP BY 1, 2, 3, 4 ORDER BY r.lang
    """,
)
def mixture_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing: deterministically downsample every language to
    the token budget of the smallest one (keep iff Knuth-scrambled
    doc_id mod 1000 < floor(rate * 1000) — reproducible across
    runs/engines, no rand(), uniform even for dense sequential ids).
    Two aggregates + a broadcast of the O(#strata) rate table."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(text.tokens_col("text")).cast("bigint").alias("n_tokens")
    )
    _, summary = datapipe.mixture_sample(docs, "lang", "n_tokens", "doc_id", mod=1000)
    return summary.orderBy("lang")


@query(
    "bm25_search_topk",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents
    ), lengths AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS dl
        FROM documents
    ), corpus AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM lengths
    ), tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM toks WHERE term IN ('hash', 'join', 'scan')
        GROUP BY doc_id, term
    ), idf AS (
        SELECT term, ln(1.0 + (c.n_docs - df + 0.5) / (df + 0.5)) AS idf, c.avgdl
        FROM (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term), corpus c
    ), scores AS (
        SELECT t.doc_id,
               SUM(i.idf * t.tf * 2.2
                   / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / i.avgdl))) AS score
        FROM tf t JOIN idf i USING (term) JOIN lengths l USING (doc_id)
        GROUP BY t.doc_id
    )
    SELECT doc_id, round(score, 6) AS score
    FROM scores ORDER BY round(score, 6) DESC, doc_id LIMIT 20
    """,
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search (query: "hash join scan"), top-20 by score.
    Three aggregations over one corpus scan; the exploded token stream is
    filtered to the query terms BEFORE any shuffle and the corpus/idf
    scalars are broadcast. Deterministic cut: rounded score desc, doc_id."""
    from predictor_spark.operators.retrieval import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    out = bm25_scores(docs, ["hash", "join", "scan"], "doc_id", "text")
    return (
        out.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


@query(
    "dataset_split_assignment",
    oracle="""
    SELECT split, lang, count(*) AS n_docs
    FROM (
        SELECT lang,
               CASE WHEN pct < 80 THEN 'train'
                    WHEN pct < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT lang,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                        AS BIGINT) % 100 AS pct
            FROM documents
        )
    )
    GROUP BY split, lang
    """,
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-stable
    hash of the document id (md5 prefix mod 100) — the split every
    training pipeline needs: reproducible across runs and engines, no
    shuffle-order dependence, no RNG state.  Reported as per-(split,
    lang) counts so skew between splits is visible.

    Scale: pure projection + partial-agg groupBy; the hash is the same
    portable md5-prefix idiom the winnowing fingerprints use.  Adding a
    stratification key just extends the GROUP BY.
    """
    docs = _t(spark, sf_dir, "documents")
    pct = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 100
    )
    return (
        docs.select(
            "lang",
            F.when(pct < 80, "train").when(pct < 90, "val")
             .otherwise("test").alias("split"),
        )
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "weighted_sample_docs",
    oracle="""
    SELECT doc_id, lang, round(k, 6) + 0.0 AS sample_key
    FROM (
        SELECT doc_id, lang,
               ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                        AS BIGINT) + 1.0) / 268435457.0)
                   / n_chars AS k
        FROM documents
    )
    ORDER BY k DESC, doc_id LIMIT 50
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, top-50 by length weight —
    the Efraimidis-Spirakis (2006) one-pass reservoir law: draw
    u~U(0,1) per item, keep the k largest u^(1/w), equivalently the
    largest ln(u)/w.  The uniform comes from the md5-prefix of the id
    (u = (h+1)/(2^28+1)), so the sample is deterministic, engine-
    independent, and reproducible across runs — no RNG state to ship.

    Scale: pure projection + TakeOrderedAndProject — the canonical
    distributed reservoir: each partition keeps its top-50, the driver
    merges |partitions|·50 candidates.  Weights change per policy by
    swapping the `w` column (quality score, token count, domain boost).
    """
    docs = _t(spark, sf_dir, "documents")
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7),
                16, 10).cast("double") + 1.0) / 268435457.0
    k = F.log(u) / F.col("n_chars")
    return (
        docs.select("doc_id", "lang", k.alias("k"))
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(50)
        .select("doc_id", "lang",
                (F.round("k", 6) + F.lit(0.0)).alias("sample_key"))
    )
