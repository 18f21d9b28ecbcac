"""Training-data-pipeline operators beyond the reference's own surface:
sequence packing, benchmark-contamination checking, and mixture-targeted
stratified sampling — the curation steps an LLM data pipeline runs after
dedup/quality filtering (operators/dedup.py, operators/text.py).

All three are pure DataFrame compositions — no Python UDFs — so they
inherit whole-stage codegen and AQE at 100 TB:

- pack_sequences: one window pass per shard (the shard column is the
  parallel axis — packing is sequential WITHIN a shard by construction,
  so shards must be sized for one executor's window state; lang/source/
  date are natural shards).
- contamination: shingle explode + equi-join where the benchmark side is
  tiny by definition (eval sets are KBs against TBs of corpus) and is
  broadcast — the corpus is scanned once, never shuffled on shingles.
- mixture sampling: two aggregates + a broadcast join of the per-stratum
  rate table (O(#strata) rows); the keep decision is a deterministic
  modulo on the document id, reproducible across runs and engines (no
  rand(), which would be seed/partitioning-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from predictor_spark.operators.dedup import _doc_shingles


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    shard_col: str,
    budget: int,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence by
    sequential greedy packing in id order within each shard: a document
    goes to bin floor(cumulative_tokens_before / budget). Documents are
    never split; bin boundaries fall on the budget grid, so a bin's fill
    deviates from the budget by at most one document's tokens in either
    direction (an overflowing doc eats into the next bin's capacity) —
    the standard streaming-packing compromise, fill in
    (budget - max_doc_tokens, budget + max_doc_tokens).

    Adds ``seq_id`` (bin index within shard). One shuffle (the window
    partitioning); everything else is a projection.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    return df.withColumn(
        "seq_id", F.floor(cum_before / F.lit(int(budget))).cast("bigint")
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_common: int = 2,
    corpus_shingles: DataFrame | None = None,
) -> DataFrame:
    """Flag corpus documents sharing >= min_common distinct word n-grams
    with any benchmark document (train/eval contamination screening).

    Output: (corpus_id, bench_id, n_common, overlap_frac) where
    overlap_frac = n_common / |corpus doc shingle set|.

    The benchmark side is broadcast: at 100 TB the corpus side streams
    through one scan + one partial-agg shuffle keyed on the (corpus,
    bench) pair — never on raw shingles.
    """
    # one shingle evaluation per corpus doc: carry |set| alongside the
    # exploded shingles (an int per row) instead of re-shingling the
    # corpus in a second branch — shingling is the md5/regex-bound cost.
    # corpus_shingles: a composing caller (curation pipeline) passes a
    # pre-computed (id, sh) frame so earlier stages' shingle work is
    # reused instead of re-derived from text.
    base = (corpus_shingles if corpus_shingles is not None
            else _doc_shingles(corpus, id_col, text_col, n))
    c_sh = base.select(
        F.col(id_col).alias("corpus_id"),
        F.size("sh").alias("set_size"),
        F.explode("sh").alias("shingle"),
    )
    b_sh = _doc_shingles(benchmark, id_col, text_col, n).select(
        F.col(id_col).alias("bench_id"), F.explode("sh").alias("shingle")
    )
    common = (
        c_sh.join(broadcast(b_sh), "shingle")
        .groupBy("corpus_id", "bench_id")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first("set_size").alias("set_size"),
        )
        .filter(F.col("n_common") >= min_common)
    )
    return common.select(
        "corpus_id",
        "bench_id",
        "n_common",
        (F.col("n_common") / F.col("set_size")).alias("overlap_frac"),
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    id_col: str,
    mod: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Deterministically downsample every stratum to the token budget of
    the SMALLEST stratum (uniform mixture — the degenerate case of a
    target-proportion table; pass a custom rates frame to generalize).

    rate_s = min_stratum_tokens / stratum_tokens; a document is kept iff
    ``scramble(id) % mod < floor(rate_s * mod)`` — reproducible,
    engine-independent (no rand()), and stable under repartitioning.
    scramble is Knuth's multiplicative hash ((id * 2654435761) mod 2^32,
    exact in int64 for ids < ~3.4e9) so sequential ids sample uniformly;
    a raw ``id % mod`` would be badly skewed whenever ids are dense.

    Returns (kept_docs, per-stratum summary with thresholds and realized
    kept counts/tokens).
    """
    # cached (r14, guide §2.4): totals is O(#strata) rows but is
    # referenced by target, rates AND the summary join — un-cached, each
    # reference re-ran the full tokenize+aggregate scan of df (the plan
    # audit showed FIVE document scans for the registered row; cached
    # it is the minimum two: one aggregate pass to learn the rates, one
    # pass to apply them).
    # Lifetime (ADVICE r14): the cache is INTENTIONALLY left pinned —
    # the returned frames are lazy and consume it at the caller's
    # action, so an in-function unpersist would re-expand the scans.
    # The entry is O(#strata) rows and evicts LRU under pressure;
    # callers that materialize eagerly may unpersist it via
    # kept.sparkSession.catalog.clearCache() at their own scope.
    totals = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(F.col(token_col)).alias("total_tokens"),
    ).cache()
    target = totals.agg(F.min("total_tokens").alias("target_tokens"))
    rates = totals.crossJoin(broadcast(target)).withColumn(
        "keep_permille",
        F.floor(F.col("target_tokens") / F.col("total_tokens") * mod).cast("bigint"),
    )
    bucket = F.pmod(
        F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(4294967296)), F.lit(mod)
    )
    kept = df.join(broadcast(rates.select(strata_col, "keep_permille")), strata_col).filter(
        bucket < F.col("keep_permille")
    )
    summary = (
        kept.groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum(F.col(token_col)).alias("kept_tokens"),
        )
        .join(rates, strata_col)
        .select(
            strata_col,
            "total_docs",
            "total_tokens",
            "keep_permille",
            "kept_docs",
            "kept_tokens",
        )
    )
    return kept, summary
