"""Deduplication operator family for LLM-data pipelines (BASELINE.json):
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point of these at 100 TB):
- exact dedup: one hash-shuffle groupBy on the content key; no pairwise
  anything.
- n-gram Jaccard: exact pairwise similarity — O(pairs); only usable after
  candidate pruning. Exposed standalone for oracle checking and as the
  verify stage of LSH.
- MinHash+LSH: linear-cost signatures (one explode + groupBy), candidate
  generation by band-bucket join (shuffle on band key — skew-safe because
  bucket sizes are bounded by near-dup cluster size, and AQE splits hot
  buckets), exact-Jaccard verification only on candidates. This is the
  100 TB dedup path.
- SimHash: constant-size signature per doc; near-dup = small Hamming
  distance; bucket by bit-bands like MinHash.

Hashes use the engine-portable md5-prefix scheme (operators/text.py) when
``portable=True`` so a DuckDB oracle reproduces results bit-for-bit;
production swaps xxhash64 in (same topology, cheaper hash).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from predictor_spark.operators.text import portable_hash, shingles_col

#: modulus for the universal-hash family (a*h + b) % MOD; prime, and small
#: enough that a*h fits in int64 for 28-bit h and 31-bit a.
MOD = 1_000_000_007


def _perm_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per permutation — odd multipliers, fixed seed-free
    sequence so Spark and any oracle derive identical families."""
    return [(2 * k + 1, 12_345 + 7 * k) for k in range(1, num_perm + 1)]


def exact_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Exact deduplication — keep the min-id row per identical key.

    One groupBy shuffle on the content hash. For wide keys, pre-hash with
    md5/xxhash64 so the shuffle key is 16 bytes, not the document."""
    key = F.md5(F.concat_ws("", *[F.col(c) for c in key_cols]))
    return (
        df.withColumn("__key", key)
        .groupBy("__key")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__key")
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct n-gram shingles.

    Repartitions by id first: a small parquet file arrives as ONE input
    split, which would serialize the CPU-heavy tokenize+explode on a
    single core; the cheap pre-shuffle (doc ids + text only) spreads it
    across the cluster and co-locates each doc's shingles for the
    downstream per-doc aggregates."""
    return df.select(id_col, text_col).repartition(F.col(id_col)).select(
        F.col(id_col), F.explode(shingles_col(text_col, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above ``threshold``.

    |A∩B| via self-join on shingle; |A∪B| = |A| + |B| - |A∩B|.
    Quadratic in cluster size — at scale, run AFTER LSH candidate pruning
    (see minhash_lsh_pairs); standalone here it is the ground-truth oracle.
    """
    sh = shingle_sets(df, id_col, text_col, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("set_size", "size_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("set_size", "size_b")
    out = (
        inter.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 16,
) -> DataFrame:
    """MinHash signatures: sig_k = min over shingles of (a_k*h + b_k) % MOD.

    One explode + one groupBy with num_perm min() aggregates — linear in
    corpus size, partial-aggregated map-side. h is the portable 28-bit
    md5-prefix hash (swap portable_hash -> xxhash64 & a wider MOD for the
    pure-scale path)."""
    sh = shingle_sets(df, id_col, text_col, n)
    sh = sh.withColumn("h", portable_hash(F.col("shingle")))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MOD)).alias(f"mh_{k}")
        for k, (a, b) in enumerate(_perm_params(num_perm))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified with exact Jaccard.

    Pipeline: signatures (linear) -> band keys (rows_per_band = num_perm /
    bands) -> candidate pairs = docs sharing any band bucket (shuffle join
    on the band key) -> exact n-gram Jaccard ONLY on candidates ->
    threshold filter.

    Output = (id_a, id_b, jaccard) for candidate pairs with jaccard >=
    threshold. Deterministic given the fixed permutation family, so a SQL
    oracle mirrors it exactly (including LSH's recall misses — this checks
    the ALGORITHM, while ngram_jaccard_pairs checks the semantics)."""
    rows_per_band = num_perm // bands
    assert rows_per_band * bands == num_perm
    sh = shingle_sets(df, id_col, text_col, n).cache()
    # materialize the cache NOW: four downstream branches (signatures,
    # sizes, both verify sides) otherwise race to compute it concurrently
    # inside one job and each re-runs the tokenize+explode
    sh.count()
    hashed = sh.withColumn("h", portable_hash(F.col("shingle")))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MOD)).alias(f"mh_{k}")
        for k, (a, b) in enumerate(_perm_params(num_perm))
    ]
    sig = hashed.groupBy(id_col).agg(*aggs)

    band_structs = F.array(*[
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws("_", *[F.col(f"mh_{bi * rows_per_band + r}") for r in range(rows_per_band)]).alias("bkey"),
        )
        for bi in range(bands)
    ])
    banded = sig.select(F.col(id_col), F.explode(band_structs).alias("x")).select(
        id_col, "x.band", "x.bkey"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    # exact-Jaccard verify on CANDIDATES ONLY (the whole point of LSH:
    # never touch non-candidate pairs). cands ⋈ shingles(a) ⋈ shingles(b)
    # costs |candidate pairs| x shingles-per-doc, not |docs|^2.
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a_sh = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b_sh = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cands.join(a_sh, "id_a")
        .join(b_sh, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("set_size", "size_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("set_size", "size_b")
    return (
        inter.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 24,
) -> DataFrame:
    """SimHash signature per document (token-level, unweighted).

    bit_j(doc) = 1 iff sum over tokens of (+1 if bit j of hash(token) else
    -1) > 0. Implemented as explode(tokens) x explode(bit positions) ->
    groupBy — pure relational, portable hashes. 24 bits keeps the bit
    explode cheap; production uses xxhash64 + 64 bits via bitwise aggs."""
    from predictor_spark.operators.text import tokens_col

    toks = df.select(id_col, text_col).repartition(F.col(id_col)).select(
        F.col(id_col), F.explode(F.array_distinct(tokens_col(text_col))).alias("tok")
    )
    toks = toks.withColumn("h", portable_hash(F.col("tok")))
    bit_idx = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    bitsdf = toks.select(id_col, "h", bit_idx)
    # bit test via floor(h / 2^bit) % 2 — portable to any SQL engine and
    # exact for 28-bit h in double arithmetic
    bit_set = (F.floor(F.col("h") / F.pow(F.lit(2.0), F.col("bit").cast("double"))) % 2) == 1
    bitsdf = bitsdf.withColumn("vote", F.when(bit_set, 1).otherwise(-1))
    return (
        bitsdf.groupBy(id_col, "bit")
        .agg(F.sum("vote").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("bitval") * F.pow(F.lit(2.0), F.col("bit").cast("double")).cast("bigint"))
            .cast("bigint")
            .alias("simhash")
        )
    )
