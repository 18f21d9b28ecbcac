"""Similarity search over embedding columns (BASELINE.json north star).

Two paths:
- brute-force cosine top-k: exact; crossJoin(queries x corpus) with the
  query side broadcast. Cost O(|Q| * |corpus|) — right whenever |Q| is
  small (the common "find neighbors of these docs" shape) because the
  corpus is streamed once, never shuffled.
- hyperplane-LSH bucketed top-k: random-hyperplane signs bucket the
  corpus; candidates share a bucket -> exact cosine only on candidates.
  Sub-linear per query at the cost of recall. Hyperplanes are generated
  DETERMINISTICALLY from (plane, dim) via sin() so any engine reproduces
  them (no RNG state) — the engine-parity analog of a seeded Gaussian.

Both stay JVM-side: dot products via zip_with + aggregate on array<double>
(no Python). For billion-scale corpora the same topology holds: broadcast
queries, mapPartitions-local top-k (here: groupBy row_number), then a
|Q|*k-row shuffle — never a corpus-wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def as_double_vec(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k: for every query vector, the k
    nearest corpus vectors (self excluded).

    Output: (query_id, neighbor_id, cosine, rank). Rank is computed over
    the ROUNDED score with neighbor-id tie-break, so the result is
    engine-deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    if round_dp is not None:
        cos = F.round(cos, round_dp)
    pairs = pairs.withColumn("cosine", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_signature(vec: Column, n_planes: int, dim: int) -> Column:
    """Deterministic random-hyperplane sign signature as a bit-string key.

    plane_p[d] = sin(1000*p + d) — fixed pseudo-random directions shared
    with the oracle. sign bit = 1 iff dot(vec, plane_p) > 0.
    """
    def _plane(p: int) -> Column:
        # single-arg lambda (two-arg lambdas receive the array index)
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.sin(F.lit(1000.0 * (p + 1)) + d.cast("double")),
        )

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, _plane(p), lambda x, h: x * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = 6,
) -> DataFrame:
    """Bucketed approximate cosine top-k: candidates = corpus vectors whose
    hyperplane signature equals the query's; exact cosine + rank within the
    bucket. Recall < 1 by construction (single-probe); the deterministic
    planes make the approximation itself oracle-checkable."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv")
    )
    q = q.withColumn("sig", hyperplane_signature(F.col("qv"), n_planes, dim)).withColumn("qn", _norm(F.col("qv")))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv")
    )
    c = c.withColumn("sig", hyperplane_signature(F.col("cv"), n_planes, dim)).withColumn("cn", _norm(F.col("cv")))
    pairs = c.join(F.broadcast(q), "sig").filter(F.col("neighbor_id") != F.col("query_id"))
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    if round_dp is not None:
        cos = F.round(cos, round_dp)
    pairs = pairs.withColumn("cosine", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
