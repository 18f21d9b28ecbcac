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


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.42,
    n_planes: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection (BASELINE.json dedup
    family): all unordered pairs (a < b) with cosine >= ``threshold``,
    candidate-blocked by hyperplane-LSH signature so the corpus is never
    fully cross-joined.

    Scale: the self-join shuffles the corpus ONCE by signature bucket;
    pair generation and the exact-cosine filter run per bucket. With
    ``n_planes`` planes the candidate set shrinks ~2^n_planes-fold at the
    cost of recall on far-apart near-dups (raise n_planes for tighter
    thresholds — higher cosine => higher same-bucket probability). Output:
    (vec_id_a, vec_id_b, cosine).
    """
    c = emb.select(F.col(id_col).alias("vid"), as_double_vec(vec_col).alias("v"))
    c = c.withColumn("sig", hyperplane_signature(F.col("v"), n_planes, dim)).withColumn(
        "n", _norm(F.col("v"))
    )
    a = c.select(F.col("vid").alias("vec_id_a"), F.col("v").alias("va"),
                 F.col("n").alias("na"), "sig")
    b = c.select(F.col("vid").alias("vec_id_b"), F.col("v").alias("vb"),
                 F.col("n").alias("nb"), "sig")
    pairs = a.join(b, "sig").filter(F.col("vec_id_a") < F.col("vec_id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    if round_dp is not None:
        cos = F.round(cos, round_dp)
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("vec_id_a", "vec_id_b", "cosine")
    )


def ivf_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_iter: int = 2,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = 6,
    dim: int = 64,
    dist_dp: int = 6,
    centroid_dp: int = 8,
) -> DataFrame:
    """IVF approximate top-k with a REAL coarse quantizer: k-means
    (operators/kmeans.kmeans_fit, deterministic lowest-id init, rounded
    updates so a SQL oracle replays the fit) partitions the corpus into
    inverted lists; each query probes its ``nprobe`` nearest lists and
    reranks exactly (cosine) within them.

    Scale: the quantizer fit touches the corpus ``n_iter`` times with
    map-side broadcast-literal assignment + one K x dim aggregate per
    pass (driver holds only the K x dim centroid matrix); at query time
    centroids broadcast, list assignment is map-side, and the only
    shuffle is the corpus hash-partitioned by centroid id — its natural
    storage layout for repeated querying. Probing nprobe of C lists scans
    ~nprobe/C of the corpus per query; recall rises with nprobe (the
    classical IVF trade-off), unlike the round-1 lowest-id stub whose
    recall was accidental.
    """
    from predictor_spark.operators.kmeans import _sqdist, kmeans_fit

    cents, assigned = kmeans_fit(
        emb, k=n_centroids, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
        dim=dim, assign_dp=dist_dp, centroid_dp=centroid_dp,
    )

    # corpus inverted lists = the fit's own final assignment — already a
    # map-side broadcast-literal argmin over the final centroids (carries
    # the vector too, so no corpus self-join is needed)
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("cluster").alias("cent_id"),
    ).withColumn("cn", _norm(F.col("cv")))

    # queries probe their nprobe nearest centroids (same rounded-L2 metric
    # as the fit, ties to the lowest centroid id)
    q = queries.select(F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv"))
    q = q.withColumn("__d", F.array(*[F.round(_sqdist(F.col("qv"), cv), dist_dp)
                                      for cv in cents]))
    q = q.select("query_id", "qv", F.posexplode("__d").alias("cent_id", "qd"))
    wq = Window.partitionBy("query_id").orderBy("qd", "cent_id")
    q = (
        q.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "qv", "cent_id")
        .withColumn("qn", _norm(F.col("qv")))
    )

    pairs = c.join(F.broadcast(q), "cent_id").filter(F.col("neighbor_id") != F.col("query_id"))
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
