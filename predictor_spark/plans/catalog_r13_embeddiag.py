"""Catalog part — embedding-space diagnostics (STAGED for r9).

The ANN ladder (brute force -> LSH -> IVF -> PQ) tells you how to
SEARCH an embedding space; these two rows tell you whether the space
is healthy enough to search — the diagnostics an embedding-quality
gate runs before anyone ships a retrieval index:

- intrinsic_dimension_twonn  TwoNN estimator (Facco et al. 2017,
                             Sci. Rep.): ID = n / sum ln(d2/d1) over
                             each point's two nearest neighbors — low
                             ID in a high-D space means the embeddings
                             live on a thin manifold
- knn_hubness_skew           k-occurrence skewness (Radovanovic et al.
                             2010, JMLR): how often each point appears
                             in others' 5-NN lists; a heavily right-
                             skewed N_k distribution marks hub points
                             that poison retrieval

Both run on the _DIAG_N lowest-md5 vectors (the PQ/_EVAL_N bounded-
sample idiom — the all-pairs distance table is quadratic BY DESIGN and
must never see the full corpus; at 100 TB the sample is the estimator,
as in the papers' own experiments).

Determinism: squared L2 distances fold the embedding arrays in a fixed
left-to-right order on both engines and are rounded (9 dp) BEFORE the
rank; neighbor ranks break ties on vec_id; each ln(d2^2/d1^2) term is
quantized to integer nano-units before summing; k-occurrence counts
are exact integers feeding exact moment sums.

Scale: |sample|^2 = ~260k distance rows — constant, independent of SF;
one rank window per query point; everything else is a tiny aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.operators.similarity import as_double_vec
from predictor_spark.plans.catalog import query, _t

_DIAG_N = 512
_K = 5  # hubness neighborhood size

#: oracle prelude: sampled all-pairs squared distances with per-query
#: neighbor ranks (ties on vec_id)
_PAIRS_SQL = f"""
    c AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_DIAG_N}
    ),
    pairs AS MATERIALIZED (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               round(list_sum(list_transform(range(1, len(a.v) + 1),
                     i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))), 9)
                   AS d2
        FROM c a JOIN c b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT qid, nid, d2,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY d2, nid) AS rn
        FROM pairs
    )
"""


def _ranked(spark: SparkSession, sf_dir: str, max_rank: int) -> DataFrame:
    """(qid, nid, d2, rn): sampled all-pairs squared distances with
    per-query neighbor ranks, truncated at max_rank — mirrors the
    oracle prelude expression-for-expression."""
    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id", as_double_vec("embedding").alias("v"))
           .withColumn("__h", F.md5(F.col("vec_id").cast("string")))
           .orderBy("__h", "vec_id").limit(_DIAG_N).drop("__h"))
    a = emb.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    b = emb.select(F.col("vec_id").alias("nid"), F.col("v").alias("nv"))
    # r14 (guide §4.1 — prefer codegen'd expressions): the zip_with +
    # aggregate higher-order pair distance ran INTERPRETED per element
    # (~17M lambda evaluations over the 512^2 pair grid).  Unrolled to
    # a static 64-term sum (the generator's fixed embedding dim,
    # TESTDATA.md) it whole-stage-codegens; the fold order is the same
    # left-to-right 0.0 + t1 + ... + t64, and element_at past the array
    # end yields NULL exactly like zip_with's padding, so every d2 is
    # bit-identical.
    _dim = 64
    d2_sum = F.lit(0.0)
    for _i in range(1, _dim + 1):
        _e = F.element_at("qv", _i) - F.element_at("nv", _i)
        d2_sum = d2_sum + _e * _e
    d2 = F.round(d2_sum, 9)
    pairs = (a.join(F.broadcast(b), F.col("qid") != F.col("nid"))
             .select("qid", "nid", d2.alias("d2")))
    w = Window.partitionBy("qid").orderBy("d2", "nid")
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= max_rank))


@query(
    "intrinsic_dimension_twonn",
    oracle=f"""
    WITH {_PAIRS_SQL},
    mu AS (
        SELECT qid,
               CAST(round(1e9 * 0.5 * ln(
                   max(CASE WHEN rn = 2 THEN d2 END)
                   / max(CASE WHEN rn = 1 THEN d2 END))) AS BIGINT)
                   AS t_nano
        FROM ranked WHERE rn <= 2
        GROUP BY qid
        HAVING max(CASE WHEN rn = 1 THEN d2 END) > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           round(CAST(count(*) AS DOUBLE)
                 / (CAST(sum(t_nano) AS DOUBLE) / 1e9), 6)
               AS intrinsic_dim,
           round(CAST(sum(t_nano) AS DOUBLE) / (1e9 * count(*)), 6)
               AS mean_log_mu
    FROM mu
    """,
)
def intrinsic_dimension_twonn(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """TwoNN intrinsic dimension over the bounded sample: per point,
    ln mu = 0.5 ln(d2^2/d1^2) from its two nearest neighbors (nano-
    quantized before the sum; zero-distance duplicates excluded), then
    the MLE ID = n / sum ln mu.  An ID far below the ambient dimension
    is the expected signature of real embedding manifolds."""
    r = _ranked(spark, sf_dir, 2)
    g = (r.groupBy("qid")
         .agg(F.max(F.when(F.col("rn") == 1, F.col("d2"))).alias("d1"),
              F.max(F.when(F.col("rn") == 2, F.col("d2"))).alias("d2_"))
         .filter(F.col("d1") > 0))
    t_nano = F.round(F.lit(1e9) * 0.5 * F.log(F.col("d2_") / F.col("d1")),
                     0).cast("long")
    return (g.select(t_nano.alias("t_nano"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                 F.round(F.count(F.lit(1)).cast("double")
                         / (F.sum("t_nano").cast("double") / 1e9), 6)
                 .alias("intrinsic_dim"),
                 F.round(F.sum("t_nano").cast("double")
                         / (F.lit(1e9) * F.count(F.lit(1))), 6)
                 .alias("mean_log_mu")))


@query(
    "knn_hubness_skew",
    oracle=f"""
    WITH {_PAIRS_SQL},
    occ AS (
        SELECT c.vec_id,
               COALESCE(k.n_occ, 0) AS n_occ
        FROM c LEFT JOIN (
            SELECT nid AS vec_id, count(*) AS n_occ
            FROM ranked WHERE rn <= {_K} GROUP BY nid
        ) k USING (vec_id)
    ),
    m AS (
        SELECT count(*) AS n,
               sum(CAST(n_occ AS HUGEINT)) AS s1,
               sum(CAST(n_occ AS HUGEINT) * n_occ) AS s2,
               sum(CAST(n_occ AS HUGEINT) * n_occ * n_occ) AS s3,
               max(n_occ) AS mx
        FROM occ
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           CAST({_K} AS BIGINT) AS k,
           CAST(mx AS BIGINT) AS max_occurrence,
           round((CAST(s3 AS DOUBLE) / n
                  - 3.0 * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
                  + 2.0 * pow(CAST(s1 AS DOUBLE) / n, 3))
                 / pow(CAST(s2 AS DOUBLE) / n
                       - pow(CAST(s1 AS DOUBLE) / n, 2), 1.5), 6)
               AS occurrence_skewness
    FROM m
    """,
)
def knn_hubness_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence hubness over the bounded sample: N_5(x) = how many
    points count x among their 5-NN (zeros kept via the left join),
    reported as the distribution's skewness from exact integer moment
    sums plus the max occurrence — the two numbers Radovanovic et al.
    use to call a space hub-infested."""
    r = _ranked(spark, sf_dir, _K)
    emb_ids = (_t(spark, sf_dir, "embeddings")
               .select("vec_id")
               .withColumn("__h", F.md5(F.col("vec_id").cast("string")))
               .orderBy("__h", "vec_id").limit(_DIAG_N).drop("__h"))
    occ = (emb_ids.join(
        F.broadcast(r.groupBy("nid").agg(F.count(F.lit(1)).alias("n_occ"))
                    .withColumnRenamed("nid", "vec_id")), "vec_id", "left")
        .select(F.coalesce(F.col("n_occ"), F.lit(0)).alias("n_occ")))
    dec = F.col("n_occ").cast("decimal(38,0)")
    m = occ.agg(F.count(F.lit(1)).alias("n"),
                F.sum(dec).alias("s1"),
                F.sum(dec * F.col("n_occ")).alias("s2"),
                F.sum(dec * F.col("n_occ") * F.col("n_occ")).alias("s3"),
                F.max("n_occ").alias("mx"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mu = d("s1") / F.col("n")
    m2 = d("s2") / F.col("n") - mu * mu
    m3 = (d("s3") / F.col("n") - F.lit(3.0) * mu * (d("s2") / F.col("n"))
          + F.lit(2.0) * F.pow(mu, 3))
    return m.select(
        F.col("n").cast("long").alias("n_points"),
        F.lit(_K).cast("long").alias("k"),
        F.col("mx").cast("long").alias("max_occurrence"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("occurrence_skewness"))
