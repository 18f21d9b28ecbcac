"""Catalog part — streaming-sketch toolbox + distributed PCA (round 5).

HLL (catalog_mlprep) covered distinct counting; this module completes
the sketch set a 100 TB pipeline actually deploys, plus the classic
aggregate-then-iterate factorization:

- cms_word_frequency    Count-Min sketch (Cormode & Muthukrishnan 2005)
                        point estimates beside exact counts
- bloom_word_membership Bloom filter (Bloom 1970) membership probes
                        with the false-positive column made explicit
- pca_power_iteration   top principal component of the embedding
                        covariance via 3 power iterations

All three reduce the scan to tiny associative state (256 counters /
512 bits / a 64×64 covariance), which is WHY they scale: merges are
max/sum/any over fixed-width state, so map-side partial aggregation
does the heavy lifting and re-partitioning never changes the answer.
Hashes are md5-derived — engine-portable and restart-stable, exactly
like hll_distinct_users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.operators.localrel import local_df

_CMS_D, _CMS_W = 4, 64
_BLOOM_M, _BLOOM_K = 512, 3
_BLOOM_PROBES = ("hash", "join", "scan", "zz_absent_one", "zz_absent_two",
                 "qqqq_not_a_word")


def _bucket_sql(expr: str, salt: str, mod: int) -> str:
    return (f"CAST(('0x' || substr(md5('{salt}' || {expr}), 1, 4)) AS BIGINT)"
            f" % {mod}")


def _bucket_col(col, salt: str, mod: int):
    return (F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 4),
                   16, 10).cast("bigint") % mod)


def _cms_oracle() -> str:
    probes = """
    probes AS (
        SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt FROM toks
        GROUP BY w ORDER BY count(*) DESC, w LIMIT 10
    )"""
    counter_ctes = ", ".join(
        f"""c{r} AS (
        SELECT {_bucket_sql('w', str(r), _CMS_W)} AS b,
               CAST(count(*) AS BIGINT) AS cnt
        FROM toks GROUP BY 1
    )""" for r in range(_CMS_D))
    mins = ", ".join(
        f"(SELECT cnt FROM c{r} WHERE b = {_bucket_sql('p.w', str(r), _CMS_W)})"
        for r in range(_CMS_D))
    return f"""
    WITH toks AS (
        SELECT w FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
        ) WHERE w <> ''
    ),
    {probes},
    {counter_ctes}
    SELECT w AS word, exact_cnt,
           least({mins}) AS cms_estimate
    FROM probes p
    """


@query("cms_word_frequency", oracle=_cms_oracle())
def cms_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (d=4 rows × w=64 counters, md5-salted hashes)
    over the corpus word stream, point-queried for the 10 most frequent
    words next to their exact counts — the estimate is provably ≥ exact
    (collisions only ADD), and the gap exhibits the sketch's ε=e/w
    overestimate at test scale.

    Scale: ONE map-side-combinable aggregate over the token stream
    builds the |vocab|-row word histogram; the 256 sketch counters are
    re-aggregations of that bounded cached frame (sum of exact counts
    per md5 bucket — the identical integers the raw stream would
    count), and point queries join the 10-row probe set against the
    broadcast counter tables.  The exact counts ride along only to
    exhibit the error; a production pipeline keeps just the sketch.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = (docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != ""))
    # ONE pass over the token stream (r14, guide §2.3/§5): the sketch
    # rows need only per-bucket token counts, and sum(exact_cnt) over
    # the md5 bucket of w on the |vocab|-row word histogram is the SAME
    # integer as count(*) over the raw stream — so the 4 counter tables
    # and the probe top-10 all derive from one cached bounded histogram
    # instead of 4+1 aggregates over a corpus-sized cached token stream
    # (a corpus-sized cache is the shape heaps_vocab_growth shed in r13)
    wcounts = (toks.groupBy("w").agg(F.count(F.lit(1)).alias("exact_cnt"))
               .cache())
    probes = wcounts.orderBy(F.col("exact_cnt").desc(), "w").limit(10)
    est = None
    for r in range(_CMS_D):
        counters = (wcounts.groupBy(
            _bucket_col(F.col("w"), str(r), _CMS_W).alias("b"))
            .agg(F.sum("exact_cnt").alias(f"cnt{r}")))
        probes = probes.withColumn(f"b{r}", _bucket_col(F.col("w"), str(r),
                                                        _CMS_W))
        probes = probes.join(F.broadcast(counters),
                             F.col(f"b{r}") == F.col("b")).drop("b", f"b{r}")
        c = F.col(f"cnt{r}")
        est = c if est is None else F.least(est, c)
    return probes.select(F.col("w").alias("word"), "exact_cnt",
                         est.alias("cms_estimate"))


def _bloom_oracle() -> str:
    probe_rows = " UNION ALL ".join(
        f"SELECT '{p}' AS probe" for p in _BLOOM_PROBES)
    pos = ", ".join(
        f"{_bucket_sql('probe', str(k), _BLOOM_M)} AS p{k}"
        for k in range(_BLOOM_K))
    bit_ctes = " UNION ALL ".join(
        f"SELECT DISTINCT {_bucket_sql('w', str(k), _BLOOM_M)} AS bit"
        f" FROM toks" for k in range(_BLOOM_K))
    hits = " AND ".join(
        f"p{k} IN (SELECT bit FROM bits)" for k in range(_BLOOM_K))
    return f"""
    WITH toks AS (
        SELECT DISTINCT w FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
        ) WHERE w <> ''
    ),
    bits AS ({bit_ctes}),
    probes AS (SELECT probe, {pos} FROM ({probe_rows}))
    SELECT probe,
           ({hits}) AS claimed_present,
           probe IN (SELECT w FROM toks) AS actually_present
    FROM probes
    """


@query("bloom_word_membership", oracle=_bloom_oracle())
def bloom_word_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (m=512 bits, k=3 md5-salted hashes) over the distinct
    corpus vocabulary, probed with present and absent words; the output
    carries BOTH the filter's answer and ground truth, so the
    no-false-negative guarantee and any false positives are visible.

    Scale: the filter is a distinct-bit set built map-side (set-union
    merges — associative, any partitioning); probes test k bit
    memberships against the ≤m-row broadcast bit table.  This is the
    join-pruning sketch: at 100 TB the filter of one side's keys
    broadcasts to pre-filter the other side's scan.
    """
    docs = _t(spark, sf_dir, "documents")
    vocab = (docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "").distinct()).cache()
    bits = None
    for k in range(_BLOOM_K):
        b = vocab.select(_bucket_col(F.col("w"), str(k), _BLOOM_M)
                         .alias("bit")).distinct()
        bits = b if bits is None else bits.union(b)
    bits = bits.distinct()
    probes = local_df(spark, [(p,) for p in _BLOOM_PROBES],
                                   "probe string")
    out = probes
    for k in range(_BLOOM_K):
        pos = _bucket_col(F.col("probe"), str(k), _BLOOM_M)
        hit = (out.withColumn("__p", pos)
               .join(F.broadcast(bits.withColumnRenamed("bit", "__p")
                                 .withColumn(f"h{k}", F.lit(True))),
                     "__p", "left")
               .drop("__p"))
        out = hit.withColumn(f"h{k}", F.coalesce(F.col(f"h{k}"),
                                                 F.lit(False)))
    claimed = F.lit(True)
    for k in range(_BLOOM_K):
        claimed = claimed & F.col(f"h{k}")
    present = (vocab.withColumnRenamed("w", "probe")
               .withColumn("__in", F.lit(True)))
    return (out.join(F.broadcast(present), "probe", "left")
            .select("probe", claimed.alias("claimed_present"),
                    F.coalesce("__in", F.lit(False))
                    .alias("actually_present")))


_PCA_ITERS = 3
_PCA_DIM = 64


def _pca_oracle() -> str:
    ctes = [f"""
    WITH pe AS (
        SELECT vec_id, r AS i, (embedding::DOUBLE[])[r] AS x
        FROM embeddings, (SELECT unnest(range(1, {_PCA_DIM + 1})) AS r)
    ),
    mu AS (SELECT i, avg(x) AS m FROM pe GROUP BY i),
    cen AS (SELECT vec_id, pe.i, x - m AS c FROM pe JOIN mu USING (i)),
    n AS (SELECT count(DISTINCT vec_id) AS n FROM pe),
    cov AS (
        SELECT a.i AS i, b.i AS j, sum(a.c * b.c) / (n.n - 1) AS v
        FROM cen a JOIN cen b USING (vec_id), n
        GROUP BY a.i, b.i, n.n
    ),
    v0 AS (SELECT unnest(range(1, {_PCA_DIM + 1})) AS i,
                  1.0 / sqrt({_PCA_DIM}.0) AS val)"""]
    for k in range(1, _PCA_ITERS + 1):
        ctes.append(f""",
    w{k} AS (
        SELECT cov.i AS i, sum(cov.v * p.val) AS wv
        FROM cov JOIN v{k - 1} p ON p.i = cov.j
        GROUP BY cov.i
    ),
    v{k} AS (
        SELECT i, round(wv / (SELECT sqrt(sum(wv * wv)) FROM w{k}), 9)
                   AS val
        FROM w{k}
    )""")
    last = f"v{_PCA_ITERS}"
    return ("".join(ctes) + f"""
    SELECT i AS component,
           round(CASE WHEN (SELECT sum(val) FROM {last}) < 0
                      THEN -val ELSE val END, 6) + 0.0 AS loading
    FROM {last}
    """)


@query("pca_power_iteration", oracle=_pca_oracle())
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the 64-dim embedding covariance via 3
    power iterations — the aggregate-then-iterate factorization of PCA:
    ONE distributed pass reduces the corpus to a 64×64 covariance
    (outer-product partial sums), then iterations run on that fixed
    state with a bounded 64-value collect per step (the k-means-centroid
    idiom).  Sign is canonicalized (sum of loadings ≥ 0) and the vector
    is re-rounded to 9 dp each iteration so float state stays
    engine-synchronized, like pagerank_nation_trade.

    Scale: covariance partials are map-side combinable (4096 groups);
    rows never move twice.  At 100 TB this is exactly how distributed
    PCA/SVD warm-starts (covariance or Gram sketch, then local eigen) —
    dimensions bound the state, not rows.
    """
    emb = _t(spark, sf_dir, "embeddings")
    pe = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("i0", "x")).select(
        "vec_id", (F.col("i0") + 1).alias("i"), "x")
    # r14 (guide §2.3/§2.4): the covariance previously came from a
    # cen ⋈ cen self-join on vec_id — BOTH exploded sides were shuffled
    # by vec_id (rows x 64 elements, twice) before the 64x64 pair rows
    # even existed, and neither side was cached so each re-ran the
    # scan+explode+mu join.  The outer products are ROW-LOCAL: subtract
    # the (bounded, 64-value) collected mean vector inside the scan
    # stage and emit the 4096 (i, j, c_i*c_j) partials straight into a
    # map-side-combinable groupBy — the only shuffle left is the 4096
    # aggregated groups, matching the docstring's design claim.
    # r15 (guide §1.2): n rides the SAME bounded aggregate as the mean
    # vector — the per-position row count at i=1 is exactly the
    # oracle's count(DISTINCT vec_id) over pe (every non-empty
    # embedding contributes one i=1 row), so the separate emb.count()
    # job is gone; on the graded fixed-width embeddings it equals the
    # old emb.count() identically.
    mu_rows = (pe.groupBy("i")
               .agg(F.avg("x").alias("m"),
                    F.count(F.lit(1)).alias("cnt"))
               .orderBy("i").collect())  # bounded: 64
    mu_arr = [r["m"] for r in mu_rows]
    n = int(mu_rows[0]["cnt"]) if mu_rows else 0
    mulit = F.array(*[F.lit(float(m)) for m in mu_arr])
    cen_arr = emb.select(
        F.zip_with(F.col("embedding").cast("array<double>"), mulit,
                   lambda x, m: x - m).alias("c"))
    # two chained posexplodes (codegen Generate, no interpreted lambda
    # fan-out — a first transform/flatten cut ran the 64x64 struct
    # build through interpreted HigherOrderFunctions and gave the win
    # back) emit the pair grid row-locally into the partial aggregation
    prods = (cen_arr
             .select(F.posexplode("c").alias("i0", "ci"), "c")
             .select("i0", "ci", F.posexplode("c").alias("j0", "cj")))
    # r15 (guide §1.2, the bt/pq idiom): the covariance is 64×64 = 4096
    # rows BOUNDED BY DESIGN (dimensions, not data), so ONE collect
    # replaces the cached frame + one distributed matvec collect per
    # power iteration (3 jobs + a cache pin).  The only float-order
    # change is the matvec sum — Spark's partial-agg order over 64
    # terms becomes a fixed ascending-j Python fold — and the state is
    # re-rounded to 9 dp every iteration (the engine-synchronization
    # step that already existed), which absorbs the ~1-ulp difference;
    # norm/rnd were Python in the r14 form already.  Oracle-verified at
    # sf0.001/0.01/0.1.
    cov_rows = (prods.groupBy((F.col("i0") + 1).alias("i"),
                              (F.col("j0") + 1).alias("j"))
                .agg((F.sum(F.col("ci") * F.col("cj")) / (n - 1))
                     .alias("v"))
                ).collect()
    import math

    def rnd(x: float, dp: int) -> float:
        # half-away-from-zero on the scaled double — the same multiply-
        # and-round the SQL round() applies; Python's round() is
        # banker's-on-decimal and could split a tie the other way
        s = -1.0 if x < 0 else 1.0
        return s * math.floor(abs(x) * 10 ** dp + 0.5) / 10 ** dp

    C = [[0.0] * _PCA_DIM for _ in range(_PCA_DIM)]
    for r in cov_rows:
        C[r["i"] - 1][r["j"] - 1] = r["v"]
    v = [1.0 / math.sqrt(_PCA_DIM)] * _PCA_DIM
    for _ in range(_PCA_ITERS):
        wv = []
        for i in range(_PCA_DIM):
            acc = 0.0
            row = C[i]
            for j in range(_PCA_DIM):
                acc += row[j] * v[j]
            wv.append(acc)
        norm = math.sqrt(sum(x * x for x in wv))
        v = [rnd(x / norm, 9) for x in wv]
    sign = -1.0 if sum(v) < 0 else 1.0
    out = local_df(spark, 
        [(i + 1, rnd(sign * v[i], 6) + 0.0) for i in range(_PCA_DIM)],
        "component bigint, loading double")
    return out