"""Catalog part — dedup blocking-quality evaluation (STAGED for r8).

The record-linkage literature's standard report card for a blocking
scheme (Christen 2012, "Data Matching", ch. 7): how many comparisons
did blocking save, and how many TRUE matches survived the pruning?

- blocking_quality_report  reduction ratio + pair completeness (a.k.a.
                           recall of the blocker) of the engine's
                           MinHash-LSH blocking against the exact
                           3-gram-Jaccard ground truth — the ONE row a
                           pipeline owner reads before trusting
                           dedup_minhash_lsh at 100 TB

Both legs reuse the engine's own operators (operators/dedup.py): the
candidate set is the LSH band join BEFORE Jaccard verification; the
truth set is the exact shingle-level Jaccard >= 0.1 pairs.  One
corpus shingling feeds signatures, candidates, and truth (the cached
frame is the same sharing the curation pipeline uses).

Determinism: everything is exact integer pair counts until the two
display ratios, which ride the integer-scale rounding idiom.

Scale: reduction ratio is WHY LSH exists — the report itself runs the
quadratic truth join, so it RUNS ON A SAMPLE (the _EVAL_N lowest-md5
documents; r8 made the sample real after the SCALING sweep measured
the unsampled row at 14.75x per 10x rows, 37.8 s at sf1 — the one
super-linear plan in the repo); the engine-side plan is sample-first
(every stage keyed on doc/shingle, no driver state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.operators import dedup
from predictor_spark.plans.catalog import query, _t
from predictor_spark.plans.catalog_text import _SHINGLES_CTE

_NPERM, _BANDS, _THRESH = 16, 4, 0.1
#: evaluation sample: the report card runs the QUADRATIC exact-Jaccard
#: truth join, so it evaluates the blocker on the _EVAL_N lowest-md5
#: documents (deterministic, engine-agnostic — the PQ _FIT_N idiom).
#: The r8 SCALING sweep measured the unsampled row at 14.75x for 10x
#: rows (37.8 s at sf1): the one super-linear plan in the repo, exactly
#: what its own docstring said must run on a sample at scale.  sf0.01
#: has 500 docs (< _EVAL_N), so the driver-graded result is unchanged.
_EVAL_N = 2000

#: _SHINGLES_CTE rebased onto the sample (the CTE text is shared with
#: catalog_text verbatim, only the source table swaps)
_SHINGLES_EVAL_CTE = (
    f"eval_docs AS MATERIALIZED (SELECT doc_id, text FROM documents "
    f"ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {_EVAL_N}),"
    + _SHINGLES_CTE.replace("FROM documents)", "FROM eval_docs)"))


def _cands_oracle() -> str:
    """The LSH candidate CTEs of dedup_minhash_lsh's oracle, shared
    verbatim (same permutation family, same band keys)."""
    params = dedup._perm_params(_NPERM)
    mh_exprs = ", ".join(
        f"min(({a} * h + {b}) % {dedup.MOD}) AS mh_{k}"
        for k, (a, b) in enumerate(params))
    rpb = _NPERM // _BANDS
    band_keys = []
    for bi in range(_BANDS):
        key = " || '_' || ".join(
            f"CAST(mh_{bi * rpb + r} AS VARCHAR)" for r in range(rpb))
        band_keys.append(
            f"SELECT doc_id, {bi} AS band, {key} AS bkey FROM sig")
    banded = " UNION ALL ".join(band_keys)
    return f"""
    hashed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT) AS h
        FROM sh
    ),
    sig AS (SELECT doc_id, {mh_exprs} FROM hashed GROUP BY doc_id),
    banded AS ({banded}),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    """


@query(
    "blocking_quality_report",
    oracle=f"""
    WITH {_SHINGLES_EVAL_CTE},
    {_cands_oracle()},
    truth AS (
        SELECT id_a, id_b FROM jac WHERE j >= {_THRESH}
    ),
    counts AS (
        SELECT (SELECT count(*) FROM sizes) AS n_docs,
               (SELECT count(*) FROM cands) AS n_cand,
               (SELECT count(*) FROM truth) AS n_true,
               (SELECT count(*) FROM truth t
                JOIN cands c ON c.id_a = t.id_a AND c.id_b = t.id_b)
                   AS n_caught
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_cand AS BIGINT) AS n_candidate_pairs,
           CAST(n_true AS BIGINT) AS n_true_pairs,
           CAST(n_caught AS BIGINT) AS n_caught,
           round(1000000.0 - CAST(n_cand AS DOUBLE) * 1000000.0
                 / (CAST(n_docs AS DOUBLE) * (n_docs - 1) / 2)) / 1000000.0
               AS reduction_ratio,
           round(CAST(n_caught AS DOUBLE) * 1000000.0 / n_true) / 1000000.0
               AS pair_completeness
    FROM counts
    """,
)
def blocking_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduction ratio = 1 − |candidates| / |all pairs| (how much the
    blocker pruned) and pair completeness = |truth ∩ candidates| /
    |truth| (how much recall survived), for MinHash(16)/LSH(4 bands)
    against exact 3-gram Jaccard >= 0.1 over docs with >= 1 shingle.

    Scale: ONE shingling feeds all three legs (cached doc-shingle
    frame); candidates come from the band-bucket join, truth from the
    shingle-inverted join — the same two plans the dedup rows run.

    r14 optimization (guide §2.4 — remove shuffles outright): the
    pre-r14 plan computed BOTH heavy legs twice (cands for its count
    and again under caught; truth likewise), and the truth leg
    re-shingled the sample from scratch inside ngram_jaccard_pairs
    with its own cache+count — 58 Exchange nodes
    (plans/r14/blocking_quality_report_before.txt).  Now truth derives
    from the SAME cached doc-shingle frame (explode for the inverted
    join, F.size(sh) for set sizes — the arrays are distinct by
    construction, so both are exactly ngram_jaccard_pairs' integers),
    and all three counts come from ONE full-outer join over cands and
    truth, so each leg is computed exactly once."""
    docs = (_t(spark, sf_dir, "documents")
            .withColumn("__h", F.md5(F.col("doc_id").cast("string")))
            .orderBy("__h", "doc_id").limit(_EVAL_N).drop("__h"))
    doc = dedup._doc_shingles(docs, "doc_id", "text", 3).cache()
    n_docs = doc.count()  # materializes the shared cache

    rpb = _NPERM // _BANDS
    band_structs = F.array(*[
        F.struct(F.lit(bi).alias("band"),
                 F.concat_ws("_", *[
                     F.element_at("sig", bi * rpb + r + 1)
                     for r in range(rpb)]).alias("bkey"))
        for bi in range(_BANDS)])
    banded = (doc.select("doc_id",
                         dedup._sig_array(F.col("sh"), _NPERM).alias("sig"))
              .select("doc_id", F.explode(band_structs).alias("x"))
              .select("doc_id", "x.band", "x.bkey"))
    a, b = banded.alias("a"), banded.alias("b")
    cands = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bkey") == F.col("b.bkey")))
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"))
             .distinct())
    # exact-Jaccard truth from the cached shingle arrays — identical
    # integers to ngram_jaccard_pairs (|A∩B| via the shingle-inverted
    # self-join; |A|,|B| = size of the distinct-shingle arrays) and the
    # identical jaccard expression/threshold, without the second
    # shingling pass + cache the operator would spin up
    sh = doc.select("doc_id", F.explode("sh").alias("shingle"))
    sizes = doc.select("doc_id", F.size("sh").alias("set_size"))
    ta, tb = sh.alias("a"), sh.alias("b")
    inter = (ta.join(tb, F.col("a.shingle") == F.col("b.shingle"))
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("id_a"),
                      F.col("b.doc_id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("n_inter")))
    sa = (sizes.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("set_size", "size_a"))
    sb = (sizes.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("set_size", "size_b"))
    truth = (inter.join(F.broadcast(sa), "id_a")
             .join(F.broadcast(sb), "id_b")
             .withColumn("jaccard",
                         F.col("n_inter")
                         / (F.col("size_a") + F.col("size_b")
                            - F.col("n_inter")))
             .filter(F.col("jaccard") >= _THRESH)
             .select("id_a", "id_b"))

    # all three pair counts in ONE pass: full-outer join the two pair
    # sets (each now computed exactly once) and count membership flags
    row = (cands.withColumn("in_cand", F.lit(1))
           .join(truth.withColumn("in_truth", F.lit(1)),
                 ["id_a", "id_b"], "full_outer")
           .agg(F.count("in_cand").alias("n_cand"),
                F.count("in_truth").alias("n_true"),
                F.count(F.when(F.col("in_cand").isNotNull()
                               & F.col("in_truth").isNotNull(), 1))
                .alias("n_caught")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    total = float(n_docs) * (n_docs - 1) / 2
    return row.select(
        F.lit(n_docs).cast("long").alias("n_docs"),
        F.col("n_cand").cast("long").alias("n_candidate_pairs"),
        F.col("n_true").cast("long").alias("n_true_pairs"),
        F.col("n_caught").cast("long").alias("n_caught"),
        (F.round(1000000.0 - d("n_cand") * 1000000.0 / F.lit(total))
         / 1000000.0).alias("reduction_ratio"),
        (F.round(d("n_caught") * 1000000.0 / F.col("n_true")) / 1000000.0)
        .alias("pair_completeness"))
