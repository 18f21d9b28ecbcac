"""Round-12 perf prototypes — NOT registered, NOT imported by any
catalog module, so this file adds zero closure-hash churn while the
round-11/12 re-grade queue drains (VERDICT r10 #2/#3 arithmetic).

Two drop-in replacements, each equality-pinned against its live
registered row by tests/test_r12_prototypes.py (identical rows at
sf0.01, 6dp-rounded outputs — the same rounding the oracle grades).
Measured r11, warm session, identical rows at every SF probed:

  sf1 (/tmp/predictor_spark_sf1):  weibull 10.97 s -> 8.12 s (v3, -26%)
                                   hurst    4.81 s -> 4.26 s (v2, -11%)
  sf0.1:                           weibull crossover not yet reached
                                   (3.9 vs 5.2 s — two passes over the
                                   un-cached join beat the 5-task
                                   window only once data outweighs the
                                   second scan); hurst 2.69 -> 2.12 s.

The wins grow with scale: the live weibull window is capped at 5
tasks at ANY cluster size, the v3 rank runs wide.

- `weibull_mrr_fit_v3` (THE swap candidate): replaces the
  o_orderpriority rank window (parallelism capped at 5 tasks at ANY
  cluster size) with operators/ranking.discrete_key_rank — a 2-pass
  offset rank keyed on the day-granular lead time, which also yields
  the per-priority total for free (the registered query's second
  single-task window). Swap plan (r12): paste the body over
  catalog_r14_reliability.weibull_mrr_fit below the shared `lt`
  construction; the oracle is untouched (ranks are EXACTLY equal,
  not approximately).
- `weibull_mrr_fit_v2` (kept as the negative result): the generic
  two_phase_row_number needs quantile + counts + rank passes — three
  recomputations of the unmaterialized orders⋈lineitem join, measured
  2.7x SLOWER than the live row at sf0.1. The generic primitive is
  for ranking over an already-materialized/cached frame or a
  continuous key; for this query the discrete-key form wins.
- `hurst_rs_per_series_v2`: folds the per-block cumulative-deviation
  window into the per-series rank window's own pass — the running sum
  C is global per series, and the block-base offset cancels inside
  max-min, so the second ordered window over the 3x-expanded tick set
  disappears (the SCALING.md cost-model note's "known shave").
  Deviations are computed SCALED BY THE BLOCK SIZE in exact 64-bit
  integers (devL = C*cnt - i*sx), so the block range R = ΔdevL/n pays
  ONE float rounding instead of one per row; long-overflow headroom:
  |C| ≤ Σ|x| and |i*sx| ≤ N * n * max|x| stay under 2^63 up to ~10^10
  ticks per series at |x| ≤ 10^5. Swap plan (r12): paste over
  catalog_r11_longmemory.hurst_rs_per_series AND mirror the oracle's
  dev expression to the same integer form ((cum*cnt - i*sum) integer
  math) so both sides are bit-identical by construction rather than
  1-ulp-coincident.

Behavioral spec: the registered rows themselves (this module cites no
reference file — both queries are beyond-reference extensions).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.operators.ranking import (discrete_key_rank,
                                               two_phase_row_number)
from predictor_spark.plans.catalog import _t
from predictor_spark.plans.catalog_r11_longmemory import _SIZES


def _weibull_lead_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered query's `lt` frame, verbatim."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .select(F.col("o_orderpriority").alias("pri"),
                    F.datediff("l_shipdate", "o_orderdate").alias("t"),
                    F.col("l_orderkey").alias("ok"),
                    F.col("l_linenumber").alias("ln_"))
            .filter(F.col("t") > 0))


def weibull_mrr_fit_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """weibull_mrr_fit with the 2-pass discrete-key rank (the r12 swap
    candidate — see module docstring). Everything from the ranked
    frame down is byte-for-byte the registered query's math."""
    lt = _weibull_lead_times(spark, sf_dir)
    ranked = discrete_key_rank(lt, ["pri"], "t", ["ok", "ln_"],
                               rank_name="i", total_name="n")
    return _weibull_fit_from_ranked(ranked)


def weibull_mrr_fit_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """weibull_mrr_fit with the generic 3-pass two-phase rank — kept
    as the measured NEGATIVE result (see module docstring)."""
    lt = _weibull_lead_times(spark, sf_dir)
    ranked = two_phase_row_number(
        lt, ["pri"], "t", ["t", "ok", "ln_"], rank_name="i")
    nper = lt.groupBy("pri").agg(F.count(F.lit(1)).alias("n"))
    ranked = ranked.join(F.broadcast(nper), "pri")
    return _weibull_fit_from_ranked(ranked)


def _weibull_fit_from_ranked(ranked: DataFrame) -> DataFrame:
    """The registered query's median-rank-regression tail, verbatim,
    over any frame carrying (pri, t, i, n)."""
    x9 = F.round(F.lit(1e9) * F.log(F.col("t").cast("double")), 0) \
        .cast("long")
    y9 = F.round(F.lit(1e9) * F.log(-F.log(1.0 - (F.col("i") - 0.3)
                                           / (F.col("n") + 0.4))),
                 0).cast("long")
    xy = ranked.select("pri", "n", x9.alias("x9"), y9.alias("y9"))
    dx = F.col("x9").cast("decimal(38,0)")
    m = (xy.groupBy("pri")
         .agg(F.max("n").alias("n"), F.count(F.lit(1)).alias("cnt"),
              F.sum(dx).alias("sx"),
              F.sum(F.col("y9").cast("decimal(38,0)")).alias("sy"),
              F.sum(dx * F.col("x9")).alias("sxx"),
              F.sum(dx * F.col("y9")).alias("sxy"))
         .filter(F.col("cnt") >= 3))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    k = ((d("cnt") * d("sxy") - d("sx") * d("sy"))
         / (d("cnt") * d("sxx") - d("sx") * d("sx")))
    fit = m.select("pri", "n", k.alias("k"), "cnt", "sx", "sy")
    lam = F.exp(-((d("sy") / 1e9 - F.col("k") * (d("sx") / 1e9))
                  / F.col("cnt")) / F.col("k"))
    return (fit.select(
        F.col("pri").alias("priority"),
        F.col("n").cast("long").alias("n_lines"),
        F.round("k", 6).alias("shape_k"),
        F.round(lam, 6).alias("scale_days"),
        F.round(lam * F.pow(F.lit(-math.log(0.9)), 1.0 / F.col("k")), 6)
        .alias("b10_days"))
        .orderBy("priority"))


def hurst_rs_per_series_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hurst_rs_per_series with the per-block ordered window removed
    (see module docstring). One ordered window per series computes
    BOTH the tick rank and the global running sum; the per-block pass
    is an unordered window + one hash rollup."""
    ev = _t(spark, sf_dir, "events")
    wrn = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wrun = wrn.rowsBetween(Window.unboundedPreceding, 0)
    x = F.round(F.col("value") * 100).cast("long")
    # rank AND global running sum from the SAME (partition, order) spec:
    # one exchange + one sort feed both window functions
    ticks = ev.select(
        "event_type",
        x.alias("x"),
        F.row_number().over(wrn).alias("rn"),
        F.sum(x).over(wrun).alias("c"))
    sizes = spark.range(len(_SIZES)).select(
        F.element_at(F.array(*[F.lit(s) for s in _SIZES]),
                     (F.col("id") + 1).cast("int")).alias("n"))
    sized = (ticks.crossJoin(F.broadcast(sizes))
             .select("event_type", "n", "x", "rn", "c",
                     F.expr("(rn - 1) div n").alias("bid"),
                     ((F.col("rn") - 1) % F.col("n") + 1).alias("i")))
    wb = Window.partitionBy("event_type", "n", "bid")
    cnt_w = F.count(F.lit(1)).over(wb)
    sx_w = F.sum("x").over(wb)
    # exact-integer scaled deviation: devL = C*cnt - i*sx
    #   = cnt * ((C - C_base) - i*sx/cnt) + cnt*C_base
    # the per-block constant cnt*C_base cancels in max-min, so
    # R = (max(devL) - min(devL)) / n with ONE float rounding
    dev_l = F.col("c") * cnt_w - F.col("i") * sx_w
    blocks = (sized
              .withColumn("devL", dev_l)
              .groupBy("event_type", "n", "bid")
              .agg(F.count(F.lit(1)).alias("cnt"),
                   F.sum("x").alias("sx"),
                   F.sum(F.col("x") * F.col("x")).alias("sxx"),
                   (F.max("devL") - F.min("devL")).alias("rl")))
    sigma = F.sqrt(F.greatest(
        F.col("sxx").cast("double") / F.col("n")
        - (F.col("sx").cast("double") / F.col("n"))
        * (F.col("sx").cast("double") / F.col("n")), F.lit(1e-12)))
    rs = (blocks.where(F.col("cnt") == F.col("n"))
          .select("event_type", "n", "bid",
                  (F.col("rl").cast("double") / F.col("n") / sigma)
                  .alias("rs")))
    wa = (Window.partitionBy("event_type", "n").orderBy("bid")
          .rowsBetween(Window.unboundedPreceding, 0))
    wdesc = Window.partitionBy("event_type", "n").orderBy(
        F.col("bid").desc())
    avg_rs = (rs.select(
        "event_type", "n",
        (F.sum("rs").over(wa)
         / F.row_number().over(
             Window.partitionBy("event_type", "n").orderBy("bid")))
        .alias("avg_rs"),
        F.row_number().over(wdesc).alias("rdesc"))
        .where(F.col("rdesc") == 1))
    piv = (avg_rs.groupBy("event_type")
           .agg(*[F.max(F.when(F.col("n") == s, F.col("avg_rs")))
                  .alias(f"rs{s}") for s in _SIZES]))
    lx = [math.log(float(s)) for s in _SIZES]
    xbar = sum(lx) / 3
    ly = [F.log(F.col(f"rs{s}")) for s in _SIZES]
    ybar = (ly[0] + ly[1] + ly[2]) / 3
    terms = [(lxi - xbar) * (lyi - ybar) for lxi, lyi in zip(lx, ly)]
    num = terms[0] + terms[1] + terms[2]
    den = ((lx[0] - xbar) ** 2 + (lx[1] - xbar) ** 2
           + (lx[2] - xbar) ** 2)
    return piv.select(
        "event_type",
        F.round(F.col("rs16"), 6).alias("rs_16"),
        F.round(F.col("rs32"), 6).alias("rs_32"),
        F.round(F.col("rs64"), 6).alias("rs_64"),
        F.round(num / F.lit(den), 6).alias("hurst")).orderBy("event_type")


def hybrid_rrf_fusion_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hybrid_rrf_fusion with the BM25 leg's full-corpus unpartitioned
    rank window (PARALLELISM_AUDIT.md Class C: |docs| rows through one
    task) replaced by orderBy().limit(20) — Spark compiles that to
    TakeOrderedAndProject, a per-partition partial top-k merged on k
    heads, fully parallel. EXACT semantics: the registered row filters
    to bm25_rank <= 20 immediately, so ranks beyond the cut never
    matter, and the (rounded score desc, doc_id) ordering is a total
    order — the surviving 20 rows and their ranks are identical. The
    residual row_number window sorts 20 rows. Zero extra passes.

    r12 swap cost: zero extra window slots — all 9 catalog_mlprep rows
    are already among the 31 pending r12's grading window."""
    from predictor_spark.operators import similarity
    from predictor_spark.operators.retrieval import bm25_scores
    from predictor_spark.plans.catalog_mlprep import _RRF_K
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    top = (bm25_scores(docs, ["hash", "join", "scan"])
           .select("doc_id", F.round("score", 6).alias("s"))
           .orderBy(F.col("s").desc(), "doc_id").limit(20))
    bm = (top.withColumn(
            "bm25_rank",
            F.row_number().over(Window.orderBy(F.col("s").desc(),
                                               "doc_id")))
          .select("doc_id", "bm25_rank"))
    co = (similarity.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=20)
          .select(F.col("neighbor_id").alias("doc_id"),
                  F.col("rank").alias("cos_rank")))
    rrf = (F.coalesce(1.0 / (_RRF_K + F.col("bm25_rank")), F.lit(0.0))
           + F.coalesce(1.0 / (_RRF_K + F.col("cos_rank")), F.lit(0.0)))
    return (
        bm.join(co, "doc_id", "full_outer")
        .select("doc_id",
                F.coalesce("bm25_rank", F.lit(0)).cast("bigint")
                .alias("bm25_rank"),
                F.coalesce("cos_rank", F.lit(0)).cast("bigint")
                .alias("cos_rank"),
                F.round(rrf, 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
    )
