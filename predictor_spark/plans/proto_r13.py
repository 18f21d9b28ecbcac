"""Round-13 perf prototype — NOT registered, NOT imported by any
catalog module (zero closure-hash churn; same discipline as
proto_r12.py).

`mutual_info_value_type_v2` removes the engine's worst remaining
single-task plan (PARALLELISM_AUDIT.md Class C #1): the registered row
assigns value deciles with `ntile(10) OVER (ORDER BY value, event_id)`
— the ENTIRE event stream through one sort task. The rewrite
reproduces ntile's bucket arithmetic exactly without any global sort,
via the histogram-refinement idiom (catalog_r18_ebayes.py is the
in-house precedent):

1. value-support histogram (groupBy value — 17.8k rows at sf1) with a
   cumulative window ONLY over the support, giving each value group
   its global rank span [lo, hi];
2. ntile's closed form (rem = N mod 10, base = N div 10; group sizes
   base+1 for the first rem groups) maps any global position to its
   decile with pure integer arithmetic — ceil(a/b) computed as
   (a+b-1) div b, so no float rounding anywhere;
3. value groups entirely inside one decile contribute via a
   (value, event_type) count histogram — no row-level work at all;
4. ONLY the <=9 boundary-straddling value groups get row-level ranks,
   via Window.partitionBy(value).orderBy(event_id) — fine-grained
   keys, fully parallel, touching ~9 x (N / |support|) rows (~500 at
   sf1) instead of N.

The (event_type, decile) joint counts — and therefore the MI — are
equal BY CONSTRUCTION, not approximately: step 2 is the same function
ntile applies, evaluated on the same global positions.

Swap cost (r13 window): catalog_drift.py has 19 registered dependent
rows, all currently verified — schedule per PARALLELISM_AUDIT.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.operators.ranking import _tile_of, exact_ntile
from predictor_spark.plans.catalog import _t

#: ntile's closed-form bucket function — shared with the generic
#: operators/ranking.exact_ntile so the two cannot drift apart
_dec_of = _tile_of


def mutual_info_value_type_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value",
                                            "event_id")
    # 1. value support with global rank spans (window over the SUPPORT,
    #    never the stream)
    sup = ev.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    spans = sup.select(
        "value", "c",
        F.sum("c").over(wv).alias("hi")).withColumn(
        "lo", F.col("hi") - F.col("c") + 1)
    tot = spans.agg(F.sum("c").alias("n")).select(
        (F.col("n") % 10).alias("rem"),
        ((F.col("n") - F.col("n") % 10) / 10).cast("long").alias("base"))
    spans = spans.crossJoin(F.broadcast(tot)).withColumn(
        "dec_lo", _dec_of(F.col("lo"), F.col("base"), F.col("rem"))
    ).withColumn(
        "dec_hi", _dec_of(F.col("hi"), F.col("base"), F.col("rem")))

    # 3. interior groups: whole span inside one decile — histogram-only
    interior = (spans.where(F.col("dec_lo") == F.col("dec_hi"))
                .select("value", F.col("dec_lo").alias("dec")))
    per_vt = ev.groupBy("value", "event_type").agg(
        F.count(F.lit(1)).alias("c"))
    joint_int = (per_vt.join(F.broadcast(interior), "value")
                 .groupBy("event_type", "dec")
                 .agg(F.sum("c").alias("c")))

    # 4. straddling groups: row-level ranks WITHIN each value group
    #    (fine-grained window keys), global pos = lo - 1 + local rank
    strad = (spans.where(F.col("dec_lo") != F.col("dec_hi"))
             .select("value", "lo", "base", "rem"))
    wrow = Window.partitionBy("value").orderBy("event_id")
    rows = (ev.join(F.broadcast(strad), "value")
            .withColumn("rn", F.row_number().over(wrow))
            .withColumn("pos", F.col("lo") - 1 + F.col("rn"))
            .withColumn("dec", _dec_of(F.col("pos"), F.col("base"),
                                       F.col("rem"))))
    joint_str = rows.groupBy("event_type", "dec").agg(
        F.count(F.lit(1)).alias("c"))

    joint = (joint_int.unionByName(joint_str)
             .groupBy("event_type", "dec").agg(F.sum("c").alias("c")))

    # identical MI tail to the registered row
    n1 = joint.agg(F.sum("c").cast("double").alias("n"))
    wx = Window.partitionBy("event_type")
    wy = Window.partitionBy("dec")
    m = (joint
         .withColumn("cx", F.sum("c").over(wx))
         .withColumn("cy", F.sum("c").over(wy))
         .crossJoin(F.broadcast(n1)))
    term = ((F.col("c") / F.col("n"))
            * F.log((F.col("c") * F.col("n"))
                    / (F.col("cx").cast("double") * F.col("cy"))))
    return m.agg(F.round(F.sum(term), 6).alias("mutual_info_nats"))


def lift_gain_deciles_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lift_gain_deciles with the unpartitioned ntile over the per-user
    score frame (PARALLELISM_AUDIT.md Class C) replaced by
    operators/ranking.exact_ntile — support spans + closed-form bucket
    arithmetic, row-level ranks only inside the <=9 straddling score
    groups. The decile assignment (and therefore every output value)
    is equal by construction; everything from the decile column down
    is the registered query's math verbatim. Swap cost: 5 verified
    rows (catalog_eval module)."""
    from predictor_spark.plans.catalog_eval import _eval_base

    base = _eval_base(spark, sf_dir)
    dec = exact_ntile(base, "score_int", ["user_id"], 10,
                      tile_name="decile", descending=True)
    agg = (dec.select("label", "decile")
           .groupBy("decile")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("label").alias("pos"))
           .cache())
    tot = agg.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    cum = F.sum("pos").over(
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        agg.crossJoin(F.broadcast(tot))
        .withColumn("cum_pos", cum)
        .select(F.col("decile").cast("long").alias("decile"),
                F.col("n").cast("long").alias("n_users"),
                F.col("pos").cast("long").alias("n_pos"),
                F.round((F.col("pos").cast("double") / F.col("n"))
                        / (F.col("pt").cast("double") / F.col("nt")), 6)
                .alias("lift"),
                F.round(F.col("cum_pos").cast("double") / F.col("pt"), 6)
                .alias("cum_gain"))
    )


def causal_decile_agg_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """catalog_r7_causal._decile_agg (the shared 10-row reduction
    behind the uplift and Qini rows) with the same exact_ntile swap;
    pinning THIS frame pins every dependent row, since they consume
    only its output. Swap cost: 4 verified rows (causal module)."""
    from predictor_spark.plans.catalog_r7_causal import _user_base

    base = _user_base(spark, sf_dir)
    dec = exact_ntile(base, "pre_activity", ["user_id"], 10,
                      tile_name="decile", descending=True)
    t = F.col("treat") == 1
    return (dec.select("treat", "label", "decile")
            .groupBy("decile")
            .agg(F.sum(t.cast("int")).alias("nt"),
                 F.sum((~t).cast("int")).alias("nc"),
                 F.sum(F.when(t, F.col("label")).otherwise(0)).alias("pt"),
                 F.sum(F.when(~t, F.col("label")).otherwise(0)).alias("pc")))


def funnel_latency_quantiles_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """funnel_latency_quantiles with the |converters|-row rank window
    (PARALLELISM_AUDIT.md Class C) removed ENTIRELY: the row only
    reads the order statistic at two positions (p50, p90), and ties on
    lat_s share the value — so the smallest lat_s whose support span
    [lo, hi] covers position k IS the ranked row's value, computed
    from a latency-support histogram with a window over the SUPPORT
    only. No row-level rank anywhere; exact by construction."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    mv = (ev.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("mv")))
    lat = (ev.where(F.col("event_type") == "purchase")
           .join(mv, "user_id")
           .where(F.col("ts") > F.col("mv"))
           .groupBy("user_id", "mv")
           .agg(F.min("ts").alias("mp"))
           .select("user_id",
                   F.floor((F.unix_micros("mp") - F.unix_micros("mv"))
                           / F.lit(1e6)).cast("long").alias("lat_s")))
    sup = lat.groupBy("lat_s").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("lat_s").rowsBetween(Window.unboundedPreceding, 0)
    spans = (sup.select("lat_s", "c", F.sum("c").over(wv).alias("hi"))
             .withColumn("lo", F.col("hi") - F.col("c") + 1))
    tot = spans.agg(F.sum("c").alias("n"))
    k50 = F.expr("(n + 1) div 2")
    k90 = F.expr("(9 * n + 9) div 10")
    return (spans.crossJoin(F.broadcast(tot)).agg(
        F.max("n").cast("long").alias("n_converters"),
        F.max(F.when((F.col("lo") <= k50) & (k50 <= F.col("hi")),
                     F.col("lat_s"))).alias("p50_latency_s"),
        F.max(F.when((F.col("lo") <= k90) & (k90 <= F.col("hi")),
                     F.col("lat_s"))).alias("p90_latency_s")))


def heaps_vocab_growth_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """heaps_vocab_growth with the |docs|-row rank window removed: the
    registered row only COMPARES ranks against four checkpoint
    positions, and the rank order is exactly doc_id order — so each
    checkpoint reduces to an order statistic of doc_id (the k-th
    smallest), found by ebayes-style bucket refinement (bucket counts
    -> tiny cumulative frame -> rank ONLY inside the one bucket
    holding position k). Per-term first-occurrence rank becomes
    min(doc_id); prefix token counts become doc_id <= threshold.
    Exact by construction (rank r <= k  <=>  doc_id <= kth-smallest)."""
    from predictor_spark.operators.text import tokens_col

    docs = (_t(spark, sf_dir, "documents")
            .select("doc_id", tokens_col("text").alias("t")))
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    cp = (spark.createDataFrame([(0.1,), (0.25,), (0.5,), (1.0,)],
                                "frac double")
          .crossJoin(F.broadcast(nd))
          .select("frac", F.ceil(F.col("frac") * F.col("nd"))
                  .cast("long").alias("k_docs")))
    # order-statistic thresholds by bucket refinement
    ids = docs.select("doc_id",
                      (F.col("doc_id") - F.col("doc_id") % 1024)
                      .alias("b"))
    bcnt = ids.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    bcum = bcnt.withColumn("cum", F.sum("c").over(wb))
    target = (cp.join(F.broadcast(bcum),
                      (F.col("cum") >= F.col("k_docs"))
                      & (F.col("cum") - F.col("c") < F.col("k_docs")))
              .select("frac", "k_docs", "b",
                      (F.col("cum") - F.col("c")).alias("before")))
    wrow = Window.partitionBy("frac").orderBy("doc_id")
    thr = (ids.join(F.broadcast(target), "b")
           .withColumn("rn", F.row_number().over(wrow))
           .where(F.col("before") + F.col("rn") == F.col("k_docs"))
           .select("frac", "k_docs", F.col("doc_id").alias("thr")))
    # prefix token counts and vocab against the thresholds
    tokcum = docs.select("doc_id", F.size("t").alias("ntok"))
    toks_at = (thr.join(tokcum, tokcum.doc_id <= thr.thr)
               .groupBy("frac", "k_docs")
               .agg(F.sum("ntok").cast("long").alias("n_tokens")))
    first_seen = (docs.select("doc_id", F.explode("t").alias("term"))
                  .groupBy("term").agg(F.min("doc_id").alias("first_d")))
    vocab_at = (thr.join(first_seen, first_seen.first_d <= thr.thr)
                .groupBy("frac", "k_docs")
                .agg(F.count(F.lit(1)).cast("long").alias("vocab")))
    return toks_at.join(F.broadcast(vocab_at), ["frac", "k_docs"]) \
        .select("frac", "k_docs", "n_tokens", "vocab")


def kingman_wait_estimate_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kingman_wait_estimate with the |sessions|-row unpartitioned lag
    window replaced by a two-phase rank (fixed-width bounds derived
    from one min/max pull — any boundary set is rank-correct) and an
    rn = rn+1 self-join for adjacent gaps. Exact: the rank order is
    the same total order the lag window used. The session frame is
    materialized once per pass like the live row's; the self-join is a
    co-partitioned shuffle on rn instead of a single-task sort —
    expected to be the 100 TB shape, measured either way."""
    from predictor_spark.operators.ranking import two_phase_row_number
    from predictor_spark.plans.catalog_r9_opsresearch import _sessions

    sess, span = _sessions(spark, sf_dir)
    lohi = sess.agg(F.min("start_ms").alias("lo"),
                    F.max("start_ms").alias("hi")).collect()[0]
    lo, hi = lohi["lo"], lohi["hi"]
    step = max(1, (hi - lo) // 64)
    bounds = [float(lo + i * step) for i in range(1, 64)]
    ranked = two_phase_row_number(
        sess.select("start_ms", "user_id", "session_id"), [],
        "start_ms", ["start_ms", "user_id", "session_id"],
        rank_name="rn", bounds=bounds)
    a, b = ranked.alias("a"), ranked.alias("b")
    gaps = (a.join(b, F.col("a.rn") == F.col("b.rn") + 1)
            .select((F.col("a.start_ms") - F.col("b.start_ms")).alias("g")))
    mom = gaps.agg(F.count(F.lit(1)).alias("ng"),
                   F.sum("g").alias("sg"),
                   F.sum(F.col("g").cast("decimal(38,0)") * F.col("g"))
                   .alias("sg2"))
    smom = sess.agg(F.count(F.lit(1)).alias("ns"),
                    F.sum("dur_ms").alias("ss"),
                    F.sum(F.col("dur_ms").cast("decimal(38,0)")
                          * F.col("dur_ms")).alias("ss2"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ca2 = d("sg2") * F.col("ng") / (d("sg") * F.col("sg")) - 1
    cs2 = d("ss2") * F.col("ns") / (d("ss") * F.col("ss")) - 1
    a_ = d("ss") / F.col("span_ms")
    tau = d("ss") / F.col("ns") / 60000.0
    m = F.ceil(1.25 * a_)
    rho = a_ / m
    return (mom.crossJoin(F.broadcast(smom)).crossJoin(F.broadcast(span))
            .select(
                F.col("ns").cast("long").alias("n_sessions"),
                F.round(ca2, 6).alias("ca_squared"),
                F.round(cs2, 6).alias("cs_squared"),
                m.cast("long").alias("m_servers"),
                F.round(rho, 6).alias("utilization"),
                F.round(rho / (1 - rho) * ((ca2 + cs2) / 2) * tau, 6)
                .alias("kingman_wq_min")))
