"""Round-13 perf prototypes + swapped-out reference plans — NOT
registered, NOT imported by any catalog module (zero closure-hash
churn; same discipline as proto_r12.py).

r13 status: the three scheduled swaps LANDED in their live rows, in
their final driver-side-prefix-sum form (zero unpartitioned windows;
sf1 warm vs the window forms kept below: mutual_info 3.90 → 1.86 s,
funnel 0.73 → 0.77 s, heaps ~2.0 → 1.92 s) — see the live docstrings
in catalog_drift / catalog_r10_funnel / catalog_textstats.  This
module keeps the PRE-SWAP window-form plans (`*_window` below)
verbatim, so the equality pins in tests/test_r13_prototypes.py
compare two genuinely different physical plans — the same evidence
standard the r12 hybrid_rrf pin set — instead of a plan against
itself.

Still HELD here (prototyped, exact, measured locally slower; swap
triggers with r13-measured sf1 frame sizes in the live rows'
docstrings — deciles ≈ sf 700, kingman ≈ sf 10):

- `lift_gain_deciles_v2` / `causal_decile_agg_v2`: the
  operators/ranking.exact_ntile swap (collect_spans=True — the
  zero-unpartitioned-window mode) for the per-user score frames of
  catalog_eval.lift_gain_deciles and catalog_r7_causal._decile_agg.
  (lift's own 10-row decile cumsum now also runs driver-side on the
  collected agg frame — the full prototype is zero-unpartitioned-
  window, swap-ready as-is.)
- `kingman_wait_estimate_v2`: two-phase rank + rn self-join replacing
  the |sessions|-row unpartitioned lag window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.operators.ranking import exact_ntile
from predictor_spark.plans.catalog import _t


def mutual_info_value_type_window(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The PRE-r13 registered plan, verbatim: ntile(10) over a
    (value, event_id) global order — the ENTIRE event stream through
    one sort task (PARALLELISM_AUDIT.md Class C #1 before the swap).
    Kept as the equality-pin reference for the live histogram-
    refinement plan in catalog_drift.py."""
    ev = _t(spark, sf_dir, "events")
    dec = ev.select(
        "event_type",
        F.ntile(10).over(Window.orderBy("value", "event_id")).alias("dec"))
    joint = dec.groupBy("event_type", "dec").agg(
        F.count(F.lit(1)).alias("c"))
    tot = joint.agg(F.sum("c").cast("double").alias("n"))
    wx = Window.partitionBy("event_type")
    wy = Window.partitionBy("dec")
    m = (joint
         .withColumn("cx", F.sum("c").over(wx))
         .withColumn("cy", F.sum("c").over(wy))
         .crossJoin(F.broadcast(tot)))
    term = ((F.col("c") / F.col("n"))
            * F.log((F.col("c") * F.col("n"))
                    / (F.col("cx").cast("double") * F.col("cy"))))
    return m.agg(F.round(F.sum(term), 6).alias("mutual_info_nats"))


def funnel_latency_quantiles_window(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """The PRE-r13 registered plan, verbatim: row_number over the full
    |converters| frame in one task.  Equality-pin reference for the
    live support-span order-statistics plan in catalog_r10_funnel.py."""
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
    w = Window.orderBy("lat_s", "user_id")
    ranked = lat.select(
        "lat_s", F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))).alias("n"))
    return ranked.agg(
        F.max("n").cast("long").alias("n_converters"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                     F.col("lat_s"))).alias("p50_latency_s"),
        F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"),
                     F.col("lat_s"))).alias("p90_latency_s"))


def heaps_vocab_growth_window(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The PRE-r13 registered plan, verbatim: row_number over the full
    |docs| frame in one task (plus the cached tokenized frame).
    Equality-pin reference for the live bucket-refinement plan in
    catalog_textstats.py."""
    from predictor_spark.operators.text import tokens_col

    docs = _t(spark, sf_dir, "documents")
    r = F.row_number().over(Window.orderBy("doc_id"))
    ranked = docs.select("doc_id", tokens_col("text").alias("t")) \
        .withColumn("r", r).cache()
    nd = ranked.agg(F.max("r").alias("nd"))
    first_seen = (ranked.select("r", F.explode("t").alias("term"))
                  .groupBy("term").agg(F.min("r").alias("first_r")))
    tokcum = ranked.select("r", F.size("t").alias("ntok"))
    cp = (spark.createDataFrame([(0.1,), (0.25,), (0.5,), (1.0,)],
                                "frac double")
          .crossJoin(F.broadcast(nd))
          .select("frac", F.ceil(F.col("frac") * F.col("nd"))
                  .cast("long").alias("k_docs")))
    toks_at = (cp.join(tokcum, tokcum.r <= cp.k_docs)
               .groupBy("frac", "k_docs")
               .agg(F.sum("ntok").cast("long").alias("n_tokens")))
    vocab_at = (cp.join(first_seen, first_seen.first_r <= cp.k_docs)
                .groupBy("frac", "k_docs")
                .agg(F.count(F.lit(1)).cast("long").alias("vocab")))
    return toks_at.join(F.broadcast(vocab_at), ["frac", "k_docs"]) \
        .select("frac", "k_docs", "n_tokens", "vocab")


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
                      tile_name="decile", descending=True,
                      collect_spans=True)
    agg = (dec.select("label", "decile")
           .groupBy("decile")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("label").alias("pos"))
           .cache())
    tot = agg.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    # The decile cumulative sum runs DRIVER-SIDE on the collected
    # <=10-row agg frame (the r13 funnel/heaps idiom) — an
    # unpartitioned window here, however small, re-logs
    # "No Partition Defined" per AQE replan.  Mirrors window-sum null
    # semantics: nulls skipped, prefix stays null until the first
    # non-null.
    acc, cum_rows = None, []
    for r in sorted(agg.select("decile", "pos").collect(),
                    key=lambda r: r["decile"]):
        if r["pos"] is not None:
            acc = (acc or 0) + int(r["pos"])
        cum_rows.append((r["decile"], acc))
    cum_df = spark.createDataFrame(
        cum_rows, "decile bigint, cum_pos bigint")
    return (
        agg.crossJoin(F.broadcast(tot))
        .join(F.broadcast(cum_df), "decile")
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
                      tile_name="decile", descending=True,
                      collect_spans=True)
    t = F.col("treat") == 1
    return (dec.select("treat", "label", "decile")
            .groupBy("decile")
            .agg(F.sum(t.cast("int")).alias("nt"),
                 F.sum((~t).cast("int")).alias("nc"),
                 F.sum(F.when(t, F.col("label")).otherwise(0)).alias("pt"),
                 F.sum(F.when(~t, F.col("label")).otherwise(0)).alias("pc")))


def kingman_wait_estimate_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kingman_wait_estimate with the |sessions|-row unpartitioned lag
    window replaced by a two-phase rank (fixed-width bounds derived
    from one min/max pull — any boundary set is rank-correct) and an
    rn = rn+1 self-join for adjacent gaps. Exact: the rank order is
    the same total order the lag window used; the self-join is a
    co-partitioned shuffle on rn instead of a single-task sort — the
    100 TB shape. The session and ranked frames are CACHED, each
    being consumed twice (r13 finding: un-cached, the sessionization
    window recomputed per consumer — 5.3 s at sf1 vs 4.2 s cached).
    Still HELD: the live lag form runs 2.2–3.0 s on the same data,
    BUT the r13 measurement corrected the frame-size assumption —
    |sessions| = 954,650 at sf1 (≈ |events|, the 30-min gap rule
    makes nearly every event its own session), so the ~10^7-row swap
    trigger sits at ≈ SF 10, first of the held rows to fire."""
    from predictor_spark.operators.ranking import two_phase_row_number
    from predictor_spark.plans.catalog_r9_opsresearch import _sessions

    sess, span = _sessions(spark, sf_dir)
    sess = sess.cache()
    lohi = sess.agg(F.min("start_ms").alias("lo"),
                    F.max("start_ms").alias("hi")).collect()[0]
    lo, hi = lohi["lo"], lohi["hi"]
    step = max(1, (hi - lo) // 64)
    bounds = [float(lo + i * step) for i in range(1, 64)]
    ranked = two_phase_row_number(
        sess.select("start_ms", "user_id", "session_id"), [],
        "start_ms", ["start_ms", "user_id", "session_id"],
        rank_name="rn", bounds=bounds).cache()
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
