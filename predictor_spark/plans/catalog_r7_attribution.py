"""Catalog part — multi-touch marketing attribution (STAGED for r7).

The batch counterpart of the streaming `view_purchase_attribution`
operator (streaming/joins.py) and the natural extension of the funnel /
session family (catalog_behavior.py): given a conversion event and the
touchpoints that preceded it inside a lookback window, split the
conversion's value across channels under the four standard models
(Google Analytics model-comparison surface; Shao & Li, KDD 2011):

- attribution_last_touch    100% to the latest touch before conversion
- attribution_first_touch   100% to the earliest touch in the window
- attribution_linear        value split equally across all touches
- attribution_position_u    U-shaped 40/20/40: first and last touch get
                            40% each, middles share the remaining 20%
                            (n=1 -> 100%, n=2 -> 50/50)
- attribution_markov_removal  data-driven Markov removal effect
                            (Anderl et al. 2014): absorption-probability
                            loss when a channel is deleted from the
                            first-order journey chain, solved in CLOSED
                            FORM for the 2-channel state space
- attribution_shapley       Shapley value (Shapley 1953; Shao & Li 2011)
                            of the conversion-counting coalition game —
                            for 2 channels: exclusive conversions in
                            full + half of the shared ones

Scenario on the events table: conversions are `purchase` events;
touches are `view`/`click` events by the same user strictly before the
purchase and at most 7 days earlier.  Purchases with no touch in the
window are reported under the '(none)' channel so every model's
attributed total reconciles against raw purchase revenue.

Determinism: purchase value is exact integer cents; every fractional
credit is INTEGER-DIV-quantized micro-cents (cents * share_micro div n)
before any cross-row sum, so partial-aggregation order cannot move a
hash; ties on touch timestamps break on event_id.  Each output value
divides the exact integer sum once, then rounds.

Scale: one events scan per leg (conversion / touch columns pruned
independently); the touch join is per-user and time-bounded — the
canonical user-keyed temporal join, co-partitioned on user_id, never a
cross join; credits are map-side integer partials; output is <= 3 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

_CENTS = "CAST(round(value * 100) AS BIGINT)"

# conversions x lookback touches, LEFT so no-touch purchases keep a row
_PAIR_BASE = f"""
    conv AS MATERIALIZED (
        SELECT event_id AS conv_id, user_id, ts AS conv_ts,
               {_CENTS} AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS MATERIALIZED (
        SELECT user_id, event_type AS channel, ts AS touch_ts,
               event_id AS touch_id
        FROM events WHERE event_type IN ('view', 'click')
    ),
    pairs AS MATERIALIZED (
        SELECT c.conv_id, c.cents, t.channel, t.touch_ts, t.touch_id
        FROM conv c
        LEFT JOIN touch t
          ON t.user_id = c.user_id
         AND t.touch_ts < c.conv_ts
         AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
    )"""


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(conv_id, cents, channel, touch_ts, touch_id) — one row per
    (purchase, lookback touch); purchases with no touch keep one row
    with a NULL channel (left join, so reconciliation never drops
    revenue)."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    conv = (ev.filter(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("conv_id"),
                    F.col("user_id").alias("c_user"),
                    F.col("ts").alias("conv_ts"),
                    cents.alias("cents")))
    touch = (ev.filter(F.col("event_type").isin("view", "click"))
             .select(F.col("user_id").alias("t_user"),
                     F.col("event_type").alias("channel"),
                     F.col("ts").alias("touch_ts"),
                     F.col("event_id").alias("touch_id")))
    return (conv.join(
        touch,
        (F.col("t_user") == F.col("c_user"))
        & (F.col("touch_ts") < F.col("conv_ts"))
        & (F.col("touch_ts")
           >= F.col("conv_ts") - F.expr("INTERVAL 7 DAYS")),
        "left")
        .select("conv_id", "cents", "channel", "touch_ts", "touch_id"))


def _single_touch(spark: SparkSession, sf_dir: str, last: bool) -> DataFrame:
    """Shared engine plan for first/last-touch: rank the lookback touches
    per conversion, keep rank 1, roll up by channel."""
    pairs = _pairs(spark, sf_dir)
    if last:
        order = [F.col("touch_ts").desc(), F.col("touch_id").desc()]
    else:
        order = [F.col("touch_ts").asc(), F.col("touch_id").asc()]
    rn = F.row_number().over(Window.partitionBy("conv_id").orderBy(*order))
    return (pairs.withColumn("rn", rn).filter(F.col("rn") == 1)
            .groupBy(F.coalesce(F.col("channel"), F.lit("(none)"))
                     .alias("channel"))
            .agg(F.count(F.lit(1)).alias("n_conversions"),
                 F.sum("cents").alias("s"))
            .select("channel", "n_conversions",
                    F.round(F.col("s").cast("double") / 100, 2)
                    .alias("attributed_value")))


def _single_touch_sql(desc: bool) -> str:
    direction = "DESC" if desc else "ASC"
    return f"""
    WITH {_PAIR_BASE},
    ranked AS (
        SELECT conv_id, cents, channel,
               row_number() OVER (
                   PARTITION BY conv_id
                   ORDER BY touch_ts {direction} NULLS LAST,
                            touch_id {direction} NULLS LAST) AS rn
        FROM pairs
    )
    SELECT coalesce(channel, '(none)') AS channel,
           CAST(count(*) AS BIGINT) AS n_conversions,
           round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS attributed_value
    FROM ranked WHERE rn = 1
    GROUP BY 1
    """


@query("attribution_last_touch", oracle=_single_touch_sql(desc=True))
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase's full value goes to the
    channel of the latest view/click in the 7-day lookback (ties break
    on event_id); untouched purchases report under '(none)'.

    Scale: the per-user temporal join shuffles both legs once on
    user_id; rank-1 selection is one window per conversion key; the
    rollup is a <=3-group integer aggregate."""
    return _single_touch(spark, sf_dir, last=True)


@query("attribution_first_touch", oracle=_single_touch_sql(desc=False))
def attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: full value to the EARLIEST lookback
    touch — the acquisition-oriented mirror of last-touch, same plan
    with the window order reversed."""
    return _single_touch(spark, sf_dir, last=False)


@query(
    "attribution_linear",
    oracle=f"""
    WITH {_PAIR_BASE},
    sized AS (
        SELECT conv_id, cents, channel,
               count(channel) OVER (PARTITION BY conv_id) AS n
        FROM pairs
    ),
    credited AS (
        SELECT CASE WHEN n = 0 THEN '(none)' ELSE channel END AS channel,
               conv_id,
               CASE WHEN n = 0 THEN cents * 1000000
                    ELSE (cents * 1000000) // n END AS credit_micro
        FROM sized
        WHERE n = 0 OR channel IS NOT NULL
    )
    SELECT channel,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
           round(CAST(sum(credit_micro) AS DOUBLE) / 100000000.0, 4)
               AS attributed_value
    FROM credited GROUP BY 1
    """,
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear attribution: each purchase's value splits equally across
    its lookback touches.  Per-touch credit is the integer-quantized
    (cents * 1e6) div n micro-cents, so channel sums are exact bigints
    on both engines regardless of summation order.

    Scale: n-per-conversion is a count window on the pair frame (same
    partitioning as the join output — no extra shuffle); the rollup is
    a <=3-group aggregate with a distinct-conversion count."""
    pairs = _pairs(spark, sf_dir)
    n = F.count("channel").over(Window.partitionBy("conv_id"))
    sized = pairs.withColumn("n", n)
    credited = (sized.filter((F.col("n") == 0) | F.col("channel").isNotNull())
                .select(
                    F.when(F.col("n") == 0, F.lit("(none)"))
                    .otherwise(F.col("channel")).alias("channel"),
                    "conv_id",
                    F.when(F.col("n") == 0, F.col("cents") * 1000000)
                    .otherwise(F.expr("(cents * 1000000) div n"))
                    .alias("credit_micro")))
    return (credited.groupBy("channel")
            .agg(F.count_distinct("conv_id").alias("n_conversions"),
                 F.sum("credit_micro").alias("s"))
            .select("channel", "n_conversions",
                    F.round(F.col("s").cast("double") / 100000000.0, 4)
                    .alias("attributed_value")))


@query(
    "attribution_markov_removal",
    oracle=f"""
    WITH {_PAIR_BASE},
    seq AS (
        SELECT conv_id, cents, channel,
               lag(channel) OVER (PARTITION BY conv_id
                                  ORDER BY touch_ts, touch_id) AS prev,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY touch_ts DESC, touch_id DESC)
                   AS rd
        FROM pairs WHERE channel IS NOT NULL
    ),
    m AS (
        SELECT
            sum(CASE WHEN prev IS NULL AND channel = 'view'
                THEN 1 ELSE 0 END) AS sv,
            sum(CASE WHEN prev IS NULL AND channel = 'click'
                THEN 1 ELSE 0 END) AS sc,
            sum(CASE WHEN prev = 'view' AND channel = 'view'
                THEN 1 ELSE 0 END) AS vv,
            sum(CASE WHEN prev = 'view' AND channel = 'click'
                THEN 1 ELSE 0 END) AS vc,
            sum(CASE WHEN prev = 'click' AND channel = 'view'
                THEN 1 ELSE 0 END) AS cv,
            sum(CASE WHEN prev = 'click' AND channel = 'click'
                THEN 1 ELSE 0 END) AS cc,
            sum(CASE WHEN rd = 1 AND channel = 'view'
                THEN 1 ELSE 0 END) AS vk,
            sum(CASE WHEN rd = 1 AND channel = 'click'
                THEN 1 ELSE 0 END) AS ck,
            sum(CASE WHEN rd = 1 THEN cents ELSE 0 END) AS total_cents
        FROM seq
    ),
    re AS MATERIALIZED (
        SELECT total_cents,
               1.0 - (CAST(sc AS DOUBLE) / (sv + sc))
                     * (CAST(ck AS DOUBLE) / (cv + cc + ck))
                     / (1.0 - CAST(cc AS DOUBLE) / (cv + cc + ck))
                   AS re_view,
               1.0 - (CAST(sv AS DOUBLE) / (sv + sc))
                     * (CAST(vk AS DOUBLE) / (vv + vc + vk))
                     / (1.0 - CAST(vv AS DOUBLE) / (vv + vc + vk))
                   AS re_click
        FROM m
    )
    SELECT channel, round(re, 6) AS removal_effect,
           round(re / (re_view + re_click), 6) AS attribution_share,
           round(re / (re_view + re_click) * total_cents / 100, 2)
               AS attributed_value
    FROM (
        SELECT 'view' AS channel, re_view AS re, re_view, re_click,
               total_cents FROM re
        UNION ALL
        SELECT 'click', re_click, re_view, re_click, total_cents FROM re
    )
    """,
)
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven Markov attribution by removal effect (Anderl et al.
    2014; Shao & Li 2011): journeys form a first-order chain over
    states {START, view, click, CONV}; a channel's effect is the loss
    in absorption probability when every path through it is deleted.
    For the 2-channel space the absorbing-chain solve is CLOSED FORM —
    removing 'view' leaves p = P(START->c) * P(c->CONV)/(1 - P(c->c)),
    so RE_view = 1 - p (the full graph absorbs with probability 1 by
    construction: only converting journeys enter the model).  Channel
    value = total touched-conversion revenue split by normalized
    removal effects.

    Determinism: the chain is summarized by 8 exact integer transition
    counts + 1 exact cents total in ONE global conditional aggregate;
    every probability and removal effect is a one-shot double
    expression over them, rounded in-query.

    Scale: the same per-user lookback join as the other attribution
    rows, then one window pass (two sort orders over the conversion-key
    partitioning) and a single 1-row aggregate — no per-journey state,
    no iteration, no driver math."""
    pairs = _pairs(spark, sf_dir).filter(F.col("channel").isNotNull())
    w = Window.partitionBy("conv_id")
    seq = pairs.select(
        "conv_id", "cents", "channel",
        F.lag("channel").over(
            w.orderBy(F.col("touch_ts").asc(), F.col("touch_id").asc()))
        .alias("prev"),
        F.row_number().over(
            w.orderBy(F.col("touch_ts").desc(), F.col("touch_id").desc()))
        .alias("rd"))

    def cnt(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    pv, ch = F.col("prev"), F.col("channel")
    m = seq.agg(
        cnt(pv.isNull() & (ch == "view")).alias("sv"),
        cnt(pv.isNull() & (ch == "click")).alias("sc"),
        cnt((pv == "view") & (ch == "view")).alias("vv"),
        cnt((pv == "view") & (ch == "click")).alias("vc"),
        cnt((pv == "click") & (ch == "view")).alias("cv"),
        cnt((pv == "click") & (ch == "click")).alias("cc"),
        cnt((F.col("rd") == 1) & (ch == "view")).alias("vk"),
        cnt((F.col("rd") == 1) & (ch == "click")).alias("ck"),
        F.sum(F.when(F.col("rd") == 1, F.col("cents")).otherwise(0))
        .alias("total_cents"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    re_view = (F.lit(1.0)
               - (d("sc") / (F.col("sv") + F.col("sc")))
               * (d("ck") / (F.col("cv") + F.col("cc") + F.col("ck")))
               / (F.lit(1.0) - d("cc")
                  / (F.col("cv") + F.col("cc") + F.col("ck"))))
    re_click = (F.lit(1.0)
                - (d("sv") / (F.col("sv") + F.col("sc")))
                * (d("vk") / (F.col("vv") + F.col("vc") + F.col("vk")))
                / (F.lit(1.0) - d("vv")
                   / (F.col("vv") + F.col("vc") + F.col("vk"))))
    # 1-row frame, referenced by BOTH union legs — cached so the
    # journey join + window pass runs once, not twice
    re = m.select(re_view.alias("re_view"), re_click.alias("re_click"),
                  "total_cents").cache()
    rows = (re.select(F.lit("view").alias("channel"),
                      F.col("re_view").alias("re"),
                      "re_view", "re_click", "total_cents")
            .unionAll(re.select(F.lit("click").alias("channel"),
                                F.col("re_click").alias("re"),
                                "re_view", "re_click", "total_cents")))
    share = F.col("re") / (F.col("re_view") + F.col("re_click"))
    return rows.select(
        "channel", F.round("re", 6).alias("removal_effect"),
        F.round(share, 6).alias("attribution_share"),
        F.round(share * F.col("total_cents") / 100, 2)
        .alias("attributed_value"))


@query(
    "attribution_shapley",
    oracle=f"""
    WITH {_PAIR_BASE},
    sets AS (
        SELECT conv_id, max(cents) AS cents,
               max(CASE WHEN channel = 'view' THEN 1 ELSE 0 END) AS hv,
               max(CASE WHEN channel = 'click' THEN 1 ELSE 0 END) AS hc
        FROM pairs WHERE channel IS NOT NULL
        GROUP BY conv_id
    ),
    m AS (
        SELECT
            sum(CASE WHEN hv = 1 AND hc = 0 THEN 1 ELSE 0 END) AS nv,
            sum(CASE WHEN hv = 0 AND hc = 1 THEN 1 ELSE 0 END) AS nc,
            sum(CASE WHEN hv = 1 AND hc = 1 THEN 1 ELSE 0 END) AS nb,
            sum(CASE WHEN hv = 1 AND hc = 0 THEN cents ELSE 0 END) AS cv,
            sum(CASE WHEN hv = 0 AND hc = 1 THEN cents ELSE 0 END) AS cc,
            sum(CASE WHEN hv = 1 AND hc = 1 THEN cents ELSE 0 END) AS cb
        FROM sets
    )
    SELECT channel,
           round(n_excl + CAST(nb AS DOUBLE) / 2, 1)
               AS shapley_conversions,
           -- 4 dp: the exact value has <= 3 decimals (half-cents /
           -- 100), so no engine ever rounds AT a boundary (a 2-dp
           -- round of x.xx5 is the classic half-up knife edge)
           round((c_excl + CAST(cb AS DOUBLE) / 2) / 100, 4)
               AS shapley_value
    FROM (
        SELECT 'view' AS channel, nv AS n_excl, cv AS c_excl, nb, cb
        FROM m
        UNION ALL
        SELECT 'click', nc, cc, nb, cb FROM m
    )
    """,
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value attribution (Shapley 1953; the Shao & Li 2011
    game): the characteristic function counts conversions whose
    channel set is covered by the coalition, so for two channels the
    value collapses to exclusive conversions in full plus HALF of the
    both-channel conversions — computed from six exact integer sums in
    one aggregate over the per-conversion channel-set frame.

    Scale: the lookback join reduces to one row per conversion
    (groupBy on the conversion key), then a 1-row global aggregate;
    the union legs read the same 1-row cached frame."""
    pairs = _pairs(spark, sf_dir).filter(F.col("channel").isNotNull())
    sets = (pairs.groupBy("conv_id")
            .agg(F.max("cents").alias("cents"),
                 F.max(F.when(F.col("channel") == "view", 1).otherwise(0))
                 .alias("hv"),
                 F.max(F.when(F.col("channel") == "click", 1).otherwise(0))
                 .alias("hc")))
    vo = (F.col("hv") == 1) & (F.col("hc") == 0)
    co = (F.col("hv") == 0) & (F.col("hc") == 1)
    bo = (F.col("hv") == 1) & (F.col("hc") == 1)
    m = sets.agg(
        F.sum(F.when(vo, 1).otherwise(0)).alias("nv"),
        F.sum(F.when(co, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(bo, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(vo, F.col("cents")).otherwise(0)).alias("cv"),
        F.sum(F.when(co, F.col("cents")).otherwise(0)).alias("cc"),
        F.sum(F.when(bo, F.col("cents")).otherwise(0)).alias("cb")).cache()
    rows = (m.select(F.lit("view").alias("channel"),
                     F.col("nv").alias("n_excl"),
                     F.col("cv").alias("c_excl"), "nb", "cb")
            .unionAll(m.select(F.lit("click").alias("channel"),
                               F.col("nc").alias("n_excl"),
                               F.col("cc").alias("c_excl"), "nb", "cb")))
    return rows.select(
        "channel",
        F.round(F.col("n_excl") + F.col("nb").cast("double") / 2, 1)
        .alias("shapley_conversions"),
        F.round((F.col("c_excl") + F.col("cb").cast("double") / 2) / 100,
                4).alias("shapley_value"))


@query(
    "attribution_position_u",
    oracle=f"""
    WITH {_PAIR_BASE},
    ranked AS (
        SELECT conv_id, cents, channel,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY touch_ts, touch_id) AS ra,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY touch_ts DESC, touch_id DESC)
                   AS rd
        FROM pairs
    ),
    credited AS (
        -- n touches per conversion = ra + rd - 1 on ANY of its rows (the
        -- two ranks run over the same partition), so no third window pass
        SELECT CASE WHEN channel IS NULL THEN '(none)'
                    ELSE channel END AS channel,
               conv_id,
               CASE WHEN channel IS NULL THEN cents * 1000000
                    WHEN ra + rd - 1 = 1 THEN cents * 1000000
                    WHEN ra + rd - 1 = 2 THEN cents * 500000
                    WHEN ra = 1 OR rd = 1 THEN cents * 400000
                    ELSE (cents * 200000) // (ra + rd - 3) END AS credit_micro
        FROM ranked
    )
    SELECT channel,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
           round(CAST(sum(credit_micro) AS DOUBLE) / 100000000.0, 4)
               AS attributed_value
    FROM credited GROUP BY 1
    """,
)
def attribution_position_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) attribution: first and last touch get
    40% each, the middles share 20% equally; degenerate journeys fall
    back to 100% (n=1) or 50/50 (n=2).  All shares are integer-div
    micro-cents — exact under any summation order.

    Scale: the touch count per conversion falls out of the two position
    ranks (n = ra + rd - 1, both over the SAME conversion-key
    partitioning: one shuffle, two sort orders, no third window pass);
    the rollup is a <=3-group aggregate."""
    pairs = _pairs(spark, sf_dir)
    w = Window.partitionBy("conv_id")
    ranked = pairs.select(
        "conv_id", "cents", "channel",
        F.row_number().over(
            w.orderBy(F.col("touch_ts").asc_nulls_last(),
                      F.col("touch_id").asc_nulls_last())).alias("ra"),
        F.row_number().over(
            w.orderBy(F.col("touch_ts").desc_nulls_last(),
                      F.col("touch_id").desc_nulls_last())).alias("rd"))
    n = F.col("ra") + F.col("rd") - 1
    credit = (F.when(F.col("channel").isNull(), F.col("cents") * 1000000)
              .when(n == 1, F.col("cents") * 1000000)
              .when(n == 2, F.col("cents") * 500000)
              .when((F.col("ra") == 1) | (F.col("rd") == 1),
                    F.col("cents") * 400000)
              .otherwise(F.expr("(cents * 200000) div (ra + rd - 3)")))
    credited = ranked.select(
        F.when(F.col("channel").isNull(), F.lit("(none)"))
        .otherwise(F.col("channel")).alias("channel"),
        "conv_id", credit.alias("credit_micro"))
    return (credited.groupBy("channel")
            .agg(F.count_distinct("conv_id").alias("n_conversions"),
                 F.sum("credit_micro").alias("s"))
            .select("channel", "n_conversions",
                    F.round(F.col("s").cast("double") / 100000000.0, 4)
                    .alias("attributed_value")))
