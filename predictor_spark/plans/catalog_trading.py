"""Catalog part 10 — trading-strategy simulation queries.

The backtest is a per-series stateful fold (operators/trading.py). The
driver oracle replays the identical state machine inside DuckDB as a
RECURSIVE CTE: the working table carries one state row per series
(balance, open position, last-3 entry times, accumulated trades) and each
iteration folds in tick i+1 for every series at once. Layered derived
tables (z0..z3) stage the intermediate expressions because DuckDB expands
lateral column aliases by substitution — a deep alias chain (rr -> rb ->
pb -> ...) would blow up exponentially at bind time. Arithmetic is written
in the exact operation order of simulate_series so every double matches
bit-for-bit; tests/test_trading.py holds the scenario + pandas-parity
coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.operators.trading import (
    simulate_heuristic_strategy,
    trading_summary,
)
from predictor_spark.plans.catalog import _t, query

# Recursive-CTE replay of operators/trading.py simulate_series (horizon=6,
# default params). Ends with a `tr(user_id, t STRUCT)` CTE of closed trades
# including the end-of-series force-close.
_SIM_CTE = r"""
WITH RECURSIVE ordered AS (
    SELECT user_id, ts, value AS p,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS i
    FROM events
),
ticks AS (
    SELECT user_id, i, ts, p,
           count(p) OVER w AS nx,
           max(p) OVER w AS mx,
           min(p) OVER w AS mn
    FROM ordered
    WINDOW w AS (PARTITION BY user_id ORDER BY i
                 ROWS BETWEEN 1 FOLLOWING AND 6 FOLLOWING)
),
sim AS (
    SELECT user_id, CAST(-1 AS BIGINT) AS i, CAST(10000.0 AS DOUBLE) AS bal,
           CAST(NULL AS VARCHAR) AS dir,
           CAST(NULL AS DOUBLE) AS entry,
           CAST(NULL AS TIMESTAMP) AS entry_ts,
           CAST(NULL AS BIGINT) AS entry_i,
           CAST(NULL AS DOUBLE) AS sz,
           CAST(NULL AS DOUBLE) AS tp,
           CAST(NULL AS DOUBLE) AS sl,
           CAST(NULL AS DOUBLE) AS extreme,
           CAST([] AS TIMESTAMP[]) AS ets,
           CAST([] AS STRUCT(e_ts TIMESTAMP, x_ts TIMESTAMP, dir VARCHAR,
                entry DOUBLE, ex DOUBLE, sz DOUBLE, pnl DOUBLE, pips DOUBLE,
                dur INTEGER, mdd DOUBLE, bal DOUBLE)[]) AS trades,
           CAST(NULL AS DOUBLE) AS last_p,
           CAST(NULL AS TIMESTAMP) AS last_ts
    FROM (SELECT DISTINCT user_id FROM events)
    UNION ALL
    SELECT user_id, i,
           (CASE WHEN hit THEN bal_cl ELSE s_bal END) AS bal,
           (CASE WHEN hit THEN NULL WHEN is_open THEN s_dir
                 WHEN entering AND go_long THEN 'long'
                 WHEN entering THEN 'short' END) AS dir,
           (CASE WHEN hit THEN NULL WHEN is_open THEN s_entry
                 WHEN entering THEN p END) AS entry,
           (CASE WHEN hit THEN NULL WHEN is_open THEN s_entry_ts
                 WHEN entering THEN ts END) AS entry_ts,
           (CASE WHEN hit THEN NULL WHEN is_open THEN s_entry_i
                 WHEN entering THEN i END) AS entry_i,
           (CASE WHEN hit THEN NULL WHEN is_open THEN s_sz
                 WHEN entering THEN sz_c END) AS sz,
           (CASE WHEN hit THEN NULL WHEN is_open THEN s_tp
                 WHEN entering AND go_long THEN p + 0.9 * pb * 0.01
                 WHEN entering THEN p - 0.9 * ps * 0.01 END) AS tp,
           (CASE WHEN hit THEN NULL WHEN is_open THEN s_sl
                 WHEN entering AND go_long THEN p - 2.0 * db * 0.01
                 WHEN entering THEN p + 2.0 * ds * 0.01 END) AS sl,
           (CASE WHEN hit THEN NULL WHEN is_open THEN x_new
                 WHEN entering THEN p END) AS extreme,
           (CASE WHEN entering THEN list_append(ets_keep, ts)
                 ELSE s_ets END) AS ets,
           (CASE WHEN hit THEN list_append(s_trades, struct_pack(
                     e_ts := s_entry_ts, x_ts := ts, dir := s_dir,
                     entry := s_entry, ex := p, sz := s_sz, pnl := pnl_c,
                     pips := sgn * (p - s_entry) / 0.01,
                     dur := CAST(i - s_entry_i AS INTEGER),
                     mdd := sgn * (s_entry - x_new) / 0.01, bal := bal_cl))
                 ELSE s_trades END) AS trades,
           p AS last_p, ts AS last_ts
    FROM (
      SELECT z2.*,
             ((NOT is_open) AND nx = 6 AND recent_cnt < 3
              AND (go_long OR go_short) AND sz_c > 0) AS entering
      FROM (
        SELECT z1.*,
               least(CASE WHEN rr >= 2.0 THEN 100.0
                          WHEN rr <= 0.5 THEN 1.0
                          ELSE 1.0 + (rr - 0.5) / (2.0 - 0.5) * (100.0 - 1.0) END,
                     s_bal * 0.05 * 100.0) AS sz_c,
               (s_bal + pnl_c) AS bal_cl
        FROM (
          SELECT z0a.*, z0.rb, z0.rs,
                 (pb >= 5.0 AND rb >= rs) AS go_long,
                 (NOT (pb >= 5.0 AND rb >= rs) AND ps >= 5.0 AND rs > rb) AS go_short,
                 (CASE WHEN pb >= 5.0 AND rb >= rs THEN rb
                       WHEN NOT (pb >= 5.0 AND rb >= rs) AND ps >= 5.0 AND rs > rb THEN rs
                       ELSE 0.0 END) AS rr,
                 (is_open AND (CASE WHEN s_dir = 'long'
                       THEN p >= s_tp OR (CASE WHEN nx > 0 THEN mn ELSE p END) < s_sl
                       ELSE p <= s_tp OR (CASE WHEN nx > 0 THEN mx ELSE p END) > s_sl
                  END)) AS hit,
                 (CASE WHEN NOT is_open THEN NULL
                       WHEN s_dir = 'long' THEN least(s_extreme, p)
                       ELSE greatest(s_extreme, p) END) AS x_new,
                 (sgn * (p - s_entry) * s_sz) AS pnl_c
          FROM (
            SELECT s.user_id, t.i, t.ts, t.p, t.nx, t.mx, t.mn,
                   s.bal AS s_bal, s.dir AS s_dir, s.entry AS s_entry,
                   s.entry_ts AS s_entry_ts, s.entry_i AS s_entry_i,
                   s.sz AS s_sz, s.tp AS s_tp, s.sl AS s_sl,
                   s.extreme AS s_extreme, s.ets AS s_ets, s.trades AS s_trades,
                   (s.dir IS NOT NULL) AS is_open,
                   (CASE WHEN s.dir = 'long' THEN 1.0 ELSE -1.0 END) AS sgn,
                   length(list_filter(s.ets,
                       d -> date_diff('microsecond', d, t.ts) // 86400000000 < 5)) AS recent_cnt,
                   ((t.mx - t.p) / 0.01) AS pb,
                   (CASE WHEN t.p > t.mn THEN (t.p - t.mn) / 0.01 ELSE 10.0 END) AS db,
                   ((t.p - t.mn) / 0.01) AS ps,
                   (CASE WHEN t.p < t.mx THEN (t.mx - t.p) / 0.01 ELSE 10.0 END) AS ds,
                   s.ets[greatest(length(s.ets) - 1, 1):length(s.ets)] AS ets_keep
            FROM sim s JOIN ticks t ON t.user_id = s.user_id AND t.i = s.i + 1
          ) z0a, LATERAL (SELECT
                 CASE WHEN z0a.db > 0 THEN z0a.pb / z0a.db ELSE 0.0 END AS rb,
                 CASE WHEN z0a.ds > 0 THEN z0a.ps / z0a.ds ELSE 0.0 END AS rs) z0
        ) z1
      ) z2
    ) z3
),
fin AS (
    SELECT s.* FROM sim s
    JOIN (SELECT user_id, max(i) AS mi FROM sim GROUP BY user_id) m
      ON s.user_id = m.user_id AND s.i = m.mi
),
closed AS (
    SELECT user_id, i, entry_i, entry_ts, last_ts, dir, entry, last_p, sz,
           extreme, trades, bal,
           (CASE WHEN dir = 'long' THEN 1.0 ELSE -1.0 END) AS fsgn,
           ((CASE WHEN dir = 'long' THEN 1.0 ELSE -1.0 END) * (last_p - entry) * sz) AS pnl_fc
    FROM fin
),
withfc AS (
    SELECT user_id,
           CASE WHEN dir IS NULL THEN trades
                ELSE list_append(trades, struct_pack(
                     e_ts := entry_ts, x_ts := last_ts, dir := dir,
                     entry := entry, ex := last_p, sz := sz, pnl := pnl_fc,
                     pips := fsgn * (last_p - entry) / 0.01,
                     dur := CAST(i - entry_i AS INTEGER),
                     mdd := fsgn * (entry - extreme) / 0.01,
                     bal := bal + pnl_fc))
           END AS all_trades
    FROM closed
),
tr AS (SELECT user_id, unnest(all_trades) AS t FROM withfc)
"""


@query(
    "trading_sim_trades",
    oracle=_SIM_CTE + """
    SELECT user_id, t.e_ts AS entry_ts, t.x_ts AS exit_ts, t.dir AS direction,
           round(t.entry, 6) + 0.0 AS entry, round(t.ex, 6) + 0.0 AS exit,
           round(t.sz, 6) + 0.0 AS size, round(t.pnl, 6) + 0.0 AS pnl,
           round(t.pips, 6) + 0.0 AS pips, round(t.mdd, 6) + 0.0 AS max_dd,
           round(t.bal, 6) + 0.0 AS balance, t.dur AS duration
    FROM tr
    """,
)
def trading_sim_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trades table generated by the heuristic strategy over every
    user's event series (perfect-foresight predictions, RR-sized orders,
    TP/SL exits, end-of-series force-close —
    app/heuristic_strategy.py:109-299,301-387 semantics). One
    applyInPandas task per series; rounded for stable output."""
    ev = _t(spark, sf_dir, "events")
    tr = simulate_heuristic_strategy(ev, horizon=6)
    return tr.select(
        "user_id", "entry_ts", "exit_ts", "direction",
        # + 0.0 normalizes IEEE -0.0 (short force-close with extreme == entry
        # yields -1.0 * 0 / pip = -0.0); the oracle applies the same + 0.0 so
        # both sides agree on the sign bit of zero.
        *[(F.round(c, 6) + F.lit(0.0)).alias(c) for c in
          ("entry", "exit", "size", "pnl", "pips", "max_dd", "balance")],
        "duration",
    )


@query(
    "trading_sim_summary",
    oracle=_SIM_CTE + """
    SELECT user_id,
           count(*) AS n_trades,
           round(avg(t.pnl), 4) AS avg_pnl,
           round(avg(t.pips), 4) AS avg_pips,
           round(avg(abs(t.pips)), 4) AS avg_abs_pips,
           round(avg(t.dur), 4) AS avg_duration,
           round(avg(t.mdd), 4) AS avg_max_dd,
           round(least(min(t.bal), 10000.0), 4) AS min_balance,
           round(struct_extract(max(struct_pack(x := t.x_ts, b := t.bal)), 'b'),
                 4) AS final_balance
    FROM tr GROUP BY user_id
    """,
)
def trading_sim_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series closed-trade summary (the reference's stop() printout,
    heuristic_strategy.py:301-387): counts, average pnl/pips/duration/
    drawdown, min + final balance. Feeds the same aggregate family as
    a11_trading_aggregates."""
    ev = _t(spark, sf_dir, "events")
    return trading_summary(simulate_heuristic_strategy(ev, horizon=6))
