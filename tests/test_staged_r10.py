"""Tests for the STAGED round-10 catalog families.

Same contract as test_staged_r7/r8.py: the DuckDB oracle sweep proves
Spark == SQL replay; these tests prove both match the MATH via an
independent pure-pandas/numpy reimplementation of each spec, plus
family-specific invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def ladder():
    """Per-user ordered funnel timestamps, computed in pandas."""
    ev = _events()
    mv = (ev[ev.event_type == "view"].groupby("user_id")["ts"].min()
          .rename("mv"))
    e = ev.merge(mv, on="user_id")
    mp = (e[(e.event_type == "purchase") & (e.ts > e.mv)]
          .groupby("user_id")["ts"].min().rename("mp"))
    return ev, mv, mp


class TestFunnel:
    def test_conversion_7d_matches_pandas(self, spark, ladder):
        from predictor_spark.plans.catalog_r10_funnel import (
            funnel_conversion_7d)

        ev, mv, mp = ladder
        j = pd.concat([mv, mp], axis=1)
        conv = ((j.mp - j.mv) <= pd.Timedelta(days=7)) & j.mp.notna()
        row = funnel_conversion_7d(spark, SF_DIR).collect()[0]
        assert row["n_viewers"] == len(mv)
        assert row["n_converted_7d"] == int(conv.sum())
        assert row["conv_rate_7d"] == pytest.approx(
            conv.sum() / len(mv), abs=1e-6)

    def test_latency_quantiles_are_exact_order_stats(self, spark, ladder):
        from predictor_spark.plans.catalog_r10_funnel import (
            funnel_latency_quantiles)

        ev, mv, mp = ladder
        j = pd.concat([mv, mp], axis=1).dropna()
        lat = ((j.mp - j.mv).dt.total_seconds().astype(np.int64)
               .rename("lat_s").reset_index())
        lat = lat.sort_values(["lat_s", "user_id"]).reset_index(drop=True)
        n = len(lat)
        p50 = int(lat.lat_s.iloc[(n + 1) // 2 - 1])
        p90 = int(lat.lat_s.iloc[(9 * n + 9) // 10 - 1])
        row = funnel_latency_quantiles(spark, SF_DIR).collect()[0]
        assert row["n_converters"] == n
        assert row["p50_latency_s"] == p50
        assert row["p90_latency_s"] == p90
        # order statistics must be actual observed latencies
        assert p50 in set(lat.lat_s) and p90 in set(lat.lat_s)

    def test_daily_cohorts_partition_viewers(self, spark, ladder):
        from predictor_spark.plans.catalog_r10_funnel import (
            funnel_daily_cohorts)

        ev, mv, mp = ladder
        rows = funnel_daily_cohorts(spark, SF_DIR).collect()
        # cohorts partition the viewer population
        assert sum(r["n_viewers"] for r in rows) == len(mv)
        for r in rows:
            assert 0 <= r["n_converted"] <= r["n_viewers"]
            assert r["conv_rate"] == pytest.approx(
                r["n_converted"] / r["n_viewers"], abs=1e-6)
        # cohort keys are ISO dates (strings — nested/date types are
        # forbidden in registered outputs)
        assert all(isinstance(r["cohort_day"], str)
                   and len(r["cohort_day"]) == 10 for r in rows)

    def test_abandonment_profile_matches_pandas(self, spark, ladder):
        from predictor_spark.plans.catalog_r10_funnel import (
            funnel_abandonment_profile)

        ev, mv, mp = ladder
        e = ev.merge(mv, on="user_id")
        in24 = e[(e.event_type == "purchase") & (e.ts > e.mv)
                 & ((e.ts - e.mv) <= pd.Timedelta(hours=24))]
        stalled = set(mv.index) - set(in24.user_id)
        last = (ev[ev.user_id.isin(stalled)]
                .sort_values(["user_id", "ts", "event_id"])
                .groupby("user_id").tail(1))
        want = last.event_type.value_counts().to_dict()
        rows = funnel_abandonment_profile(spark, SF_DIR).collect()
        got = {r["last_event_type"]: r["n_users"] for r in rows}
        assert got == want
        assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-4)


@pytest.fixture(scope="module")
def surv_obs():
    """Pandas twin of the signup->purchase observation table."""
    ev = _events()
    su = (ev[ev.event_type == "signup"].groupby("user_id")["ts"].min()
          .rename("t0").reset_index())
    pur = ev[ev.event_type == "purchase"][["user_id", "ts"]]
    j = su.merge(pur, on="user_id", how="left")
    j = j[j.ts.isna() | (j.ts > j.t0)]
    t1 = j.groupby("user_id")["ts"].min().rename("t1")
    obs = su.set_index("user_id").join(t1)
    dur = np.floor((obs.t1 - obs.t0).dt.total_seconds() / 3600)
    obs["died"] = obs.t1.notna() & (dur <= 72)
    obs["t"] = np.where(obs.t1.isna(), 72,
                        np.minimum(dur.fillna(72), 72)).astype(np.int64)
    obs["g1"] = obs.index % 2 == 0
    return obs


class TestSurvival2:
    def _risk(self, obs):
        per_t = (obs.groupby("t")
                 .agg(ucnt=("died", "size"), d=("died", "sum"),
                      ucnt1=("g1", "sum"),
                      d1=("died", lambda s: int((s & obs.loc[s.index, "g1"]).sum())))
                 .sort_index(ascending=False))
        per_t["n"] = per_t.ucnt.cumsum()
        per_t["n1"] = per_t.ucnt1.cumsum()
        return per_t.sort_index()

    def test_logrank_matches_pandas(self, spark, surv_obs):
        from predictor_spark.plans.catalog_r10_survival2 import (
            logrank_signup_cohorts)

        per_t = self._risk(surv_obs)
        dead = per_t[per_t.d > 0]
        o1 = int(dead.d1.sum())
        e1 = float((dead.n1 * dead.d / dead.n).sum())
        p = dead.n1 / dead.n
        v = float((dead.d * p * (1 - p) * (dead.n - dead.d)
                   / np.maximum(dead.n - 1, 1)).sum())
        row = logrank_signup_cohorts(spark, SF_DIR).collect()[0]
        assert row["observed_g1"] == o1
        assert row["expected_g1"] == pytest.approx(e1, abs=2e-6)
        assert row["variance"] == pytest.approx(v, abs=2e-6)
        assert row["logrank_z"] == pytest.approx(
            (o1 - e1) / np.sqrt(v), abs=2e-5)
        assert row["logrank_chi2"] == pytest.approx(
            (o1 - e1) ** 2 / v, abs=2e-5)

    def test_rmst_matches_direct_integration(self, spark, surv_obs):
        from predictor_spark.plans.catalog_r10_survival2 import (
            rmst_signup_72h)

        per_t = self._risk(surv_obs)
        dead = per_t[per_t.d > 0]
        surv = (1 - dead.d / dead.n).cumprod()
        ts = list(dead.index)
        rmst = float(ts[0])  # S = 1 on [0, t_1)
        for i, t in enumerate(ts):
            nxt = ts[i + 1] if i + 1 < len(ts) else 72
            rmst += float(surv.loc[t]) * (nxt - t)
        row = rmst_signup_72h(spark, SF_DIR).collect()[0]
        assert row["n_death_times"] == len(ts)
        assert row["first_death_h"] == ts[0]
        assert row["rmst_h"] == pytest.approx(rmst, abs=2e-4)
        assert 0 < row["rmst_h"] <= 72


class TestProfile:
    def test_orders_profile_matches_pandas(self, spark):
        from predictor_spark.plans.catalog_r10_profile import (
            _ORDER_COLS, table_profile_orders)

        od = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        rows = {r["col_name"]: r
                for r in table_profile_orders(spark, SF_DIR).collect()}
        assert set(rows) == set(_ORDER_COLS)
        for c in _ORDER_COLS:
            r = rows[c]
            assert r["n_rows"] == len(od)
            assert r["n_nulls"] == int(od[c].isna().sum())
            assert r["n_distinct"] == od[c].nunique()
            assert r["completeness"] == pytest.approx(
                (len(od) - od[c].isna().sum()) / len(od), abs=1e-6)

    def test_entropy_matches_scipy_formula(self, spark):
        from predictor_spark.plans.catalog_r10_profile import (
            _ENTROPY_COLS, categorical_entropy_profile)

        rows = {r["col_name"]: r for r in
                categorical_entropy_profile(spark, SF_DIR).collect()}
        for label, table, col in _ENTROPY_COLS:
            s = pd.read_parquet(f"{SF_DIR}/{table}.parquet")[col]
            p = s.value_counts(normalize=True).to_numpy()
            want = float(-(p * np.log2(p)).sum())
            r = rows[label]
            assert r["n_categories"] == s.nunique()
            assert r["n_rows"] == len(s)
            assert r["entropy_bits"] == pytest.approx(want, abs=2e-6)
            # entropy is bounded by log2(k)
            assert r["entropy_bits"] <= np.log2(r["n_categories"]) + 1e-9

    def test_histogram_partitions_orders(self, spark):
        from predictor_spark.plans.catalog_r10_profile import (
            histogram_totalprice_profile)

        od = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        c = np.round(od.o_totalprice.to_numpy() * 100).astype(np.int64)
        mn, w = c.min(), c.max() - c.min() + 1
        want = pd.Series(np.minimum((c - mn) * 10 // w, 9)) \
            .value_counts().sort_index()
        rows = histogram_totalprice_profile(spark, SF_DIR).collect()
        got = {r["bucket"]: r["n_orders"] for r in rows}
        assert got == want.to_dict()
        assert sum(got.values()) == len(od)
        # bucket bounds tile [min, max] without gaps or overlap
        rows = sorted(rows, key=lambda r: r["bucket"])
        assert rows[0]["lo_cents"] == mn
        assert rows[-1]["hi_cents"] == mn + w - 1
        for a, b in zip(rows, rows[1:]):
            assert b["lo_cents"] == a["hi_cents"] + 1


def _pandas_ohlc():
    ev = _events().copy()
    ev["day"] = ev.ts.dt.day
    ev["c"] = np.round(ev.value * 100).astype(np.int64)
    ev = ev.sort_values(["ts", "event_id"])
    g = ev.groupby(["event_type", "day"])
    return pd.DataFrame({
        "high": g.c.max(), "low": g.c.min(),
        "open": g.c.first(), "close": g.c.last()}).reset_index()


class TestCandles:
    def test_patterns_match_pandas_rules(self, spark):
        from predictor_spark.plans.catalog_r10_candles import (
            candlestick_patterns_daily)

        bars = _pandas_ohlc().sort_values(["event_type", "day"])
        body = (bars.close - bars.open).abs()
        bars["doji"] = body * 10 <= bars.high - bars.low
        bars["hammer"] = (
            (bars[["open", "close"]].min(axis=1) - bars.low >= 2 * body)
            & (bars.high - bars[["open", "close"]].max(axis=1) <= body))
        po = bars.groupby("event_type").open.shift()
        pc = bars.groupby("event_type").close.shift()
        bars["bull"] = ((po > pc) & (bars.close > bars.open)
                        & (bars.open <= pc) & (bars.close >= po))
        bars["bear"] = ((pc > po) & (bars.open > bars.close)
                        & (bars.open >= pc) & (bars.close <= po))
        want = bars.groupby("event_type")[
            ["doji", "hammer", "bull", "bear"]].sum()
        rows = candlestick_patterns_daily(spark, SF_DIR).collect()
        for r in rows:
            w = want.loc[r["event_type"]]
            assert (r["n_doji"], r["n_hammer"], r["n_bull_engulf"],
                    r["n_bear_engulf"]) == (
                w.doji, w.hammer, w.bull, w.bear)

    def test_gaps_match_pandas(self, spark):
        from predictor_spark.plans.catalog_r10_candles import (
            gap_days_analysis)

        bars = _pandas_ohlc().sort_values(["event_type", "day"])
        bars["gap"] = bars.open - bars.groupby("event_type").close.shift()
        g = bars.dropna(subset=["gap"]).groupby("event_type").gap
        rows = gap_days_analysis(spark, SF_DIR).collect()
        for r in rows:
            s = g.get_group(r["event_type"])
            assert r["n_gaps"] == len(s)
            assert r["n_gap_up"] == int((s > 0).sum())
            assert r["n_gap_down"] == int((s < 0).sum())
            assert r["max_gap_up_cents"] == int(s.max())
            assert r["max_gap_down_cents"] == int(s.min())
            assert r["avg_abs_gap_cents"] == pytest.approx(
                s.abs().mean(), abs=1e-4)

    def test_pivots_bracket_price(self, spark):
        from predictor_spark.plans.catalog_r10_candles import (
            pivot_point_levels)

        bars = _pandas_ohlc()
        last = bars.sort_values("day").groupby("event_type").tail(1) \
            .set_index("event_type")
        rows = pivot_point_levels(spark, SF_DIR).collect()
        for r in rows:
            b = last.loc[r["event_type"]]
            p = (b.high + b.low + b.close) / 3 / 100
            assert r["day"] == b.day
            assert r["pivot"] == pytest.approx(p, abs=1e-4)
            assert r["s2"] <= r["s1"] <= r["pivot"] <= r["r1"] <= r["r2"]


class TestBandit:
    def test_ucb1_matches_formula(self, spark):
        from predictor_spark.plans.catalog_r10_bandit import ucb1_arm_scores

        ev = _events()
        r = (np.round(ev.value.to_numpy() * 100).astype(np.int64) > 5000)
        g = pd.DataFrame({"arm": ev.event_type, "r": r}).groupby("arm")
        n, s = g.r.size(), g.r.sum()
        big_n = int(n.sum())
        rows = {x["arm"]: x for x in
                ucb1_arm_scores(spark, SF_DIR).collect()}
        for arm in n.index:
            x = rows[arm]
            assert x["n_pulls"] == n[arm] and x["n_rewards"] == s[arm]
            assert x["mean_reward"] == pytest.approx(s[arm] / n[arm],
                                                     abs=1e-6)
            assert x["ucb1_score"] == pytest.approx(
                s[arm] / n[arm] + np.sqrt(2 * np.log(big_n) / n[arm]),
                abs=1e-6)
            assert x["ucb1_score"] > x["mean_reward"]  # bonus is positive

    def test_beta_posterior_matches_formula(self, spark):
        from predictor_spark.plans.catalog_r10_bandit import (
            beta_posterior_arms)

        ev = _events()
        r = (np.round(ev.value.to_numpy() * 100).astype(np.int64) > 5000)
        g = pd.DataFrame({"arm": ev.event_type, "r": r}).groupby("arm")
        n, s = g.r.size(), g.r.sum()
        rows = {x["arm"]: x for x in
                beta_posterior_arms(spark, SF_DIR).collect()}
        for arm in n.index:
            x = rows[arm]
            a, b = 1 + s[arm], 1 + n[arm] - s[arm]
            assert (x["alpha"], x["beta"]) == (a, b)
            mean = a / (a + b)
            sd = np.sqrt(a * b / ((a + b) ** 2 * (a + b + 1)))
            assert x["post_mean"] == pytest.approx(mean, abs=1e-6)
            assert x["post_sd"] == pytest.approx(sd, abs=1e-6)
            assert x["ci_lo"] == pytest.approx(mean - 1.96 * sd, abs=2e-6)
            assert x["ci_hi"] == pytest.approx(mean + 1.96 * sd, abs=2e-6)


class TestLtv:
    @pytest.fixture(scope="class")
    def tagged(self):
        ev = _events()
        pur = ev[ev.event_type == "purchase"].copy()
        pur["cents"] = np.round(pur.value * 100).astype(np.int64)
        pur["wk"] = (pur.ts.dt.day - 1) // 7
        pur["cohort"] = pur.groupby("user_id").wk.transform("min")
        pur["age"] = pur.wk - pur.cohort
        return pur

    def test_ltv_curves_match_pandas(self, spark, tagged):
        from predictor_spark.plans.catalog_r10_ltv import ltv_cohort_curves

        sizes = tagged.groupby("user_id").cohort.first().value_counts()
        cells = (tagged.groupby(["cohort", "age"]).cents.sum()
                 .groupby(level=0).cumsum())
        rows = ltv_cohort_curves(spark, SF_DIR).collect()
        assert len(rows) == len(cells)
        for r in rows:
            cum = int(cells.loc[(r["cohort_week"], r["age_week"])])
            nu = int(sizes[r["cohort_week"]])
            assert r["cum_cents"] == cum and r["n_users"] == nu
            assert r["ltv_per_user"] == pytest.approx(cum / nu / 100,
                                                      abs=1e-4)
        # LTV curves are nondecreasing in age within a cohort
        by_c = {}
        for r in sorted(rows, key=lambda r: (r["cohort_week"],
                                             r["age_week"])):
            by_c.setdefault(r["cohort_week"], []).append(r["ltv_per_user"])
        for curve in by_c.values():
            assert curve == sorted(curve)

    def test_payback_is_first_covering_week(self, spark, tagged):
        from predictor_spark.plans.catalog_r10_ltv import cohort_payback_week

        sizes = tagged.groupby("user_id").cohort.first().value_counts()
        cells = (tagged.groupby(["cohort", "age"]).cents.sum()
                 .groupby(level=0).cumsum())
        rows = cohort_payback_week(spark, SF_DIR).collect()
        for r in rows:
            nu = sizes[r["cohort_week"]]
            cum = cells.loc[r["cohort_week"]]
            covering = cum[cum >= 3000 * nu]
            want = int(covering.index.min()) if len(covering) else -1
            assert r["payback_week"] == want

    def test_arpu_daily_matches_pandas(self, spark):
        from predictor_spark.plans.catalog_r10_ltv import arpu_daily

        ev = _events()
        ev = ev.assign(day=ev.ts.dt.day,
                       cents=np.round(ev.value * 100).astype(np.int64))
        rows = arpu_daily(spark, SF_DIR).collect()
        for r in rows[:5] + rows[-5:]:
            d = ev[ev.day == r["day"]]
            pur = d[d.event_type == "purchase"]
            assert r["active_users"] == d.user_id.nunique()
            assert r["paying_users"] == pur.user_id.nunique()
            assert r["revenue_cents"] == int(pur.cents.sum())
            assert r["arpu"] == pytest.approx(
                pur.cents.sum() / d.user_id.nunique() / 100, abs=1e-4)


class TestGraphMetrics:
    @pytest.fixture(scope="class")
    def graph(self):
        import duckdb

        con = duckdb.connect()
        for t in ("orders", "customer", "lineitem", "supplier"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{SF_DIR}/{t}.parquet'")
        pairs = con.execute("""
            WITH pc AS (
                SELECT least(c.c_nationkey, s.s_nationkey) AS u,
                       greatest(c.c_nationkey, s.s_nationkey) AS v,
                       count(DISTINCT o.o_orderkey) AS w
                FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                WHERE c.c_nationkey <> s.s_nationkey GROUP BY u, v
            )
            SELECT u, v FROM pc
            WHERE w >= (SELECT CAST(sum(w) AS DOUBLE)/count(*) FROM pc)
        """).fetchall()
        con.close()
        adj = {}
        for u, v in pairs:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        return set(map(tuple, pairs)), adj

    def test_lcc_matches_bruteforce(self, spark, graph):
        from predictor_spark.plans.catalog_r10_graphmetrics import (
            local_clustering_coefficient)

        pairs, adj = graph
        rows = local_clustering_coefficient(spark, SF_DIR).collect()
        assert {r["node"] for r in rows} == set(adj)
        for r in rows:
            nbrs = adj[r["node"]]
            k = len(nbrs)
            t = sum(1 for a in nbrs for b in nbrs
                    if a < b and b in adj.get(a, ()))
            assert r["degree"] == k and r["n_triangles"] == t
            want = 2 * t / (k * (k - 1)) if k >= 2 else 0.0
            assert r["clustering_coef"] == pytest.approx(want, abs=1e-6)

    def test_rich_club_matches_bruteforce(self, spark, graph):
        from predictor_spark.plans.catalog_r10_graphmetrics import (
            rich_club_coefficients)

        pairs, adj = graph
        deg = {n: len(v) for n, v in adj.items()}
        rows = {r["k"]: r for r in
                rich_club_coefficients(spark, SF_DIR).collect()}
        for k in (2, 4, 6, 8):
            rich = {n for n, d in deg.items() if d > k}
            if len(rich) < 2:
                assert k not in rows
                continue
            e = sum(1 for u, v in pairs if u in rich and v in rich)
            r = rows[k]
            assert r["n_rich"] == len(rich) and r["e_rich"] == e
            assert r["phi"] == pytest.approx(
                2 * e / (len(rich) * (len(rich) - 1)), abs=1e-6)
