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

    def test_nelson_aalen_matches_pandas(self, spark, surv_obs):
        from predictor_spark.plans.catalog_r10_survival2 import (
            nelson_aalen_hazard)

        per_t = self._risk(surv_obs)
        dead = per_t[per_t.d > 0]
        want = (dead.d / dead.n).cumsum()
        rows = nelson_aalen_hazard(spark, SF_DIR).collect()
        assert [r["dur_h"] for r in rows] == list(dead.index)
        for r, (t, h) in zip(rows, want.items()):
            assert r["cum_hazard"] == pytest.approx(h, abs=2e-6)
            assert r["n_died"] == int(dead.loc[t, "d"])
            assert r["n_risk"] == int(dead.loc[t, "n"])
        # hazard is nondecreasing
        hz = [r["cum_hazard"] for r in rows]
        assert hz == sorted(hz)

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
