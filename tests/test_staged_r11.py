"""Tests for the STAGED round-11 catalog families (forensic digit
screens, long-memory diagnostics) — independent pandas/numpy
reimplementations of each spec plus family invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _cents(col="o_totalprice", table="orders") -> np.ndarray:
    df = pd.read_parquet(f"{SF_DIR}/{table}.parquet")
    return np.round(df[col].to_numpy() * 100).astype(np.int64)


class TestForensic:
    def test_cents_uniformity_matches_numpy(self, spark):
        from predictor_spark.plans.catalog_r11_forensic import (
            cents_digit_uniformity)

        c = _cents() % 10
        n = len(c)
        rows = cents_digit_uniformity(spark, SF_DIR).collect()
        assert sum(r["n_obs"] for r in rows) == n
        chi2 = float((((np.bincount(c, minlength=10) - n / 10) ** 2)
                      / (n / 10)).sum())
        assert rows[-1]["cum_chi2"] == pytest.approx(chi2, abs=2e-4)

    def test_round_price_bias_matches_counts(self, spark):
        from predictor_spark.plans.catalog_r11_forensic import (
            round_price_bias)

        cc = _cents() % 100
        row = round_price_bias(spark, SF_DIR).collect()[0]
        assert row["n_orders"] == len(cc)
        assert row["n_even_dollar"] == int((cc == 0).sum())
        assert row["n_half_dollar"] == int((cc == 50).sum())
        assert row["n_charm"] == int((cc == 99).sum())
        assert row["share_00"] == pytest.approx((cc == 0).mean(), abs=1e-6)


def _series():
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev.sort_values(["ts", "event_id"])
    out = {}
    for t, g in ev.groupby("event_type"):
        out[t] = np.round(g.value.to_numpy() * 100).astype(np.int64)
    return ev, out


class TestLongMemory:
    def test_hurst_matches_bruteforce_rs(self, spark):
        from predictor_spark.plans.catalog_r11_longmemory import (
            _SIZES, hurst_rs_per_series)

        _, series = _series()
        rows = {r["event_type"]: r
                for r in hurst_rs_per_series(spark, SF_DIR).collect()}
        for t, x in series.items():
            avg = {}
            for n in _SIZES:
                rss = []
                for b in range(len(x) // n):
                    blk = x[b * n:(b + 1) * n].astype(float)
                    dev = np.cumsum(blk - blk.mean())
                    r_ = dev.max() - dev.min()
                    s = blk.std()  # population
                    rss.append(r_ / max(s, np.sqrt(1e-12)))
                avg[n] = float(np.mean(rss))
            r = rows[t]
            assert r["rs_16"] == pytest.approx(avg[16], rel=1e-4)
            assert r["rs_32"] == pytest.approx(avg[32], rel=1e-4)
            assert r["rs_64"] == pytest.approx(avg[64], rel=1e-4)
            lx = np.log(np.array(_SIZES, dtype=float))
            ly = np.log(np.array([avg[n] for n in _SIZES]))
            slope = float(np.polyfit(lx, ly, 1)[0])
            assert r["hurst"] == pytest.approx(slope, abs=2e-4)
            # ticks are ~i.i.d. by construction: H should sit near 0.5,
            # far from the trending/reverting extremes
            assert 0.2 < r["hurst"] < 0.8

    def test_variance_ratio_matches_numpy(self, spark):
        from predictor_spark.plans.catalog_r11_longmemory import (
            _Q, variance_ratio_test)

        ev, _ = _series()
        ev = ev.assign(day=ev.ts.dt.day,
                       c=np.round(ev.value * 100).astype(np.int64))
        rows = {r["event_type"]: r
                for r in variance_ratio_test(spark, SF_DIR).collect()}
        for t, g in ev.groupby("event_type"):
            close = (g.sort_values(["ts", "event_id"])
                     .groupby("day").c.last())
            lc = np.log(close.to_numpy(dtype=float))
            r1 = np.diff(lc)
            rq = lc[_Q:] - lc[:-_Q]
            n = len(r1)
            mu = (lc[-1] - lc[0]) / n
            s1 = float(((r1 - mu) ** 2).sum())
            sq = float(((rq - _Q * mu) ** 2).sum())
            vr = (sq / (len(rq) - 1)) / (_Q * s1 / (n - 1))
            z = (vr - 1) / np.sqrt(2 * (2 * _Q - 1) * (_Q - 1)
                                   / (3 * _Q * n))
            r = rows[t]
            assert r["n_rets"] == n
            assert r["mean_log_ret"] == pytest.approx(mu, abs=1e-6)
            assert r["variance_ratio"] == pytest.approx(vr, abs=2e-5)
            assert r["z_stat"] == pytest.approx(z, abs=2e-4)
