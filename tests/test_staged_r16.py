"""Tests for the STAGED round-10 catalog families, second batch (r16).

Independent pure-pandas/numpy reimplementations — np.fft for the
spectral rows (the engine unrolls an explicit DFT), per-value loops for
the inequality indices (the engine uses quantized moment sums), and a
hashlib replication of the deterministic md5 probes for Hopkins.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _round_half_away(x):
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _micro_rets(bars: pd.DataFrame, keys) -> pd.DataFrame:
    """bars: [*keys, d, bar] -> integer micro returns per key group."""
    out = []
    for k, g in bars.groupby(keys) if keys else [((), bars)]:
        g = g.sort_values("d")
        prev = g["bar"].shift(1)
        ok = prev.notna() & (prev > 0)
        x = 1e6 * (g["bar"][ok] / prev[ok] - 1.0)
        r = _round_half_away(x).astype(np.int64)
        sub = g.loc[ok, ["d"]].copy()
        sub["r"] = r
        if keys:
            sub[keys[0]] = k if np.isscalar(k) else k[0]
        out.append(sub)
    return pd.concat(out, ignore_index=True)


@pytest.fixture(scope="module")
def typed_and_bench_rets():
    ev = _events()
    bars = (ev.assign(d=ev["ts"].dt.date)
            .groupby(["event_type", "d"])["value"].sum()
            .round(6).reset_index(name="bar"))
    typed = _micro_rets(bars, ["event_type"])
    bbars = (bars.groupby("d")["bar"].sum().round(6)
             .reset_index(name="bar"))
    bench = _micro_rets(bbars, []).rename(columns={"r": "rb"})
    return typed.merge(bench[["d", "rb"]], on="d")


class TestPerfRatios:
    def test_information_ratio(self, spark, typed_and_bench_rets):
        from predictor_spark.plans.catalog_r16_perfratios import (
            information_ratio_by_type)

        got = (information_ratio_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, g in typed_and_bench_rets.groupby("event_type"):
            a = (g["r"] - g["rb"]).to_numpy(dtype=float)
            row = got.loc[t]
            assert row["n_days"] == len(a)
            assert row["mean_active"] == pytest.approx(a.mean() / 1e6,
                                                       abs=1e-6)
            te = a.std(ddof=1)
            assert row["tracking_error"] == pytest.approx(te / 1e6,
                                                          abs=1e-6)
            assert row["information_ratio"] == pytest.approx(
                a.mean() / te, abs=1e-5)

    def test_treynor_m2(self, spark, typed_and_bench_rets):
        from predictor_spark.plans.catalog_r16_perfratios import (
            treynor_m2_by_type)

        got = (treynor_m2_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, g in typed_and_bench_rets.groupby("event_type"):
            r = g["r"].to_numpy(dtype=float)
            rb = g["rb"].to_numpy(dtype=float)
            beta = (np.cov(r, rb, ddof=1)[0, 1]
                    / np.var(rb, ddof=1))
            sharpe = r.mean() / r.std(ddof=1)
            m2 = sharpe * rb.std(ddof=1) / 1e6
            row = got.loc[t]
            assert row["beta"] == pytest.approx(beta, abs=1e-5)
            assert row["treynor"] == pytest.approx(
                (r.mean() / 1e6) / beta, abs=1e-5)
            assert row["m2_measure"] == pytest.approx(m2, abs=1e-6)


@pytest.fixture(scope="module")
def typed_rets(typed_and_bench_rets):
    # NOTE: the spectral rows use ALL typed return days, not just days
    # with a benchmark return — recompute without the bench merge
    ev = _events()
    bars = (ev.assign(d=ev["ts"].dt.date)
            .groupby(["event_type", "d"])["value"].sum()
            .round(6).reset_index(name="bar"))
    t = _micro_rets(bars, ["event_type"])
    return {k: g.sort_values("d")["r"].to_numpy()
            for k, g in t.groupby("event_type")}


class TestSpectral:
    def test_spectral_entropy_vs_npfft(self, spark, typed_rets):
        from predictor_spark.plans.catalog_r16_spectral import (
            spectral_entropy_by_type)

        got = (spectral_entropy_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in typed_rets.items():
            n = len(r)
            spec = np.fft.fft(r.astype(float))
            ks = np.arange(1, n // 2 + 1)
            p = np.abs(spec[ks]) ** 2
            q = p / p.sum()
            ent = float(-(q * np.log(q)).sum() / np.log(len(ks)))
            kstar = ks[np.argmax(p)]  # np argmax takes first max = lowest k
            row = got.loc[t]
            assert row["n_days"] == n
            assert row["spectral_entropy"] == pytest.approx(ent, abs=1e-5)
            assert row["dominant_period_days"] == pytest.approx(
                n / kstar, abs=1e-5)

    def test_band_power_shares_sum_to_one(self, spark, typed_rets):
        from predictor_spark.plans.catalog_r16_spectral import (
            band_power_by_type)

        got = (band_power_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in typed_rets.items():
            n = len(r)
            spec = np.fft.fft(r.astype(float))
            ks = np.arange(1, n // 2 + 1)
            p = np.abs(spec[ks]) ** 2
            kmax = ks[-1]
            low = p[ks * 3 <= kmax].sum() / p.sum()
            mid = p[(ks * 3 > kmax) & (ks * 3 <= 2 * kmax)].sum() / p.sum()
            row = got.loc[t]
            assert row["low_share"] == pytest.approx(low, abs=1e-5)
            assert row["mid_share"] == pytest.approx(mid, abs=1e-5)
            assert (row["low_share"] + row["mid_share"]
                    + row["high_share"]) == pytest.approx(1.0, abs=1e-5)


@pytest.fixture(scope="module")
def region_values():
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    r = pd.read_parquet(f"{SF_DIR}/region.parquet")
    m = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey")
         .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    cents = _round_half_away(
        m["o_totalprice"].to_numpy() * 100).astype(np.int64)
    return pd.DataFrame({"region": m["r_name"], "x": cents / 100.0})


class TestInequality:
    def test_theil_atkinson_per_value(self, spark, region_values):
        from predictor_spark.plans.catalog_r16_inequality import (
            theil_atkinson_by_region)

        got = (theil_atkinson_by_region(spark, SF_DIR).toPandas()
               .set_index("region"))
        for reg, g in region_values.groupby("region"):
            x = g["x"].to_numpy()
            mu = x.mean()
            theil = float(np.mean((x / mu) * np.log(x / mu)))
            atk = float(1 - np.mean(np.sqrt(x)) ** 2 / mu)
            row = got.loc[reg]
            assert row["n_orders"] == len(x)
            assert row["mean_value"] == pytest.approx(mu, abs=0.01)
            # engine quantizes x·lnx / sqrt(x) to 1e-6 per row
            assert row["theil_t"] == pytest.approx(theil, abs=1e-4)
            assert row["atkinson_05"] == pytest.approx(atk, abs=1e-4)

    def test_theil_decomposition_identity(self, spark, region_values):
        from predictor_spark.plans.catalog_r16_inequality import (
            theil_decomposition)

        x = region_values["x"].to_numpy()
        mu = x.mean()
        t_total = float(np.mean((x / mu) * np.log(x / mu)))
        t_between = t_within = 0.0
        for _, g in region_values.groupby("region"):
            xg = g["x"].to_numpy()
            sg = xg.sum() / x.sum()
            t_between += sg * np.log(xg.mean() / mu)
            t_within += sg * float(
                np.mean((xg / xg.mean()) * np.log(xg / xg.mean())))
        row = theil_decomposition(spark, SF_DIR).toPandas().iloc[0]
        assert row["theil_total"] == pytest.approx(t_total, abs=1e-4)
        assert row["theil_between"] == pytest.approx(t_between, abs=1e-4)
        assert row["theil_within"] == pytest.approx(t_within, abs=1e-4)
        # Theil's additive decomposability (the reason to use T over Gini)
        assert t_total == pytest.approx(t_between + t_within, abs=1e-9)


@pytest.fixture(scope="module")
def daily_cents_bars_df():
    ev = _events()
    cents = _round_half_away(ev["value"].to_numpy() * 100).astype(np.int64)
    return (ev.assign(d=ev["ts"].dt.date, c=cents)
            .groupby(["event_type", "d"])["c"].sum().reset_index(name="x"))


class TestSax:
    @staticmethod
    def _symbols(bars):
        out = {}
        for t, g in bars.groupby("event_type"):
            g = g.sort_values("d")
            x = g["x"].to_numpy(dtype=float)
            z = (x - x.mean()) / x.std(ddof=0)
            sym = np.where(z < -0.6745, "a",
                           np.where(z < 0.0, "b",
                                    np.where(z < 0.6745, "c", "d")))
            out[t] = sym
        return out

    def test_histogram(self, spark, daily_cents_bars_df):
        from predictor_spark.plans.catalog_r16_sax import (
            sax_symbol_histogram)

        syms = self._symbols(daily_cents_bars_df)
        got = sax_symbol_histogram(spark, SF_DIR).toPandas()
        for t, s in syms.items():
            sub = got[got["event_type"] == t].set_index("symbol")
            vals, counts = np.unique(s, return_counts=True)
            assert dict(zip(vals, counts)) == sub["n_days"].to_dict()
            for v, c in zip(vals, counts):
                assert sub.loc[v, "share"] == pytest.approx(
                    c / len(s), abs=1e-6)

    def test_bigrams(self, spark, daily_cents_bars_df):
        from predictor_spark.plans.catalog_r16_sax import sax_bigram_motifs

        syms = self._symbols(daily_cents_bars_df)
        got = sax_bigram_motifs(spark, SF_DIR).toPandas()
        for t, s in syms.items():
            bigs = pd.Series([a + b for a, b in zip(s[:-1], s[1:])])
            cnt = (bigs.value_counts().reset_index()
                   .rename(columns={"index": "bigram", 0: "n"}))
            cnt.columns = ["bigram", "n"]
            cnt = cnt.sort_values(["n", "bigram"],
                                  ascending=[False, True]).head(3)
            sub = (got[got["event_type"] == t].sort_values("rnk"))
            assert list(sub["bigram"]) == list(cnt["bigram"])
            assert list(sub["n"]) == list(cnt["n"])


class TestHopkins:
    @staticmethod
    def _pts():
        c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
        o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        ncnt = o.groupby("o_custkey").size()
        return pd.DataFrame({
            "custkey": c["c_custkey"],
            "f1": _round_half_away(
                c["c_acctbal"].to_numpy() * 100).astype(np.int64),
            "f2": c["c_custkey"].map(ncnt).fillna(0).astype(np.int64)
                  .to_numpy(),
        })

    def test_hopkins_and_nn_sample(self, spark):
        from predictor_spark.plans.catalog_r16_hopkins import (
            _M, hopkins_statistic, nn_distance_sample)

        pts = self._pts()
        md5 = pts["custkey"].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest())
        real = pts.loc[md5.sort_values().index[:_M]]
        lo1, hi1 = pts["f1"].min(), pts["f1"].max()
        lo2, hi2 = pts["f2"].min(), pts["f2"].max()

        def h48(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

        uni = pd.DataFrame({
            "f1": [lo1 + h48(f"u1-{i}") % (hi1 - lo1 + 1)
                   for i in range(1, _M + 1)],
            "f2": [lo2 + h48(f"u2-{i}") % (hi2 - lo2 + 1)
                   for i in range(1, _M + 1)],
        })
        P = pts[["f1", "f2"]].to_numpy(dtype=np.int64)

        def nn(q, exclude_key=None):
            d = ((P[:, 0] - q[0]) ** 2 + (P[:, 1] - q[1]) ** 2)
            if exclude_key is not None:
                d = d[(pts["custkey"] != exclude_key).to_numpy()]
            return np.sqrt(float(d.min()))

        sum_u = sum(nn(q) for q in uni[["f1", "f2"]].to_numpy())
        w_d = {r.custkey: nn((r.f1, r.f2), exclude_key=r.custkey)
               for r in real.itertuples()}
        sum_w = sum(w_d.values())

        row = hopkins_statistic(spark, SF_DIR).toPandas().iloc[0]
        assert row["m_probes"] == _M
        assert row["sum_u"] == pytest.approx(sum_u, abs=1e-3)
        assert row["sum_w"] == pytest.approx(sum_w, abs=1e-3)
        assert row["hopkins"] == pytest.approx(
            sum_u / (sum_u + sum_w), abs=1e-6)

        got = (nn_distance_sample(spark, SF_DIR).toPandas()
               .set_index("custkey"))
        assert len(got) == _M
        for k, d in w_d.items():
            assert got.loc[k, "nn_dist"] == pytest.approx(d, abs=1e-5)
