"""Tests for the STAGED round-11 catalog families (r18).

Independent reimplementations: scipy-free normal CDF (math.erfc) vs the
A&S polynomial, an explicit BH/Holm step loop, hashlib replication of
the md5 resampling plans, per-value Beta/power arithmetic, and
python-Levenshtein-free DP edit distance.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _round_half_away(x):
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


@pytest.fixture(scope="module")
def typed_rets():
    ev = _events()
    bars = (ev.assign(d=ev["ts"].dt.date)
            .groupby(["event_type", "d"])["value"].sum()
            .round(6).reset_index(name="bar"))
    out = {}
    for t, g in bars.groupby("event_type"):
        g = g.sort_values("d")
        prev = g["bar"].shift(1)
        ok = prev.notna() & (prev > 0)
        x = 1e6 * (g["bar"][ok] / prev[ok] - 1.0)
        out[t] = _round_half_away(x).astype(np.int64)
    return out


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


class TestMultipleTest:
    @staticmethod
    def _battery(typed_rets):
        """(pair, n, k, p) with p from the TRUE normal CDF (erfc) — the
        engine's A&S polynomial must agree to ~7.5e-8."""
        types = sorted(typed_rets)
        # align by common day index: rebuild per-day frames
        ev = _events()
        bars = (ev.assign(d=ev["ts"].dt.date)
                .groupby(["event_type", "d"])["value"].sum()
                .round(6).reset_index(name="bar"))
        rets = []
        for t, g in bars.groupby("event_type"):
            g = g.sort_values("d")
            prev = g["bar"].shift(1)
            ok = prev.notna() & (prev > 0)
            x = 1e6 * (g["bar"][ok] / prev[ok] - 1.0)
            rets.append(pd.DataFrame({
                "t": t, "d": g.loc[ok, "d"].to_numpy(),
                "r": _round_half_away(x).astype(np.int64)}))
        rets = pd.concat(rets)
        out = []
        for i, a in enumerate(types):
            for b in types[i + 1:]:
                m = rets[rets["t"] == a].merge(
                    rets[rets["t"] == b], on="d", suffixes=("_a", "_b"))
                neq = m[m["r_a"] != m["r_b"]]
                n, k = len(neq), int((neq["r_a"] > neq["r_b"]).sum())
                z = abs(2.0 * k - n) / math.sqrt(n)
                p = min(1.0, math.erfc(z / math.sqrt(2)))
                out.append((a, b, n, k, p))
        return out

    def test_fdr_and_holm_vs_explicit_steps(self, spark, typed_rets):
        from predictor_spark.plans.catalog_r18_multipletest import (
            holm_adjusted_sign_tests, pairwise_sign_tests_fdr)

        battery = self._battery(typed_rets)
        m = len(battery)
        order = sorted(range(m), key=lambda i: (battery[i][4],
                                                battery[i][0],
                                                battery[i][1]))
        ps = [battery[i][4] for i in order]
        # explicit BH step-up (reverse running min) and Holm step-down
        bh = [0.0] * m
        run = 1.0
        for r in range(m - 1, -1, -1):
            run = min(run, ps[r] * m / (r + 1))
            bh[r] = run
        holm = [0.0] * m
        run = 0.0
        for r in range(m):
            run = max(run, min(1.0, ps[r] * (m - r)))
            holm[r] = run

        got_f = (pairwise_sign_tests_fdr(spark, SF_DIR).toPandas()
                 .set_index(["type_a", "type_b"]))
        got_h = (holm_adjusted_sign_tests(spark, SF_DIR).toPandas()
                 .set_index(["type_a", "type_b"]))
        for rank_pos, i in enumerate(order):
            a, b, n, k, p = battery[i]
            rf = got_f.loc[(a, b)]
            assert rf["n_days"] == n and rf["wins_a"] == k
            # polynomial CDF error is ~7.5e-8, rounding 6dp: allow 1e-5
            assert rf["p_raw"] == pytest.approx(p, abs=1e-5)
            assert rf["p_bh"] == pytest.approx(bh[rank_pos], abs=1e-4)
            rh = got_h.loc[(a, b)]
            assert rh["p_holm"] == pytest.approx(holm[rank_pos], abs=1e-4)


class TestResample:
    def test_bootstrap_ci(self, spark, typed_rets):
        from predictor_spark.plans.catalog_r18_resample import (
            _B_BOOT, bootstrap_ci_mean_return)

        got = (bootstrap_ci_mean_return(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in typed_rets.items():
            n = len(r)
            means = []
            for b in range(1, _B_BOOT + 1):
                tot = 0
                for j in range(1, n + 1):
                    pos = 1 + _h48(f"{t}|{b}|{j}") % n
                    tot += int(r[pos - 1])
                means.append(tot / n / 1e6)
            means.sort()
            lo = means[int(np.ceil(0.025 * _B_BOOT)) - 1]
            hi = means[int(np.ceil(0.975 * _B_BOOT)) - 1]
            row = got.loc[t]
            assert row["boot_mean"] == pytest.approx(np.mean(means),
                                                     abs=1e-5)
            assert row["ci_lo"] == pytest.approx(lo, abs=1e-6)
            assert row["ci_hi"] == pytest.approx(hi, abs=1e-6)

    def test_signflip_pvalue(self, spark, typed_rets):
        from predictor_spark.plans.catalog_r18_resample import (
            _B_PERM, signflip_permutation_test)

        got = (signflip_permutation_test(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in typed_rets.items():
            n = len(r)
            t_obs = abs(int(r.sum()))
            hits = 0
            for b in range(1, _B_PERM + 1):
                s = 0
                for pos in range(1, n + 1):
                    sign = 1 if _h48(f"{t}#{b}#{pos}") % 2 == 0 else -1
                    s += sign * int(r[pos - 1])
                if abs(s) >= t_obs:
                    hits += 1
            row = got.loc[t]
            assert row["observed_mean_abs"] == pytest.approx(
                t_obs / n / 1e6, abs=1e-6)
            assert row["p_value"] == pytest.approx(
                (1 + hits) / (1 + _B_PERM), abs=1e-6)


@pytest.fixture(scope="module")
def nation_rates():
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    m = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    v = _round_half_away(m["o_totalprice"].to_numpy() * 100).astype(
        np.int64)
    m = m.assign(v=v).sort_values(["v", "o_orderkey"])
    thresh = m["v"].to_numpy()[int(np.ceil(0.5 * len(m))) - 1]
    g = m.groupby("n_name").agg(n=("v", "size"),
                                k=("v", lambda s: int((s > thresh).sum())))
    return g


class TestEBayes:
    def test_beta_posterior(self, spark, nation_rates):
        from predictor_spark.plans.catalog_r18_ebayes import (
            beta_posterior_rates)

        got = (beta_posterior_rates(spark, SF_DIR).toPandas()
               .set_index("nation"))
        for nat, row0 in nation_rates.iterrows():
            n, k = int(row0["n"]), int(row0["k"])
            row = got.loc[nat]
            assert row["n_orders"] == n and row["k_high"] == k
            assert row["post_mean"] == pytest.approx((k + 1) / (n + 2),
                                                     abs=1e-6)
            sd = math.sqrt((k + 1) * (n - k + 1)
                           / ((n + 2) ** 2 * (n + 3)))
            assert row["post_sd"] == pytest.approx(sd, abs=1e-6)

    def test_eb_shrinkage(self, spark, nation_rates):
        from predictor_spark.plans.catalog_r18_ebayes import eb_shrunk_rates

        rates = (nation_rates["k"] / nation_rates["n"]).to_numpy()
        mu, var = rates.mean(), rates.var(ddof=1)
        nu = max(mu * (1 - mu) / var - 1.0, 0.1)
        got = (eb_shrunk_rates(spark, SF_DIR).toPandas()
               .set_index("nation"))
        for nat, row0 in nation_rates.iterrows():
            n, k = int(row0["n"]), int(row0["k"])
            row = got.loc[nat]
            assert row["shrunk_rate"] == pytest.approx(
                (k + mu * nu) / (n + nu), abs=1e-5)
            assert row["shrink_weight"] == pytest.approx(
                nu / (n + nu), abs=1e-5)
        # shrinkage pulls everything toward the grand mean
        raw = got["raw_rate"].to_numpy()
        shrunk = got["shrunk_rate"].to_numpy()
        assert (np.abs(shrunk - mu) <= np.abs(raw - mu) + 1e-9).all()


class TestPower:
    def test_sample_size_and_mde(self, spark, nation_rates):
        from predictor_spark.plans.catalog_r18_power import (
            _ZA, _ZB, ab_sample_size_plan, mde_at_current_n)

        plan = (ab_sample_size_plan(spark, SF_DIR).toPandas()
                .set_index("nation"))
        mde = (mde_at_current_n(spark, SF_DIR).toPandas()
               .set_index("nation"))
        for nat, row0 in nation_rates.iterrows():
            n, k = int(row0["n"]), int(row0["k"])
            p0 = k / n
            p1 = 1.1 * p0
            pbar = (p0 + p1) / 2
            want_n = math.ceil(
                (_ZA * math.sqrt(2 * pbar * (1 - pbar))
                 + _ZB * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))) ** 2
                / (p1 - p0) ** 2)
            rp = plan.loc[nat]
            assert rp["n_per_arm"] == want_n
            assert rp["current_volume_coverage"] == pytest.approx(
                n / (2 * want_n), abs=1e-5)
            want_mde = (_ZA + _ZB) * math.sqrt(2 * p0 * (1 - p0) / (n / 2))
            rm = mde.loc[nat]
            assert rm["mde_abs"] == pytest.approx(want_mde, abs=1e-6)
            assert rm["mde_rel"] == pytest.approx(want_mde / p0, abs=1e-5)
        # power sanity: bigger baseline n => smaller MDE
        merged = mde.join(nation_rates.rename(columns={"n": "n0"}))
        big = merged.sort_values("n0").iloc[-1]["mde_abs"]
        small = merged.sort_values("n0").iloc[0]["mde_abs"]
        assert big <= small


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestEditDist:
    def test_near_pairs_and_histogram(self, spark):
        from predictor_spark.plans.catalog_r18_editdist import (
            _M, _PFX, editdist_histogram, editdist_near_pairs)

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        md5 = docs["doc_id"].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest())
        sample = docs.loc[md5.sort_values().index[:_M]]
        ids = sample["doc_id"].to_numpy()
        pfx = sample["text"].str.slice(0, _PFX).to_numpy()
        sims = []
        for i in range(len(ids)):
            for j in range(len(ids)):
                if ids[i] < ids[j]:
                    d = _lev(pfx[i], pfx[j])
                    ml = max(len(pfx[i]), len(pfx[j]))
                    if ml > 0:
                        sims.append((ids[i], ids[j], d, 1 - d / ml))
        top = sorted(sims, key=lambda s: (-s[3], s[0], s[1]))[:10]
        got = editdist_near_pairs(spark, SF_DIR).toPandas()
        for rnk, (a, b, d, s) in enumerate(top, 1):
            row = got[got["rnk"] == rnk].iloc[0]
            assert (row["doc_a"], row["doc_b"]) == (a, b)
            assert row["edit_distance"] == d
            assert row["similarity"] == pytest.approx(s, abs=1e-6)

        hist = (editdist_histogram(spark, SF_DIR).toPandas()
                .set_index("bin"))
        bins = {}
        for _, _, _, s in sims:
            bins.setdefault(min(int(s * 10), 9), []).append(s)
        assert set(hist.index) == set(bins)
        for b, vals in bins.items():
            assert hist.loc[b, "n_pairs"] == len(vals)
            assert hist.loc[b, "min_sim"] == pytest.approx(min(vals),
                                                           abs=1e-6)
