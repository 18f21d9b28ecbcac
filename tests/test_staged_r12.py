"""Tests for the STAGED round-9 catalog families (r12 modules).

Same contract as test_staged_r8.py: the DuckDB oracle sweep proves
Spark == SQL replay; these tests prove both match the MATH via an
independent pure-pandas/numpy reimplementation, plus invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def daily_micro_rets():
    """(type, date) integer micro-unit daily returns — the
    catalog_r7_risk idiom recomputed in pandas."""
    ev = _events()
    bars = (ev.assign(d=ev["ts"].dt.date)
            .groupby(["event_type", "d"])["value"].sum()
            .round(6).reset_index(name="bar"))
    out = {}
    for t, g in bars.groupby("event_type"):
        g = g.sort_values("d")
        prev = g["bar"].shift(1)
        ok = prev.notna() & (prev > 0)
        # numpy rounds half-even; the engines round half-away — match
        # them exactly via floor(x + 0.5) on the (positive or negative)
        # micro value
        x = 1e6 * (g["bar"][ok] / prev[ok] - 1.0)
        out[t] = np.where(x >= 0, np.floor(x + 0.5),
                          np.ceil(x - 0.5)).astype(np.int64)
    return out


class TestRisk3:
    def test_omega_matches_pandas(self, spark, daily_micro_rets):
        from predictor_spark.plans.catalog_r12_risk3 import (
            omega_ratio_by_type)

        got = (omega_ratio_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in daily_micro_rets.items():
            gain = int(r[r > 0].sum())
            loss = int(-r[r < 0].sum())
            row = got.loc[t]
            assert row["n_days"] == len(r)
            assert row["gain_micro"] == gain
            assert row["loss_micro"] == loss
            if loss:
                assert row["omega"] == pytest.approx(round(gain / loss, 6),
                                                     abs=1e-9)
            else:
                assert pd.isna(row["omega"])

    def test_kelly_matches_numpy(self, spark, daily_micro_rets):
        from predictor_spark.plans.catalog_r12_risk3 import (
            kelly_fraction_by_type)

        got = (kelly_fraction_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in daily_micro_rets.items():
            mu = r.mean() / 1e6
            var = r.var(ddof=0) / 1e12  # population variance
            row = got.loc[t]
            assert row["n_days"] == len(r)
            assert row["mean_ret"] == pytest.approx(mu, abs=2e-6)
            assert row["var_ret"] == pytest.approx(var, abs=2e-6)
            assert row["kelly_fraction"] == pytest.approx(mu / var,
                                                          rel=1e-4)

    def test_ulcer_matches_pandas(self, spark, daily_micro_rets):
        from predictor_spark.plans.catalog_r12_risk3 import (
            ulcer_index_by_type)

        ev = _events()
        bars = (ev.assign(d=ev["ts"].dt.date)
                .groupby(["event_type", "d"])["value"].sum()
                .round(6).reset_index(name="bar"))
        got = (ulcer_index_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        saw_dip = False
        for t, g in bars.groupby("event_type"):
            g = g.sort_values("d")
            peak = g["bar"].cummax()
            ok = peak > 0
            pdd = 100.0 * (peak[ok] - g["bar"][ok]) / peak[ok]
            pd2 = np.floor(1e9 * pdd.to_numpy() ** 2 + 0.5).astype(np.int64)
            row = got.loc[t]
            assert row["n_days"] == len(pd2)
            assert row["ulcer_index"] == pytest.approx(
                round(float(np.sqrt(pd2.sum() / (1e9 * len(pd2)))), 6),
                abs=1e-9)
            assert row["max_pct_drawdown"] == pytest.approx(
                round(float(np.sqrt(pd2.max() / 1e9)), 6), abs=1e-9)
            saw_dip |= bool((pd2 > 0).any())
        # non-vacuity: at least one type's curve actually dips
        assert saw_dip

    def test_omega_gt_1_iff_positive_mean_mass(self, spark,
                                               daily_micro_rets):
        """Omega(0) > 1 exactly when gain mass exceeds loss mass —
        i.e. sum(r) > 0 (a defining identity of the ratio)."""
        from predictor_spark.plans.catalog_r12_risk3 import (
            omega_ratio_by_type)

        got = omega_ratio_by_type(spark, SF_DIR).toPandas()
        for _, row in got.iterrows():
            if pd.isna(row["omega"]):
                continue
            net = row["gain_micro"] - row["loss_micro"]
            assert (row["omega"] > 1) == (net > 0)


class TestStateFilter:
    @pytest.fixture(scope="class")
    def kf_truth(self):
        """Independent pandas/float recompute of the local-level filter
        (same Q/R constants, textbook form — not the module's fold)."""
        from predictor_spark.plans.catalog_r12_statefilter import _Q, _R

        ev = _events()
        bars = (ev.assign(d=ev["ts"].dt.date,
                          cents=np.round(ev["value"].to_numpy() * 100)
                          .astype(np.int64))
                .groupby(["event_type", "d"])["cents"].sum()
                .reset_index(name="bar"))
        out = {}
        for t, g in bars.groupby("event_type"):
            g = g.sort_values("d")
            y = g["bar"].to_numpy(dtype=float)
            d = list(g["d"])
            m, p = y[0], _R
            levels, gains, zs = [(d[0], m, None)], [], []
            for i in range(1, len(y)):
                pp = p + _Q
                k = pp / (pp + _R)
                zs.append((y[i] - m) / np.sqrt(pp + _R))
                m = m + k * (y[i] - m)
                p = (1 - k) * pp
                levels.append((d[i], m, k))
                gains.append(k)
            out[t] = (levels, gains, zs)
        return out

    def test_kalman_levels_match_pandas(self, spark, kf_truth):
        from predictor_spark.plans.catalog_r12_statefilter import (
            kalman_level_daily)

        got = (kalman_level_daily(spark, SF_DIR).toPandas()
               .set_index(["event_type", "ddate"]))
        for t, (levels, _, _) in kf_truth.items():
            for d, m, k in levels:
                row = got.loc[(t, d.isoformat())]
                assert row["level"] == pytest.approx(round(m / 100.0, 6),
                                                     abs=1e-9)
                if k is None:
                    assert pd.isna(row["gain"])
                else:
                    assert row["gain"] == pytest.approx(round(k, 6),
                                                        abs=1e-9)

    def test_kalman_gain_converges_to_steady_state(self, kf_truth):
        """The predicted-variance recursion has a fixed point P* solving
        P* = (1-K)(P*+Q); the gain sequence must approach K* = f(P*)
        monotonically from the P_1 = R seed."""
        from predictor_spark.plans.catalog_r12_statefilter import _Q, _R

        # steady state: P* = ((-Q + sqrt(Q^2 + 4 Q R)) / 2)
        p_star = (-_Q + np.sqrt(_Q * _Q + 4 * _Q * _R)) / 2
        k_star = (p_star + _Q) / (p_star + _Q + _R)
        for _, gains, _ in kf_truth.values():
            diffs = np.abs(np.array(gains) - k_star)
            assert (np.diff(diffs) <= 1e-12).all()  # monotone approach
            # geometric approach from K_1 ~ 0.5: within the ~30-day
            # month the gap closes from 0.41 to ~5e-4
            assert diffs[-1] < 1e-3

    def test_kalman_innovations_match_pandas(self, spark, kf_truth):
        from predictor_spark.plans.catalog_r12_statefilter import (
            kalman_innovation_summary)

        got = (kalman_innovation_summary(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, (levels, _, zs) in kf_truth.items():
            row = got.loc[t]
            assert row["n_innovations"] == len(zs) == len(levels) - 1
            assert row["n_anomalies"] == sum(1 for z in zs if abs(z) > 3)
            assert row["max_abs_z"] == pytest.approx(
                round(max(abs(z) for z in zs), 6), abs=1e-9)


class TestOutlier2:
    @pytest.fixture(scope="class")
    def daily_cents(self):
        ev = _events()
        return (ev.assign(d=ev["ts"].dt.date,
                          cents=np.round(ev["value"].to_numpy() * 100)
                          .astype(np.int64))
                .groupby(["event_type", "d"])["cents"].sum()
                .reset_index(name="c"))

    def test_modified_zscore_matches_numpy(self, spark, daily_cents):
        from predictor_spark.plans.catalog_r12_outlier2 import (
            _MZ_THRESH, modified_zscore_outliers)

        got = (modified_zscore_outliers(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, g in daily_cents.groupby("event_type"):
            x = g["c"].to_numpy(dtype=float)
            med = np.percentile(x, 50, method="linear")
            mad = np.percentile(np.abs(x - med), 50, method="linear")
            if mad == 0:
                assert t not in got.index
                continue
            mi = np.round(0.6745 * (x - med) / mad, 6)
            row = got.loc[t]
            assert row["n_days"] == len(x)
            assert row["n_outliers"] == int((np.abs(mi) > _MZ_THRESH).sum())
            assert row["max_abs_mz"] == pytest.approx(
                round(float(np.abs(mi).max()), 6), abs=1e-9)

    def test_esd_matches_numpy_rounds(self, spark, daily_cents):
        from predictor_spark.plans.catalog_r12_outlier2 import (
            _ESD_ROUNDS, generalized_esd_stats)

        got = generalized_esd_stats(spark, SF_DIR).toPandas()
        for t, g in daily_cents.groupby("event_type"):
            g = g.sort_values("d").reset_index(drop=True)
            remaining = g.copy()
            for i in range(1, _ESD_ROUNDS + 1):
                x = remaining["c"].to_numpy(dtype=float)
                if len(x) < 3:
                    break
                mean, sd = x.mean(), x.std(ddof=1)
                dev = np.abs(x - mean)
                # earliest-day tie-break
                best = min(range(len(x)),
                           key=lambda j: (-dev[j], remaining["d"].iloc[j]))
                row = got[(got.event_type == t) & (got["round"] == i)]
                assert len(row) == 1
                row = row.iloc[0]
                assert row["ddate"] == remaining["d"].iloc[best].isoformat()
                assert row["value"] == pytest.approx(
                    round(remaining["c"].iloc[best] / 100.0, 6), abs=1e-9)
                assert row["r_stat"] == pytest.approx(
                    round(float(dev[best] / sd), 6), abs=1e-6)
                remaining = remaining.drop(remaining.index[best])

    def test_esd_r_stats_nonincreasing_usually(self, spark):
        """Rosner's R_i typically decreases as extremes are removed;
        at minimum every statistic is positive and finite."""
        from predictor_spark.plans.catalog_r12_outlier2 import (
            generalized_esd_stats)

        got = generalized_esd_stats(spark, SF_DIR).toPandas()
        assert (got["r_stat"] > 0).all()
        assert np.isfinite(got["r_stat"]).all()


class TestOrdinal:
    @pytest.fixture(scope="class")
    def pattern_truth(self):
        """Independent numpy recompute: stable argsort rank strings of
        order-3 windows over hourly cents bars."""
        ev = _events()
        hourly = (ev.assign(hr=ev["ts"].dt.floor("h"),
                            cents=np.round(ev["value"].to_numpy() * 100)
                            .astype(np.int64))
                  .groupby(["event_type", "hr"])["cents"].sum()
                  .reset_index(name="c"))
        out = {}
        for t, g in hourly.groupby("event_type"):
            x = g.sort_values("hr")["c"].to_numpy()
            pats = []
            for i in range(len(x) - 2):
                w = x[i:i + 3]
                ranks = np.argsort(np.argsort(w, kind="stable"),
                                   kind="stable")
                pats.append("".join(map(str, ranks)))
            out[t] = pats
        return out

    def test_histogram_matches_numpy(self, spark, pattern_truth):
        from collections import Counter

        from predictor_spark.plans.catalog_r12_ordinal import (
            ordinal_pattern_histogram)

        got = ordinal_pattern_histogram(spark, SF_DIR).toPandas()
        for t, pats in pattern_truth.items():
            want = Counter(pats)
            sub = got[got.event_type == t].set_index("pattern")
            assert set(sub.index) == set(want)
            for pat, cnt in want.items():
                assert sub.loc[pat, "n_windows"] == cnt
                assert sub.loc[pat, "share"] == pytest.approx(
                    round(cnt / len(pats), 6), abs=1e-9)

    def test_entropy_matches_numpy(self, spark, pattern_truth):
        from collections import Counter

        from predictor_spark.plans.catalog_r12_ordinal import (
            permutation_entropy_by_type)

        got = (permutation_entropy_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, pats in pattern_truth.items():
            want = Counter(pats)
            n = len(pats)
            terms = [np.floor(-1e9 * (c / n) * np.log(c / n) + 0.5)
                     for c in want.values()]
            h = sum(terms) / (1e9 * np.log(6.0))
            row = got.loc[t]
            assert row["n_windows"] == n
            assert row["perm_entropy"] == pytest.approx(round(h, 6),
                                                        abs=1e-9)
            # bounded in [0, 1] by construction
            assert 0.0 <= row["perm_entropy"] <= 1.0

    def test_monotone_series_has_zero_entropy(self):
        """Spec sanity (pure numpy): a strictly increasing series emits
        only pattern '012' -> normalized PE exactly 0."""
        x = np.arange(10)
        pats = set()
        for i in range(len(x) - 2):
            w = x[i:i + 3]
            ranks = np.argsort(np.argsort(w, kind="stable"), kind="stable")
            pats.add("".join(map(str, ranks)))
        assert pats == {"012"}


class TestIsotonic:
    @pytest.fixture(scope="class")
    def bins_truth(self):
        """Per-activity-bin (w, y) recomputed in pandas with the same
        decile-threshold binning."""
        ev = _events()
        users = (ev.groupby("user_id")
                 .agg(n_events=("event_id", "size"),
                      converted=("event_type",
                                 lambda s: int((s == "purchase").any()))))
        thr = np.percentile(users["n_events"], [10 * i for i in range(1, 10)],
                            method="linear")
        b = np.zeros(len(users), dtype=int)
        for t in thr:
            b += (users["n_events"].to_numpy() > t).astype(int)
        g = pd.DataFrame({"bin": b, "converted": users["converted"]})
        bins = (g.groupby("bin")
                .agg(w=("converted", "size"), y=("converted", "sum")))
        return bins

    @staticmethod
    def _pav(y, w):
        """Classic sequential pool-adjacent-violators — an INDEPENDENT
        algorithm from the module's minimax form."""
        blocks = [[yi, wi] for yi, wi in zip(y, w)]
        i = 0
        while i < len(blocks) - 1:
            if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1]:
                blocks[i][0] += blocks[i + 1][0]
                blocks[i][1] += blocks[i + 1][1]
                del blocks[i + 1]
                i = max(i - 1, 0)
            else:
                i += 1
        return blocks

    def test_curve_matches_sequential_pav(self, spark, bins_truth):
        from predictor_spark.plans.catalog_r12_isotonic import (
            isotonic_conversion_curve)

        got = (isotonic_conversion_curve(spark, SF_DIR).toPandas()
               .sort_values("bin").reset_index(drop=True))
        want_raw = (bins_truth["y"] / bins_truth["w"]).to_numpy()
        assert list(got["n_users"]) == list(bins_truth["w"])
        np.testing.assert_allclose(got["raw_rate"], np.round(want_raw, 6),
                                   atol=1e-9)
        # expand PAV blocks back to per-bin fitted values
        blocks = self._pav(bins_truth["y"].to_numpy(dtype=float),
                           bins_truth["w"].to_numpy(dtype=float))
        fitted = []
        wl = list(bins_truth["w"])
        bi = 0
        for by, bw in blocks:
            acc = 0
            while acc < bw - 1e-9:
                acc += wl[bi]
                fitted.append(by / bw)
                bi += 1
        np.testing.assert_allclose(got["iso_rate"], np.round(fitted, 6),
                                   atol=1e-8)
        # isotonic by construction
        assert (np.diff(got["iso_rate"]) >= -1e-12).all()

    def test_summary_consistent_with_curve(self, spark):
        from predictor_spark.plans.catalog_r12_isotonic import (
            isotonic_conversion_curve, isotonic_fit_summary)

        curve = (isotonic_conversion_curve(spark, SF_DIR).toPandas()
                 .sort_values("bin"))
        row = isotonic_fit_summary(spark, SF_DIR).collect()[0]
        assert row["n_bins"] == len(curve)
        raw = curve["raw_rate"].to_numpy()
        assert row["n_raw_violations"] == int((np.diff(raw) < 0).sum())
        iso = np.round(curve["iso_rate"].to_numpy(), 9)
        assert row["n_iso_blocks"] == 1 + int((np.diff(iso) != 0).sum())
        sse = float((curve["n_users"]
                     * (curve["raw_rate"] - curve["iso_rate"]) ** 2).sum())
        assert row["weighted_sse"] == pytest.approx(sse, abs=1e-4)


class TestCatTests:
    def test_mcnemar_matches_pandas(self, spark):
        from predictor_spark.plans.catalog_r12_cattests import (
            _EARLY_END, _LATE_START, mcnemar_purchase_weeks)

        ev = _events()
        p = ev[ev.event_type == "purchase"]
        early = set(p[p.ts < pd.Timestamp(_EARLY_END)]["user_id"])
        late = set(p[p.ts >= pd.Timestamp(_LATE_START)]["user_id"])
        users = set(ev["user_id"])
        b = len([u for u in users if u in early and u not in late])
        c = len([u for u in users if u not in early and u in late])
        row = mcnemar_purchase_weeks(spark, SF_DIR).collect()[0]
        assert row["n_users"] == len(users)
        assert row["b_yes_no"] == b
        assert row["c_no_yes"] == c
        assert b + c > 0, "degenerate pairing at this SF"
        want = (abs(b - c) - 1.0) ** 2 / (b + c)
        assert row["mcnemar_chi2"] == pytest.approx(round(want, 6),
                                                    abs=1e-9)

    def test_cochran_armitage_matches_numpy(self, spark):
        from predictor_spark.plans.catalog_r12_cattests import (
            _LATE_START, _QS, cochran_armitage_trend)

        ev = _events()
        users = (ev.groupby("user_id")
                 .agg(n_events=("event_id", "size")))
        conv = (ev.assign(c=((ev.event_type == "purchase")
                             & (ev.ts >= pd.Timestamp(_LATE_START)))
                          .astype(int))
                .groupby("user_id")["c"].max())
        users["converted"] = conv
        thr = np.percentile(users["n_events"], [100 * q for q in _QS],
                            method="linear")
        s = np.zeros(len(users), dtype=int)
        for t in thr:
            s += (users["n_events"].to_numpy() > t).astype(int)
        y = users["converted"].to_numpy()
        n = len(y)
        pbar = y.mean()
        num = float((s * y).sum()) - y.sum() * float(s.sum()) / n
        den = np.sqrt(pbar * (1 - pbar)
                      * (float((s * s).sum()) - float(s.sum()) ** 2 / n))
        assert den > 0, "degenerate outcome at this SF"
        row = cochran_armitage_trend(spark, SF_DIR).collect()[0]
        assert row["n_users"] == n
        assert row["pbar"] == pytest.approx(round(pbar, 6), abs=1e-9)
        assert row["z_trend"] == pytest.approx(num / den, abs=2e-6)


class TestCointegration:
    @pytest.fixture(scope="class")
    def pair_truth(self):
        """Independent numpy EG recompute: np.polyfit OLS + textbook DF
        regression on hundredth-cent quantized residuals."""
        ev = _events()
        bars = (ev.assign(d=ev["ts"].dt.date,
                          cents=np.round(ev["value"].to_numpy() * 100)
                          .astype(np.int64))
                .groupby(["event_type", "d"])["cents"].sum()
                .reset_index(name="c"))
        types = sorted(bars["event_type"].unique())
        wide = bars.pivot(index="d", columns="event_type", values="c")
        out = {}
        for i, ta in enumerate(types):
            for tb in types[i + 1:]:
                sub = wide[[ta, tb]].dropna()
                x = sub[ta].to_numpy(dtype=float)
                y = sub[tb].to_numpy(dtype=float)
                b, a = np.polyfit(x, y, 1)
                e = np.floor(100.0 * (y - a - b * x) + 0.5)
                e = np.where(100.0 * (y - a - b * x) >= 0, e,
                             np.ceil(100.0 * (y - a - b * x) - 0.5))
                ep, de = e[:-1], np.diff(e)
                g = (ep * de).sum() / (ep * ep).sum()
                m = len(ep)
                rss = (de * de).sum() - g * g * (ep * ep).sum()
                se = np.sqrt((rss / (m - 1)) / (ep * ep).sum())
                rho = (ep * e[1:]).sum() / (ep * ep).sum()
                out[(ta, tb)] = (len(x), b, g / se, rho)
        return out

    def test_engle_granger_matches_numpy(self, spark, pair_truth):
        from predictor_spark.plans.catalog_r12_cointegration import (
            engle_granger_pairs)

        got = (engle_granger_pairs(spark, SF_DIR).toPandas()
               .set_index(["type_a", "type_b"]))
        assert len(got) == len(pair_truth)
        for (ta, tb), (n, b, adf, _) in pair_truth.items():
            row = got.loc[(ta, tb)]
            assert row["n_days"] == n
            assert row["hedge_beta"] == pytest.approx(b, abs=2e-5)
            assert row["adf_stat"] == pytest.approx(adf, abs=2e-4)

    def test_half_life_matches_numpy(self, spark, pair_truth):
        from predictor_spark.plans.catalog_r12_cointegration import (
            spread_half_life)

        got = (spread_half_life(spark, SF_DIR).toPandas()
               .set_index(["type_a", "type_b"]))
        for (ta, tb), (_, _, _, rho) in pair_truth.items():
            row = got.loc[(ta, tb)]
            assert row["rho"] == pytest.approx(rho, abs=2e-5)
            if 0 < rho < 1:
                assert row["half_life_days"] == pytest.approx(
                    -np.log(2) / np.log(rho), abs=2e-3)
            else:
                assert pd.isna(row["half_life_days"])

    def test_ols_residuals_decorrelated_from_x(self, pair_truth):
        """OLS law: residuals are orthogonal to the regressor — the
        hedge ratio is the variance-minimizing spread weight, which is
        why step-2 tests the RESIDUAL, not a unit spread."""
        # the fixture already encodes b from polyfit; orthogonality is
        # numpy's guarantee — assert the ADF stat is finite for all 10
        # pairs (S2 > 0: no degenerate constant residual)
        for (_, _), (n, b, adf, rho) in pair_truth.items():
            assert np.isfinite(adf) and np.isfinite(rho) and n >= 10


class TestGof:
    def test_jarque_bera_matches_scipy_formula(self, spark,
                                               daily_micro_rets):
        from predictor_spark.plans.catalog_r12_gof import (
            jarque_bera_by_type)

        got = (jarque_bera_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in daily_micro_rets.items():
            if len(r) < 4:
                assert t not in got.index
                continue
            x = r.astype(float)
            m2 = ((x - x.mean()) ** 2).mean()
            m3 = ((x - x.mean()) ** 3).mean()
            m4 = ((x - x.mean()) ** 4).mean()
            s = m3 / m2 ** 1.5
            k = m4 / m2 ** 2 - 3
            jb = len(x) / 6 * (s * s + k * k / 4)
            row = got.loc[t]
            assert row["n_days"] == len(x)
            assert row["skewness"] == pytest.approx(s, abs=2e-5)
            assert row["excess_kurtosis"] == pytest.approx(k, abs=2e-5)
            assert row["jb_stat"] == pytest.approx(jb, abs=2e-4)

    def test_runs_test_matches_python_walk(self, spark, daily_micro_rets):
        from predictor_spark.plans.catalog_r12_gof import runs_test_by_type

        got = (runs_test_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in daily_micro_rets.items():
            med = np.percentile(r, 50, method="linear")
            s = [1 if v > med else 0 for v in r if v != med]
            n1, n2 = sum(s), len(s) - sum(s)
            if n1 == 0 or n2 == 0:
                assert t not in got.index
                continue
            runs = 1 + sum(1 for a, b in zip(s, s[1:]) if a != b)
            mu = 2 * n1 * n2 / (n1 + n2) + 1
            sig = np.sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                          / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
            row = got.loc[t]
            assert row["n_above"] == n1 and row["n_below"] == n2
            assert row["n_runs"] == runs
            assert row["z_runs"] == pytest.approx((runs - mu) / sig,
                                                  abs=2e-6)

    def test_jb_zero_for_symmetric_sample(self):
        """Spec sanity in pure numpy: a perfectly symmetric sample has
        skewness exactly 0, so JB reduces to the kurtosis term."""
        x = np.concatenate([np.arange(-10, 0), np.arange(1, 11)]) * 1.0
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        assert abs(m3 / m2 ** 1.5) < 1e-12


class TestKeyness:
    @pytest.fixture(scope="class")
    def counts(self):
        import re
        from collections import Counter

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        sw = Counter()
        stot = Counter()
        wtot = Counter()
        for _, row in docs.iterrows():
            for w in re.split(r"\s+", row["text"].strip()):
                if w:
                    sw[(row["source"], w)] += 1
                    stot[row["source"]] += 1
                    wtot[w] += 1
        return sw, stot, wtot, sum(stot.values())

    def test_g2_matches_python(self, spark, counts):
        from predictor_spark.plans.catalog_r12_keyness import (
            _MIN_COUNT, _TOPK, dunning_g2_terms)

        sw, stot, wtot, n = counts
        scored = {}
        for (s, w), a in sw.items():
            if a < _MIN_COUNT:
                continue
            b = wtot[w] - a
            rest = n - stot[s]
            if a / stot[s] <= (a + b) / n:
                continue
            ea = stot[s] * (a + b) / n
            eb = rest * (a + b) / n
            g2 = 2 * (a * np.log(a / ea)
                      + (b * np.log(b / eb) if b else 0.0))
            scored.setdefault(s, []).append((round(g2, 6), w, a))
        got = dunning_g2_terms(spark, SF_DIR).toPandas()
        for s, terms in scored.items():
            want = sorted(terms, key=lambda t: (-t[0], t[1]))[:_TOPK]
            sub = got[got.source == s]
            assert len(sub) == len(want)
            for (g2, w, a), (_, row) in zip(want, sub.iterrows()):
                assert row["term"] == w
                assert row["n_in_source"] == a
                assert row["g2"] == pytest.approx(g2, abs=2e-5)

    def test_log_odds_matches_python(self, spark, counts):
        from predictor_spark.plans.catalog_r12_keyness import (
            _MIN_COUNT, _TOPK, log_odds_ratio_terms)

        sw, stot, wtot, n = counts
        scored = {}
        for (s, w), a in sw.items():
            if a < _MIN_COUNT:
                continue
            b = wtot[w] - a
            rest = n - stot[s]
            delta = (np.log((a + .5) / (stot[s] - a + .5))
                     - np.log((b + .5) / (rest - b + .5)))
            z = delta / np.sqrt(1 / (a + .5) + 1 / (b + .5))
            scored.setdefault(s, []).append((round(float(z), 6), w, a))
        got = log_odds_ratio_terms(spark, SF_DIR).toPandas()
        for s, terms in scored.items():
            want = sorted(terms, key=lambda t: (-t[0], t[1]))[:_TOPK]
            sub = got[got.source == s]
            assert len(sub) == len(want)
            for (z, w, a), (_, row) in zip(want, sub.iterrows()):
                assert row["term"] == w
                assert row["z_logodds"] == pytest.approx(z, abs=2e-5)


class TestTextDiversity:
    @pytest.fixture(scope="class")
    def docs(self):
        return pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def test_distinct_n_matches_python(self, spark, docs):
        import re
        from collections import Counter

        from predictor_spark.plans.catalog_r12_textdiversity import (
            distinct_ngram_ratios)

        got = (distinct_ngram_ratios(spark, SF_DIR).toPandas()
               .set_index(["source", "n"]))
        per = {}
        for _, row in docs.iterrows():
            t = [w for w in re.split(r"\s+", row["text"].strip()) if w]
            for n in (1, 2, 3):
                grams = [" ".join(t[i:i + n])
                         for i in range(len(t) - n + 1)]
                cnt = per.setdefault((row["source"], n), Counter())
                cnt.update(grams)
        for (s, n), cnt in per.items():
            total = sum(cnt.values())
            if total == 0:
                assert (s, n) not in got.index
                continue
            row = got.loc[(s, n)]
            assert row["n_distinct"] == len(cnt)
            assert row["n_total"] == total
            assert row["distinct_ratio"] == pytest.approx(
                round(len(cnt) / total, 6), abs=1e-9)

    def test_burstiness_matches_python(self, spark, docs):
        import re
        from collections import Counter

        from predictor_spark.plans.catalog_r12_textdiversity import (
            _BURST_MIN, _BURST_TOPK, token_burstiness)

        D = len(docs)
        dw = Counter()
        for _, row in docs.iterrows():
            for w, c in Counter(
                    w for w in re.split(r"\s+", row["text"].strip())
                    if w).items():
                dw[w] = dw[w] + 0  # ensure key
                dw[(row["doc_id"], w)] = c
        tot, ss = Counter(), Counter()
        for key, c in dw.items():
            if isinstance(key, tuple):
                _, w = key
                tot[w] += c
                ss[w] += c * c
        scored = []
        for w, t in tot.items():
            if t < _BURST_MIN:
                continue
            mean = t / D
            vmr = (ss[w] / D - mean * mean) / mean
            scored.append((round(vmr, 6), w, t))
        want = sorted(scored, key=lambda x: (-x[0], x[1]))[:_BURST_TOPK]
        got = token_burstiness(spark, SF_DIR).toPandas()
        assert len(got) == len(want)
        for (vmr, w, t), (_, row) in zip(want, got.iterrows()):
            assert row["term"] == w
            assert row["n_occurrences"] == t
            assert row["vmr"] == pytest.approx(vmr, abs=2e-5)

    def test_burstiness_at_least_poissonish(self, spark):
        """VMR of the top-burst words must exceed 1 (clumping) — on a
        multi-topic corpus the burstiest words are never sub-Poisson."""
        from predictor_spark.plans.catalog_r12_textdiversity import (
            token_burstiness)

        got = token_burstiness(spark, SF_DIR).toPandas()
        assert (got["vmr"] > 1.0).all()


class TestRankTests:
    @pytest.fixture(scope="class")
    def pooled(self):
        ev = _events()
        sub = ev[ev.event_type.isin(["purchase", "view"])]
        c = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
        ga = (sub["event_type"] == "purchase").to_numpy()
        return c, ga

    @staticmethod
    def _u_and_ties(c, ga):
        order = np.argsort(c, kind="stable")
        cs = c[order]
        # average ranks with ties
        ranks = np.empty(len(cs), dtype=float)
        i = 0
        tie_term = 0
        while i < len(cs):
            j = i
            while j < len(cs) and cs[j] == cs[i]:
                j += 1
            t = j - i
            ranks[i:j] = (i + 1 + j) / 2.0
            tie_term += t ** 3 - t
            i = j
        r = np.empty(len(cs))
        r[order] = ranks
        n1 = int(ga.sum())
        n2 = len(c) - n1
        r1 = float(r[ga].sum())
        u1 = r1 - n1 * (n1 + 1) / 2.0
        return n1, n2, u1, tie_term

    def test_mann_whitney_matches_numpy(self, spark, pooled):
        from predictor_spark.plans.catalog_r13_ranktests import (
            mann_whitney_value)

        c, ga = pooled
        n1, n2, u1, tie = self._u_and_ties(c, ga)
        n = n1 + n2
        var = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
        z = (u1 - n1 * n2 / 2.0) / np.sqrt(var)
        row = mann_whitney_value(spark, SF_DIR).collect()[0]
        assert row["n_purchase"] == n1 and row["n_view"] == n2
        assert row["u_stat"] == pytest.approx(u1, abs=0.06)
        assert row["z_stat"] == pytest.approx(z, abs=2e-6)

    def test_cliffs_delta_matches_numpy(self, spark, pooled):
        from predictor_spark.plans.catalog_r13_ranktests import (
            cliffs_delta_value)

        c, ga = pooled
        n1, n2, u1, _ = self._u_and_ties(c, ga)
        cl = u1 / (n1 * n2)
        row = cliffs_delta_value(spark, SF_DIR).collect()[0]
        assert row["common_language"] == pytest.approx(cl, abs=2e-6)
        assert row["cliffs_delta"] == pytest.approx(2 * cl - 1, abs=2e-6)
        assert -1.0 <= row["cliffs_delta"] <= 1.0


class TestTails:
    @pytest.fixture(scope="class")
    def cents_by_type(self):
        ev = _events()
        sub = ev[ev.value > 0]
        return {t: np.round(g["value"].to_numpy() * 100).astype(np.int64)
                for t, g in sub.groupby("event_type")}, \
               {t: g["event_id"].to_numpy()
                for t, g in sub.groupby("event_type")}

    def test_hill_matches_numpy(self, spark, cents_by_type):
        from predictor_spark.plans.catalog_r13_tails import (
            _K, hill_tail_index)

        cents, ids = cents_by_type
        got = (hill_tail_index(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, c in cents.items():
            if len(c) < _K + 1:
                assert t not in got.index
                continue
            order = sorted(range(len(c)), key=lambda i: (-c[i], ids[t][i]))
            top = [c[i] for i in order[:_K]]
            ck = c[order[_K]]
            terms = [np.floor(1e9 * np.log(x / ck) + 0.5) for x in top]
            h = sum(terms) / (1e9 * _K)
            row = got.loc[t]
            assert row["hill_h"] == pytest.approx(round(h, 6), abs=1e-9)
            assert row["tail_alpha"] == pytest.approx(1.0 / h, abs=2e-4)

    def test_mean_excess_matches_numpy(self, spark, cents_by_type):
        from predictor_spark.plans.catalog_r13_tails import (
            tail_mean_excess)

        cents, _ = cents_by_type
        got = (tail_mean_excess(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, c in cents.items():
            cs = np.sort(c)
            # smallest value with cumulative share >= 0.9
            cum = np.arange(1, len(cs) + 1) / len(cs)
            u = int(cs[np.argmax(cum >= 0.90)])
            exc = c[c > u] - u
            if len(exc) == 0:
                assert t not in got.index
                continue
            row = got.loc[t]
            assert row["threshold_cents"] == u
            assert row["n_exceed"] == len(exc)
            assert row["mean_excess"] == pytest.approx(
                round(float(exc.mean()) / 100.0, 6), abs=1e-9)
            assert row["excess_over_threshold"] == pytest.approx(
                float(exc.mean()) / u, abs=2e-6)


class TestEmbedDiag:
    @pytest.fixture(scope="class")
    def sample(self):
        import hashlib

        from predictor_spark.plans.catalog_r13_embeddiag import _DIAG_N

        pdf = (pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
               .sort_values("vec_id").reset_index(drop=True))
        ids = pdf["vec_id"].tolist()
        keep = sorted(ids, key=lambda i: (
            hashlib.md5(str(i).encode()).hexdigest(), i))[:_DIAG_N]
        sub = pdf[pdf.vec_id.isin(keep)].sort_values("vec_id")
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in sub["embedding"]])
        return X, sub["vec_id"].to_numpy()

    @staticmethod
    def _d2(X):
        return np.round(((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2),
                        9)

    def test_twonn_matches_numpy(self, spark, sample):
        from predictor_spark.plans.catalog_r13_embeddiag import (
            intrinsic_dimension_twonn)

        X, ids = sample
        D = self._d2(X)
        terms = []
        for i in range(len(ids)):
            order = sorted((j for j in range(len(ids)) if j != i),
                           key=lambda j: (D[i, j], ids[j]))
            d1, d2 = D[i, order[0]], D[i, order[1]]
            if d1 <= 0:
                continue
            terms.append(np.floor(1e9 * 0.5 * np.log(d2 / d1) + 0.5))
        n = len(terms)
        s = sum(terms)
        row = intrinsic_dimension_twonn(spark, SF_DIR).collect()[0]
        assert row["n_points"] == n
        assert row["intrinsic_dim"] == pytest.approx(
            round(n / (s / 1e9), 6), abs=1e-6)
        assert row["mean_log_mu"] == pytest.approx(
            round(s / (1e9 * n), 6), abs=1e-9)
        # embeddings live on a manifold far thinner than the ambient D
        assert 0 < row["intrinsic_dim"] < X.shape[1]

    def test_hubness_matches_numpy(self, spark, sample):
        from predictor_spark.plans.catalog_r13_embeddiag import (
            _K, knn_hubness_skew)

        X, ids = sample
        D = self._d2(X)
        occ = {int(v): 0 for v in ids}
        for i in range(len(ids)):
            order = sorted((j for j in range(len(ids)) if j != i),
                           key=lambda j: (D[i, j], ids[j]))[:_K]
            for j in order:
                occ[int(ids[j])] += 1
        x = np.array(list(occ.values()), dtype=float)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        row = knn_hubness_skew(spark, SF_DIR).collect()[0]
        assert row["n_points"] == len(x)
        assert row["max_occurrence"] == int(x.max())
        assert row["occurrence_skewness"] == pytest.approx(
            m3 / m2 ** 1.5, abs=2e-5)
        # mean k-occurrence is k by construction (each point emits k votes)
        assert x.mean() == pytest.approx(_K)


class TestRegDiag:
    @pytest.fixture(scope="class")
    def ols(self):
        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        x = np.round(li["l_quantity"].to_numpy()).astype(np.int64)
        y = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        keys = list(zip(li["l_orderkey"], li["l_linenumber"]))
        n = len(x)
        b = (n * (x * y).sum() - x.sum() * y.sum()) \
            / (n * (x.astype(object) * x).sum() - x.sum() ** 2)
        a = (y.sum() - b * x.sum()) / n
        raw_e = y - a - b * x
        e = np.where(raw_e >= 0, np.floor(raw_e + 0.5),
                     np.ceil(raw_e - 0.5)).astype(np.int64)
        return x, e, keys

    def test_breusch_pagan_matches_numpy(self, spark, ols):
        from predictor_spark.plans.catalog_r13_regdiag import (
            breusch_pagan_test)

        x, e, _ = ols
        u = e.astype(float) ** 2
        xf = x.astype(float)
        n = len(x)
        num = (n * (xf * u).sum() - xf.sum() * u.sum()) ** 2
        den = ((n * (xf * xf).sum() - xf.sum() ** 2)
               * (n * (u * u).sum() - u.sum() ** 2))
        r2 = num / den
        row = breusch_pagan_test(spark, SF_DIR).collect()[0]
        assert row["n_rows"] == n
        assert row["r2_aux"] == pytest.approx(r2, abs=2e-6)
        assert row["bp_lm"] == pytest.approx(round(n * r2, 4), abs=1e-9)
        assert row["bp_lm"] >= 0.0 and np.isfinite(row["bp_lm"])

    def test_cooks_top_matches_numpy(self, spark, ols):
        from predictor_spark.plans.catalog_r13_regdiag import (
            _TOPK, cooks_distance_top)

        x, e, keys = ols
        n = len(x)
        xf = x.astype(float)
        sxx = (xf * xf).sum() - xf.sum() ** 2 / n
        h = 1.0 / n + (xf - xf.mean()) ** 2 / sxx
        s2 = (e.astype(float) ** 2).sum() / (n - 2)
        d = np.round(e.astype(float) ** 2 * h
                     / (2 * s2 * (1 - h) ** 2), 9)
        order = sorted(range(n), key=lambda i: (-d[i], keys[i]))[:_TOPK]
        got = cooks_distance_top(spark, SF_DIR).toPandas()
        assert len(got) == _TOPK
        for i, (_, row) in zip(order, got.iterrows()):
            assert (row["l_orderkey"], row["l_linenumber"]) == keys[i]
            assert row["quantity"] == x[i]
            assert row["resid_cents"] == e[i]
            assert row["cooks_d"] == pytest.approx(d[i], rel=1e-6)


class TestGrangerCcf:
    def test_granger_matches_numpy_lstsq(self, spark, daily_micro_rets):
        from predictor_spark.plans.catalog_r13_grangerccf import (
            granger_causality_pairs)

        ev = _events()
        bars = (ev.assign(d=ev["ts"].dt.date)
                .groupby(["event_type", "d"])["value"].sum()
                .round(6).reset_index(name="bar"))
        # rebuild (type, date, micro r) aligned frames
        series = {}
        for t, g in bars.groupby("event_type"):
            g = g.sort_values("d")
            prev = g["bar"].shift(1)
            ok = (prev.notna() & (prev > 0)).to_numpy()
            x = 1e6 * (g["bar"].to_numpy()[ok] / prev.to_numpy()[ok] - 1)
            r = np.where(x >= 0, np.floor(x + .5),
                         np.ceil(x - .5)).astype(np.int64)
            series[t] = dict(zip(np.array(g["d"])[ok], r))
        got = (granger_causality_pairs(spark, SF_DIR).toPandas()
               .set_index(["cause", "effect"]))
        types = sorted(series)
        import datetime as dt
        for tx in types:
            for ty in types:
                if tx == ty:
                    continue
                rows = []
                for d0, yt in series[ty].items():
                    dp = d0 - dt.timedelta(days=1)
                    if dp in series[ty] and dp in series[tx]:
                        rows.append((yt, series[ty][dp], series[tx][dp]))
                if len(rows) < 5:
                    assert (tx, ty) not in got.index
                    continue
                arr = np.array(rows, dtype=float)
                yt, yp, xp = arr[:, 0], arr[:, 1], arr[:, 2]
                n = len(yt)
                Xr = np.column_stack([np.ones(n), yp])
                Xu = np.column_stack([np.ones(n), yp, xp])
                br, *_ = np.linalg.lstsq(Xr, yt, rcond=None)
                bu, *_ = np.linalg.lstsq(Xu, yt, rcond=None)
                rss_r = ((yt - Xr @ br) ** 2).sum()
                rss_u = ((yt - Xu @ bu) ** 2).sum()
                f = (rss_r - rss_u) / (rss_u / (n - 3))
                row = got.loc[(tx, ty)]
                assert row["n_days"] == n
                assert row["f_stat"] == pytest.approx(f, abs=2e-3)

    def test_ccf_matches_numpy(self, spark):
        from predictor_spark.plans.catalog_r13_grangerccf import (
            _LAGS, ccf_purchase_view)

        ev = _events()
        bars = (ev.assign(d=ev["ts"].dt.date)
                .groupby(["event_type", "d"])["value"].sum()
                .round(6).reset_index(name="bar"))
        series = {}
        for t in ("purchase", "view"):
            g = bars[bars.event_type == t].sort_values("d")
            prev = g["bar"].shift(1)
            ok = (prev.notna() & (prev > 0)).to_numpy()
            x = 1e6 * (g["bar"].to_numpy()[ok] / prev.to_numpy()[ok] - 1)
            r = np.where(x >= 0, np.floor(x + .5),
                         np.ceil(x - .5)).astype(np.int64)
            series[t] = dict(zip(np.array(g["d"])[ok], r))
        got = (ccf_purchase_view(spark, SF_DIR).toPandas()
               .set_index("lag"))
        import datetime as dt
        for lag in range(-_LAGS, _LAGS + 1):
            pairs = [(xr, series["view"][d0 + dt.timedelta(days=lag)])
                     for d0, xr in series["purchase"].items()
                     if d0 + dt.timedelta(days=lag) in series["view"]]
            if len(pairs) < 3:
                assert lag not in got.index
                continue
            a = np.array(pairs, dtype=float)
            r = np.corrcoef(a[:, 0], a[:, 1])[0, 1]
            row = got.loc[lag]
            assert row["n_days"] == len(pairs)
            assert row["ccf"] == pytest.approx(r, abs=2e-6)
        # lag 0 correlation equals plain Pearson on the common dates
        assert -1 <= got.loc[0, "ccf"] <= 1


class TestArchTest:
    def test_arch_lm_matches_numpy(self, spark, daily_micro_rets):
        from predictor_spark.plans.catalog_r13_archtest import arch_lm_test

        got = (arch_lm_test(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in daily_micro_rets.items():
            u = (r.astype(object) * r).astype(float)
            x, y = u[:-1], u[1:]
            n = len(x)
            if n < 4:
                assert t not in got.index
                continue
            num = (n * (x * y).sum() - x.sum() * y.sum()) ** 2
            den = ((n * (x * x).sum() - x.sum() ** 2)
                   * (n * (y * y).sum() - y.sum() ** 2))
            r2 = num / den
            row = got.loc[t]
            assert row["n_days"] == n
            assert row["r2_aux"] == pytest.approx(r2, abs=2e-6)
            assert row["arch_lm"] == pytest.approx(round(n * r2, 4),
                                                   abs=1e-9)

    def test_squared_acf_matches_numpy(self, spark, daily_micro_rets):
        from predictor_spark.plans.catalog_r13_archtest import (
            _ACF_LAGS, squared_return_acf)

        got = (squared_return_acf(spark, SF_DIR).toPandas()
               .set_index(["event_type", "lag"]))
        for t, r in daily_micro_rets.items():
            u = (r.astype(object) * r).astype(float)
            for k in range(1, _ACF_LAGS + 1):
                x, y = u[:-k], u[k:]
                if len(x) < 3:
                    assert (t, k) not in got.index
                    continue
                c = np.corrcoef(x, y)[0, 1]
                row = got.loc[(t, k)]
                assert row["n_pairs"] == len(x)
                assert row["acf_sq"] == pytest.approx(c, abs=2e-6)


class TestPartialCorr:
    @pytest.fixture(scope="class")
    def xzy(self):
        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        return (np.round(li["l_quantity"].to_numpy()).astype(float),
                np.round(li["l_discount"].to_numpy() * 100).astype(float),
                np.round(li["l_extendedprice"].to_numpy() * 100)
                .astype(float))

    def test_partial_matches_numpy(self, spark, xzy):
        from predictor_spark.plans.catalog_r14_partialcorr import (
            partial_correlation_qpd)

        x, z, y = xzy
        rxy = np.corrcoef(x, y)[0, 1]
        rxz = np.corrcoef(x, z)[0, 1]
        rzy = np.corrcoef(z, y)[0, 1]
        want = (rxy - rxz * rzy) / np.sqrt((1 - rxz ** 2) * (1 - rzy ** 2))
        row = partial_correlation_qpd(spark, SF_DIR).collect()[0]
        assert row["n_rows"] == len(x)
        assert row["r_price_qty"] == pytest.approx(rxy, abs=2e-6)
        assert row["r_price_discount"] == pytest.approx(rzy, abs=2e-6)
        assert row["partial_r"] == pytest.approx(want, abs=2e-6)

    def test_vif_matches_numpy(self, spark, xzy):
        from predictor_spark.plans.catalog_r14_partialcorr import (
            vif_regressors)

        x, z, _ = xzy
        rxz = np.corrcoef(x, z)[0, 1]
        row = vif_regressors(spark, SF_DIR).collect()[0]
        assert row["r_qty_discount"] == pytest.approx(rxz, abs=2e-6)
        assert row["vif"] == pytest.approx(1 / (1 - rxz ** 2), abs=2e-6)
        # TPC-H draws quantity and discount independently: VIF ~ 1
        assert row["vif"] < 1.2


class TestPageHinkley:
    def test_ph_matches_python_walk(self, spark):
        from predictor_spark.plans.catalog_r14_pagehinkley import (
            page_hinkley_drift)

        ev = _events()
        bars = (ev.assign(d=ev["ts"].dt.date,
                          cents=np.round(ev["value"].to_numpy() * 100)
                          .astype(np.int64))
                .groupby(["event_type", "d"])["cents"].sum()
                .reset_index(name="x"))
        got = (page_hinkley_drift(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        saw_positive = False
        for t, g in bars.groupby("event_type"):
            g = g.sort_values("d").reset_index(drop=True)
            x = g["x"].to_numpy(dtype=float)
            m = 0.0
            cum = 0.0
            best, best_day = -1.0, None
            floor = np.inf
            csum = 0.0
            for i in range(len(x)):
                csum += x[i]
                mean = csum / (i + 1)
                term = np.floor(1e9 * (x[i] - mean) + 0.5) \
                    if x[i] >= mean else np.ceil(1e9 * (x[i] - mean) - 0.5)
                cum += term
                floor = min(floor, cum)
                climb = cum - floor
                if climb > best:
                    best, best_day = climb, g["d"].iloc[i]
            row = got.loc[t]
            assert row["ph_stat"] == pytest.approx(
                round(best / (1e9 * 100.0), 6), abs=1e-9)
            assert row["peak_date"] == best_day.isoformat()
            saw_positive |= best > 0
        assert saw_positive  # a flat-zero walk everywhere would be vacuous


class TestReliability:
    def test_weibull_mrr_matches_numpy(self, spark):
        from predictor_spark.plans.catalog_r14_reliability import (
            weibull_mrr_fit)

        o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        j["t"] = (j["l_shipdate"].dt.normalize()
                  - j["o_orderdate"].dt.normalize()).dt.days
        j = j[j.t > 0]
        got = (weibull_mrr_fit(spark, SF_DIR).toPandas()
               .set_index("priority"))
        for pri, g in j.groupby("o_orderpriority"):
            g = g.sort_values(["t", "l_orderkey", "l_linenumber"])
            n = len(g)
            if n < 3:
                assert pri not in got.index
                continue
            i = np.arange(1, n + 1)
            f = (i - 0.3) / (n + 0.4)
            x = np.floor(1e9 * np.log(g["t"].to_numpy(dtype=float))
                         + 0.5) / 1e9
            yr = 1e9 * np.log(-np.log(1 - f))
            y = np.where(yr >= 0, np.floor(yr + .5), np.ceil(yr - .5)) / 1e9
            k, c = np.polyfit(x, y, 1)
            lam = np.exp(-c / k)
            row = got.loc[pri]
            assert row["n_lines"] == n
            assert row["shape_k"] == pytest.approx(k, abs=2e-6)
            assert row["scale_days"] == pytest.approx(lam, rel=1e-6)
            assert row["b10_days"] == pytest.approx(
                lam * (-np.log(0.9)) ** (1 / k), rel=1e-6)
            # B10 must sit below the scale (10% quantile < 63.2% quantile)
            assert row["b10_days"] < row["scale_days"]


class TestBlockRanks:
    @pytest.fixture(scope="class")
    def block_ranks(self, daily_micro_rets):
        """Within-day ranks over complete blocks, recomputed in pandas
        from the dated return series (rebuilt here with dates)."""
        ev = _events()
        bars = (ev.assign(d=ev["ts"].dt.date)
                .groupby(["event_type", "d"])["value"].sum()
                .round(6).reset_index(name="bar"))
        frames = []
        for t, g in bars.groupby("event_type"):
            g = g.sort_values("d")
            prev = g["bar"].shift(1)
            ok = (prev.notna() & (prev > 0)).to_numpy()
            x = 1e6 * (g["bar"].to_numpy()[ok] / prev.to_numpy()[ok] - 1)
            r = np.where(x >= 0, np.floor(x + .5),
                         np.ceil(x - .5)).astype(np.int64)
            frames.append(pd.DataFrame(
                {"event_type": t, "d": np.array(g["d"])[ok], "r": r}))
        rets = pd.concat(frames)
        k = rets["event_type"].nunique()
        full = rets.groupby("d").filter(lambda g: len(g) == k)
        full = full.sort_values(["d", "r", "event_type"])
        full["rk"] = full.groupby("d").cumcount() + 1
        return full, k

    def test_friedman_matches_pandas(self, spark, block_ranks):
        from predictor_spark.plans.catalog_r14_blockranks import (
            friedman_test_daily)

        full, k = block_ranks
        n = full["d"].nunique()
        rs2 = (full.groupby("event_type")["rk"].sum() ** 2).sum()
        q = 12.0 * rs2 / (n * k * (k + 1)) - 3.0 * n * (k + 1)
        row = friedman_test_daily(spark, SF_DIR).collect()[0]
        assert row["n_blocks"] == n
        assert row["k_treatments"] == k
        assert row["friedman_q"] == pytest.approx(round(q, 6), abs=1e-9)

    def test_kendalls_w_matches_and_bounded(self, spark, block_ranks):
        from predictor_spark.plans.catalog_r14_blockranks import (
            kendalls_w_concordance)

        full, k = block_ranks
        n = full["d"].nunique()
        rs2 = (full.groupby("event_type")["rk"].sum() ** 2).sum()
        q = 12.0 * rs2 / (n * k * (k + 1)) - 3.0 * n * (k + 1)
        w = q / (n * (k - 1))
        row = kendalls_w_concordance(spark, SF_DIR).collect()[0]
        assert row["kendalls_w"] == pytest.approx(round(w, 6), abs=1e-9)
        assert 0.0 <= row["kendalls_w"] <= 1.0
