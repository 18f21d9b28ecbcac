"""Tests for the STAGED round-10 catalog families, third batch (r17).

Independent numpy reimplementations: scipy-free Chow F from explicit
half regressions (np.polyfit residuals), a pywt-free Haar cascade, and
per-value entropy loops for the stump scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _round_half_away(x):
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


@pytest.fixture(scope="module")
def bars_and_rets():
    ev = _events()
    bars = (ev.assign(d=ev["ts"].dt.date)
            .groupby(["event_type", "d"])["value"].sum()
            .round(6).reset_index(name="bar"))
    rets = {}
    for t, g in bars.groupby("event_type"):
        g = g.sort_values("d")
        prev = g["bar"].shift(1)
        ok = prev.notna() & (prev > 0)
        x = 1e6 * (g["bar"][ok] / prev[ok] - 1.0)
        rets[t] = pd.DataFrame({
            "d": g.loc[ok, "d"].to_numpy(),
            "r": _round_half_away(x).astype(np.int64)})
    return bars, rets


class TestRiskMore:
    def test_updown_capture(self, spark, bars_and_rets):
        from predictor_spark.plans.catalog_r17_riskmore import (
            updown_capture_by_type)

        bars, rets = bars_and_rets
        bbars = bars.groupby("d")["bar"].sum().round(6).sort_index()
        prev = bbars.shift(1)
        ok = prev.notna() & (prev > 0)
        rb = pd.Series(
            _round_half_away(1e6 * (bbars[ok] / prev[ok] - 1.0))
            .astype(np.int64), index=bbars.index[ok])
        got = (updown_capture_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, g in rets.items():
            m = g.merge(rb.rename("rb"), left_on="d", right_index=True)
            up, down = m[m["rb"] > 0], m[m["rb"] < 0]
            row = got.loc[t]
            assert row["n_up"] == len(up) and row["n_down"] == len(down)
            assert row["up_capture"] == pytest.approx(
                up["r"].sum() / up["rb"].sum(), abs=1e-5)
            assert row["down_capture"] == pytest.approx(
                down["r"].sum() / down["rb"].sum(), abs=1e-5)

    def test_pain_martin(self, spark, bars_and_rets):
        from predictor_spark.plans.catalog_r17_riskmore import (
            pain_martin_by_type)

        bars, rets = bars_and_rets
        got = (pain_martin_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, g in bars.groupby("event_type"):
            g = g.sort_values("d")
            b = g["bar"].to_numpy()
            peak = np.maximum.accumulate(b)
            pd_pct = 100.0 * (peak - b) / peak
            pain = pd_pct.mean()
            ulcer = np.sqrt((pd_pct ** 2).mean())
            r = rets[t]["r"].to_numpy(dtype=float)
            row = got.loc[t]
            assert row["pain_index"] == pytest.approx(pain, abs=1e-4)
            assert row["ulcer"] == pytest.approx(ulcer, abs=1e-4)
            assert row["martin_ratio"] == pytest.approx(
                (r.mean() / 1e6 * 100.0) / ulcer, abs=1e-4)

    def test_tail_ratio_nearest_rank(self, spark, bars_and_rets):
        from predictor_spark.plans.catalog_r17_riskmore import (
            tail_ratio_by_type)

        _, rets = bars_and_rets
        got = (tail_ratio_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, g in rets.items():
            r = np.sort(g["r"].to_numpy())
            n = len(r)
            p95 = r[int(np.ceil(0.95 * n)) - 1]
            p05 = r[int(np.ceil(0.05 * n)) - 1]
            row = got.loc[t]
            assert row["p95"] == pytest.approx(p95 / 1e6, abs=1e-6)
            assert row["p05"] == pytest.approx(p05 / 1e6, abs=1e-6)
            assert row["tail_ratio"] == pytest.approx(
                abs(p95) / abs(p05), abs=1e-4)


class TestStructBreak:
    def test_chow_f_vs_polyfit(self, spark):
        from predictor_spark.plans.catalog_r17_structbreak import (
            chow_test_price_qty)

        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        lo, hi = o["o_orderdate"].min(), o["o_orderdate"].max()
        mid = lo + pd.Timedelta(days=int((hi - lo).days // 2))
        x = m["l_quantity"].to_numpy(dtype=float)
        y = _round_half_away(
            m["l_extendedprice"].to_numpy() * 100).astype(np.int64) \
            .astype(float)
        first = (m["o_orderdate"] <= mid).to_numpy()

        def ssr(xs, ys):
            b, a = np.polyfit(xs, ys, 1)
            res = ys - (a + b * xs)
            return float((res ** 2).sum())

        s1, s2 = ssr(x[first], y[first]), ssr(x[~first], y[~first])
        sp = ssr(x, y)
        n = len(x)
        f = ((sp - s1 - s2) / 2) / ((s1 + s2) / (n - 4))
        row = chow_test_price_qty(spark, SF_DIR).toPandas().iloc[0]
        assert row["n_first"] == int(first.sum())
        assert row["n_second"] == int((~first).sum())
        assert row["chow_f"] == pytest.approx(f, rel=1e-4)

    def test_cusum_squares(self, spark, bars_and_rets):
        from predictor_spark.plans.catalog_r17_structbreak import (
            cusum_squares_break)

        _, rets = bars_and_rets
        got = (cusum_squares_break(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, g in rets.items():
            r2 = g["r"].to_numpy(dtype=float) ** 2
            n = len(r2)
            s = np.cumsum(r2) / r2.sum()
            dev = np.abs(s - (np.arange(1, n + 1) / n))
            i = int(np.argmax(dev))  # first max = earliest date
            row = got.loc[t]
            assert row["n_days"] == n
            assert row["max_deviation"] == pytest.approx(dev[i], abs=1e-5)
            assert row["break_date"] == str(g["d"].iloc[i])


class TestHaar:
    @staticmethod
    def _cascade(x):
        levels = {}
        s = x.astype(np.int64)
        for k in (1, 2, 3):
            m = len(s) // 2
            pairs = s[: 2 * m].reshape(m, 2)
            levels[k] = pairs[:, 0] - pairs[:, 1]
            s = pairs.sum(axis=1)
        return levels

    def test_energy_levels(self, spark):
        from predictor_spark.plans.catalog_r17_wavelet import (
            haar_energy_levels)

        ev = _events()
        cents = _round_half_away(
            ev["value"].to_numpy() * 100).astype(np.int64)
        bars = (ev.assign(d=ev["ts"].dt.date, c=cents)
                .groupby(["event_type", "d"])["c"].sum()
                .reset_index(name="x"))
        got = haar_energy_levels(spark, SF_DIR).toPandas()
        for t, g in bars.groupby("event_type"):
            x = g.sort_values("d")["x"].to_numpy()
            lv = self._cascade(x)
            energies = {k: float((d.astype(float) ** 2).sum()) / 2 ** k
                        for k, d in lv.items()}
            tot = sum(energies.values())
            sub = got[got["event_type"] == t].set_index("level")
            for k, e in energies.items():
                assert sub.loc[k, "n_coeffs"] == len(lv[k])
                assert sub.loc[k, "energy"] == pytest.approx(e / 1e4,
                                                             rel=1e-6)
                assert sub.loc[k, "share"] == pytest.approx(e / tot,
                                                            abs=1e-6)

    def test_top_details(self, spark):
        from predictor_spark.plans.catalog_r17_wavelet import (
            haar_top_details)

        ev = _events()
        cents = _round_half_away(
            ev["value"].to_numpy() * 100).astype(np.int64)
        bars = (ev.assign(d=ev["ts"].dt.date, c=cents)
                .groupby(["event_type", "d"])["c"].sum()
                .reset_index(name="x"))
        got = haar_top_details(spark, SF_DIR).toPandas()
        for t, g in bars.groupby("event_type"):
            g = g.sort_values("d")
            x = g["x"].to_numpy()
            m = len(x) // 2
            d1 = (x[: 2 * m].reshape(m, 2)[:, 0]
                  - x[: 2 * m].reshape(m, 2)[:, 1])
            starts = g["d"].to_numpy()[0: 2 * m: 2]
            order = sorted(range(m), key=lambda i: (-abs(int(d1[i])),
                                                    starts[i]))
            sub = got[got["event_type"] == t].sort_values("rnk")
            for rnk, i in enumerate(order[:2], start=1):
                row = sub[sub["rnk"] == rnk].iloc[0]
                assert row["pair_start"] == str(starts[i])
                assert row["detail_value"] == pytest.approx(
                    d1[i] / 100.0 / 2.0, abs=1e-6)


class TestStump:
    @staticmethod
    def _entropy(p, n):
        if p in (0, n):
            return 0.0
        q = p / n
        return -q * np.log2(q) - (1 - q) * np.log2(1 - q)

    def test_stump_gain_and_curve(self, spark):
        from predictor_spark.plans.catalog_r17_stump import (
            decision_stump_gain, stump_gain_curve)

        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        y = (li["l_returnflag"] == "R").astype(int).to_numpy()
        feats = {
            "quantity": li["l_quantity"].astype(np.int64).to_numpy(),
            "discount": _round_half_away(
                li["l_discount"].to_numpy() * 100).astype(np.int64),
        }
        nt, pt = len(y), int(y.sum())
        hp = self._entropy(pt, nt)
        best = {}
        curves = {}
        for f, x in feats.items():
            rows = []
            for v in sorted(np.unique(x))[:-1]:
                left = x <= v
                nl, pl = int(left.sum()), int(y[left].sum())
                ig = (hp - (nl / nt) * self._entropy(pl, nl)
                      - ((nt - nl) / nt) * self._entropy(pt - pl, nt - nl))
                rows.append((v, nl, pl, ig))
            curves[f] = rows
            best[f] = max(rows, key=lambda r: (r[3], -r[0]))
        got = (decision_stump_gain(spark, SF_DIR).toPandas()
               .set_index("feature"))
        for f, (v, nl, pl, ig) in best.items():
            row = got.loc[f]
            assert row["threshold"] == v
            assert row["n_left"] == nl and row["pos_left"] == pl
            assert row["info_gain_bits"] == pytest.approx(ig, abs=1e-6)
        curve = (stump_gain_curve(spark, SF_DIR).toPandas()
                 .set_index("threshold"))
        assert len(curve) == len(curves["quantity"])
        for v, nl, _, ig in curves["quantity"]:
            assert curve.loc[v, "n_left"] == nl
            assert curve.loc[v, "info_gain_bits"] == pytest.approx(
                ig, abs=1e-6)
