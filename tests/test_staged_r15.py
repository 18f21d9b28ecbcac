"""Tests for the STAGED round-10 catalog families (r15 modules).

Same contract as test_staged_r12.py: the DuckDB oracle sweep proves
Spark == SQL replay; these tests prove both match the MATH via an
independent pure-pandas/numpy reimplementation — deliberately using the
NAIVE formulation (explicit weight matrices, brute-force template loops)
where the engine uses an algebraic identity, so a wrong identity cannot
agree with its own replay.
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
def daily_micro_rets():
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


@pytest.fixture(scope="module")
def daily_cents_bars():
    ev = _events()
    cents = _round_half_away(ev["value"].to_numpy() * 100).astype(np.int64)
    bars = (ev.assign(d=ev["ts"].dt.date, c=cents)
            .groupby(["event_type", "d"])["c"].sum().reset_index(name="x"))
    return {t: g.sort_values("d")["x"].to_numpy()
            for t, g in bars.groupby("event_type")}


class TestHjorth:
    def test_hjorth_matches_numpy(self, spark, daily_micro_rets):
        from predictor_spark.plans.catalog_r15_hjorth import (
            hjorth_params_by_type)

        got = (hjorth_params_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in daily_micro_rets.items():
            r = r.astype(float)
            dr, ddr = np.diff(r), np.diff(np.diff(r))
            v0, v1, v2 = (np.var(x) for x in (r, dr, ddr))
            row = got.loc[t]
            assert row["n_days"] == len(r)
            assert row["activity"] == pytest.approx(v0 / 1e12, rel=1e-5)
            mob = np.sqrt(v1 / v0)
            assert row["mobility"] == pytest.approx(mob, rel=1e-5)
            assert row["complexity"] == pytest.approx(
                np.sqrt(v2 / v1) / mob, rel=1e-5)

    def test_crest_zcr_matches_numpy(self, spark, daily_micro_rets):
        from predictor_spark.plans.catalog_r15_hjorth import (
            crest_zcr_by_type)

        got = (crest_zcr_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in daily_micro_rets.items():
            rms = np.sqrt(np.mean(r.astype(float) ** 2))
            flips = int(np.sum(r[1:].astype(np.int64)
                               * r[:-1].astype(np.int64) < 0))
            row = got.loc[t]
            assert row["n_days"] == len(r)
            assert row["crest_factor"] == pytest.approx(
                np.abs(r).max() / rms, rel=1e-5)
            assert row["zcr"] == pytest.approx(flips / (len(r) - 1),
                                               abs=1e-6)


class TestComplexity:
    def test_sampen_matches_bruteforce(self, spark, daily_micro_rets):
        from predictor_spark.plans.catalog_r15_complexity import (
            sample_entropy_by_type)

        got = (sample_entropy_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, r in daily_micro_rets.items():
            tol = int(np.floor(0.2 * np.sqrt(np.var(r.astype(float)))))
            n = len(r) - 2
            b = a = 0
            for i in range(n):
                for j in range(i + 1, n):
                    if max(abs(int(r[i]) - int(r[j])),
                           abs(int(r[i + 1]) - int(r[j + 1]))) <= tol:
                        b += 1
                        if abs(int(r[i + 2]) - int(r[j + 2])) <= tol:
                            a += 1
            row = got.loc[t]
            assert row["b_count"] == b and row["a_count"] == a
            if a and b:
                assert row["sampen"] == pytest.approx(-np.log(a / b),
                                                      abs=1e-6)
            else:
                assert pd.isna(row["sampen"])

    def test_fractal_dims_match_numpy(self, spark, daily_cents_bars):
        from predictor_spark.plans.catalog_r15_complexity import (
            katz_petrosian_fd)

        got = (katz_petrosian_fd(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, x in daily_cents_bars.items():
            n = len(x)
            dx = np.diff(x)
            L = float(np.abs(dx).sum())
            d = float(np.abs(x - x[0]).max())
            flips = int(np.sum(dx[1:] * dx[:-1] < 0))
            row = got.loc[t]
            assert row["n_days"] == n
            katz = np.log10(n - 1) / (np.log10(n - 1) + np.log10(d / L))
            pet = np.log10(n) / (np.log10(n)
                                 + np.log10(n / (n + 0.4 * flips)))
            assert row["katz_fd"] == pytest.approx(katz, rel=1e-5)
            assert row["petrosian_fd"] == pytest.approx(pet, rel=1e-5)


@pytest.fixture(scope="module")
def nation_xs():
    """Per-nation mean balance + region key, exact-cents mean."""
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    m = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    m["cents"] = _round_half_away(
        m["c_acctbal"].to_numpy() * 100).astype(np.int64)
    g = (m.groupby(["n_nationkey", "n_name", "n_regionkey"])["cents"]
         .agg(["sum", "count"]).reset_index())
    g["x"] = g["sum"] / g["count"] / 100.0
    return g


class TestSpatial:
    def test_moran_geary_vs_explicit_weight_matrix(self, spark, nation_xs):
        """Engine uses the same-region block identity; this test builds
        the explicit n x n weight matrix and double-sums it."""
        from predictor_spark.plans.catalog_r15_spatial import (
            morans_i_nation_balance)

        g = nation_xs
        x = g["x"].to_numpy()
        region = g["n_regionkey"].to_numpy()
        n = len(x)
        W = ((region[:, None] == region[None, :])
             & ~np.eye(n, dtype=bool)).astype(float)
        d = x - x.mean()
        s0 = W.sum()
        moran = (n / s0) * (d @ W @ d) / (d @ d)
        geary = ((n - 1) / (2 * s0)) * float(
            (W * (x[:, None] - x[None, :]) ** 2).sum()) / (d @ d)
        row = morans_i_nation_balance(spark, SF_DIR).toPandas().iloc[0]
        assert row["n_nations"] == n and row["s0"] == int(s0)
        assert row["moran_i"] == pytest.approx(moran, abs=1e-5)
        assert row["geary_c"] == pytest.approx(geary, abs=1e-5)

    def test_local_moran_sums_to_global(self, spark, nation_xs):
        from predictor_spark.plans.catalog_r15_spatial import (
            local_moran_nation, morans_i_nation_balance)

        g = nation_xs
        x = g["x"].to_numpy()
        region = g["n_regionkey"].to_numpy()
        d = x - x.mean()
        m2 = (d @ d) / len(x)
        got = (local_moran_nation(spark, SF_DIR).toPandas()
               .set_index("nation"))
        for _, r in g.iterrows():
            mask = (region == r["n_regionkey"])
            dev = r["x"] - x.mean()
            li = dev * (d[mask].sum() - dev) / m2
            row = got.loc[r["n_name"]]
            assert row["n_neighbors"] == int(mask.sum()) - 1
            assert row["local_i"] == pytest.approx(li, abs=1e-5)
        # Anselin identity: global I = sum(I_i) / S0 * n / n = sum(I_i)/S0
        glob = morans_i_nation_balance(spark, SF_DIR).toPandas().iloc[0]
        assert glob["moran_i"] == pytest.approx(
            got["local_i"].sum() / glob["s0"] * 1.0, abs=1e-4)


@pytest.fixture(scope="module")
def cluster_points():
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    ncnt = orders.groupby("o_custkey").size()
    f1 = _round_half_away(
        cust["c_acctbal"].to_numpy() * 100).astype(np.int64)
    f2 = cust["c_custkey"].map(ncnt).fillna(0).astype(np.int64)
    pts = pd.DataFrame({"seg": cust["c_mktsegment"],
                        "f1": f1, "f2": f2.to_numpy()})
    z = pts[["f1", "f2"]].astype(float)
    z = (z - z.mean()) / z.std(ddof=0)
    return pts.assign(z1=z["f1"], z2=z["f2"])


class TestClusterval:
    def test_ch_matches_explicit_pointwise(self, spark, cluster_points):
        from predictor_spark.plans.catalog_r15_clusterval import (
            calinski_harabasz_segments)

        p = cluster_points
        n, k = len(p), p["seg"].nunique()
        cent = p.groupby("seg")[["z1", "z2"]].mean()
        sizes = p.groupby("seg").size()
        b = float((sizes * (cent["z1"] ** 2 + cent["z2"] ** 2)).sum())
        w = float(((p["z1"] - p["seg"].map(cent["z1"])) ** 2
                   + (p["z2"] - p["seg"].map(cent["z2"])) ** 2).sum())
        row = calinski_harabasz_segments(spark, SF_DIR).toPandas().iloc[0]
        assert row["k"] == k and row["n_points"] == n
        assert row["between_ss"] == pytest.approx(b, rel=1e-6)
        assert row["within_ss"] == pytest.approx(w, rel=1e-6)
        assert row["ch_index"] == pytest.approx(
            (b / (k - 1)) / (w / (n - k)), rel=1e-6)

    def test_db_matches_explicit_pointwise(self, spark, cluster_points):
        from predictor_spark.plans.catalog_r15_clusterval import (
            davies_bouldin_segments)

        p = cluster_points
        cent = p.groupby("seg")[["z1", "z2"]].mean()
        scat = {}
        for s, g in p.groupby("seg"):
            scat[s] = float(np.sqrt(
                ((g["z1"] - cent.loc[s, "z1"]) ** 2
                 + (g["z2"] - cent.loc[s, "z2"]) ** 2).mean()))
        got = (davies_bouldin_segments(spark, SF_DIR).toPandas()
               .set_index("seg"))
        for s in cent.index:
            comps = []
            for o in cent.index:
                if o == s:
                    continue
                m = np.hypot(cent.loc[s, "z1"] - cent.loc[o, "z1"],
                             cent.loc[s, "z2"] - cent.loc[o, "z2"])
                comps.append((scat[s] + scat[o]) / m)
            row = got.loc[s]
            assert row["scatter"] == pytest.approx(scat[s], rel=1e-5)
            assert row["db_component"] == pytest.approx(max(comps),
                                                        rel=1e-5)


class TestSeqInfo:
    def test_entropy_rate_matches_pandas(self, spark):
        from predictor_spark.plans.catalog_r15_seqinfo import (
            markov_entropy_rate)

        ev = _events().sort_values(["user_id", "ts", "event_id"])
        ev["dst"] = ev.groupby("user_id")["event_type"].shift(-1)
        pairs = ev.dropna(subset=["dst"])
        c = (pairs.groupby(["event_type", "dst"]).size()
             .reset_index(name="n"))
        got = (markov_entropy_rate(spark, SF_DIR).toPandas()
               .set_index("src"))
        total = c["n"].sum()
        for src, g in c.groupby("event_type"):
            p = g["n"] / g["n"].sum()
            h = float(-(p * np.log2(p)).sum())
            row = got.loc[src]
            assert row["n_out"] == g["n"].sum()
            assert row["pi_src"] == pytest.approx(g["n"].sum() / total,
                                                  abs=1e-6)
            assert row["h_cond_bits"] == pytest.approx(h, abs=1e-6)

    def test_fano_includes_empty_hours(self, spark):
        from predictor_spark.plans.catalog_r15_seqinfo import (
            fano_factor_by_type)

        ev = _events()
        hr = ev["ts"].dt.floor("h")
        lo, hi = hr.min(), hr.max()
        n_hours = int((hi - lo) / pd.Timedelta(hours=1)) + 1
        got = (fano_factor_by_type(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t, g in ev.groupby("event_type"):
            counts = g.groupby(g["ts"].dt.floor("h")).size()
            full = counts.reindex(
                pd.date_range(lo, hi, freq="h"), fill_value=0).to_numpy()
            row = got.loc[t]
            assert row["n_hours"] == n_hours == len(full)
            assert row["n_events"] == len(g)
            assert row["fano"] == pytest.approx(
                full.var() / full.mean(), rel=1e-5)
