"""Tests for the STAGED round-8 catalog families.

Same contract as test_staged_r7.py: the DuckDB oracle sweep proves
Spark == SQL replay; these tests prove both match the MATH via an
independent pure-pandas/numpy reimplementation of each metric spec,
plus family-specific invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def split_cents():
    ev = _events()
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    early = ev["ts"] < pd.Timestamp("2024-01-16")
    return cents[early.to_numpy()], cents[~early.to_numpy()]


class TestDistDist:
    def test_wasserstein_matches_bruteforce(self, spark, split_cents):
        from predictor_spark.plans.catalog_r8_distdist import (
            wasserstein_value_drift)

        a, b = split_cents
        # brute force: mean absolute difference of matched quantiles is
        # NOT the grouped-CDF form — integrate |Fa - Fb| over the grid
        grid = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
        w1 = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(grid))) / 100.0

        row = wasserstein_value_drift(spark, SF_DIR).collect()[0]
        assert row["n_early"] == len(a) and row["n_late"] == len(b)
        assert row["wasserstein_1"] == pytest.approx(w1, abs=2e-6)

    def test_cvm_matches_bruteforce(self, spark, split_cents):
        from predictor_spark.plans.catalog_r8_distdist import (
            cramer_von_mises_drift)

        a, b = split_cents
        pooled = np.concatenate([a, b])
        grid, cnt = np.unique(pooled, return_counts=True)
        fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
        n = len(pooled)
        t = len(a) * len(b) / n**2 * float(
            np.sum(cnt * (fa - fb) ** 2))

        row = cramer_von_mises_drift(spark, SF_DIR).collect()[0]
        assert row["cvm_t"] == pytest.approx(t, abs=2e-6)

    def test_energy_matches_bruteforce(self, spark, split_cents):
        from predictor_spark.plans.catalog_r8_distdist import (
            energy_distance_drift)

        a, b = split_cents
        axy = np.abs(a[:, None] - b[None, :]).mean()
        axx = np.abs(a[:, None] - a[None, :]).mean()
        ayy = np.abs(b[:, None] - b[None, :]).mean()
        e = float(2 * axy - axx - ayy) / 100.0

        row = energy_distance_drift(spark, SF_DIR).collect()[0]
        assert row["energy_distance"] == pytest.approx(e, abs=2e-6)

    def test_energy_distance_nonnegative(self, spark):
        """Energy distance is a metric — the V-statistic is >= 0."""
        from predictor_spark.plans.catalog_r8_distdist import (
            energy_distance_drift)

        row = energy_distance_drift(spark, SF_DIR).collect()[0]
        assert row["energy_distance"] >= 0.0


def _brute_profile(x: np.ndarray, m: int, excl: int):
    """O(n^2 m) loop-form matrix profile — independent of the engine's
    vectorized stride-trick kernel."""
    nsub = len(x) - m + 1
    mp = np.full(nsub, np.iinfo(np.int64).max, dtype=np.int64)
    nn = np.zeros(nsub, dtype=np.int64)
    for i in range(nsub):
        for j in range(nsub):
            if abs(i - j) < excl:
                continue
            d = int(((x[i:i + m] - x[j:j + m]) ** 2).sum())
            if d < mp[i]:
                mp[i], nn[i] = d, j
    return mp, nn


@pytest.fixture(scope="module")
def bars_by_type():
    ev = _events()
    ev = ev.assign(
        slot=(ev["ts"].astype("int64") // (14_400_000 * 1_000_000)),
        cents=np.round(ev["value"].to_numpy() * 100).astype(np.int64))
    g = (ev.groupby(["event_type", "slot"])["cents"].sum()
         .reset_index(name="bar"))
    return {t: grp.sort_values("slot")["bar"].to_numpy(dtype=np.int64)
            for t, grp in g.groupby("event_type")}


class TestMatrixProfile:
    def test_profile_matches_bruteforce(self, spark, bars_by_type):
        from predictor_spark.plans.catalog_r8_matrixprofile import (
            _EXCL, _M, matrix_profile_4h)

        got = (matrix_profile_4h(spark, SF_DIR).toPandas()
               .set_index(["event_type", "i"]))
        for t, x in bars_by_type.items():
            if len(x) < _M + 2 * _EXCL:
                continue
            mp, nn = _brute_profile(x, _M, _EXCL)
            for i in range(len(mp)):
                row = got.loc[(t, i + 1)]
                assert row["mp_d2"] == mp[i], (t, i)
                assert row["nn_idx"] == nn[i] + 1, (t, i)

    def test_motif_is_global_minimum(self, spark, bars_by_type):
        from predictor_spark.plans.catalog_r8_matrixprofile import (
            _EXCL, _M, motif_top_pair)

        got = motif_top_pair(spark, SF_DIR).toPandas().set_index("event_type")
        for t, x in bars_by_type.items():
            if len(x) < _M + 2 * _EXCL:
                continue
            mp, _ = _brute_profile(x, _M, _EXCL)
            row = got.loc[t]
            assert row["motif_d2"] == mp.min()
            a, b = int(row["motif_a"]) - 1, int(row["motif_b"]) - 1
            assert a < b and b - a >= _EXCL
            d = int(((x[a:a + _M] - x[b:b + _M]) ** 2).sum())
            assert d == mp.min()

    def test_discord_is_profile_maximum(self, spark, bars_by_type):
        from predictor_spark.plans.catalog_r8_matrixprofile import (
            _EXCL, _M, discord_top)

        got = discord_top(spark, SF_DIR).toPandas().set_index("event_type")
        for t, x in bars_by_type.items():
            if len(x) < _M + 2 * _EXCL:
                continue
            mp, _ = _brute_profile(x, _M, _EXCL)
            row = got.loc[t]
            assert row["discord_d2"] == mp.max()
            # smallest-index tie-break
            assert int(row["discord_idx"]) - 1 == int(np.argmax(mp))
