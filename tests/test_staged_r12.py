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
