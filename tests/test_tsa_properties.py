"""Hypothesis property tests for the TSA rows: invariants that must hold
for ARBITRARY series, not just the fixtures — ACF normalization and
shift/scale laws, CUSUM location invariance, winsorized-mean bounds."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)


def _events_df(values, event_type="a"):
    n = len(values)
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=n, freq="h")
        .astype("datetime64[us]"),
        "user_id": np.zeros(n, dtype=np.int64),
        "event_type": event_type,
        "value": np.asarray(values, dtype=float),
        "props": "{}",
    })
    return pdf


def _write(spark, tmpdir, pdf):
    import os
    import uuid

    d = os.path.join(tmpdir, uuid.uuid4().hex[:8])
    os.makedirs(d)
    spark.createDataFrame(pdf).write.parquet(f"{d}/events.parquet")
    return d


@given(seed=st.integers(0, 10_000), n=st.integers(30, 120),
       shift=st.floats(-50, 50), scale=st.floats(0.5, 10))
@settings(**SETTINGS)
def test_acf_is_shift_and_scale_invariant(spark, tmp_path_factory, seed, n,
                                          shift, scale):
    from predictor_spark.plans.catalog_tsa import acf_per_series

    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, n).cumsum()
    base = tmp_path_factory.mktemp("acf")
    d1 = _write(spark, str(base), _events_df(x))
    d2 = _write(spark, str(base), _events_df(scale * x + shift))
    a1 = {r.lag: r.acf for r in acf_per_series(spark, d1).collect()}
    a2 = {r.lag: r.acf for r in acf_per_series(spark, d2).collect()}
    for k in a1:
        assert abs(a1[k]) <= 1.0 + 1e-9
        # affine transforms leave the sample ACF unchanged (to rounding)
        assert abs(a1[k] - a2[k]) <= 2e-4, k


@given(seed=st.integers(0, 10_000), n=st.integers(40, 150),
       shift=st.floats(-100, 100))
@settings(**SETTINGS)
def test_cusum_location_is_shift_invariant(spark, tmp_path_factory, seed, n,
                                           shift):
    from predictor_spark.plans.catalog_tsa import cusum_changepoint

    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, n).cumsum()
    base = tmp_path_factory.mktemp("cusum")
    d1 = _write(spark, str(base), _events_df(x))
    d2 = _write(spark, str(base), _events_df(x + shift))
    r1 = cusum_changepoint(spark, d1).collect()[0]
    r2 = cusum_changepoint(spark, d2).collect()[0]
    # S_i subtracts i*mean, so adding a constant leaves every deviation —
    # and therefore the argmax location and statistic — unchanged
    assert r1.cp_index == r2.cp_index
    assert abs(r1.cp_stat - r2.cp_stat) <= 2e-3


@given(seed=st.integers(0, 10_000), n=st.integers(25, 200))
@settings(**SETTINGS)
def test_winsorized_mean_is_bounded_by_thresholds(spark, tmp_path_factory,
                                                  seed, n):
    from predictor_spark.plans.catalog_tsa import winsorize_values

    rng = np.random.default_rng(seed)
    x = rng.standard_cauchy(n) * 10 + 50  # heavy tails: winsorize matters
    base = tmp_path_factory.mktemp("wins")
    d = _write(spark, str(base), _events_df(x))
    r = winsorize_values(spark, d).collect()[0]
    assert r.p05 <= r.p95
    assert r.p05 - 1e-6 <= r.mean_winsorized <= r.p95 + 1e-6
    # clipping a heavy-tailed sample moves the mean toward the median;
    # at minimum it cannot move OUTSIDE the raw extremes
    assert min(x) - 1e-6 <= r.mean_winsorized <= max(x) + 1e-6
