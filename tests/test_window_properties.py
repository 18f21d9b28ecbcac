"""Property-based tests (hypothesis) for the window-tensorizer leakage
invariants — the custom piece SURVEY §4 says to property-test hard:

- W1 inclusive: window at row t = values[t-w+1 .. t]; last element IS the
  row-t value (the W4 baseline invariant).
- W2 exclusive: window at row t = values[t-w .. t-1] — row t NEVER leaks
  into its own window; the max_horizon tail guard drops exactly the rows
  whose t+h target would not exist.
- W5 leads: target_h at row t = values[t+h]; trim drops exactly max_h
  rows per series.
- W17 overlap-add inverts W1 for fully-covered ticks.

Each property is checked against a pure-Python oracle on
hypothesis-generated series, both single- and multi-series.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from predictor_spark.operators import temporal

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# distinct finite floats so "row t leaked into its window" is detectable
series_strategy = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32).map(float),
    min_size=4, max_size=24, unique=True,
)


def _df(spark, values, n_series=1):
    rows = [
        (s, t, v + s * 0.001)  # offset per series so values stay unique
        for s in range(n_series)
        for t, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "sid int, ts int, value double")


@given(values=series_strategy, w=st.integers(2, 5))
@settings(**SETTINGS)
def test_w1_inclusive_window_matches_oracle(spark, values, w):
    df = _df(spark, values, n_series=2)
    out = temporal.window_tensorize(df, ["value"], w, series_col="sid", inclusive=True)
    got = {
        (r["sid"], r["ts"]): [x[0] for x in r["window"]]
        for r in out.select("sid", "ts", "window").collect()
    }
    for s in range(2):
        vals = [v + s * 0.001 for v in values]
        expect = {t: vals[t - w + 1: t + 1] for t in range(w - 1, len(vals))}
        assert {t for (sid, t) in got if sid == s} == set(expect)
        for t, win in expect.items():
            assert got[(s, t)] == pytest.approx(win)
            assert got[(s, t)][-1] == pytest.approx(vals[t])  # W4 baseline = row t


@given(values=series_strategy, w=st.integers(2, 4), max_h=st.integers(0, 3))
@settings(**SETTINGS)
def test_w2_exclusive_window_never_contains_row_t(spark, values, w, max_h):
    df = _df(spark, values)
    out = temporal.window_tensorize(
        df, ["value"], w, series_col="sid", inclusive=False, max_horizon=max_h
    )
    rows = out.select("ts", "value", "window").collect()
    n = len(values)
    # surviving ticks: have w history rows strictly before t, and t+max_h exists
    expect_ts = [t for t in range(w, n) if t + max_h < n]
    assert sorted(r["ts"] for r in rows) == expect_ts
    for r in rows:
        win = [x[0] for x in r["window"]]
        assert win == pytest.approx(values[r["ts"] - w: r["ts"]])
        assert all(not math.isclose(x, r["value"]) for x in win)  # anti-leakage


@given(values=series_strategy, horizons=st.sets(st.integers(1, 4), min_size=1, max_size=3))
@settings(**SETTINGS)
def test_w5_lead_targets_match_future_values(spark, values, horizons):
    horizons = sorted(horizons)
    df = _df(spark, values)
    out = temporal.lead_targets(df, "value", horizons, series_col="sid", trim=True)
    rows = {r["ts"]: r for r in out.collect()}
    max_h = max(horizons)
    assert sorted(rows) == list(range(len(values) - max_h))  # trim rule
    for t, r in rows.items():
        for h in horizons:
            assert r[f"target_h{h}"] == pytest.approx(values[t + h])


@given(values=series_strategy, w=st.integers(2, 4))
@settings(**SETTINGS)
def test_w17_overlap_add_inverts_w1(spark, values, w):
    df = _df(spark, values)
    wins = temporal.window_tensorize(df, ["value"], w, series_col="sid", inclusive=True)
    wins = wins.withColumn("w1d", F.transform("window", lambda r: F.element_at(r, 1)))
    rec = temporal.overlap_add(wins, "w1d", series_col="sid").collect()
    # tick k is the 1-based original position (element p of the window at
    # post-trim row r lands at tick r+p = original index r-1+p, offset +1);
    # averaging equal values returns the value itself, so every covered
    # tick matches its original
    for r in rec:
        orig = values[r["tick"] - 1]
        assert r["value"] == pytest.approx(orig)
