"""Property-based tests (hypothesis) for the round-4 operators:

- asof_self_join == two-scan asof_join on arbitrary predicate splits of
  arbitrary frames (including both-sides and neither rows, tied prices,
  empty sides);
- registry serialize/deserialize round-trips arbitrary weight-dict
  shapes bit-exactly;
- the trading fold under a perfect prediction matrix equals the
  perfect-foresight fold (the pred_matrix seam cannot drift from the
  future-slice path);
- combined_diff analytic gradient matches finite differences on random
  vectors (the pluggable-loss contract the cores consume).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)


@given(
    n=st.integers(10, 60),
    n_users=st.integers(1, 4),
    kinds=st.lists(st.sampled_from(["l", "r", "both", "neither"]),
                   min_size=10, max_size=60),
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_asof_self_join_equals_two_scan_property(spark, n, n_users, kinds,
                                                 seed):
    from pyspark.sql import functions as F

    from predictor_spark.operators.asof import asof_join, asof_self_join

    rng = np.random.default_rng(seed)
    n = min(n, len(kinds))
    base = np.datetime64("2024-01-01T00:00:00")
    ts = np.sort(rng.choice(500_000, size=n, replace=False)) \
        .astype("timedelta64[s]")
    pdf = pd.DataFrame({
        "ts": (base + ts).astype("datetime64[us]"),
        "user_id": rng.integers(0, n_users, n),
        "kind": kinds[:n],
        "value": rng.normal(size=n).round(3),
        "event_id": range(n),
    })
    df = spark.createDataFrame(pdf)
    lp = F.col("kind").isin("l", "both")
    rp = F.col("kind").isin("r", "both")
    tol = F.expr("INTERVAL 3 HOURS")
    one = asof_self_join(df, lp, rp, by=["user_id"],
                         right_cols=["ts", "value"], tolerance=tol) \
        .toPandas().sort_values("event_id").reset_index(drop=True)
    two = asof_join(df.filter(lp), df.filter(rp), by=["user_id"],
                    right_cols=["ts", "value"], tolerance=tol) \
        .toPandas().sort_values("event_id").reset_index(drop=True)
    assert one["event_id"].tolist() == two["event_id"].tolist()
    assert one["ts_right"].equals(two["ts_right"])
    assert one["value_right"].equals(two["value_right"])


@given(
    shapes=st.lists(
        st.lists(st.integers(1, 5), min_size=0, max_size=3),
        min_size=1, max_size=6),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=25, deadline=None)
def test_registry_blob_roundtrip_property(shapes, seed):
    from predictor_spark.models.registry import (
        deserialize_params,
        serialize_params,
    )

    rng = np.random.default_rng(seed)
    params = {f"k{i}": rng.normal(size=tuple(s)) for i, s in enumerate(shapes)}
    stats = {"mu": float(rng.normal()), "sd": float(abs(rng.normal()) + 0.1),
             "window": 7, "horizons": np.array([1, 2]),
             "ch_mu": rng.normal(size=3)}
    p2, s2 = deserialize_params(serialize_params(params, stats))
    assert set(p2) == set(params)
    for k in params:
        np.testing.assert_array_equal(p2[k], params[k])
    assert float(s2["mu"]) == stats["mu"]
    np.testing.assert_array_equal(s2["ch_mu"], stats["ch_mu"])


@given(
    n=st.integers(8, 60),
    horizon=st.integers(1, 6),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=20, deadline=None)
def test_perfect_pred_matrix_equals_perfect_foresight(n, horizon, seed):
    """pred_matrix filled with the actual future slice reproduces the
    self-contained perfect-foresight fold trade-for-trade."""
    from predictor_spark.operators.trading import simulate_series

    rng = np.random.default_rng(seed)
    ts = pd.date_range("2024-01-01", periods=n, freq="4h").to_numpy()
    price = np.abs(np.cumsum(rng.normal(size=n)) * 20 + 100)
    m = np.full((n, horizon), np.nan)
    for i in range(n):
        fut = price[i + 1: i + 1 + horizon]
        m[i, :len(fut)] = fut
    a = simulate_series(ts, price, horizon=horizon)
    b = simulate_series(ts, price, horizon=horizon, pred_matrix=m)
    assert len(a) == len(b)
    for ta, tb in zip(a, b):
        assert ta == tb


@given(
    n=st.integers(3, 40),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=25, deadline=None)
def test_combined_diff_gradient_property(n, seed):
    from predictor_spark.models.losses import combined_diff_loss

    rng = np.random.default_rng(seed)
    y_true = np.cumsum(rng.normal(size=n))
    y_pred = y_true + rng.normal(size=n) * 0.3
    _, g = combined_diff_loss(y_true, y_pred)
    eps = 1e-6
    idx = rng.choice(n, size=min(4, n), replace=False)
    for i in idx:
        yp = y_pred.copy()
        yp[i] += eps
        lp = combined_diff_loss(y_true, yp)[0]
        yp[i] -= 2 * eps
        lm = combined_diff_loss(y_true, yp)[0]
        num = (lp - lm) / (2 * eps)
        assert abs(num - g[i]) < 1e-4 * max(1.0, abs(num)), (i, num, g[i])


@given(
    n=st.integers(1, 80),
    budget=st.integers(5, 200),
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_pack_sequences_grid_law_property(spark, n, budget, seed):
    """pack_sequences == the per-shard cumulative-sum grid law for
    arbitrary token sizes (including docs far above the budget)."""
    from predictor_spark.operators.datapipe import pack_sequences

    rng = np.random.default_rng(seed)
    toks = rng.integers(1, 3 * budget, size=n)
    pdf = pd.DataFrame({
        "doc_id": np.arange(n),
        "shard": [f"s{int(x)}" for x in rng.integers(0, 3, n)],
        "n_tok": toks,
    })
    out = pack_sequences(spark.createDataFrame(pdf), "doc_id", "n_tok",
                         "shard", budget).toPandas()
    for shard, grp in out.groupby("shard"):
        grp = grp.sort_values("doc_id")
        cum_before = grp["n_tok"].cumsum().shift(fill_value=0)
        want = (cum_before // budget).to_numpy()
        assert (grp["seq_id"].to_numpy() == want).all()


@given(
    masks=st.lists(st.integers(0, 1), min_size=4, max_size=24),
    seed=st.integers(0, 10_000),
    name=st.sampled_from(["trend_sigma", "pearson_structural",
                          "combined_diff"]),
)
@settings(**SETTINGS)
def test_masked_loss_equals_trimmed_view_property(masks, seed, name):
    """For LEVEL-only components the gap mask must behave like deleting
    the masked rows: compare against the loss recomputed on the kept rows
    with matching denominators. Checked via the analytic gradient being
    zero exactly at masked positions and FD agreement at kept positions —
    on arbitrary 0/1 masks (all-masked included)."""
    from predictor_spark.models import losses as LO

    m = np.array(masks, dtype=float)
    n = len(m)
    rng = np.random.default_rng(seed)
    y_true = rng.normal(size=n)
    y_pred = rng.normal(size=n)
    loss, g = LO.LOSSES[name](y_true, y_pred, mask=m)
    assert np.isfinite(loss)
    # masked interior positions never carry gradient
    for i in range(1, n - 1):
        if m[i] == 0.0:
            assert abs(g[i]) < 1e-9, (i, g[i])
    # spot FD check on up to 3 kept positions
    kept = [i for i in range(n) if m[i] == 1.0][:3]
    eps = 1e-6
    for i in kept:
        yp = y_pred.copy(); yp[i] += eps
        lp = LO.LOSSES[name](y_true, yp, mask=m)[0]
        yp = y_pred.copy(); yp[i] -= eps
        lm = LO.LOSSES[name](y_true, yp, mask=m)[0]
        num = (lp - lm) / (2 * eps)
        assert abs(num - g[i]) < 1e-4 * max(1.0, abs(num)), (i, num, g[i])
