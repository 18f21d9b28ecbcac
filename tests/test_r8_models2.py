"""tcn_forward_pass / mlp_forward_pass hard-gate rows (VERDICT r7 #4).

The driver row proves Spark == DuckDB on the shared expression strings;
these tests close the remaining gap — the strings must also encode the
ACTUAL numpy cores (models/tcn.py, models/mlp.py forward), so the layer
generators are evaluated via DuckDB on random windows and compared to
the cores' forward() to float noise."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from predictor_spark.plans.catalog_r8_models2 import (
    _mlp_literal_params, _tcn_literal_params, mlp_forward_layers,
    tcn_forward_layers)


def _eval_layers(layers, window: np.ndarray) -> float:
    con = duckdb.connect()
    raws = [repr(float(v)) for v in window]
    nested = "(SELECT 1 AS one) base"
    for idx, layer in enumerate(layers):
        cols = ", ".join(f"{e} AS {c}" for c, e in layer.items())
        nested = f"(SELECT *, {cols} FROM {nested}) l{idx}"
    # splice the literal window values in place of the raw columns
    layers0 = dict(layers[0])
    first = ", ".join(f"({r}) / 100.0 AS x{t}" for t, r in enumerate(raws))
    nested = nested.replace(
        "(SELECT *, " + ", ".join(f"{e} AS {c}" for c, e in layers0.items())
        + " FROM (SELECT 1 AS one) base) l0",
        f"(SELECT *, {first} FROM (SELECT 1 AS one) base) l0")
    y = con.execute(f"SELECT y FROM {nested}").fetchone()[0]
    con.close()
    return float(y)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tcn_layers_match_numpy_forward(seed):
    from predictor_spark.models import tcn

    p = _tcn_literal_params()
    rng = np.random.default_rng(seed)
    w = rng.uniform(10.0, 500.0, size=8)
    layers = tcn_forward_layers([f"w{t}" for t in range(8)], p)
    got = _eval_layers(layers, w)
    ys, _ = tcn.forward(p, (w / 100.0)[None, :], (1,))
    assert got == pytest.approx(float(ys[1][0]), abs=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mlp_layers_match_numpy_forward(seed):
    from predictor_spark.models import mlp

    p = _mlp_literal_params()
    rng = np.random.default_rng(seed)
    w = rng.uniform(10.0, 500.0, size=8)
    layers = mlp_forward_layers([f"w{t}" for t in range(8)], p)
    got = _eval_layers(layers, w)
    ys, _ = mlp.forward(p, (w / 100.0)[None, :], (1,))
    assert got == pytest.approx(float(ys[1][0]), abs=1e-9)


def test_tcn_layers_prune_unreachable_positions():
    """Only positions that feed the last-step head are emitted for each
    conv layer — at (layers=2, kernel=2) that is {5, 7} for layer 1's
    inputs... i.e. layer-0 columns exist only where needed."""
    p = _tcn_literal_params()
    layers = tcn_forward_layers([f"w{t}" for t in range(8)], p)
    l0_cols = {c for L in layers for c in L if c.startswith("z0_")}
    # layer1 (dilation 2, kernel 2) at t=7 needs h0 at {7, 5}; h0 at t
    # needs x{t}, x{t-1} only — no other layer-0 position may be emitted
    assert {c.rsplit("_", 2)[1] for c in l0_cols} == {"5", "7"}
