"""TF/Keras execution seam (VERDICT r3 #7): the real path runs only
where tensorflow is importable (this image ships none — those tests
skip); the seam's guards and numpy-side contract are verified
everywhere.
"""

from __future__ import annotations

import numpy as np
import pytest

from predictor_spark.models import mlp
from predictor_spark.models.tf_bridge import tf_available

needs_tf = pytest.mark.skipif(not tf_available(),
                              reason="tensorflow not installed in this image")


def test_seam_guards_without_tf():
    """Without TF the bridge must fail loudly at the seam, not deep in a
    worker."""
    if tf_available():
        pytest.skip("tensorflow present — guard path not reachable")
    from predictor_spark.models import tf_bridge

    p = mlp.init_params(np.random.default_rng(0), 4, (1,))
    with pytest.raises(ImportError):
        tf_bridge.keras_model_from_params(p, (1,))


@needs_tf
def test_keras_forward_matches_numpy_core():
    """Keras rebuild of the MLP weights agrees with models/mlp.forward
    (float32 tolerance — TF computes in float32 by default)."""
    from predictor_spark.models.tf_bridge import keras_model_from_params

    rng = np.random.default_rng(1)
    hs = (1, 3)
    p = mlp.init_params(rng, 6, hs, layers=2, units=5)
    X = rng.normal(size=(17, 6))
    want = mlp.predict(p, X, hs)
    model = keras_model_from_params(p, hs)
    got = model(X, training=False)
    for h, y in zip(hs, got):
        np.testing.assert_allclose(np.asarray(y)[:, 0], want[h],
                                   rtol=1e-5, atol=1e-6)


@needs_tf
def test_keras_artifact_roundtrip(tmp_path):
    """.keras save/load (reference base.py:325-330) preserves inference."""
    from predictor_spark.models.tf_bridge import (
        keras_model_from_params,
        load_keras,
        save_keras,
    )

    rng = np.random.default_rng(2)
    p = mlp.init_params(rng, 5, (1,), layers=1, units=4)
    model = keras_model_from_params(p, (1,))
    path = str(tmp_path / "model.keras")
    save_keras(model, path)
    X = rng.normal(size=(9, 5))
    a = np.asarray(model(X, training=False))
    b = np.asarray(load_keras(path)(X, training=False))
    np.testing.assert_allclose(a, b)


@needs_tf
def test_tf_infer_mapinpandas(spark):
    """Distributed Keras inference equals the numpy core's predictions."""
    import pandas as pd

    from predictor_spark.models.tf_bridge import tf_infer

    rng = np.random.default_rng(3)
    n, d = 200, 4
    p = mlp.init_params(rng, d, (1,), layers=2, units=6)
    pdf = pd.DataFrame(rng.normal(size=(n, d)),
                       columns=[f"x{i}" for i in range(d)])
    pdf["row_id"] = range(n)
    out = tf_infer(
        spark.createDataFrame(pdf), p, (1,),
        feature_cols=[f"x{i}" for i in range(d)], id_cols=["row_id"],
    ).toPandas().sort_values("row_id")
    want = mlp.predict(p, pdf[[f"x{i}" for i in range(d)]].to_numpy(), (1,))[1]
    np.testing.assert_allclose(out["pred_h1"].to_numpy(), want,
                               rtol=1e-5, atol=1e-6)


def test_unknown_core_fails_fast():
    from predictor_spark.models.tf_bridge import keras_model_for_core

    p = mlp.init_params(np.random.default_rng(0), 4, (1,))
    with pytest.raises((ValueError, ImportError)):
        # without TF the mlp/tcn builders raise ImportError first; with
        # TF the typo must raise ValueError before any worker sees it
        keras_model_for_core("gru", p, (1,))


@needs_tf
def test_keras_tcn_matches_numpy_core():
    """Keras Conv1D(causal, dilated) rebuild of the TCN weights agrees
    with models/tcn.forward — incl. the multivariate-channel case
    (VERDICT r7 #8: the champion artifact is a TCN, not an MLP)."""
    from predictor_spark.models import tcn
    from predictor_spark.models.tf_bridge import keras_model_for_core

    rng = np.random.default_rng(5)
    hs = (1, 3)
    for in_ch in (1, 3):
        p = tcn.init_params(rng, 12, hs, layers=3, channels=5, kernel=2,
                            in_channels=in_ch)
        X = rng.normal(size=(11, 12, in_ch))
        want, _ = tcn.forward(p, X, hs)
        model = keras_model_for_core("tcn", p, hs)
        got = model(X, training=False)
        for h, y in zip(hs, got):
            np.testing.assert_allclose(np.asarray(y)[:, 0], want[h],
                                       rtol=1e-5, atol=1e-6)


@needs_tf
def test_keras_tcn_artifact_roundtrip(tmp_path):
    """.keras save/load of the TCN rebuild (base.py:325-330 contract)."""
    from predictor_spark.models import tcn
    from predictor_spark.models.tf_bridge import (keras_model_for_core,
                                                  load_keras, save_keras)

    rng = np.random.default_rng(6)
    p = tcn.init_params(rng, 8, (1,), layers=2, channels=4, kernel=2)
    model = keras_model_for_core("tcn", p, (1,))
    path = str(tmp_path / "tcn.keras")
    save_keras(model, path)
    X = rng.normal(size=(7, 8, 1))
    a = np.asarray(model(X, training=False))
    b = np.asarray(load_keras(path)(X, training=False))
    np.testing.assert_allclose(a, b)


@needs_tf
def test_tf_infer_tcn_mapinpandas(spark):
    """Distributed TCN inference (flat features reshaped to the
    (window, channels) frame) equals the numpy core."""
    import pandas as pd

    from predictor_spark.models import tcn
    from predictor_spark.models.tf_bridge import tf_infer

    rng = np.random.default_rng(7)
    n, T, C = 100, 6, 2
    p = tcn.init_params(rng, T, (1,), layers=2, channels=4, kernel=2,
                        in_channels=C)
    X = rng.normal(size=(n, T, C))
    flat = X.reshape(n, T * C)
    pdf = pd.DataFrame(flat, columns=[f"x{i}" for i in range(T * C)])
    pdf["row_id"] = range(n)
    out = tf_infer(
        spark.createDataFrame(pdf), p, (1,),
        feature_cols=[f"x{i}" for i in range(T * C)], id_cols=["row_id"],
        core="tcn",
    ).toPandas().sort_values("row_id")
    want, _ = tcn.forward(p, X, (1,))
    np.testing.assert_allclose(out["pred_h1"].to_numpy(), want[1],
                               rtol=1e-5, atol=1e-6)
