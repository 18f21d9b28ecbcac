from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from predictor_spark.functions import registry
from predictor_spark.plans.mllib_model import fit_linear_forecaster
from predictor_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_registry_builtin_lookup():
    spec = registry.get("predictor", "ar1")
    assert spec.params["horizon"] == 1
    assert "persistence" in registry.available("predictor")
    assert "lead_targets" in registry.available("target")


def test_registry_unknown_errors():
    with pytest.raises(KeyError, match="no predictor plugin named 'nope'"):
        registry.get("predictor", "nope")
    with pytest.raises(ValueError, match="unknown plugin group"):
        registry.register("bogus_group", "x")


def test_registry_custom_registration():
    @registry.register("preprocessor", "_test_double", params={"k": 2})
    def double(df, col):
        return df.withColumn(col, F.col(col) * 2)

    spec = registry.get("preprocessor", "_test_double")
    assert spec.factory is double and spec.params == {"k": 2}


def test_mllib_multifeature_runs(spark):
    ev = load_table(spark, SF, "events")
    ev = ev.withColumn("hod", F.hour("ts").cast("double"))
    model, scored = fit_linear_forecaster(ev, ["value", "hod"], train_end="2024-01-22 00:00:00")
    lr = model.stages[-1]
    assert len(lr.coefficients) == 2
    mae = scored.agg(F.avg(F.abs(F.col("pred") - F.col("target_h1")))).collect()[0][0]
    naive = scored.agg(F.avg(F.abs(F.col("value") - F.col("target_h1")))).collect()[0][0]
    assert mae < naive  # trained model beats persistence
