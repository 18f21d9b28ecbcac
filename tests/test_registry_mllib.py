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


def test_sql_functions_match_expression_forms(spark):
    from predictor_spark.functions.sqlfuncs import register_sql_functions
    from predictor_spark.operators.text import portable_hash, with_quality_score
    from predictor_spark.operators.temporal import symmetric_log1p
    from predictor_spark.sources.tables import load_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    names = register_sql_functions(spark)
    assert names == ["ps_log_return", "ps_portable_hash",
                     "ps_quality_score", "ps_sym_log1p"]
    docs = load_table(spark, SF_DIR, "documents")
    docs.createOrReplaceTempView("__docs")

    # portable hash parity
    sql = spark.sql("SELECT doc_id, ps_portable_hash(text) AS h FROM __docs")
    expr = docs.select("doc_id", portable_hash(F.col("text")).alias("h"))
    assert {tuple(r) for r in sql.collect()} == {tuple(r) for r in expr.collect()}

    # quality-score parity (rounded: float vs Column arithmetic)
    sql = spark.sql(
        "SELECT doc_id, round(ps_quality_score(text), 9) AS q FROM __docs")
    expr = with_quality_score(docs).select(
        "doc_id", F.round("quality_score", 9).alias("q"))
    assert {tuple(r) for r in sql.collect()} == {tuple(r) for r in expr.collect()}

    # log-return guard parity on crafted values
    vals = spark.createDataFrame(
        [(1.0, 2.0), (0.0, 2.0), (3.0, 0.0), (-1.0, 2.0)], "cur double, prev double")
    vals.createOrReplaceTempView("__vals")
    rows = spark.sql(
        "SELECT round(ps_log_return(cur, prev), 9) AS r FROM __vals").collect()
    import math
    assert [r["r"] for r in rows] == [round(math.log(0.5), 9), 0.0, 0.0, 0.0]


def test_chunk_plan_udtf(spark):
    from predictor_spark.functions.udtfs import register_udtfs

    assert register_udtfs(spark) == ["ps_chunk_plan"]
    rows = spark.sql("SELECT * FROM ps_chunk_plan(100, 30, 5)").collect()
    # chunks cover [0,100) exactly once in their cores, halos clamp at edges
    assert [(r["chunk_id"], r["start"], r["end"], r["core_start"], r["core_end"])
            for r in rows] == [
        (0, 0, 35, 0, 30), (1, 25, 65, 30, 60),
        (2, 55, 95, 60, 90), (3, 85, 100, 90, 100),
    ]
    # lateral use: plan chunks for per-series lengths
    spark.createDataFrame([(1, 70), (2, 10)], "sid int, n int") \
        .createOrReplaceTempView("__lens")
    lat = spark.sql(
        "SELECT sid, chunk_id, core_start, core_end "
        "FROM __lens, LATERAL ps_chunk_plan(n, 40, 4)").collect()
    assert {(r["sid"], r["chunk_id"]) for r in lat} == {(1, 0), (1, 1), (2, 0)}
