"""Round-12 perf-prototype equality pins (see plans/proto_r12.py).

Each prototype must reproduce its live registered row EXACTLY (the
same 6dp-rounded values the DuckDB oracle grades) before round 12 is
allowed to swap it in. These tests are the evidence that the swap is
mechanical: if a prototype ever drifts from the registered query,
this fails before any grade is put at risk.

Also pins the two-phase rank primitive itself against the
single-window row_number on a skewed frame with duplicate order keys.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_two_phase_row_number_matches_window(spark):
    from predictor_spark.operators.ranking import two_phase_row_number

    # skewed: one key holds ~90% of rows; duplicate ts values force
    # cross-bucket tie handling through the bucket-is-a-pure-function
    # guarantee
    base = (spark.range(3000)
            .select((F.when(F.col("id") % 10 < 9, "hot")
                     .otherwise("cold")).alias("k"),
                    (F.col("id") % 97).alias("t"),
                    F.col("id").alias("uid")))
    got = two_phase_row_number(base, ["k"], "t", ["t", "uid"],
                               rank_name="i", n_buckets=16)
    w = Window.partitionBy("k").orderBy("t", "uid")
    want = sorted(_rows(
        base.withColumn("i", F.row_number().over(w))
            .select("k", "uid", "i")))
    assert sorted(_rows(got.select("k", "uid", "i"))) == want
    # explicit-bounds path (skips the quantile pass); ANY boundary set
    # must give identical ranks — here a deliberately lopsided one
    got2 = two_phase_row_number(base, ["k"], "t", ["t", "uid"],
                                rank_name="i", bounds=[5.0, 50.0, 90.0])
    assert sorted(_rows(got2.select("k", "uid", "i"))) == want


def test_discrete_key_rank_matches_window(spark):
    from predictor_spark.operators.ranking import discrete_key_rank

    base = (spark.range(3000)
            .select((F.when(F.col("id") % 10 < 9, "hot")
                     .otherwise("cold")).alias("k"),
                    (F.col("id") % 97).alias("t"),
                    F.col("id").alias("uid")))
    got = discrete_key_rank(base, ["k"], "t", ["uid"],
                            rank_name="i", total_name="n")
    w = Window.partitionBy("k").orderBy("t", "uid")
    want = (base.withColumn("i", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(
                Window.partitionBy("k"))))
    assert sorted(_rows(got.select("k", "uid", "i", "n"))) == \
        sorted(_rows(want.select("k", "uid", "i", "n")))


def test_rank_operators_empty_input(spark):
    """Empty-input short-circuit (ADVICE r11): both offset operators
    must return an empty frame with the rank column attached — the
    window form's behavior — instead of crashing in createDataFrame
    schema inference."""
    from predictor_spark.operators.ranking import (discrete_key_rank,
                                                   two_phase_row_number)

    base = (spark.range(10)
            .select(F.lit("k").alias("k"), F.col("id").alias("t"),
                    F.col("id").alias("uid"))
            .filter(F.col("t") < 0))
    got = discrete_key_rank(base, ["k"], "t", ["uid"],
                            rank_name="i", total_name="n")
    assert got.count() == 0
    assert set(got.columns) == {"k", "t", "uid", "i", "n"}
    got2 = two_phase_row_number(base, ["k"], "t", ["t", "uid"],
                                rank_name="i", n_buckets=4)
    assert got2.count() == 0
    assert "i" in got2.columns


def test_rank_operators_null_keys_raise(spark):
    """NULL group keys fail EARLY with a clear error (ADVICE r11)
    instead of a driver-side sorted() TypeError or silent row loss in
    the offset equi-join."""
    from predictor_spark.operators.ranking import (discrete_key_rank,
                                                   two_phase_row_number)

    base = (spark.range(20)
            .select(F.lit("k").alias("k"),
                    F.when(F.col("id") % 7 == 0, None)
                    .otherwise(F.col("id") % 5).alias("t"),
                    F.col("id").alias("uid")))
    with pytest.raises(ValueError, match="NULL in 't'"):
        discrete_key_rank(base, ["k"], "t", ["uid"], rank_name="i")
    null_part = base.withColumn(
        "k", F.when(F.col("uid") % 3 == 0, None).otherwise(F.col("k")))
    with pytest.raises(ValueError, match="NULL in 'k'"):
        two_phase_row_number(null_part, ["k"], "uid", ["uid", "t"],
                             rank_name="i", n_buckets=4)


def test_weibull_mrr_fit_v2_v3_equal_registered(spark):
    from predictor_spark.plans.catalog_r14_reliability import \
        weibull_mrr_fit
    from predictor_spark.plans.proto_r12 import (weibull_mrr_fit_v2,
                                                 weibull_mrr_fit_v3)

    live = _rows(weibull_mrr_fit(spark, SF_DIR))
    assert _rows(weibull_mrr_fit_v3(spark, SF_DIR)) == live
    assert _rows(weibull_mrr_fit_v2(spark, SF_DIR)) == live


def test_hybrid_rrf_fusion_v2_equals_registered(spark):
    from predictor_spark.plans.catalog_mlprep import hybrid_rrf_fusion
    from predictor_spark.plans.proto_r12 import hybrid_rrf_fusion_v2

    live = _rows(hybrid_rrf_fusion(spark, SF_DIR))
    v2 = _rows(hybrid_rrf_fusion_v2(spark, SF_DIR))
    assert v2 == live


def test_hurst_rs_per_series_v2_equals_registered(spark):
    from predictor_spark.plans.catalog_r11_longmemory import \
        hurst_rs_per_series
    from predictor_spark.plans.proto_r12 import hurst_rs_per_series_v2

    live = _rows(hurst_rs_per_series(spark, SF_DIR))
    v2 = _rows(hurst_rs_per_series_v2(spark, SF_DIR))
    assert v2 == live


@pytest.mark.skipif("RUN_SCALE" not in __import__("os").environ,
                    reason="sf0.1 timing probe; opt-in via RUN_SCALE=1")
def test_prototype_sf01_equality_and_timing(spark):
    """Larger-SF equality (the driver grades at sf0.01; this guards the
    1-ulp rounding argument at 10x the data) plus a printed timing
    comparison for the r12 record."""
    import time

    from predictor_spark.plans.catalog_r11_longmemory import \
        hurst_rs_per_series
    from predictor_spark.plans.catalog_r14_reliability import \
        weibull_mrr_fit
    from predictor_spark.plans.proto_r12 import (hurst_rs_per_series_v2,
                                                 weibull_mrr_fit_v3)

    sf = "/root/testdata/sf0.1"
    for name, old, new in (
            ("weibull", weibull_mrr_fit, weibull_mrr_fit_v3),
            ("hurst", hurst_rs_per_series, hurst_rs_per_series_v2)):
        t0 = time.perf_counter()
        a = _rows(old(spark, sf))
        t1 = time.perf_counter()
        b = _rows(new(spark, sf))
        t2 = time.perf_counter()
        assert a == b, f"{name} prototype diverged at sf0.1"
        print(f"{name}: live {t1 - t0:.2f}s vs new {t2 - t1:.2f}s")
