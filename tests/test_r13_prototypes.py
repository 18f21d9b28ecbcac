"""Round-13 perf-prototype equality pins (see plans/proto_r13.py).

mutual_info_value_type_v2 must reproduce the registered row EXACTLY —
it re-derives ntile(10)'s bucket arithmetic in closed form, so the
joint (event_type, decile) counts are equal by construction; these
tests are the executable proof. Also pins the integer ntile closed
form itself against Spark's ntile on adversarial group sizes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("n", [7, 10, 23, 100, 101, 109, 1000])
def test_dec_of_matches_ntile(spark, n):
    from predictor_spark.plans.proto_r13 import _dec_of

    base = spark.range(1, n + 1).select(F.col("id").alias("p"))
    want = (spark.range(n)
            .select(F.ntile(10).over(Window.orderBy("id")).alias("d"))
            .withColumn("p", F.row_number().over(Window.orderBy("d"))))
    got = base.select(
        "p", _dec_of(F.col("p"), F.lit(n // 10).cast("long"),
                     F.lit(n % 10).cast("long")).alias("d"))
    assert sorted(_rows(got.select("p", "d"))) == \
        sorted(_rows(want.select("p", F.col("d").cast("long"))))


def test_mutual_info_v2_equals_registered(spark):
    from predictor_spark.plans.catalog_drift import mutual_info_value_type
    from predictor_spark.plans.proto_r13 import mutual_info_value_type_v2

    live = _rows(mutual_info_value_type(spark, SF_DIR))
    v2 = _rows(mutual_info_value_type_v2(spark, SF_DIR))
    assert v2 == live


@pytest.mark.skipif("RUN_SCALE" not in __import__("os").environ,
                    reason="sf0.1 probe; opt-in via RUN_SCALE=1")
def test_mutual_info_v2_sf01_equality(spark):
    from predictor_spark.plans.catalog_drift import mutual_info_value_type
    from predictor_spark.plans.proto_r13 import mutual_info_value_type_v2

    sf = "/root/testdata/sf0.1"
    assert _rows(mutual_info_value_type_v2(spark, sf)) == \
        _rows(mutual_info_value_type(spark, sf))
