"""Round-14 perf-prototype equality pins (see plans/proto_r14.py).

`a8_mmd_v2` must reproduce the registered row EXACTLY — it only adds
caches on the two subsample frames (same rows, same kernel, same
rounding), collapsing six runtime events scans into one.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_a8_mmd_v2_equals_registered(spark):
    from predictor_spark.plans.catalog_analytics import a8_mmd
    from predictor_spark.plans.proto_r14 import a8_mmd_v2

    live = _rows(a8_mmd(spark, SF_DIR))
    v2 = _rows(a8_mmd_v2(spark, SF_DIR))
    assert v2 == live
