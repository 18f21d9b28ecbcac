"""Round-14 swap equality pins (see plans/proto_r14.py).

The registered `a8_mmd` (cached subsample frames, r14 swap) must
reproduce the archived pre-swap uncached plan EXACTLY — the cache
only collapses six runtime events scans into one; same rows, same
kernel, same rounding.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_a8_mmd_registered_equals_uncached_archive(spark):
    from predictor_spark.plans.catalog_analytics import a8_mmd
    from predictor_spark.plans.proto_r14 import a8_mmd_uncached

    live = _rows(a8_mmd(spark, SF_DIR))
    old = _rows(a8_mmd_uncached(spark, SF_DIR))
    assert live == old
