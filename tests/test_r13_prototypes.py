"""Round-13 equality pins (see plans/proto_r13.py).

The three r13-swapped rows — mutual_info_value_type (histogram-
refinement ntile), funnel_latency_quantiles (support-span order
statistics), heaps_vocab_growth (bucket-refinement thresholds) — are
pinned against their PRE-SWAP window-form plans, kept verbatim in
proto_r13 as `*_window`, so each pin compares two genuinely different
physical plans (the r12 hybrid_rrf evidence standard).  Also pins the
integer ntile closed form itself against Spark's ntile on adversarial
group sizes.  The formerly-held trio (lift/causal deciles, kingman)
swapped to their prototype forms in r14 — their live rows are pinned
against the archived pre-swap window forms the same way.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("n", [7, 10, 23, 100, 101, 109, 1000])
def test_tile_of_matches_ntile(spark, n):
    from predictor_spark.operators.ranking import _tile_of, _tile_of_py

    base = spark.range(1, n + 1).select(F.col("id").alias("p"))
    want = (spark.range(n)
            .select(F.ntile(10).over(Window.orderBy("id")).alias("d"))
            .withColumn("p", F.row_number().over(Window.orderBy("d"))))
    got = base.select(
        "p", _tile_of(F.col("p"), F.lit(n // 10).cast("long"),
                      F.lit(n % 10).cast("long")).alias("d"))
    expected = sorted(_rows(want.select("p", F.col("d").cast("long"))))
    assert sorted(_rows(got.select("p", "d"))) == expected
    # the driver-side mirror computes the identical mapping
    py = sorted((p, _tile_of_py(p, n // 10, n % 10))
                for p in range(1, n + 1))
    assert py == expected


def test_ntile_spans_matches_window_spans():
    """Driver-side span/tile assignment vs a brute-force recomputation
    over a tied, skewed histogram — including the guards."""
    import pytest as _pytest

    from predictor_spark.operators.ranking import _tile_of_py, ntile_spans

    counts = [(5, 7), (1, 3), (9, 1), (2, 40), (7, 12)]
    interior, strad, base, rem, total = ntile_spans(counts, 10)
    assert total == 63 and (base, rem) == (6, 3)
    # brute force: positions of each key under the sorted-key order
    lo = 1
    expect_int, expect_strad = [], []
    for k, c in sorted(counts):
        hi = lo + c - 1
        tiles = {_tile_of_py(p, base, rem) for p in range(lo, hi + 1)}
        if len(tiles) == 1:
            expect_int.append((k, tiles.pop()))
        else:
            expect_strad.append((k, lo))
        lo = hi + 1
    assert interior == expect_int and strad == expect_strad
    # every key lands in exactly one list, straddlers < n_tiles
    assert len(interior) + len(strad) == len(counts)
    assert len(strad) <= 9
    # guards
    assert ntile_spans([], 10) == ([], [], 0, 0, 0)
    with _pytest.raises(ValueError, match="NULL key"):
        ntile_spans([(None, 3)], 10)
    with _pytest.raises(ValueError, match="max_keys"):
        ntile_spans([(i, 1) for i in range(11)], 10, max_keys=10)
    with _pytest.raises(ValueError, match="NaN key"):
        ntile_spans([(1.0, 3), (float("nan"), 2)], 10)


def test_ntile_spans_fuzz_against_bruteforce():
    """Hypothesis fuzz: arbitrary histograms (including n < n_tiles,
    single giant groups, all-singletons) against a per-position
    brute-force recomputation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from predictor_spark.operators.ranking import _tile_of_py, ntile_spans

    @settings(max_examples=200, deadline=None)
    @given(st.dictionaries(st.integers(-50, 50), st.integers(1, 40),
                           min_size=0, max_size=30),
           st.integers(2, 12))
    def run(hist, n_tiles):
        counts = list(hist.items())
        interior, strad, base, rem, total = ntile_spans(counts, n_tiles)
        assert total == sum(hist.values())
        assert len(strad) <= n_tiles - 1
        # reconstruct per-key tile sets brute-force
        got = dict(interior)
        lo = 1
        for k, c in sorted(counts):
            hi = lo + c - 1
            tiles = {_tile_of_py(p, base, rem) for p in range(lo, hi + 1)}
            if len(tiles) == 1:
                assert got[k] == tiles.pop()
            else:
                assert (k, lo) in strad
            lo = hi + 1

    run()


def test_mutual_info_live_equals_window_form(spark):
    from predictor_spark.plans.catalog_drift import mutual_info_value_type
    from predictor_spark.plans.proto_r13 import mutual_info_value_type_window

    live = _rows(mutual_info_value_type(spark, SF_DIR))
    window_form = _rows(mutual_info_value_type_window(spark, SF_DIR))
    assert live == window_form


def test_exact_ntile_matches_window(spark):
    """The generic operator against Spark's ntile on a skewed frame
    with heavy ties, ascending AND descending, window-spans AND
    collected-spans modes."""
    from predictor_spark.operators.ranking import exact_ntile

    base = (spark.range(3001)
            .select((F.col("id") % 37).alias("s"),
                    F.col("id").alias("uid"),
                    (F.col("id") % 3).alias("lbl")))
    for desc in (False, True):
        order = [F.col("s").desc() if desc else F.col("s").asc(), "uid"]
        want = sorted(_rows(base.select(
            "uid", F.ntile(10).over(Window.orderBy(*order)).cast("long")
            .alias("d"))))
        for collected in (False, True):
            got = sorted(_rows(
                exact_ntile(base, "s", ["uid"], 10, tile_name="d",
                            descending=desc, collect_spans=collected)
                .select("uid", "d")))
            assert got == want, f"descending={desc} collected={collected}"


def test_lift_gain_deciles_live_equals_window_form(spark):
    from predictor_spark.plans.catalog_eval import lift_gain_deciles
    from predictor_spark.plans.proto_r13 import lift_gain_deciles_window

    live = sorted(_rows(lift_gain_deciles(spark, SF_DIR)))
    window_form = sorted(_rows(lift_gain_deciles_window(spark, SF_DIR)))
    assert live == window_form


def test_causal_decile_agg_live_equals_window_form(spark):
    from predictor_spark.plans.catalog_r7_causal import _decile_agg
    from predictor_spark.plans.proto_r13 import causal_decile_agg_window

    live = sorted(_rows(_decile_agg(spark, SF_DIR)))
    window_form = sorted(_rows(causal_decile_agg_window(spark, SF_DIR)))
    assert live == window_form


@pytest.mark.skipif("RUN_SCALE" not in __import__("os").environ,
                    reason="sf0.1 probe; opt-in via RUN_SCALE=1")
def test_mutual_info_sf01_equality(spark):
    from predictor_spark.plans.catalog_drift import mutual_info_value_type
    from predictor_spark.plans.proto_r13 import mutual_info_value_type_window

    sf = "/root/testdata/sf0.1"
    assert _rows(mutual_info_value_type(spark, sf)) == \
        _rows(mutual_info_value_type_window(spark, sf))


def test_funnel_latency_live_equals_window_form(spark):
    from predictor_spark.plans.catalog_r10_funnel import \
        funnel_latency_quantiles
    from predictor_spark.plans.proto_r13 import \
        funnel_latency_quantiles_window

    live = _rows(funnel_latency_quantiles(spark, SF_DIR))
    window_form = _rows(funnel_latency_quantiles_window(spark, SF_DIR))
    assert live == window_form


def test_heaps_vocab_live_equals_window_form(spark):
    from predictor_spark.plans.catalog_textstats import heaps_vocab_growth
    from predictor_spark.plans.proto_r13 import heaps_vocab_growth_window

    live = sorted(_rows(heaps_vocab_growth(spark, SF_DIR)))
    window_form = sorted(_rows(heaps_vocab_growth_window(spark, SF_DIR)))
    assert live == window_form


def test_kingman_wait_estimate_live_equals_window_form(spark):
    from predictor_spark.plans.catalog_r9_opsresearch import \
        kingman_wait_estimate
    from predictor_spark.plans.proto_r13 import kingman_wait_estimate_window

    live = _rows(kingman_wait_estimate(spark, SF_DIR))
    window_form = _rows(kingman_wait_estimate_window(spark, SF_DIR))
    assert live == window_form
