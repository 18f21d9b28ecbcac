"""Semantic tests for the round-4 continuation rows — independent of the
DuckDB oracles (which replay the same algorithm): each test checks the
STATISTICAL/semantic property the row claims, on constructed inputs with
known ground truth or by driver-side recomputation from raw data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _events_dir(spark, tmp_path, pdf: pd.DataFrame) -> str:
    """Write a synthetic events table shaped like the generator's."""
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf / "events.parquet"))
    return str(sf)


def _mk_events(values: np.ndarray, event_type: str = "a") -> pd.DataFrame:
    n = len(values)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=n, freq="h").astype("datetime64[us]"),
        "user_id": np.zeros(n, dtype=np.int64),
        "event_type": event_type,
        "value": values.astype(float),
        "props": "{}",
    })


def test_cusum_finds_injected_mean_shift(spark, tmp_path):
    from predictor_spark.plans.catalog_tsa import cusum_changepoint

    rng = np.random.default_rng(7)
    x = np.concatenate([rng.normal(0.0, 0.5, 120), rng.normal(8.0, 0.5, 80)])
    sf = _events_dir(spark, tmp_path, _mk_events(x))
    row = cusum_changepoint(spark, sf).collect()[0]
    # for a step change the |cumsum - i*mean| peak sits AT the shift
    assert row.n == 200
    assert abs(row.cp_index - 120) <= 1
    assert row.cp_stat > 100  # 120 * (8*80/200) / ... far from noise scale


def test_anomaly_zscore_flags_injected_spike_causally(spark, tmp_path):
    from predictor_spark.plans.catalog_tsa import anomaly_rolling_zscore

    rng = np.random.default_rng(11)
    x = rng.normal(10.0, 1.0, 300)
    x[150] = 60.0  # unambiguous spike
    sf = _events_dir(spark, tmp_path, _mk_events(x))
    flagged = {r.event_id for r in anomaly_rolling_zscore(spark, sf).collect()}
    assert 150 in flagged
    # the spike sits in the TRAILING windows of ids 151..174 and inflates
    # their std — causality means none of the EARLIER ids can be affected
    assert all(i >= 150 or abs(x[i] - 10.0) > 3.0 for i in flagged)


def test_acf_of_ar1_matches_phi_powers(spark, tmp_path):
    from predictor_spark.plans.catalog_tsa import acf_per_series

    rng = np.random.default_rng(3)
    phi, n = 0.8, 4000
    x = np.empty(n)
    x[0] = 0.0
    for i in range(1, n):
        x[i] = phi * x[i - 1] + rng.normal()
    sf = _events_dir(spark, tmp_path, _mk_events(x))
    acf = {r.lag: r.acf for r in acf_per_series(spark, sf).collect()}
    for k in range(1, 6):
        assert acf[k] == pytest.approx(phi ** k, abs=0.08), k
    assert all(-1.0 <= v <= 1.0 for v in acf.values())


def test_transition_matrix_is_row_stochastic(spark):
    from predictor_spark.plans.catalog_tsa import event_transition_matrix

    rows = event_transition_matrix(spark, SF_DIR).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        by_src[r.src] = by_src.get(r.src, 0.0) + r.prob
        assert r.n > 0 and 0.0 < r.prob <= 1.0
    for src, tot in by_src.items():
        assert tot == pytest.approx(1.0, abs=2e-5), src


def test_substring_spans_are_real_cross_doc_duplicates(spark):
    from predictor_spark.plans.catalog_text import (
        _SPAN_K, _SPAN_MIN, dedup_substring_spans)

    spans = dedup_substring_spans(spark, SF_DIR).collect()
    assert spans
    texts = {r.doc_id: r.text for r in
             spark.read.parquet(f"{SF_DIR}/documents.parquet")
             .select("doc_id", "text").collect()}
    for r in spans:
        assert r.span_len >= _SPAN_MIN
        frag = texts[r.doc_id][r.span_start - 1: r.span_start - 1 + r.span_len]
        assert len(frag) == r.span_len  # span inside the document
        # every K-gram of the span occurs in >=2 distinct docs
        for off in (0, r.span_len - _SPAN_K):
            gram = frag[off: off + _SPAN_K]
            owners = sum(1 for t in texts.values() if gram in t)
            assert owners >= 2, (r.doc_id, off)


def test_vocab_topk_matches_python_recount(spark):
    from collections import Counter

    from predictor_spark.plans.catalog_text import vocab_topk

    got = [(r.token, r.n) for r in vocab_topk(spark, SF_DIR).collect()]
    texts = [r.text for r in
             spark.read.parquet(f"{SF_DIR}/documents.parquet")
             .select("text").collect()]
    cnt = Counter(t for txt in texts for t in txt.split())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


def test_relational_rows_nonempty_and_typed(spark):
    """The planner-breadth rows return stable, non-degenerate frames
    at the small SF (the oracle gate checks values; this pins schema and
    non-emptiness under the vanilla test session)."""
    from predictor_spark.plans import catalog_relational as cr

    for fn, cols in [
        (cr.q6_revenue_delta, {"revenue", "n_items"}),
        (cr.q7_nation_volume,
         {"cust_nation", "supp_nation", "order_year", "volume"}),
        (cr.window_rank_functions,
         {"p_partkey", "p_brand", "rnk", "drnk", "prnk", "cdist", "quartile"}),
        (cr.q14_promo_share, {"promo_share", "n_items"}),
        (cr.q18_big_orders, {"c_custkey", "o_orderkey", "total_price", "sum_qty"}),
        (cr.q19_disjunctive_join, {"revenue", "n_items"}),
        (cr.exists_not_exists_orders, {"o_orderpriority", "n_orders"}),
    ]:
        df = fn(spark, SF_DIR)
        assert set(df.columns) == cols
        assert df.count() >= 1, fn.__name__


def test_holt_winters_tracks_trend_plus_seasonality(spark, tmp_path):
    from predictor_spark.plans.catalog_tsa import holt_winters_per_series

    t = np.arange(400)
    x = 50.0 + 0.05 * t + 5.0 * np.sin(2 * np.pi * t / 24)
    sf = _events_dir(spark, tmp_path, _mk_events(x))
    row = holt_winters_per_series(spark, sf).collect()[0]
    assert row.n == 400
    # smoothing locks on: in-sample one-step MAE far below the seasonal
    # amplitude, trend estimate near the true slope, and the h-step
    # forecasts near the true continuation
    assert row.mae < 1.0
    assert row.trend == pytest.approx(0.05, abs=0.03)
    for h in (1, 2, 3):
        tt = 400 + h - 1
        truth = 50.0 + 0.05 * tt + 5.0 * np.sin(2 * np.pi * tt / 24)
        assert getattr(row, f"fc{h}") == pytest.approx(truth, abs=1.5), h


def test_km_survival_matches_hand_computation(spark, tmp_path):
    from predictor_spark.plans.catalog_behavior import survival_km_conversion

    # 6 users: conversions after 1h,1h,5h,80h(censored at 72),none,none
    rows = []
    base = pd.Timestamp("2024-01-01")
    eid = 0
    for uid, conv_h in enumerate([1, 1, 5, 80, None, None]):
        rows.append({"event_id": eid, "ts": base, "user_id": uid,
                     "event_type": "signup", "value": 1.0, "props": "{}"})
        eid += 1
        if conv_h is not None:
            rows.append({"event_id": eid, "ts": base + pd.Timedelta(hours=conv_h),
                         "user_id": uid, "event_type": "purchase",
                         "value": 1.0, "props": "{}"})
            eid += 1
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf / "events.parquet"))

    got = {r.dur_h: (r.n_died, r.n_risk, r.survival)
           for r in survival_km_conversion(spark, str(sf)).collect()}
    # death times: t=1 (d=2, n=6 -> S=4/6), t=5 (d=1, n=4 -> S=4/6*3/4=0.5);
    # the 80h conversion and the two non-converters censor at t=72
    assert got == {1: (2, 6, round(4 / 6, 6)), 5: (1, 4, 0.5)}


@pytest.mark.parametrize("corpus", [
    ["low low low low low", "lower lower newest",
     "newest newest newest newest newest", "widest widest widest"],
    # same-char runs: the case where a space-separated merge encoding
    # provably diverges from greedy BPE (review finding) — 'aaaa' must
    # merge to [aa, aa], 'aaaaa' to [aa, aa, a]
    ["loooool loooool loooool loooool", "aaaa aaaa aaaa aaaa aaaa",
     "aaaaa aaaaa", "abab abab abab"],
], ids=["sennrich", "char-runs"])
def test_bpe_merges_match_reference_implementation(spark, tmp_path, corpus):
    """bpe_train_merges vs an independent pure-Python BPE trainer
    (word-histogram weighting, every adjacent position counted, ties by
    (count desc, left, right), greedy left-to-right merge)."""
    from predictor_spark.plans.catalog_text import bpe_train_merges
    pdf = pd.DataFrame({
        "doc_id": range(len(corpus)), "text": corpus,
        "lang": "en", "source": "t",
        "n_chars": [len(t) for t in corpus],
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf / "documents.parquet"))

    def py_bpe(texts, iters=3):
        from collections import Counter
        hist = Counter(w for t in texts for w in t.split())
        reps = {w: list(w) for w in hist}
        merges = []
        for _ in range(iters):
            pc = Counter()
            for w, syms in reps.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += hist[w]
            (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((l, r, c))
            for w, syms in reps.items():
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                reps[w] = out
        return merges

    want = py_bpe(corpus)
    got = sorted(bpe_train_merges(spark, str(sf)).collect(),
                 key=lambda r: r.merge_rank)
    assert [(r.left_sym, r.right_sym, r.pair_count) for r in got] == want


def test_scd2_ranges_are_consistent_and_disjoint(spark):
    from collections import defaultdict
    from datetime import date, timedelta

    from predictor_spark.plans.catalog_behavior import scd2_user_segment_history

    rows = scd2_user_segment_history(spark, SF_DIR).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        f = date.fromisoformat(r.valid_from)
        t = date.fromisoformat(r.valid_to)
        # a range spans exactly n_weeks ISO weeks
        assert (t - f).days == (r.n_weeks - 1) * 7, r
        by_user[r.user_id].append((f, t, r.segment))
    for uid, ranges in by_user.items():
        ranges.sort()
        for (f1, t1, s1), (f2, t2, s2) in zip(ranges, ranges[1:]):
            assert t1 < f2, (uid, t1, f2)  # disjoint, strictly ordered
            if s1 == s2:  # same segment must be separated by a real gap
                assert (f2 - t1).days > 7, (uid, s1)


def test_conformal_coverage_near_nominal_on_gaussian_walk(spark, tmp_path):
    from predictor_spark.plans.catalog_tsa import conformal_interval_coverage

    rng = np.random.default_rng(21)
    x = np.cumsum(rng.normal(0.0, 1.0, 800)) + 100.0  # N(0,1) residuals
    sf = _events_dir(spark, tmp_path, _mk_events(x))
    row = conformal_interval_coverage(spark, sf).collect()[0]
    assert row.n_train > 300 and row.n_eval > 200
    # calibrated on N(0,1) increments: q05/q95 near ±1.645, coverage near 90%
    assert row.q_lo == pytest.approx(-1.645, abs=0.35)
    assert row.q_hi == pytest.approx(1.645, abs=0.35)
    assert row.coverage == pytest.approx(0.90, abs=0.08)


def test_approx_count_distinct_within_bound(spark):
    """The scale path for distinct counts (approx_count_distinct / HLL)
    stays within its advertised error on the real data — the operator a
    100 TB deployment swaps in where the exact two-stage form
    (skewed_distinct_users) is overkill."""
    from pyspark.sql import functions as F

    from predictor_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(3, 0.05 * r.exact), r
