"""Invariant tests for the round-5 rows — properties the DuckDB oracle
equality cannot express (the oracle proves Spark == SQL replay; these
prove both match the MATH the row claims to compute)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def r5(spark):
    import __spark_entry__ as entry

    return spark, entry.queries()


def test_ema_np_matches_naive_truncated_fold():
    """_ema_np (convolution form) == the literal truncated weighted mean,
    element by element — the differential check that the C path computes
    the same closed form the oracle folds."""
    from predictor_spark.plans.catalog_indicators import _ema_np

    rng = np.random.default_rng(7)
    x = rng.normal(100.0, 25.0, size=400)
    n = 9
    a = 1.0 - 2.0 / (n + 1.0)
    w = a ** np.arange(12 * n)
    got = _ema_np(x, n)
    for t in (0, 1, 5, 107, 108, 200, 399):
        k = min(t + 1, len(w))
        exp = float(np.dot(x[t::-1][:k], w[:k]) / w[:k].sum())
        assert got[t] == pytest.approx(exp, rel=1e-12), t

    # constant series: EMA is the constant at every truncation length
    const = _ema_np(np.full(50, 42.5), 26)
    assert np.allclose(const, 42.5, rtol=0, atol=1e-9)


def test_rsi_bounds_and_monotone_extremes(r5):
    spark, qs = r5
    rows = qs["rsi_indicator"](spark, SF_DIR).collect()
    assert rows and all(0.0 <= r["rsi"] <= 100.0 for r in rows)
    # pure-gain / pure-loss series hit the poles
    from predictor_spark.plans.catalog_indicators import _ema_np

    up = np.arange(30, dtype="float64")
    d = np.diff(up, prepend=up[:1])
    ag = _ema_np(np.clip(d, 0, None), 27)
    al = _ema_np(np.clip(-d, 0, None), 27)
    rsi = 100.0 * ag[-1] / (ag[-1] + al[-1])
    assert rsi == pytest.approx(100.0)


def test_macd_zero_on_constant_series():
    from predictor_spark.plans.catalog_indicators import _ema_np

    x = np.full(200, 7.25)
    m = _ema_np(x, 12) - _ema_np(x, 26)
    assert np.allclose(m, 0.0, atol=1e-9)
    assert np.allclose(_ema_np(m, 9), 0.0, atol=1e-9)


def test_hll_error_within_sketch_bounds(r5):
    """p=8 HLL has theoretical RSE 1.04/sqrt(256) ~ 6.5%; the data is
    fixed so the observed error is a constant — pin it under 3 RSE."""
    spark, qs = r5
    for r in qs["hll_distinct_users"](spark, SF_DIR).collect():
        assert r["exact_nd"] > 0
        rel = abs(r["hll_estimate"] - r["exact_nd"]) / r["exact_nd"]
        assert rel < 0.20, (r["event_type"], rel)


def test_pagerank_distribution_properties(r5):
    spark, qs = r5
    rows = qs["pagerank_nation_trade"](spark, SF_DIR).collect()
    assert len(rows) == 25
    total = sum(r["pagerank"] for r in rows)
    # dangling-free graph conserves mass up to per-iteration rounding
    assert 0.95 <= total <= 1.0001, total
    assert all(r["pagerank"] >= (1 - 0.85) / 25.0 - 1e-9 for r in rows)


def test_ks_statistic_bounds_and_null_case(r5, spark):
    _, qs = r5
    row = qs["ks_test_value_drift"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert row["n_early"] > 0 and row["n_late"] > 0
    # identical samples -> KS exactly 0 (implementation-level null case)
    import duckdb

    con = duckdb.connect()
    ks = con.execute("""
        WITH a AS (SELECT range AS v FROM range(100)),
        pts AS (SELECT v, count(*) AS ca, count(*) AS cb FROM a GROUP BY v),
        cdf AS (SELECT sum(ca) OVER (ORDER BY v) / 100.0 AS fa,
                       sum(cb) OVER (ORDER BY v) / 100.0 AS fb FROM pts)
        SELECT max(abs(fa - fb)) FROM cdf""").fetchone()[0]
    con.close()
    assert ks == 0.0


def test_psi_bins_partition_everything(r5, spark):
    _, qs = r5
    rows = qs["psi_value_stability"](spark, SF_DIR).collect()
    from predictor_spark.sources.tables import load_table

    n_events = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n_expected"] + r["n_actual"] for r in rows) == n_events
    assert all(1 <= r["bin"] <= 10 for r in rows)


def test_mutual_info_nonnegative(r5):
    spark, qs = r5
    mi = qs["mutual_info_value_type"](spark, SF_DIR).collect()[0][
        "mutual_info_nats"]
    assert mi >= -1e-6  # >= 0 up to the 6 dp rounding


def test_rrf_scores_self_consistent(r5):
    spark, qs = r5
    for r in qs["hybrid_rrf_fusion"](spark, SF_DIR).collect():
        expect = 0.0
        if r["bm25_rank"] > 0:
            expect += 1.0 / (60 + r["bm25_rank"])
        if r["cos_rank"] > 0:
            expect += 1.0 / (60 + r["cos_rank"])
        assert r["rrf"] == pytest.approx(expect, abs=5e-7)
        assert r["bm25_rank"] > 0 or r["cos_rank"] > 0


def test_q13_histogram_partitions_customers(r5, spark):
    _, qs = r5
    from predictor_spark.sources.tables import load_table

    n_cust = load_table(spark, SF_DIR, "customer").count()
    rows = qs["q13_customer_distribution"](spark, SF_DIR).collect()
    assert sum(r["n_customers"] for r in rows) == n_cust


def test_cube_margins_consistent(r5, spark):
    _, qs = r5
    rows = {(r["status"], r["priority"]): r
            for r in qs["cube_orders_profile"](spark, SF_DIR).collect()}
    from predictor_spark.sources.tables import load_table

    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert rows[("ALL", "ALL")]["n_orders"] == n_orders
    # row margins sum to the grand total
    per_status = sum(r["n_orders"] for (s, p), r in rows.items()
                     if p == "ALL" and s != "ALL")
    assert per_status == n_orders


def test_doc_chunks_tile_documents(r5, spark):
    _, qs = r5
    from pyspark.sql import functions as F

    from predictor_spark.sources.tables import load_table

    chunks = qs["doc_chunk_overlap"](spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    agg = (chunks.groupBy("doc_id")
           .agg(F.max("chunk_idx").alias("mx"),
                F.min("chunk_len").alias("mn"),
                F.count(F.lit(1)).alias("k")).collect())
    assert len(agg) == n_docs
    for r in agg:
        assert r["k"] == r["mx"] + 1          # contiguous chunk indices
        assert 0 <= r["mn"] <= 50             # lengths within the window
    assert chunks.filter((F.col("chunk_len") > 50)
                         | (F.col("chunk_len") < 0)).count() == 0


def test_bpe_apply_token_counts_bracketed(r5, spark):
    """After 3 merges, per-doc token count is between n_words (every
    word one symbol) and the raw character count (no merges)."""
    _, qs = r5
    from pyspark.sql import functions as F

    out = qs["bpe_encode_apply"](spark, SF_DIR)
    bad = out.filter((F.col("n_tokens") < F.col("n_words"))
                     | (F.col("n_tokens") <= 0)).count()
    assert bad == 0
    # merges strictly reduce tokens vs the character baseline somewhere
    from predictor_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    chars = docs.select(
        F.sum(F.length(F.regexp_replace(F.trim("text"), r"\s+", "")))
    ).collect()[0][0]
    total_tokens = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_tokens < chars

def test_outlier_screens_bounded(r5):
    spark, qs = r5
    for r in qs["outlier_iqr_flags"](spark, SF_DIR).collect():
        assert 0 <= r["n_outliers"] <= r["n_values"]
        assert r["q1"] <= r["q3"]
    for r in qs["robust_zscore_mad"](spark, SF_DIR).collect():
        assert r["n_flagged"] >= 0 and r["mad"] >= 0


def test_benford_frequencies_partition(r5):
    spark, qs = r5
    rows = qs["benford_first_digit"](spark, SF_DIR).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert sum(r["obs_freq"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["benford_freq"] for r in rows) <= 1.0 + 1e-4


def test_cms_never_underestimates(r5):
    spark, qs = r5
    for r in qs["cms_word_frequency"](spark, SF_DIR).collect():
        assert r["cms_estimate"] >= r["exact_cnt"]


def test_bloom_no_false_negatives(r5):
    spark, qs = r5
    rows = {r["probe"]: r for r in
            qs["bloom_word_membership"](spark, SF_DIR).collect()}
    for p, r in rows.items():
        if r["actually_present"]:
            assert r["claimed_present"], p


def test_pca_unit_norm_and_dominance(r5):
    import math

    spark, qs = r5
    v = [r["loading"] for r in
         qs["pca_power_iteration"](spark, SF_DIR).collect()]
    assert len(v) == 64
    assert math.sqrt(sum(x * x for x in v)) == pytest.approx(1.0, abs=1e-4)
    assert sum(v) >= 0  # sign canonicalization


def test_js_divergence_bounded_by_ln2(r5):
    import math

    spark, qs = r5
    rows = qs["js_divergence_value_drift"](spark, SF_DIR).collect()
    total = sum(r["js_term"] for r in rows)
    assert -1e-9 <= total <= math.log(2) + 1e-6
    assert all(r["js_term"] >= -1e-9 for r in rows)


def test_winsorize_mean_moves_inside_fences(r5):
    spark, qs = r5
    for r in qs["winsorize_moments"](spark, SF_DIR).collect():
        assert r["lo"] <= r["hi"]
        assert r["lo"] <= r["mean_after"] <= r["hi"]
        assert r["n_clipped_low"] + r["n_clipped_high"] <= r["n_values"]


def test_fuzzy_match_blocked_and_canonical(r5):
    spark, qs = r5
    rows = qs["fuzzy_match_part_names"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["name_a"] < r["name_b"]  # canonical pair order, no dupes
        assert r["name_a"].split(" ")[1] == r["block"]
        assert r["name_b"].split(" ")[1] == r["block"]
        assert 1 <= r["edit_dist"] <= 2


def test_triangle_census_combinatorial_bounds(r5):
    spark, qs = r5
    [r] = qs["triangle_count_trade_graph"](spark, SF_DIR).collect()
    n, e, t = r["n_nodes"], r["n_edges"], r["n_triangles"]
    assert e <= n * (n - 1) // 2
    assert t <= n * (n - 1) * (n - 2) // 6


def test_hourly_gaps_partition_the_grid(r5):
    spark, qs = r5
    for r in qs["hourly_gap_detection"](spark, SF_DIR).collect():
        assert r["n_observed"] + r["n_missing"] == r["n_expected"] == 720
        assert r["max_gap_hours"] <= r["n_missing"]


def test_bollinger_band_ordering(r5):
    spark, qs = r5
    rows = qs["bollinger_bands_daily"](spark, SF_DIR).collect()
    assert len(rows) == 120  # 5 types x 24 full-window days
    for r in rows:
        assert r["lower"] <= r["mid"] <= r["upper"]
        assert 7 <= r["day"] <= 30


def test_bfs_levels_well_formed(r5):
    spark, qs = r5
    rows = qs["bfs_hops_trade_graph"](spark, SF_DIR).collect()
    assert len(rows) == 25
    hops = [r["hops"] for r in rows]
    assert hops.count(0) == 1  # exactly one source
    assert all(h == -1 or 0 <= h <= 6 for h in hops)
    # BFS levels have no holes: if some node is at hop h >= 2, a node
    # at hop h-1 must exist
    present = {h for h in hops if h > 0}
    for h in present:
        if h >= 2:
            assert (h - 1) in present or (h - 1) == 0


def test_promo_overlap_bounds(r5):
    spark, qs = r5
    rows = qs["promo_session_overlap"](spark, SF_DIR).collect()
    assert len(rows) == 30
    two_hours_us = 2 * 3600 * 1_000_000
    for r in rows:
        assert r["n_users"] <= r["n_sessions"]
        assert 0 <= r["overlap_us"] <= r["n_sessions"] * two_hours_us


def test_inverted_index_postings_sorted_and_capped(r5):
    spark, qs = r5
    rows = qs["inverted_index_postings"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # postings_head is a comma-joined STRING (nested output types are
        # forbidden by the gate — r6); parse back to numeric postings
        p = [int(x) for x in r["postings_head"].split(",")]
        assert p == sorted(p) and len(set(p)) == len(p)
        assert len(p) == min(r["df"], 10)


def test_negative_samples_are_true_negatives(r5, spark):
    _, qs = r5
    from pyspark.sql import functions as F

    from predictor_spark.sources.tables import load_table

    neg = qs["negative_sampling_brands"](spark, SF_DIR)
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    p = load_table(spark, SF_DIR, "part")
    pos = (o.join(li, o.o_orderkey == li.l_orderkey)
           .join(p, li.l_partkey == p.p_partkey)
           .select("o_custkey", F.col("p_brand").alias("neg_brand"))
           .distinct())
    assert neg.join(pos, ["o_custkey", "neg_brand"]).count() == 0
    per_cust = neg.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    assert per_cust <= 2


def test_quantile_normalization_equalizes_marginals(r5):
    spark, qs = r5
    rows = qs["quantile_normalize_daily"](spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (r["rank"], r["normalized"], r["orig"]))
    dists = {t: sorted(v) for t, v in by_type.items()}
    # after normalization every series has the SAME sorted value list
    vals = {t: [x[1] for x in v] for t, v in dists.items()}
    first = next(iter(vals.values()))
    assert all(v == first for v in vals.values())
    # and within a series the mapping is monotone in the original order
    for v in dists.values():
        origs = [x[2] for x in v]
        assert origs == sorted(origs)


def test_reconciled_forecasts_sum_to_total(r5):
    spark, qs = r5
    rows = qs["forecast_reconcile_topdown"](spark, SF_DIR).collect()
    assert len(rows) == 5
    total = rows[0]["total_forecast"]
    assert sum(r["reconciled_forecast"] for r in rows) == pytest.approx(
        total, abs=5e-4 * 5)  # coherence up to per-row display rounding


def test_cuped_reduces_or_preserves_spread(r5):
    spark, qs = r5
    rows = {r["arm"]: r for r in qs["ab_test_cuped"](spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    t0, t1 = rows[0]["theta"], rows[1]["theta"]
    assert t0 == t1  # theta is pooled, identical on both rows
    for r in rows.values():
        assert r["n_users"] > 0 and r["mean_y"] >= 0 and r["mean_x"] >= 0


def test_tfidf_ranks_and_df_consistency(r5):
    spark, qs = r5
    from pyspark.sql import functions as F

    out = qs["tfidf_top_terms"](spark, SF_DIR)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k"), F.min("rank").alias("mn"),
        F.max("rank").alias("mx")).collect()
    for r in per_doc:
        assert r["mn"] == 1 and r["mx"] == r["k"] <= 3
    assert out.filter(F.col("score") < 0).count() == 0


def test_incremental_rollup_coherent(r5):
    spark, qs = r5
    rows = qs["incremental_daily_rollup"](spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(r["matches_full"] for r in rows)


def test_entity_clusters_closed_and_canonical(r5, spark):
    _, qs = r5
    from predictor_spark.sources.tables import load_table

    n_names = (load_table(spark, SF_DIR, "part")
               .select("p_name").distinct().count())
    rows = qs["entity_resolution_clusters"](spark, SF_DIR).collect()
    assert len(rows) == n_names
    by_rep = {}
    for r in rows:
        assert r["cluster_rep"] <= r["p_name"]  # rep is the component min
        by_rep.setdefault(r["cluster_rep"], []).append(r)
    for rep, members in by_rep.items():
        assert all(m["cluster_size"] == len(members) for m in members)
        assert any(m["p_name"] == rep for m in members)  # rep is a member
    # the pairwise matches are a subset of the clusters (closure property)
    pairs = qs["fuzzy_match_part_names"](spark, SF_DIR).collect()
    rep_of = {r["p_name"]: r["cluster_rep"] for r in rows}
    for p in pairs:
        assert rep_of[p["name_a"]] == rep_of[p["name_b"]]


def test_robust_trend_statistics_consistent(r5):
    spark, qs = r5
    sen = {r["event_type"]: r for r in
           qs["theil_sen_trend"](spark, SF_DIR).collect()}
    mk = {r["event_type"]: r for r in
          qs["mann_kendall_trend"](spark, SF_DIR).collect()}
    assert set(sen) == set(mk) and len(sen) == 5
    for t in sen:
        n = sen[t]["n_days"]
        assert n == mk[t]["n_days"] <= 31
        max_pairs = n * (n - 1) // 2
        assert abs(mk[t]["s_stat"]) <= max_pairs
        assert mk[t]["var_s"] > 0
        # the two estimators agree on trend direction when MK is
        # decisive (|z| > 1.96)
        if abs(mk[t]["z"]) > 1.96:
            assert (mk[t]["s_stat"] > 0) == (sen[t]["sen_slope"] > 0)
