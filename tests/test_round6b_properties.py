"""Invariant tests for the round-6 session-2 rows (concentration, OHLC
indicators, behavioral sequences, closed-form regression) — properties
the DuckDB oracle equality cannot express: the oracle proves Spark ==
SQL replay; these prove both match the MATH each row claims."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def r6b(spark):
    import __spark_entry__ as entry

    return spark, entry.queries()


def _events(spark):
    from predictor_spark.sources.tables import load_table

    pdf = load_table(spark, SF_DIR, "events").toPandas()
    pdf["c"] = np.round(pdf["value"] * 100).astype("int64")
    pdf["day"] = pdf["ts"].dt.day.astype("int64")
    return pdf


def _bars(spark) -> pd.DataFrame:
    """Daily OHLC bars recomputed in pandas (independent of the Spark
    row_number idiom: sort + tail)."""
    ev = _events(spark).sort_values(["event_type", "ts", "event_id"],
                                    kind="mergesort")
    g = ev.groupby(["event_type", "day"], sort=True)
    bars = g.agg(high=("c", "max"), low=("c", "min"),
                 volume=("c", "size")).reset_index()
    bars["close"] = g.tail(1).set_index(["event_type", "day"]) \
        .loc[list(zip(bars.event_type, bars.day)), "c"].to_numpy()
    return bars


# ---------------------------------------------------------------------------
# concentration family
# ---------------------------------------------------------------------------

def test_gini_matches_numpy_and_bounds(r6b):
    spark, qs = r6b
    from predictor_spark.plans.catalog_concentration import _cust_rev

    rev = _cust_rev(spark, SF_DIR).toPandas()
    rows = {r["c_mktsegment"]: r
            for r in qs["gini_revenue_concentration"](spark, SF_DIR)
            .collect()}
    for seg, grp in rev.groupby("c_mktsegment"):
        x = np.sort(grp["rev"].to_numpy())
        n = len(x)
        expected = (2 * np.sum(np.arange(1, n + 1) * x)
                    - (n + 1) * x.sum()) / (n * x.sum())
        assert rows[seg]["n_customers"] == n
        assert 0.0 <= rows[seg]["gini"] < 1.0
        assert rows[seg]["gini"] == pytest.approx(expected, abs=1e-6)


def test_lorenz_monotone_and_complete(r6b):
    spark, qs = r6b
    pdf = qs["lorenz_curve_deciles"](spark, SF_DIR).toPandas()
    for seg, grp in pdf.groupby("c_mktsegment"):
        grp = grp.sort_values("decile")
        assert list(grp["decile"]) == list(range(1, 11))
        shares = grp["cum_share"].to_numpy()
        assert (np.diff(shares) > 0).all()           # strictly increasing
        assert shares[-1] == pytest.approx(1.0, abs=1e-6)
        # ascending-rank deciles: each decile's PER-CUSTOMER revenue is
        # no smaller than the previous one's (totals aren't monotone —
        # decile sizes differ by one when n % 10 != 0)
        per_cust = (grp["decile_revenue"] / grp["n_customers"]).to_numpy()
        assert (np.diff(per_cust) > -1e-9).all()


def test_abc_classes_partition_and_respect_cutpoints(r6b):
    spark, qs = r6b
    pdf = qs["pareto_abc_classification"](spark, SF_DIR).toPandas()
    for brand, grp in pdf.groupby("p_brand"):
        tot = grp["class_revenue"].sum()
        by_cls = grp.set_index("abc_class")["class_revenue"]
        if "A" in by_cls.index:
            assert by_cls["A"] / tot <= 0.8 + 1e-9
        ab = by_cls.reindex(["A", "B"]).fillna(0.0).sum()
        assert ab / tot <= 0.95 + 1e-9
        assert set(grp["abc_class"]) <= {"A", "B", "C"}


def test_hhi_matches_numpy_shares(r6b):
    spark, qs = r6b
    import duckdb

    con = duckdb.connect()
    nat = con.execute(f"""
        SELECT r_name, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
        FROM '{SF_DIR}/orders.parquet' o
        JOIN '{SF_DIR}/customer.parquet' cu ON o_custkey = c_custkey
        JOIN '{SF_DIR}/nation.parquet' n ON c_nationkey = n_nationkey
        JOIN '{SF_DIR}/region.parquet' r ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """).df()
    rows = {r["r_name"]: r
            for r in qs["hhi_market_concentration"](spark, SF_DIR).collect()}
    for reg, grp in nat.groupby("r_name"):
        shares = grp["c"].to_numpy(dtype="float64")
        shares = shares / shares.sum()
        expected = 10000.0 * np.sum(shares * shares)
        n = len(shares)
        assert rows[reg]["n_nations"] == n
        assert 10000.0 / n - 1e-6 <= rows[reg]["hhi"] <= 10000.0 + 1e-6
        assert rows[reg]["hhi"] == pytest.approx(expected, abs=1e-3)


# ---------------------------------------------------------------------------
# OHLC indicator family
# ---------------------------------------------------------------------------

def test_vwap_between_unit_price_extremes(r6b):
    spark, qs = r6b
    import duckdb

    con = duckdb.connect()
    unit = con.execute(f"""
        SELECT p_brand, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               min(l_extendedprice / l_quantity) AS lo,
               max(l_extendedprice / l_quantity) AS hi
        FROM '{SF_DIR}/lineitem.parquet'
        JOIN '{SF_DIR}/part.parquet' ON l_partkey = p_partkey
        GROUP BY 1, 2
    """).df().set_index(["p_brand", "ship_year"])
    for r in qs["vwap_brand_year"](spark, SF_DIR).collect():
        lo, hi = unit.loc[(r["p_brand"], r["ship_year"])]
        assert lo - 0.01 <= r["vwap"] <= hi + 0.01   # weighted-mean bound


def test_atr_matches_numpy_recursion(r6b):
    spark, qs = r6b
    bars = _bars(spark)
    got = qs["atr_14_daily"](spark, SF_DIR).toPandas() \
        .set_index(["event_type", "day"])
    for et, grp in bars.groupby("event_type"):
        grp = grp.sort_values("day")
        h, low, c = (grp[k].to_numpy(dtype="float64")
                     for k in ("high", "low", "close"))
        prev = np.concatenate([[np.nan], c[:-1]])
        tr = np.maximum(h - low,
                        np.maximum(np.abs(h - prev), np.abs(low - prev)))
        days = grp["day"].to_numpy()
        for i in range(14, len(days)):               # rn > 14 (0-based i>=14)
            atr = np.mean(tr[i - 13:i + 1]) / 100
            assert got.loc[(et, days[i]), "atr"] == \
                pytest.approx(atr, abs=1e-3)


def test_obv_matches_numpy_cumsum(r6b):
    spark, qs = r6b
    bars = _bars(spark)
    got = qs["obv_daily"](spark, SF_DIR).toPandas() \
        .set_index(["event_type", "day"])
    for et, grp in bars.groupby("event_type"):
        grp = grp.sort_values("day")
        c = grp["close"].to_numpy()
        v = grp["volume"].to_numpy()
        sign = np.sign(np.diff(c))
        obv = np.concatenate([[0], np.cumsum(sign * v[1:])])
        for day, expected in zip(grp["day"], obv):
            assert got.loc[(et, day), "obv"] == expected


def test_stochastic_bounds_and_d_is_k_mean(r6b):
    spark, qs = r6b
    pdf = qs["stochastic_oscillator_14_3"](spark, SF_DIR).toPandas()
    assert ((pdf["pct_k"] >= 0) & (pdf["pct_k"] <= 100)).all()
    for et, grp in pdf.groupby("event_type"):
        grp = grp.sort_values("day").reset_index(drop=True)
        for i in range(2, len(grp)):
            expected = grp["pct_k"].iloc[i - 2:i + 1].mean()
            assert grp["pct_d"].iloc[i] == pytest.approx(expected, abs=1e-3)


# ---------------------------------------------------------------------------
# behavioral sequence family
# ---------------------------------------------------------------------------

def test_streaks_match_python_scan(r6b):
    spark, qs = r6b
    bars = _bars(spark)
    rows = {r["event_type"]: r
            for r in qs["streak_longest_updays"](spark, SF_DIR).collect()}
    for et, grp in bars.groupby("event_type"):
        c = grp.sort_values("day")["close"].to_numpy()
        best = cur = ups = 0
        for i in range(1, len(c)):
            if c[i] > c[i - 1]:
                cur += 1
                ups += 1
                best = max(best, cur)
            else:
                cur = 0
        r = rows[et]
        assert r["n_days"] == len(c)
        assert r["n_up_days"] == ups
        assert r["longest_up_streak"] == best


def test_peak_concurrency_matches_python_sweep(r6b):
    spark, qs = r6b
    ev = _events(spark)
    ev["s"] = (ev["ts"].astype("int64") // 10**9).astype("int64")
    ev["e"] = ev["s"] + 1 + ev["c"] % 3600
    rows = {r["event_type"]: r
            for r in qs["peak_concurrency"](spark, SF_DIR).collect()}
    for et, grp in ev.groupby("event_type"):
        pts = sorted([(t, +1, i) for t, i in zip(grp.s, grp.event_id)]
                     + [(t, -1, i) for t, i in zip(grp.e, grp.event_id)],
                     key=lambda p: (p[0], p[1], p[2]))
        open_now = peak = 0
        first_peak = None
        for t, d, _ in pts:
            open_now += d
            if open_now > peak:
                peak, first_peak = open_now, t
        r = rows[et]
        assert r["peak_concurrency"] == peak
        assert r["n_intervals"] == len(grp)
        assert r["first_peak_s"] == first_peak


def test_rfm_scores_partition_quintiles(r6b):
    spark, qs = r6b
    pdf = qs["rfm_segments"](spark, SF_DIR).toPandas()
    assert set(pdf["r_score"]) <= {1, 2, 3, 4, 5}
    assert set(pdf["f_score"]) <= {1, 2, 3, 4, 5}
    assert set(pdf["m_score"]) <= {1, 2, 3, 4, 5}
    for seg, grp in pdf.groupby("c_mktsegment"):
        n = grp["n_customers"].sum()
        # every score dimension partitions the SAME population into the
        # explicit (rn-1)*5 DIV n quintiles: sizes n_k = #{rn: bucket k}
        expected = {k: ((n * k + 4) // 5) - ((n * (k - 1) + 4) // 5)
                    for k in range(1, 6)}
        expected = {k: sum(1 for rn in range(1, n + 1)
                           if 1 + ((rn - 1) * 5) // n == k)
                    for k in range(1, 6)}
        for dim in ("r_score", "f_score", "m_score"):
            sizes = grp.groupby(dim)["n_customers"].sum().to_dict()
            assert sizes == {k: v for k, v in expected.items() if v}


def test_interpurchase_gap_count_identity(r6b):
    spark, qs = r6b
    import duckdb

    con = duckdb.connect()
    base = con.execute(f"""
        SELECT c_mktsegment, count(*) AS n_orders,
               count(DISTINCT o_custkey) AS n_cust
        FROM '{SF_DIR}/orders.parquet'
        JOIN '{SF_DIR}/customer.parquet' ON o_custkey = c_custkey
        GROUP BY 1
    """).df().set_index("c_mktsegment")
    for r in qs["interpurchase_intervals"](spark, SF_DIR).collect():
        b = base.loc[r["c_mktsegment"]]
        # each customer contributes (orders - 1) gaps
        assert r["n_gaps"] == b["n_orders"] - b["n_cust"]
        assert r["min_gap_days"] >= 0
        assert r["min_gap_days"] <= r["avg_gap_days"] <= r["max_gap_days"]
        assert 0.0 <= r["share_within_30d"] <= 1.0


# ---------------------------------------------------------------------------
# closed-form regression family
# ---------------------------------------------------------------------------

def test_ols_trend_matches_numpy_polyfit(r6b):
    spark, qs = r6b
    ev = _events(spark)
    rows = {r["event_type"]: r
            for r in qs["ols_trend_per_series"](spark, SF_DIR).collect()}
    for et, grp in ev.groupby("event_type"):
        grp = grp.sort_values(["ts", "event_id"], kind="mergesort")
        x = np.arange(1, len(grp) + 1, dtype="float64")
        y = grp["c"].to_numpy(dtype="float64") / 100
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        r = rows[et]
        assert r["n"] == len(x)
        assert r["slope"] == pytest.approx(slope, abs=1e-5)
        assert r["intercept"] == pytest.approx(intercept, abs=1e-3)
        assert r["r2"] == pytest.approx(r2, abs=1e-5)


def test_two_var_ols_matches_numpy_lstsq(r6b):
    spark, qs = r6b
    import duckdb

    con = duckdb.connect()
    li = con.execute(f"""
        SELECT l_returnflag,
               CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_discount * 100) AS BIGINT) AS z,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM '{SF_DIR}/lineitem.parquet'
    """).df()
    rows = {r["l_returnflag"]: r
            for r in qs["ols_price_qty_discount"](spark, SF_DIR).collect()}
    for flag, grp in li.groupby("l_returnflag"):
        A = np.column_stack([grp.x, grp.z, np.ones(len(grp))])
        coef, *_ = np.linalg.lstsq(A, grp.y.to_numpy(dtype="float64"),
                                   rcond=None)
        r = rows[flag]
        assert r["b_qty"] == pytest.approx(coef[0] / 100, abs=1e-3)
        assert r["b_discount_bp"] == pytest.approx(coef[1] / 100, abs=1e-3)
        assert r["intercept"] == pytest.approx(coef[2] / 100, abs=1e-2)


def test_elasticity_matches_numpy_slope(r6b):
    spark, qs = r6b
    import duckdb

    con = duckdb.connect()
    ll = con.execute(f"""
        SELECT p_brand, round(ln(l_extendedprice / l_quantity), 9) AS lx,
               round(ln(l_quantity), 9) AS ly
        FROM '{SF_DIR}/lineitem.parquet'
        JOIN '{SF_DIR}/part.parquet' ON l_partkey = p_partkey
        WHERE l_quantity > 0
    """).df()
    rows = {r["p_brand"]: r
            for r in qs["price_elasticity_loglog"](spark, SF_DIR).collect()}
    for brand, grp in ll.groupby("p_brand"):
        slope = np.polyfit(grp.lx, grp.ly, 1)[0]
        assert rows[brand]["elasticity"] == pytest.approx(slope, abs=1e-3)


def test_durbin_watson_matches_numpy(r6b):
    spark, qs = r6b
    ev = _events(spark)
    rows = {r["event_type"]: r
            for r in qs["durbin_watson_residuals"](spark, SF_DIR).collect()}
    for et, grp in ev.groupby("event_type"):
        grp = grp.sort_values(["ts", "event_id"], kind="mergesort")
        x = np.arange(1, len(grp) + 1, dtype="float64")
        y = grp["c"].to_numpy(dtype="float64")
        b, a = np.polyfit(x, y, 1)
        e = np.round(y - a - b * x, 6)
        dw = np.sum(np.diff(e) ** 2) / np.sum(e * e)
        r = rows[et]
        assert r["n"] == len(x)
        assert r["dw"] == pytest.approx(dw, abs=1e-3)
        assert 0.0 <= r["dw"] <= 4.0