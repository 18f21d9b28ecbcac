"""Tests for the STAGED round-11 catalog families, second batch (r19).

Independent reimplementations: explicit numpy modularity/assortativity
over the materialized edge list, scipy-free G² from a pandas
contingency table, a dict-based Good-Turing, and a pure-Python
Bradley-Terry MM loop.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _round_half_away(x):
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


@pytest.fixture(scope="module")
def trade_edges():
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    s = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    m = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey")
         .merge(n.add_prefix("cn_"), left_on="c_nationkey",
                right_on="cn_n_nationkey")
         .merge(n.add_prefix("sn_"), left_on="s_nationkey",
                right_on="sn_n_nationkey"))
    return (m.groupby(["cn_n_name", "cn_n_regionkey",
                       "sn_n_name", "sn_n_regionkey"])
            .size().reset_index(name="w")
            .rename(columns={"cn_n_name": "src", "cn_n_regionkey": "sreg",
                             "sn_n_name": "dst", "sn_n_regionkey": "dreg"}))


class TestGraphQual:
    def test_modularity(self, spark, trade_edges):
        from predictor_spark.plans.catalog_r19_graphqual import (
            modularity_regions)

        e = trade_edges
        m = e["w"].sum()
        got = (modularity_regions(spark, SF_DIR).toPandas()
               .set_index("regionkey"))
        for reg in sorted(e["sreg"].unique()):
            w_in = e[(e["sreg"] == reg) & (e["dreg"] == reg)]["w"].sum()
            ko = e[e["sreg"] == reg]["w"].sum()
            ki = e[e["dreg"] == reg]["w"].sum()
            row = got.loc[reg]
            assert row["w_internal"] == w_in
            assert row["k_out"] == ko and row["k_in"] == ki
            assert row["q_contrib"] == pytest.approx(
                w_in / m - (ko / m) * (ki / m), abs=1e-6)
        # Q in [-1, 1]
        assert -1 <= got["q_contrib"].sum() <= 1

    def test_assortativity(self, spark, trade_edges):
        from predictor_spark.plans.catalog_r19_graphqual import (
            trade_assortativity)

        e = trade_edges
        kout = e.groupby("src")["w"].sum()
        kin = e.groupby("dst")["w"].sum()
        w = e["w"].to_numpy(dtype=float)
        x = e["src"].map(kout).to_numpy(dtype=float)
        y = e["dst"].map(kin).to_numpy(dtype=float)
        sw = w.sum()
        cov = (w * x * y).sum() * sw - (w * x).sum() * (w * y).sum()
        vx = (w * x * x).sum() * sw - (w * x).sum() ** 2
        vy = (w * y * y).sum() * sw - (w * y).sum() ** 2
        r = cov / math.sqrt(vx * vy)
        row = trade_assortativity(spark, SF_DIR).toPandas().iloc[0]
        assert row["n_edges"] == len(e)
        assert row["total_weight"] == int(sw)
        assert row["assortativity"] == pytest.approx(r, abs=1e-5)


@pytest.fixture(scope="module")
def transitions():
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    ev["dst"] = ev.groupby("user_id")["event_type"].shift(-1)
    return ev.dropna(subset=["dst"])[["ts", "event_type", "dst"]] \
        .rename(columns={"event_type": "src"})


class TestChainOrder:
    def test_g2_vs_contingency(self, spark, transitions):
        from predictor_spark.plans.catalog_r19_chainorder import (
            markov_order_lr_test)

        ct = pd.crosstab(transitions["src"], transitions["dst"])
        n = ct.to_numpy().sum()
        g2 = 0.0
        cells = 0
        for i in ct.index:
            for j in ct.columns:
                c = ct.loc[i, j]
                if c > 0:
                    cells += 1
                    g2 += 2 * c * math.log(
                        c * n / (ct.loc[i].sum() * ct[j].sum()))
        row = markov_order_lr_test(spark, SF_DIR).toPandas().iloc[0]
        assert row["n_transitions"] == n
        assert row["n_cells"] == cells
        assert row["df"] == (len(ct.index) - 1) * (len(ct.columns) - 1)
        assert row["g2_stat"] == pytest.approx(g2, rel=1e-5)

    def test_halves_drift(self, spark, transitions):
        from predictor_spark.plans.catalog_r19_chainorder import (
            chain_halves_drift)

        ev = _events()
        # explicit microsecond ints: the parquet column's pandas unit
        # (ns vs us) must not leak into the midpoint arithmetic
        us = ev["ts"].astype("datetime64[us]").astype("int64")
        lo, hi = int(us.min()), int(us.max())
        mid = lo + (hi - lo) // 2
        t = transitions.copy()
        t_us = t["ts"].astype("datetime64[us]").astype("int64")
        t["half"] = np.where(t_us <= mid, 1, 2)
        got = (chain_halves_drift(spark, SF_DIR).toPandas()
               .set_index("src"))
        for src, g in t.groupby("src"):
            p1 = (g[g["half"] == 1]["dst"].value_counts(normalize=True))
            p2 = (g[g["half"] == 2]["dst"].value_counts(normalize=True))
            dsts = set(p1.index) | set(p2.index)
            l1 = sum(abs(p1.get(d, 0.0) - p2.get(d, 0.0)) for d in dsts)
            row = got.loc[src]
            assert row["n_first"] == (g["half"] == 1).sum()
            assert row["n_second"] == (g["half"] == 2).sum()
            assert row["l1_drift"] == pytest.approx(l1, abs=1e-5)


class TestSmoothing:
    @staticmethod
    def _bigram_counts():
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        from collections import Counter
        cnt = Counter()
        for text in docs["text"]:
            toks = [w for w in text.strip().split() if w]
            for a, b in zip(toks[:-1], toks[1:]):
                cnt[f"{a} {b}"] += 1
        return cnt

    def test_good_turing_table(self, spark):
        from predictor_spark.plans.catalog_r19_smoothing import (
            good_turing_counts, unseen_mass_estimate)

        cnt = self._bigram_counts()
        from collections import Counter
        coc = Counter(cnt.values())
        n_tokens = sum(r * nr for r, nr in coc.items())
        got = good_turing_counts(spark, SF_DIR).toPandas().set_index("r")
        assert len(got) > 0  # the corpus must expose low-count classes
        for r in got.index:
            assert got.loc[r, "n_r"] == coc[r]
            r_star = (r + 1) * coc[r + 1] / coc[r]
            assert got.loc[r, "r_star"] == pytest.approx(r_star, abs=1e-5)
            assert got.loc[r, "smoothed_mass"] == pytest.approx(
                r_star * coc[r] / n_tokens, abs=1e-6)

        row = unseen_mass_estimate(spark, SF_DIR).toPandas().iloc[0]
        assert row["n_tokens"] == n_tokens
        assert row["vocab"] == len(cnt)
        assert row["n_singletons"] == coc[1]
        assert row["gt_unseen_mass"] == pytest.approx(
            coc[1] / n_tokens, abs=1e-6)


class TestBradleyTerry:
    @staticmethod
    def _wins():
        ev = _events()
        bars = (ev.assign(d=ev["ts"].dt.date)
                .groupby(["event_type", "d"])["value"].sum()
                .round(6).reset_index(name="bar"))
        rets = []
        for t, g in bars.groupby("event_type"):
            g = g.sort_values("d")
            prev = g["bar"].shift(1)
            ok = prev.notna() & (prev > 0)
            x = 1e6 * (g["bar"][ok] / prev[ok] - 1.0)
            rets.append(pd.DataFrame({
                "t": t, "d": g.loc[ok, "d"].to_numpy(),
                "r": _round_half_away(x).astype(np.int64)}))
        rets = pd.concat(rets)
        piv = rets.pivot(index="d", columns="t", values="r").dropna()
        types = sorted(piv.columns)
        wins = {}
        for i in types:
            for j in types:
                if i != j:
                    wins[(i, j)] = int((piv[i] > piv[j]).sum())
        return types, wins

    def test_strengths_and_matrix(self, spark):
        from predictor_spark.plans.catalog_r19_bradleyterry import (
            _ITERS, bt_strengths, bt_win_matrix)

        types, wins = self._wins()
        p = {t: 0.2 for t in types}
        for _ in range(_ITERS):
            raw = {}
            for i in types:
                wi = sum(wins[(i, j)] for j in types if j != i)
                den = sum((wins[(i, j)] + wins[(j, i)]) / (p[i] + p[j])
                          for j in types if j != i
                          if wins[(i, j)] + wins[(j, i)] > 0)
                raw[i] = wi / den
            s = sum(raw[t] for t in sorted(raw))
            p = {t: raw[t] / s for t in raw}

        got = (bt_strengths(spark, SF_DIR).toPandas()
               .set_index("event_type"))
        for t in types:
            assert got.loc[t, "strength"] == pytest.approx(p[t], abs=1e-5)
            assert got.loc[t, "total_wins"] == sum(
                wins[(t, j)] for j in types if j != t)
        assert got["strength"].sum() == pytest.approx(1.0, abs=1e-4)

        mat = (bt_win_matrix(spark, SF_DIR).toPandas()
               .set_index(["type_a", "type_b"]))
        for i in types:
            for j in types:
                if i < j and wins[(i, j)] > 0:
                    row = mat.loc[(i, j)]
                    n = wins[(i, j)] + wins[(j, i)]
                    assert row["n_contests"] == n
                    assert row["fitted_p_win"] == pytest.approx(
                        p[i] / (p[i] + p[j]), abs=1e-5)
                    assert row["empirical_p_win"] == pytest.approx(
                        wins[(i, j)] / n, abs=1e-6)


class TestTextEval:
    def test_bleu_rouge_vs_counter(self, spark):
        """Counter-based BLEU-2 / ROUGE-1/2 over the same md5-adjacent
        pairing."""
        import hashlib
        from collections import Counter

        from predictor_spark.plans.catalog_r19_texteval import (
            _M, bleu_doc_pairs, rouge_doc_pairs)

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        md5 = docs["doc_id"].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest())
        sample = docs.loc[md5.sort_values().index[:_M]]
        texts = sample["text"].to_numpy()
        ids = sample["doc_id"].to_numpy()

        def grams(text, n):
            toks = [w for w in text.strip().split() if w]
            if n == 1:
                return Counter(toks)
            return Counter(" ".join(toks[i:i + n])
                           for i in range(len(toks) - n + 1))

        got_r = (rouge_doc_pairs(spark, SF_DIR).toPandas()
                 .set_index("doc_ref"))
        got_b = (bleu_doc_pairs(spark, SF_DIR).toPandas()
                 .set_index("doc_ref"))
        assert len(got_r) == _M // 2 and len(got_b) == _M // 2
        for k in range(0, _M, 2):
            ref, cand = texts[k], texts[k + 1]
            rid = ids[k]
            fs = {}
            ps = {}
            for n in (1, 2):
                cr, cc = grams(ref, n), grams(cand, n)
                clip = sum(min(cr[g], cc[g]) for g in cr)
                fs[n] = 2 * clip / (sum(cr.values()) + sum(cc.values()))
                ps[n] = (clip, sum(cc.values()))
            rr = got_r.loc[rid]
            assert rr["rouge1_f1"] == pytest.approx(fs[1], abs=1e-6)
            assert rr["rouge2_f1"] == pytest.approx(fs[2], abs=1e-6)
            rb = got_b.loc[rid]
            c1, t1 = ps[1]
            c2, t2 = ps[2]
            len_ref = sum(grams(ref, 1).values())
            bp = min(1.0, math.exp(1 - len_ref / t1))
            bleu = (bp * math.sqrt((c1 / t1) * (c2 / t2))
                    if c1 > 0 and c2 > 0 else 0.0)
            assert rb["p1"] == pytest.approx(c1 / t1, abs=1e-6)
            assert rb["p2"] == pytest.approx(c2 / t2, abs=1e-6)
            assert rb["bleu2"] == pytest.approx(bleu, abs=1e-6)
