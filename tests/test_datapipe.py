"""Training-data-pipeline operators (operators/datapipe.py): sequence
packing, contamination screening, mixture sampling. The catalog rows pin
engine-vs-DuckDB equivalence; these tests pin the SEMANTIC contracts the
SQL can't express directly (packing bounds, broadcast plan shape,
determinism under repartitioning).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from predictor_spark.operators import datapipe


def test_pack_sequences_bounds(spark):
    """Bin boundaries sit on the budget grid, so every non-last bin's fill
    deviates from the budget by less than one max-size document in either
    direction, bins are contiguous, and packing respects id order."""
    rng = np.random.default_rng(3)
    rows = [(i, "s" + str(i % 2), int(rng.integers(5, 60))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tok long")
    out = datapipe.pack_sequences(df, "doc_id", "n_tok", "shard", budget=100)
    pdf = out.toPandas()
    max_doc = pdf["n_tok"].max()
    for shard, grp in pdf.groupby("shard"):
        grp = grp.sort_values("doc_id")
        # bin ids are contiguous from 0 and nondecreasing in doc order
        assert grp["seq_id"].iloc[0] == 0
        steps = np.diff(grp["seq_id"])
        assert ((steps == 0) | (steps == 1)).all()
        fills = grp.groupby("seq_id")["n_tok"].sum()
        last = fills.index.max()
        assert (fills.drop(last) > 100 - max_doc).all()
        assert (fills.drop(last) < 100 + max_doc).all()
        # exact grid law: bin k holds exactly the docs whose cumulative
        # predecessor total lies in [k*B, (k+1)*B)
        cum_before = grp["n_tok"].cumsum().shift(fill_value=0)
        assert (grp["seq_id"].to_numpy() == (cum_before // 100).to_numpy()).all()


def test_pack_sequences_shards_are_independent(spark):
    """Dropping one shard must not move another shard's assignment (the
    window is per-shard — this is the 100 TB parallel axis)."""
    rows = [(i, "a" if i < 50 else "b", 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tok long")
    both = datapipe.pack_sequences(df, "doc_id", "n_tok", "shard", 35).toPandas()
    only_a = datapipe.pack_sequences(
        df.filter("shard = 'a'"), "doc_id", "n_tok", "shard", 35).toPandas()
    a_in_both = both[both["shard"] == "a"].sort_values("doc_id")
    only_a = only_a.sort_values("doc_id")
    assert list(a_in_both["seq_id"]) == list(only_a["seq_id"])


def test_contamination_pairs_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with no overlap here"),
            (3, "the quick brown fox sat still today"),  # 2 shared 3-grams w/ 1
            (4, "quick brown fox jumps high"),           # shares w/ 1 too
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 1")
    corpus = docs.filter("doc_id != 1")
    out = datapipe.contamination_pairs(corpus, bench, "doc_id", "text",
                                       n=3, min_common=2).collect()
    got = {(r["corpus_id"], r["bench_id"]): r for r in out}
    assert set(got) == {(3, 1), (4, 1)}
    # doc 3: shingles of "the quick brown fox sat still today" overlapping
    # doc 1 = {"the quick brown", "quick brown fox"} -> 2 of its 5 shingles
    assert got[(3, 1)]["n_common"] == 2
    assert got[(3, 1)]["overlap_frac"] == pytest.approx(2 / 5)


def test_contamination_benchmark_is_broadcast(spark):
    """The bench side must appear as a broadcast exchange — the corpus is
    never shuffled on raw shingles."""
    docs = spark.createDataFrame(
        [(i, "w%d x y z common tail piece" % i) for i in range(20)],
        "doc_id long, text string",
    )
    out = datapipe.contamination_pairs(
        docs.filter("doc_id > 2"), docs.filter("doc_id <= 2"),
        "doc_id", "text", n=3, min_common=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_mixture_sample_deterministic_and_budgeted(spark):
    rng = np.random.default_rng(9)
    rows = [(i, ["big", "mid", "small"][min(i % 10, 2) if i % 10 < 3 else 0],
             int(rng.integers(50, 150))) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    kept, summary = datapipe.mixture_sample(df, "lang", "n_tok", "doc_id", mod=1000)
    s = {r["lang"]: r for r in summary.collect()}
    smallest = min(s.values(), key=lambda r: r["total_tokens"])
    # smallest stratum keeps everything (rate 1.0 -> permille 1000)
    assert smallest["keep_permille"] == 1000
    assert smallest["kept_docs"] == smallest["total_docs"]
    # the Knuth-scrambled modulo samples dense sequential ids uniformly:
    # realized kept fraction tracks the permille within sampling noise
    for r in s.values():
        expect = r["total_docs"] * r["keep_permille"] / 1000
        sigma = max(1.0, (expect * (1 - r["keep_permille"] / 1000)) ** 0.5)
        assert abs(r["kept_docs"] - expect) < 4 * sigma + 2
    # deterministic: repartitioned input yields identical keep set
    kept2, _ = datapipe.mixture_sample(df.repartition(13), "lang", "n_tok",
                                       "doc_id", mod=1000)
    assert sorted(r["doc_id"] for r in kept.collect()) == \
        sorted(r["doc_id"] for r in kept2.collect())


def test_bm25_matches_hand_formula(spark):
    """BM25 on a 3-doc corpus vs the closed form computed in numpy."""
    import math

    from predictor_spark.operators import retrieval

    texts = {
        1: "hash join hash scan filter",
        2: "join order by value",
        3: "scan scan scan scan",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in
           retrieval.bm25_scores(docs, ["hash", "scan"]).collect()}
    # doc 2 has neither query term -> absent
    assert set(got) == {1, 3}

    k1, b = 1.2, 0.75
    n_docs, avgdl = 3.0, (5 + 4 + 4) / 3.0
    def idf(df): return math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    def part(tf, dl, df):
        return idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    want1 = part(2, 5, 1) + part(1, 5, 2)   # hash(df=1) + scan(df=2)
    want3 = part(4, 4, 2)                   # scan only
    assert got[1] == pytest.approx(want1, rel=1e-12)
    assert got[3] == pytest.approx(want3, rel=1e-12)
    # more occurrences of a rarer term outranks common-term spam
    assert got[1] > got[3]
