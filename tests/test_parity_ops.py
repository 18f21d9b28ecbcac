"""Unit tests for the parity-batch operators: IVF ANN, embedding near-dup,
anti-naive-lock dispatch, min-max round trip, upsert semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window, functions as F

from predictor_spark.operators import normalize as norm, similarity
from predictor_spark.operators.transforms import anti_naive_lock, infer_roles


@pytest.fixture(scope="module")
def emb(spark):
    from predictor_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()


def test_ivf_subset_of_bruteforce_candidates(spark, emb):
    """Every IVF hit must be an exact cosine computed identically to the
    brute-force path (same pair -> same score), and rank must be
    consistent within each query's probed list."""
    queries = emb.filter(F.col("vec_id") < 5)
    ivf = similarity.ivf_cosine_topk(emb, queries, k=3, n_centroids=4).collect()
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.cosine_topk(emb, queries, k=10**6).collect()
    }
    assert ivf, "IVF returned nothing"
    for r in ivf:
        assert math.isclose(bf[(r["query_id"], r["neighbor_id"])], r["cosine"], abs_tol=1e-9)


def test_near_dup_pairs_ordered_and_thresholded(spark, emb):
    out = similarity.cosine_near_dup_pairs(emb, threshold=0.3, n_planes=1).collect()
    for r in out:
        assert r["vec_id_a"] < r["vec_id_b"]
        assert r["cosine"] >= 0.3


def test_near_dup_recall_grows_with_fewer_planes(spark, emb):
    few = similarity.cosine_near_dup_pairs(emb, threshold=0.3, n_planes=4).count()
    many = similarity.cosine_near_dup_pairs(emb, threshold=0.3, n_planes=1).count()
    assert many >= few  # coarser blocking can only add candidate pairs


def test_anti_naive_lock_dispatch(spark):
    rows = [(i, float(i + 1), float(i + 1), float(i), float(i % 24)) for i in range(5)]
    df = spark.createDataFrame(rows, "ts int, close double, price_x double, trend_x double, hod double")
    roles = infer_roles(["close", "price_x", "trend_x", "hod"], target_col="close")
    assert roles == {"close": "preserve", "price_x": "log_returns",
                     "trend_x": "first_diff", "hod": "cyclic"}
    out = anti_naive_lock(df, roles, ts_col="ts").orderBy("ts").collect()
    assert [r["close"] for r in out] == [1.0, 2.0, 3.0, 4.0, 5.0]  # preserved
    assert out[0]["price_x"] == 0.0 and math.isclose(out[1]["price_x"], math.log(2 / 1))
    assert [r["trend_x"] for r in out] == [0.0, 1.0, 1.0, 1.0, 1.0]
    assert math.isclose(out[1]["hod_sin"], math.sin(2 * math.pi * 1 / 24), abs_tol=1e-12)


def test_minmax_roundtrip_identity(spark):
    df = spark.createDataFrame([(float(v),) for v in (2.0, 5.0, 11.0)], "x double")
    stats = norm.fit_minmax(df, ["x"])
    assert stats == {"x": {"min": 2.0, "max": 11.0}}
    back = norm.denormalize(norm.normalize(df, stats), stats).collect()
    assert sorted(r["x"] for r in back) == [2.0, 5.0, 11.0]


def test_salted_agg_equals_direct_groupby(spark):
    from predictor_spark.operators.skew import salted_agg

    rows = [(i, "k%d" % (i % 3), float(i) * 0.5) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, k string, v double")
    got = {
        r["k"]: r
        for r in salted_agg(
            df, ["k"],
            {"s": ("sum", "v"), "n": ("count", "v"), "a": ("avg", "v"),
             "mn": ("min", "v"), "mx": ("max", "v")},
            buckets=7, salt_col=F.col("id"),
        ).collect()
    }
    want = {
        r["k"]: r
        for r in df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("n"), F.avg("v").alias("a"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        for c in ("s", "n", "a", "mn", "mx"):
            assert got[k][c] == pytest.approx(want[k][c])


def test_salted_agg_rejects_non_algebraic(spark):
    from predictor_spark.operators.skew import salted_agg

    df = spark.createDataFrame([(1, "a", 1.0)], "id int, k string, v double")
    with pytest.raises(ValueError, match="not algebraic"):
        salted_agg(df, ["k"], {"d": ("approx_count_distinct", "v")})


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located joins via bucketing: two tables bucketed+sorted on the
    join key sort-merge-join with NO Exchange — the 100 TB fact-fact
    strategy the relational docstrings point to."""
    left = spark.createDataFrame([(i, float(i)) for i in range(100)], "k int, v double")
    right = spark.createDataFrame([(i, i * 2) for i in range(100)], "k int, w int")
    for name, df in (("bl", left), ("br", right)):
        (df.write.mode("overwrite").option("path", str(tmp_path / name))
         .bucketBy(4, "k").sortBy("k").saveAsTable(name))
    # force the sort-merge path (tiny test tables would broadcast, which
    # hides the bucketing; at fact-fact scale broadcast is off the table)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bl").join(spark.table("br"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("bl", "br"):
            spark.sql(f"DROP TABLE {t}")


def test_upsert_latest_wins(spark, tmp_path):
    from predictor_spark.sources.olap import StarSchemaWarehouse

    wh = StarSchemaWarehouse(spark, str(tmp_path))
    wh.upsert("t", spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), ["k"])
    wh.upsert("t", spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), ["k"])
    got = {(r["k"], r["v"]) for r in spark.read.parquet(str(tmp_path / "t")).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_salted_join_equals_plain_join(spark):
    from predictor_spark.operators.skew import salted_join
    from pyspark.sql import functions as F

    # skewed left: key 'hot' carries 90% of rows; right has multiplicity 2
    left = spark.createDataFrame(
        [("hot" if i % 10 else f"k{i}", i) for i in range(1000)], "k string, lv int")
    right = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("k10", 3), ("k20", 4), ("absent", 5)],
        "k string, rv int")

    for how in ("inner", "left", "right", "full"):
        got = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in salted_join(left, right, ["k"], buckets=4, how=how)
            .select("k", "lv", "rv").collect()
        )
        want = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in left.join(right, ["k"], how)
            .select("k", "lv", "rv").collect()
        )
        assert got == want, how

    import pytest
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="cross")
