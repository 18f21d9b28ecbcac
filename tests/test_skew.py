"""Skew utilities (operators/skew.py): result-equivalence to the naive
forms on skewed data, including a 90%-one-key hot distribution."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from predictor_spark.operators import skew


def _skewed_df(spark, n=20_000, hot_frac=0.9, seed=5):
    rng = np.random.default_rng(seed)
    keys = np.where(rng.random(n) < hot_frac, 0, rng.integers(1, 50, n))
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in zip(keys, rng.integers(0, 500, n))],
        "k long, v long",
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame([(i, f"name_{i}") for i in range(50)],
                                  "k long, label string")
    for how in ("inner", "left"):
        plain = big.join(small, "k", how).orderBy("k", "v", "label")
        salted = skew.salted_join(big, small, "k", salt=8, how=how) \
            .orderBy("k", "v", "label")
        assert salted.columns == plain.columns
        assert [tuple(r) for r in salted.collect()] == \
            [tuple(r) for r in plain.collect()]


def test_salted_join_composite_key(spark):
    big = _skewed_df(spark).withColumn("k2", F.col("v") % 3)
    small = spark.createDataFrame(
        [(i, j, i * 10 + j) for i in range(50) for j in range(3)],
        "k long, k2 long, payload long")
    plain = big.join(small, ["k", "k2"]).count()
    salted = skew.salted_join(big, small, ["k", "k2"], salt=4).count()
    assert salted == plain


def test_two_stage_count_distinct_equals_naive(spark):
    df = _skewed_df(spark)
    naive = {r["k"]: r["n"] for r in df.groupBy("k").agg(
        F.count_distinct("v").alias("n")).collect()}
    two = {r["k"]: r["n_distinct"] for r in
           skew.two_stage_count_distinct(df, "k", "v").collect()}
    assert two == naive
    # the hot key really is hot (the test means nothing otherwise)
    assert df.filter("k = 0").count() > 0.8 * df.count()
