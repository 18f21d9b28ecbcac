"""two_stage_count_distinct (operators/skew.py) — the non-algebraic
skew case salted_agg cannot decompose. salted_agg/salted_join have their
own equivalence tests in tests/test_parity_ops.py; here the distinct
count is checked result-identical to the naive form on a 90%-one-key
hot distribution, plus a salted_join smoke on the same data."""

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


def test_two_stage_count_distinct_equals_naive(spark):
    df = _skewed_df(spark)
    naive = {r["k"]: r["n"] for r in df.groupBy("k").agg(
        F.count_distinct("v").alias("n")).collect()}
    two = {r["k"]: r["n_distinct"] for r in
           skew.two_stage_count_distinct(df, "k", "v").collect()}
    assert two == naive
    # the hot key really is hot (the test means nothing otherwise)
    assert df.filter("k = 0").count() > 0.8 * df.count()


def test_two_stage_count_distinct_composite_keys(spark):
    df = _skewed_df(spark).withColumn("k2", F.col("v") % 3)
    naive = {(r["k"], r["k2"]): r["n"] for r in df.groupBy("k", "k2").agg(
        F.count_distinct("v").alias("n")).collect()}
    two = {(r["k"], r["k2"]): r["n_distinct"] for r in
           skew.two_stage_count_distinct(df, ["k", "k2"], "v").collect()}
    assert two == naive


def test_salted_join_hot_key_equivalence(spark):
    """salted_join on the 90%-one-key distribution equals the plain join
    (complements the randomized-shape tests in test_parity_ops)."""
    big = _skewed_df(spark)
    small = spark.createDataFrame([(i, f"name_{i}") for i in range(50)],
                                  "k long, label string")
    for how in ("inner", "left"):
        plain = sorted(map(tuple, big.join(small, "k", how).collect()))
        salted = sorted(map(tuple,
                            skew.salted_join(big, small, ["k"], buckets=8,
                                             how=how).collect()))
        assert salted == plain
