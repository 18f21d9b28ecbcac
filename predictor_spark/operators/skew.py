"""Skew-handling utilities — salting for hot keys.

AQE's skew-join splitting (on in predictor_spark.session) handles most
runtime skew, but two shapes still need explicit salting at 100 TB:

- a broadcast-ineligible dimension joined on a key where a handful of
  values dominate (one reducer gets the whale partition): salted_join
  spreads each hot key over ``salt`` sub-partitions by replicating the
  small side;
- exact COUNT(DISTINCT payload) per hot key: the naive plan shuffles
  every payload row to the key's single reducer; the two-stage form
  first dedupes on (key, payload) — a shuffle whose partitioning
  includes the payload, so it balances regardless of key skew — then
  counts per key over the already-distinct rows.

Both are result-identical to their naive forms (property-tested) — the
salt only changes the physical partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small (but broadcast-ineligible) side
    by spreading each key over ``salt`` sub-keys.

    The big side gets an arbitrary per-row salt (monotonically increasing
    id mod salt — WHICH salt a row lands on is irrelevant to the result,
    only the spread matters); the small side is replicated once per salt
    value, so every (key, salt) bucket can satisfy the join locally.
    Result-identical to ``big.join(small, on, how)`` for how in
    {inner, left}; the shuffle's largest partition shrinks by ~salt.
    """
    keys = [on] if isinstance(on, str) else list(on)
    b = big.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(salt)]))
    )
    return b.join(s, keys + ["_salt"], how).drop("_salt")


def two_stage_count_distinct(
    df: DataFrame,
    keys: str | list[str],
    col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per key, skew-proof: stage 1 dedupes on
    (keys..., col) — partitioned by the FULL tuple, so a hot key's rows
    spread across reducers — stage 2 counts the distinct rows per key.
    Equal to groupBy(keys).agg(count_distinct(col)); the difference is
    purely the shuffle profile under skew."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.select(*ks, col)
        .distinct()
        .groupBy(*ks)
        .agg(F.count(F.lit(1)).cast("bigint").alias(out_col))
    )
