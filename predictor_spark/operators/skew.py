"""Skew-safe aggregation via two-phase salting.

When a groupBy key is heavily skewed (a handful of hot keys carrying most
rows — e.g. event_type with 5 values over 10^12 events), a plain hash
aggregation sends each hot key to ONE reducer. Spark's map-side partial
aggregation usually absorbs this, but when the per-key state is large
(distinct counts, collect-style aggs) or AQE skew handling is off, the
classic fix is salting: phase 1 aggregates on (key, salt) spreading each
hot key over ``buckets`` reducers, phase 2 re-aggregates the
bucket-partials by key — shuffling |keys| x buckets rows instead of data
rows.

Only ALGEBRAIC aggregates decompose this way (sum/count/min/max, and
avg = sum/count recomposed in phase 2). The API takes named specs and
derives both phases; the result is bit-identical to the direct groupBy
(checked by the skew_salted_agg oracle query).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: agg name -> (phase1 expr builder, phase2 re-combiner)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    buckets: int = 32,
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (agg_name, input_col) with agg_name in
    {sum, count, min, max, avg}. ``salt_col`` defaults to a hash of the
    whole row's partition randomness via monotonically_increasing_id —
    any roughly-uniform integer works; pass an explicit column (e.g. a
    row id) for deterministic tests.
    """
    salt = (salt_col if salt_col is not None else F.monotonically_increasing_id()) % buckets
    work = df.withColumn("__salt", salt)

    phase1, phase2 = [], []
    for out, (name, col) in aggs.items():
        if name == "avg":
            phase1 += [F.sum(col).alias(f"__{out}_s"), F.count(col).alias(f"__{out}_c")]
            phase2.append(
                (F.sum(f"__{out}_s") / F.sum(f"__{out}_c")).alias(out)
            )
        elif name in _ALGEBRAIC:
            p1, p2 = _ALGEBRAIC[name]
            phase1.append(p1(col).alias(f"__{out}"))
            phase2.append(p2(f"__{out}").alias(out))
        else:
            raise ValueError(f"{name!r} is not algebraic; salting cannot decompose it")

    partial = work.groupBy(*keys, "__salt").agg(*phase1)
    return partial.groupBy(*keys).agg(*phase2)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
    salt_col: Column | None = None,
) -> DataFrame:
    """Skew-safe equi-join by salting: the LEFT (large, skewed) side gets
    a salt in [0, buckets); the RIGHT side is replicated once per salt
    value; the join runs on (keys..., salt), spreading each hot key over
    ``buckets`` reducers.

    Use when one join key carries a disproportionate share of the left
    rows AND the right side is too big to broadcast outright (else just
    broadcast) — the classic whale-key fact⋈fact fix when AQE skew-join
    splitting isn't available (e.g. the join feeds a co-partitioned
    downstream op that disables AQE splitting). Replication costs
    |right| x buckets rows, so pick buckets ~ hot-key multiplicity, not
    cluster width. Result is row-identical to the plain join (pytest).

    ``how``:
      inner/left — salt the left side, replicate the right (per-left-row
        semantics preserved);
      right — the mirror: salt the right side, replicate the left;
      full — salted left join UNION the right rows whose key has no left
        match (left_anti on the column-pruned distinct left keys), with
        null-filled left columns. One salted pass plus one keys-only
        semi-shuffle; unmatched-right detection never touches left
        payload columns."""
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(
            "salted_join supports how in {'inner', 'left', 'right', 'full'}")
    salt = (salt_col if salt_col is not None else F.monotonically_increasing_id()) % buckets
    # explode cannot be nested inside another expression (cast) — keep it
    # top-level and cast the int-typed sequence bounds instead
    replicate = F.explode(
        F.sequence(F.lit(0).cast("int"), F.lit(buckets - 1).cast("int")))
    if how == "right":
        rhs = right.withColumn("__salt", salt.cast("int"))
        lhs = left.withColumn("__salt", replicate)
        return lhs.join(rhs, [*on, "__salt"], "right").drop("__salt")
    lhs = left.withColumn("__salt", salt.cast("int"))
    rhs = right.withColumn("__salt", replicate)
    joined = lhs.join(rhs, [*on, "__salt"], "inner" if how == "inner" else "left")
    joined = joined.drop("__salt")
    if how != "full":
        return joined
    # full = (salted left join) + unmatched right rows. Every right row
    # whose key exists in left was matched above (the right side is
    # replicated across ALL salts), so unmatched-right = keys absent
    # from left entirely.
    unmatched = right.join(left.select(*on).distinct(), list(on), "left_anti")
    key_set = set(on)
    left_nonkey = [f for f in left.schema.fields if f.name not in key_set]
    filled = unmatched.select(
        *on,
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left_nonkey],
        *[c for c in right.columns if c not in key_set],
    )
    return joined.unionByName(filled)


def two_stage_count_distinct(
    df: DataFrame,
    keys: str | Sequence[str],
    col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per key, skew-proof — the case salted_agg
    cannot decompose (distinct state is not algebraic): stage 1 dedupes
    on (keys..., col), a shuffle partitioned by the FULL tuple so a hot
    key's rows spread across reducers; stage 2 counts the already-
    distinct rows per key. Equal to groupBy(keys).count_distinct(col);
    only the shuffle profile under skew differs."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.select(*ks, col)
        .distinct()
        .groupBy(*ks)
        .agg(F.count(F.lit(1)).cast("bigint").alias(out_col))
    )
