"""As-of join — for each left row, the most recent right row at-or-before
it (per key, optional tolerance). The trades⋈quotes primitive the
reference approximates with pandas positional/date alignment
(preprocessor date-merge semantics, SURVEY §2.6 J4), generalized to two
tables.

Spark has no ASOF JOIN operator; the scalable encoding is NOT a range
join (which would replicate rows) but union + ordered window:

  1. tag left rows 1, right rows 0, union on (keys…, ts, tag, payload);
  2. one window pass per (keys…) ordered by (ts, tag):
     last_value(right-payload IGNORE NULLS) — at equal ts the right row
     sorts first, so 'backward' semantics include exact matches;
  3. keep left rows; null out matches older than ``tolerance``.

Cost: ONE shuffle of |left|+|right| rows on the by-keys and one sort —
the same WindowExec shape as every temporal operator here, with no row
replication. DuckDB's native ASOF JOIN replays it for the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = (),
    right_cols: Sequence[str] = (),
    tolerance: Column | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join. Returns every left row plus, for each name in
    ``right_cols``, the matched right row's value as ``name + suffix``
    (and the match timestamp as ``ts_col + suffix``); all-null when no
    right row at-or-before exists (or it is outside ``tolerance``, an
    INTERVAL-typed Column)."""
    payload = [c for c in right_cols if c != ts_col]
    l_tag = left.select(
        *by, ts_col, F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r_tag = right.select(
        *by, ts_col, F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*by).orderBy(ts_col, "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE last() over a struct of the entire right row (ts + payload), built
    # only for tag==0 rows. A per-column last(ignorenulls) would skip a NULL
    # payload value and silently splice in an OLDER right row's value —
    # backward as-of must return the matched row's value, NULL included.
    r_row = F.when(
        F.col("__tag") == 0,
        F.struct(F.col(ts_col).alias("__ts"),
                 *[F.col(f"__r_{c}").alias(c) for c in payload]),
    )
    out = u.withColumn("__m", F.last(r_row, ignorenulls=True).over(w))
    out = out.filter(F.col("__tag") == 1)
    keep = F.col("__m").isNotNull()
    if tolerance is not None:
        keep = keep & (F.col(ts_col) <= F.col("__m.__ts") + tolerance)
    sel = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    sel.append(F.when(keep, F.col("__m.__ts")).alias(f"{ts_col}{suffix}"))
    sel += [F.when(keep, F.col(f"__m.{c}")).alias(f"{c}{suffix}") for c in payload]
    return out.select(*sel)


def asof_self_join(
    df: DataFrame,
    left_pred: Column,
    right_pred: Column,
    ts_col: str = "ts",
    by: Sequence[str] = (),
    right_cols: Sequence[str] = (),
    tolerance: Column | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Same-table as-of join in ONE scan (VERDICT r3 #4): when both sides
    are predicates over one table (clicks vs purchases of `events`), the
    two-scan ``asof_join(df.filter(l), df.filter(r))`` reads the table
    twice. Here each row is read once and TAGGED: rows matching
    ``right_pred`` contribute a match-struct column, rows matching
    ``left_pred`` are the output rows, and the same (ts, tag) window pass
    as ``asof_join`` computes last-right-at-or-before — right rows sort
    before left rows at equal ts, so exact-timestamp matches are included
    (a row matching BOTH predicates matches itself, exactly as its two
    copies would in the union form). Identical result, half the I/O, and
    the window shuffle carries |left|+|right| rows instead of the union's
    duplicated frame.

    Output: every ``left_pred`` row with all original columns plus
    ``ts_col+suffix`` / ``c+suffix`` for each payload column (all-null
    when no match at-or-before, or the match is outside ``tolerance``).
    """
    payload = [c for c in right_cols if c != ts_col]
    r_row = F.when(
        right_pred,
        F.struct(F.col(ts_col).alias("__ts"),
                 *[F.col(c).alias(c) for c in payload]),
    )
    tagged = (
        df.filter(left_pred | right_pred)     # prune non-participants early
        .withColumn("__tag", F.when(right_pred, 0).otherwise(1))
        .withColumn("__r", r_row)
    )
    w = (
        Window.partitionBy(*by).orderBy(ts_col, "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        tagged.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(left_pred)
    )
    keep = F.col("__m").isNotNull()
    if tolerance is not None:
        keep = keep & (F.col(ts_col) <= F.col("__m.__ts") + tolerance)
    sel = [F.col(c) for c in df.columns]
    sel.append(F.when(keep, F.col("__m.__ts")).alias(f"{ts_col}{suffix}"))
    sel += [F.when(keep, F.col(f"__m.{c}")).alias(f"{c}{suffix}") for c in payload]
    return out.select(*sel)
