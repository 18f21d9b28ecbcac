"""Binned range (interval) join — the scale path for point-in-interval
joins, which Spark would otherwise execute as BroadcastNestedLoopJoin
(reference analog: pandas positional/date alignment merges,
preprocessor_plugins/phase2_6_preprocessor.py windowing joins; the
binning technique itself is the standard "bucketed range join"
optimization from the data-warehouse literature).

Semantics: ``points p JOIN intervals i ON i.lo <= p.x < i.hi``
(+ optional equi-keys). Instead of a nested loop, both sides are mapped
to fixed-width bins of the x-domain: a point lands in exactly one bin,
an interval is replicated to every bin it overlaps, and the join becomes
a hash equi-join on (keys…, bin) followed by the exact residual
predicate. With bin_width ~ interval length each interval replicates to
~2 rows, so the shuffle is O(|points| + 2|intervals|) and AQE handles
bin skew like any other hash join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (and equal ``keys``), via bin equi-join.

    ``point_col``/``lo_col``/``hi_col`` must be integer-like (cast
    timestamps with unix_micros first). Returns all columns of both
    inputs (keys once). Inner join; wrap with a left join against the
    interval side afterwards if unmatched intervals must survive."""
    p_bin = F.floor(F.col(point_col) / bin_width)
    # hi is exclusive, but covering floor(hi/w) too only adds candidates
    # that the residual predicate drops — correct either way, and exact
    # when hi is a bin boundary
    i_bins = F.sequence(
        F.floor(F.col(lo_col) / bin_width), F.floor((F.col(hi_col) - 1) / bin_width)
    )
    p = points.withColumn("__bin", p_bin)
    i = intervals.withColumn("__bin", F.explode(i_bins))
    on = [*keys, "__bin"]
    return (
        p.join(i, on=on)
        .filter((F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bin")
    )
