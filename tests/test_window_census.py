"""tools/window_census.py classifier — the unpartitioned-WindowExec
detector must agree with Spark's own "No Partition Defined" warning
condition on every Arguments shape formatted explain can print."""

import sys

from pyspark.sql import Window, functions as F

sys.path.insert(0, "/root/repo/tools")

from window_census import (  # noqa: E402
    _is_unpartitioned, unpartitioned_windows)


def test_arguments_shapes_text_only():
    # [exprs], [part], [order] — partitioned + ordered
    assert not _is_unpartitioned(
        "Arguments: [row_number() windowspecdefinition(p#1L, id#0L ASC "
        "NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(),"
        " currentrow$())) AS rn#4], [p#1L], [id#0L ASC NULLS FIRST]")
    # [exprs], [order] — UNpartitioned + ordered (the Class-C shape)
    assert _is_unpartitioned(
        "Arguments: [row_number() windowspecdefinition(id#0L ASC NULLS "
        "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS rn#2], [id#0L ASC NULLS FIRST]")
    # [exprs], [part] — partitioned, no order (sum over partition)
    assert not _is_unpartitioned(
        "Arguments: [sum(c#3L) windowspecdefinition(p#1L, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS cx#9L], [p#1L]")
    # [exprs] alone — global-frame window, single task
    assert _is_unpartitioned(
        "Arguments: [sum(c#3L) windowspecdefinition(specifiedwindowframe("
        "RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS n#9L]")


def _formatted(df):
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_live_plans_match_warning_condition(spark):
    df = spark.range(32).withColumn("p", F.col("id") % 2)
    cases = [
        (df.withColumn("rn", F.row_number().over(
            Window.partitionBy("p").orderBy("id"))), 0),
        (df.withColumn("rn", F.row_number().over(Window.orderBy("id"))), 1),
        (df.withColumn("s", F.sum("id").over(Window.partitionBy("p"))), 0),
        # constant partition key: Catalyst folds it away, the runtime
        # spec is EMPTY — Spark warns and single-tasks it, so flag it
        (df.withColumn("s", F.sum("id").over(
            Window.partitionBy(F.lit(1)))), 1),
        # two stacked unpartitioned windows over different orders
        (df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
           .withColumn("rd", F.row_number().over(
               Window.orderBy(F.col("id").desc()))), 2),
    ]
    for d, want in cases:
        assert unpartitioned_windows(_formatted(d)) == want


def test_window_group_limit_not_counted(spark):
    # rank()<=k triggers WindowGroupLimit pushdown: the helper node must
    # not be miscounted as a Window
    df = spark.range(32).withColumn("p", F.col("id") % 2)
    d = (df.withColumn("rn", F.row_number().over(
            Window.partitionBy("p").orderBy("id")))
           .where(F.col("rn") <= 3))
    plan = _formatted(d)
    assert "WindowGroupLimit" in plan
    assert unpartitioned_windows(plan) == 0
