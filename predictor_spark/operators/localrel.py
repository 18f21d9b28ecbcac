"""Single-slice local relations for bounded driver-side frames.

`spark.createDataFrame(rows)` parallelizes the list into
``defaultParallelism`` slices, and the resulting plan is a Scan
ExistingRDD over a PYTHON RDD: every action then launches one task —
and one Python-worker round-trip — per slice, even when the frame holds
a single row.  Measured at local[32] (r15, guide §4 — eliminate the
Python boundary): a 1-row createDataFrame frame costs ~0.58 s per noop
materialization; the identical frame parallelized into ONE slice costs
~0.03 s.  Every bounded-collect finish (the r13/r14 idiom: collect
exact integers, re-enter them as a local relation for the float
expressions) pays this on each consuming job, so the engine's
driver-side finishes build their local frames through ``local_df``.

The rows are the same pickled Python values either way — no literal
stringification, so float/Decimal bit-exactness is untouched.  Row
ORDER is also unchanged (parallelize preserves list order across
slices).  The only layout difference is one partition instead of N,
which matters downstream ONLY to a float aggregation's partial-sum
grouping — callers that float-aggregate a multi-row local frame must
pin equality (every current caller either select/joins per row or
aggregates exact integers/decimals, where grouping cannot change the
value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` as a ONE-slice frame.

    ``rows``: a list (empty lists fall back to the plain path, which
    handles the no-partition edge).  ``schema``: DDL string or
    StructType, exactly as createDataFrame takes it.
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
