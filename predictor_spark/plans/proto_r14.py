"""Round-14 perf prototypes — NOT registered, NOT imported by any
catalog module (zero closure-hash churn; the proto_r12/r13
discipline).

Found by the r13 audit-log sweep for un-cached multi-consumer subtree
re-expansion (the disease the r13 swaps fixed in their own plans):

- `a8_mmd_v2`: the live row (plans/catalog_analytics.py) derives its
  x / y subsamples from an un-cached 1 %-of-events filter, and the
  three kernel aggregates (kxx, kyy, kxy) each re-expand both sides —
  SIX full events scans at runtime for a ≤ |events|/97 subsample
  (event_id % 97 is not a pushable predicate, so every scan reads the
  whole file). The v2 caches the two subsample frames: ONE events
  scan builds them, the pairwise kernels run on the cached ≤1 %
  frames. Output equal by construction (same rows, same kernel, same
  rounding); pinned by tests/test_r14_prototypes.py.

Swap cost (r14 window): catalog_analytics has 11 registered dependent
rows (census r13) — schedule with the also-deferred ADVICE r12 mlprep
non-null assert (9 rows): 11 + 9 = 20 ≤ 50.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import _t


def a8_mmd_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a8_mmd with the deterministic 1 % subsample CACHED so the three
    pairwise-kernel aggregates share one events scan instead of six.
    The cached state is ≤ |events|/97 rows of one double column per
    side — bounded the way the reference's sample_size=256 subsample
    is (losses.py:42-58)."""
    ev = _t(spark, sf_dir, "events")
    sub = ev.filter(F.col("event_id") % 97 == 0)
    x = (sub.filter(F.col("event_type") == "click")
         .select(F.col("value").alias("xv")).cache())
    y = (sub.filter(F.col("event_type") == "purchase")
         .select(F.col("value").alias("yv")).cache())

    def k(a, b):
        return F.exp(-((a - b) * (a - b)) / F.lit(200.0))

    kxx = x.crossJoin(x.select(F.col("xv").alias("xv2"))).agg(
        F.avg(k(F.col("xv"), F.col("xv2"))).alias("v"))
    kyy = y.crossJoin(y.select(F.col("yv").alias("yv2"))).agg(
        F.avg(k(F.col("yv"), F.col("yv2"))).alias("v"))
    kxy = x.crossJoin(y).agg(F.avg(k(F.col("xv"), F.col("yv"))).alias("v"))
    return (
        kxx.select(F.col("v").alias("kxx"))
        .crossJoin(kyy.select(F.col("v").alias("kyy")))
        .crossJoin(kxy.select(F.col("v").alias("kxy")))
        .select((F.round(F.col("kxx") + F.col("kyy") - 2 * F.col("kxy"), 6)
                 + F.lit(0.0)).alias("mmd2"))
    )
