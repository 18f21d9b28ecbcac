"""Deployment-shape robustness: at 100 TB, tables arrive as DIRECTORY
parquet (many part files, optionally hive-partitioned), not the single
files the generator writes. load_table and the query surface must treat
both layouts identically."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from predictor_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def dir_sf(spark, tmp_path_factory):
    """An sf_dir where events is a 8-part DIRECTORY and lineitem is
    hive-partitioned by l_returnflag; every other table symlinks the
    single-file original."""
    root = str(tmp_path_factory.mktemp("dirsf"))
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(8).write.mode("overwrite").parquet(f"{root}/events.parquet")
    li = load_table(spark, SF_DIR, "lineitem")
    (li.write.mode("overwrite").partitionBy("l_returnflag")
       .parquet(f"{root}/lineitem.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "documents", "embeddings"):
        os.symlink(f"{SF_DIR}/{t}.parquet", f"{root}/{t}.parquet")
    return root


def test_directory_events_equals_single_file(spark, dir_sf):
    a = load_table(spark, SF_DIR, "events")
    b = load_table(spark, dir_sf, "events")
    assert b.schema == a.schema  # ts canonicalization applied to both
    assert sorted(r["event_id"] for r in b.select("event_id").collect()) == \
        sorted(r["event_id"] for r in a.select("event_id").collect())


def test_queries_run_identically_on_directory_tables(spark, dir_sf):
    """Representative rows over the rewritten tables (multi-part events,
    hive-partitioned lineitem) produce the same results as the
    single-file layout — including partition-column recovery."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in ("q1_pricing_summary", "flagship_persistence_metrics",
                 "sessionize_counts", "rollup_returnflag_status"):
        want = sorted(map(str, qs[name](spark, SF_DIR).collect()))
        got = sorted(map(str, qs[name](spark, dir_sf).collect()))
        assert got == want, name


def test_partition_pruning_on_hive_layout(spark, dir_sf):
    """A filter on the hive partition column must prune partitions at
    the scan (PartitionFilters), not post-filter."""
    li = load_table(spark, dir_sf, "lineitem")
    plan = (li.filter(F.col("l_returnflag") == "R")
              ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [" in plan
    assert "l_returnflag" in plan.split("PartitionFilters")[1][:200]
