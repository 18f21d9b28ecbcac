"""Stream-stream join (streaming/joins.py): the streaming interval join
must equal the batch interval join, AND the replay fixture must actually
exercise cross-batch buffered state (≥1 pair straddling each chunk
boundary — the property the data-driven cutoffs guarantee)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_stream_join_equals_batch_and_straddles_batches(spark):
    from predictor_spark.sources.tables import load_table
    from predictor_spark.streaming.joins import (
        _chronological_chunks, view_purchase_attribution)

    got = {(r.user_id, r.view_id, r.purchase_id)
           for r in view_purchase_attribution(spark, SF_DIR).collect()}

    ev = load_table(spark, SF_DIR, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
    batch = v.join(p, "user_id").filter(
        (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")))
    want = {(r.user_id, r.view_id, r.purchase_id) for r in batch.collect()}
    assert got == want and got

    # chunk files carry disjoint chronological bands; at least one batch
    # pair must straddle a boundary (its view replays >=1 micro-batch
    # before its purchase), proving the join matched from buffered state
    d = _chronological_chunks(spark, SF_DIR)
    bounds = []
    for f in sorted(glob.glob(f"{d}/chunk_*.parquet")):
        lo, hi = spark.read.parquet(f).agg(
            F.min("ts"), F.max("ts")).collect()[0]
        bounds.append((lo, hi))
    for (_, hi_prev), (lo_next, _) in zip(bounds, bounds[1:]):
        assert hi_prev <= lo_next  # chronological, disjoint
    ts = {r.view_id: r.v_ts for r in batch.collect()}
    pts = {r.purchase_id: r.p_ts for r in batch.collect()}
    cut = bounds[1][0]  # first chunk boundary
    straddle = [(vid, pid) for (_, vid, pid) in got
                if ts[vid] < cut <= pts[pid]]
    assert straddle, "no pair crosses the first chunk boundary"
