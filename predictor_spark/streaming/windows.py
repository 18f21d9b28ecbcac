"""Structured Streaming operators (SURVEY §2.9: the reference has NO
streaming — this is the engine's extension surface, §7 M7).

Pattern: readStream(parquet) -> event-time windowed aggregation with
watermark -> memory/foreachBatch sink. In production the source is
Kafka/files-on-arrival and the sink is an idempotent foreachBatch writer;
the parquet-driven variant here exercises the identical logical plan
synchronously (processAllAvailable) so a batch oracle can check it.

Scale: stateful agg state is partitioned by (window, group key); the
watermark bounds state size to (max event lag / window slide) windows per
key — without it, 100 TB of stream history would pin unbounded state.
"""

from __future__ import annotations

import hashlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

def _stream_dir(sf_dir: str, table: str = "events") -> str:
    """FileStreamSource requires a DIRECTORY source; testdata is read-only
    single files. Build (once) a /tmp dir of symlinks to the parquet file."""
    key = hashlib.md5(f"{sf_dir}/{table}".encode()).hexdigest()[:12]
    d = f"/tmp/predictor_spark_stream/{key}"
    os.makedirs(d, exist_ok=True)
    link = f"{d}/{table}.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/{table}.parquet", link)
    return d


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the schema taken from a
    batch footer read (FileStreamSource needs an explicit schema, and the
    generator's physical timestamp layout has changed across rounds —
    nanos-as-long vs NTZ micros), then ts canonicalized to TIMESTAMP
    exactly like the batch path (sources/tables.py canonical_ts)."""
    from predictor_spark.sources.tables import canonical_ts

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover
        pass
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(_stream_dir(sf_dir, "events"))
    )
    return canonical_ts(stream)


def tumbling_event_counts(
    spark: SparkSession,
    sf_dir: str,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts/sums per event_type, driven to
    completion synchronously and returned as a batch DataFrame.

    Uses outputMode('complete') + memory sink so every window (including
    ones the watermark hasn't closed) is emitted — matching the batch
    oracle GROUP BY date_trunc."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def sessionized_stream_counts(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """session_window (gap-based) per user — the streaming analog of the
    batch sessionize operator. Returns per-user session counts."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
    )
