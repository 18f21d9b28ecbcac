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
from predictor_spark.operators.localrel import local_df

def stream_clone(spark: SparkSession, source_files: list[str],
                 skip_no_data: bool) -> SparkSession:
    """Per-query session clone for a synchronous streaming run (r14,
    guide §1.2/§2.2 — the pattern measured on streaming_stream_join):

    - state-store width = spark.sql.shuffle.partitions is captured at
      query start, and the caller session's batch width (local: one per
      core) over-parallelizes the per-batch state-store tasks of these
      bounded replays.  Auto-size from the source row count (parquet
      FOOTER read, no job): one partition per ~50k rows, clamped to
      [8, 32] — sf0.1 gets 8, larger SFs widen, and on a cluster the
      same rule tracks input size.  Cloning (own SQLConf, shared
      SparkContext) keeps the caller's batch conf untouched.
    - ``skip_no_data=True`` disables the trailing NO-DATA micro-batch.
      Only pass it for queries where that batch provably emits nothing:
      complete-mode aggregations re-emit unchanged state (the final
      data batch already produced the full table) and inner
      stream-stream joins only evict.  APPEND-mode windowed aggs MUST
      keep it — the last watermark advance is what flushes their final
      closed windows."""
    import pyarrow.parquet as _pq

    ss = spark.newSession()
    try:
        ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover
        pass
    n_rows = sum(_pq.ParquetFile(p).metadata.num_rows
                 for p in source_files)
    ss.conf.set("spark.sql.shuffle.partitions",
                str(min(32, max(8, n_rows // 50_000))))
    if skip_no_data:
        ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
                    "false")
    return ss


def drain_to_caller(caller: SparkSession, ss: SparkSession, name: str,
                    schema) -> DataFrame:
    """Drain a clone-session memory sink back onto the CALLER session
    (local relation), dropping the clone's temp view. The memory sink is
    already driver-resident, so the collect moves nothing extra."""
    rows = ss.table(name).collect()
    ss.catalog.dropTempView(name)
    return local_df(caller, rows, schema)


def drain_memory_sink(spark: SparkSession, name: str, schema) -> DataFrame:
    """Collect a completed memory-sink table and DROP the temp view.

    The memory sink already holds its rows on the driver, so the collect
    adds nothing; without the drop, every call leaves a uuid-named
    in-memory table registered for the session lifetime (bench loops and
    grading sweeps accumulate them). Returns a plain local-relation
    DataFrame with the aggregation's schema."""
    rows = spark.table(name).collect()
    spark.catalog.dropTempView(name)
    return local_df(spark, rows, schema)


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
    exactly like the batch path (sources/tables.py canonical_ts).

    ``spark`` may be a per-query clone from :func:`stream_clone` — the
    stream then plans under the clone's conf."""
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
    ss = stream_clone(spark, [f"{sf_dir}/events.parquet"],
                      skip_no_data=True)  # complete mode: re-emit only
    stream = _events_stream(ss, sf_dir)
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
    return drain_to_caller(spark, ss, name, agg.schema)


def sessionized_stream_counts(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """session_window (gap-based) per user — the streaming analog of the
    batch sessionize operator. Returns per-user session counts."""
    ss = stream_clone(spark, [f"{sf_dir}/events.parquet"],
                      skip_no_data=True)  # complete mode: re-emit only
    stream = _events_stream(ss, sf_dir)
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
        drain_to_caller(spark, ss, name, agg.schema)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
    )


def late_data_drop_counts(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermark LATE-DATA-DROP semantics, deterministically replayable
    (COVERAGE r2 open note): the events table is split into three
    chronologically-processed files — (0) everything before Jan 19 EXCEPT
    the Jan 10-12 band, (1) a Jan 19-24 filler, (2) the remainder PLUS the
    band as late stragglers. After file 0 the watermark stands at
    max(file-0 event time) - 2h (~Jan 18) and file 1's batch EVICTS every
    pre-Jan-18 window from the state store; when the band then arrives in
    batch 2 its hour-windows are already finalized, so Spark drops every
    band row (observable as numRowsDroppedByWatermark). The filler batch
    is load-bearing: a late row whose window is evicted in the SAME batch
    it would have been dropped in still gets aggregated and emitted —
    eviction happens at end-of-batch, so dropping starts one batch later.
    Append mode then emits only windows the final watermark has closed.
    The batch oracle replays exactly that rule.

    Scale: the drop predicate is evaluated row-local against the
    broadcast watermark — no extra shuffle; state is bounded by
    (watermark / window) open windows per key, which is the entire point
    of watermarking at 100 TB."""
    import glob
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from predictor_spark.sources.tables import load_table, table_fingerprint

    fp = table_fingerprint(sf_dir, "events")
    key = hashlib.md5(f"{sf_dir}/late_drop_v2/{fp}".encode()).hexdigest()[:12]
    d = f"/tmp/predictor_spark_stream_late/{key}"
    if not (os.path.isdir(d) and len(glob.glob(f"{d}/chunk_*.parquet")) == 3):
        os.makedirs(d, exist_ok=True)
        ev = load_table(spark, sf_dir, "events")
        band = (F.col("ts") >= F.lit("2024-01-10").cast("timestamp")) & \
               (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
        early = F.col("ts") < F.lit("2024-01-19").cast("timestamp")
        mid = (~early) & (F.col("ts") < F.lit("2024-01-24").cast("timestamp"))
        late = F.col("ts") >= F.lit("2024-01-24").cast("timestamp")
        parts = [ev.filter(early & ~band), ev.filter(mid), ev.filter(late | band)]
        for i, part in enumerate(parts):
            tmp = f"{d}/__tmp_{i}"
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            src = glob.glob(f"{tmp}/part-*.parquet")[0]
            dst = f"{d}/chunk_{i}.parquet"
            shutil.move(src, dst)
            shutil.rmtree(tmp)
            os.utime(dst, (_time.time() + i, _time.time() + i))

    # append mode: the trailing no-data batch flushes the final closed
    # windows, so ONLY the state width is tuned — never skip_no_data here
    ss = stream_clone(spark, sorted(glob.glob(f"{d}/chunk_*.parquet")),
                      skip_no_data=False)
    schema = ss.read.parquet(f"{d}/chunk_0.parquet").schema
    stream = (
        ss.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(d)
    )
    from predictor_spark.sources.tables import canonical_ts

    stream = canonical_ts(stream)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 6).alias("total_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )
    name = f"stream_late_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return drain_to_caller(spark, ss, name, agg.schema)


def sliding_event_counts(
    spark: SparkSession,
    sf_dir: str,
    window_len: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """OVERLAPPING (sliding) event-time windows: window(ts, 2h, 1h) —
    every event lands in TWO windows, the state store keys on
    (window, event_type) exactly like tumbling but with len/slide copies
    per row.  Completes the window-type matrix (tumbling / session /
    sliding).

    Scale: state per key is bounded by (watermark / slide) open windows;
    the map-side expansion factor is len/slide — the knob that trades
    freshness granularity against state size at 100 TB/day rates."""
    ss = stream_clone(spark, [f"{sf_dir}/events.parquet"],
                      skip_no_data=True)  # complete mode: re-emit only
    stream = _events_stream(ss, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n",
                "total_value")
    )
    name = f"stream_slide_{uuid.uuid4().hex[:8]}"
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
    return drain_to_caller(spark, ss, name, agg.schema)
