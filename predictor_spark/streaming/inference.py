"""Streaming model inference via foreachBatch — the M7 closing piece
(SURVEY §7: "foreachBatch inference").

Pattern: train in batch (per-series AR(1) coefficients, one aggregate
pass), then score an incoming stream by broadcast-joining the tiny
coefficient table onto each micro-batch inside ``foreachBatch`` and
appending scored rows to the sink. This is the canonical
Structured-Streaming serving topology: the model is a DataFrame, scoring
is a projection, and each micro-batch costs one broadcast join — no
Python loop, no state store.

The stream replays the events table chronologically (time-chunk files,
one per trigger — streaming/stateful.py harness), so results are
deterministic and equal to batch scoring, which is what the oracle
checks.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T


def stream_score_ar1(
    spark: SparkSession,
    sf_dir: str,
    train_end: str = "2024-01-22 00:00:00",
    n_chunks: int = 4,
) -> DataFrame:
    """Fit AR(1) per user on the train slice (batch), then score every
    held-out event from a chronological stream via foreachBatch broadcast
    joins. Returns the scored rows (user_id, ts, event_type, value, pred).
    """
    from predictor_spark.sources.tables import load_table
    from predictor_spark.streaming.stateful import _chunked_stream_dir

    cutoff = F.lit(train_end).cast("timestamp")
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "ts", "value",
        F.lead("value", 1).over(
            Window.partitionBy("user_id").orderBy("ts")
        ).alias("target"),
    ).filter(F.col("target").isNotNull())
    coeffs = (
        base.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(
            F.regr_slope("target", "value").alias("slope"),
            F.regr_intercept("target", "value").alias("intercept"),
        )
        .filter(F.col("slope").isNotNull())
    )

    src = _chunked_stream_dir(spark, sf_dir, n_chunks,
                              cols=("ts", "user_id", "value", "event_type"))
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("event_type", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .filter(F.col("ts") >= cutoff)
    )
    out_dir = tempfile.mkdtemp(prefix=f"stream_score_{uuid.uuid4().hex[:8]}_")

    def score(batch_df: DataFrame, batch_id: int) -> None:
        scored = (
            batch_df.join(F.broadcast(coeffs), "user_id")
            .withColumn("pred", F.col("intercept") + F.col("slope") * F.col("value"))
            .select("user_id", "ts", "event_type", "value", "pred")
        )
        scored.write.mode("append").parquet(out_dir)

    q = stream.writeStream.foreachBatch(score).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(out_dir)
    # materialize before the temp dir can be cleaned up by the caller
    out = out.localCheckpoint()
    shutil.rmtree(out_dir, ignore_errors=True)
    return out
