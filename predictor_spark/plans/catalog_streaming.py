"""Catalog part 3 — Structured Streaming queries with batch SQL oracles.

The streaming queries run synchronously (processAllAvailable on a memory
sink) and return batch DataFrames, so the driver's correctness gate treats
them like any other query. Spark's tumbling window(ts, '1 hour') start ==
date_trunc('hour', ts), which makes the batch oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from predictor_spark.plans.catalog import query
from predictor_spark.streaming.windows import sessionized_stream_counts, tumbling_event_counts


@query(
    "streaming_tumbling_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n, round(sum(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling 1h event-time windows per event_type
    (watermarked stateful agg driven to completion on the parquet source)."""
    return tumbling_event_counts(spark, sf_dir, window_len="1 hour", watermark="2 hours")


@query(
    "streaming_session_windows",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events
    FROM (
        SELECT user_id, session_id, count(*) AS n FROM (
            SELECT user_id,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
            FROM (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800.0
                            THEN 1 ELSE 0 END AS is_new
                FROM events
            )
        ) GROUP BY user_id, session_id
    ) GROUP BY user_id
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming session_window(30 min gap) per user — checked
    against the batch lag/cumsum sessionization oracle (same semantics:
    sessions close when the gap exceeds 30 min)."""
    return sessionized_stream_counts(spark, sf_dir, gap="30 minutes")


@query(
    "streaming_late_data_drop",
    oracle="""
    WITH wmF AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events),
    kept AS (
        SELECT * FROM events
        WHERE NOT (ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12')
    )
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n, round(sum(value), 6) AS total_value
    FROM kept
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT w FROM wmF)
    GROUP BY 1, 2
    """,
)
def streaming_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data-drop proof (streaming/windows.py
    late_data_drop_counts): the Jan 10-12 band arrives two micro-batches
    after its event time, finds its hour-windows already evicted by the
    2h watermark, and is dropped; append mode emits only watermark-closed
    windows. The oracle excludes exactly the dropped band and the
    unclosed tail — if Spark ever aggregated a late band row, counts
    would mismatch."""
    from predictor_spark.streaming.windows import late_data_drop_counts

    return late_data_drop_counts(spark, sf_dir, watermark="2 hours")


@query(
    "streaming_dedup_unique",
    oracle="""
    SELECT lang, CAST(count(DISTINCT text) AS BIGINT) AS n_unique
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def streaming_dedup_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time exact dedup: first-seen-wins on (lang, md5(text)) with
    state carried across >=3 micro-batches — the stream replays every
    10th first-band document as an injected "refetch" duplicate two
    batches later, so matching batch COUNT(DISTINCT text) on the RAW
    table proves the cross-batch drops happened. Set-cardinality output
    makes the streaming result deterministic."""
    from predictor_spark.streaming.dedup import stream_dedup_unique_counts

    return stream_dedup_unique_counts(spark, sf_dir).orderBy("lang")


@query(
    "streaming_stream_join",
    oracle="""
    SELECT e1.user_id, e1.event_id AS view_id, e2.event_id AS purchase_id,
           round((epoch_us(e2.ts) - epoch_us(e1.ts)) / 60000000.0, 4) AS lag_min
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 2 HOUR
    WHERE e1.event_type = 'view' AND e2.event_type = 'purchase'
    """,
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (view→purchase attribution
    within 2 h), replayed over 3 chronological micro-batches so
    boundary-straddling pairs prove cross-batch join state; the complete
    batch interval join is the oracle (streaming/joins.py)."""
    from predictor_spark.streaming.joins import view_purchase_attribution

    return view_purchase_attribution(spark, sf_dir, horizon_hours=2)


@query(
    "streaming_static_enrichment",
    oracle="""
    SELECT e.user_id, e.event_id AS purchase_id,
           round((epoch_us(e.ts) - epoch_us(s.signup_ts)) / 60000000.0, 4)
               AS min_since_signup
    FROM events e
    JOIN (SELECT user_id, min(ts) AS signup_ts FROM events
          WHERE event_type = 'signup' GROUP BY user_id) s
      USING (user_id)
    WHERE e.event_type = 'purchase'
    """,
)
def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless stream-static join: purchase stream enriched with the
    broadcast first-signup dimension (streaming/joins.py) — the third
    join mode next to the stream-stream and batch as-of variants."""
    from predictor_spark.streaming.joins import purchases_enriched_with_signup

    return purchases_enriched_with_signup(spark, sf_dir)


@query(
    "streaming_sliding_counts",
    oracle="""
    SELECT win_start, event_type,
           count(*) AS n, round(sum(value), 6) AS total_value
    FROM (
        SELECT date_trunc('hour', ts) - INTERVAL (o) HOUR AS win_start,
               event_type, value
        FROM events CROSS JOIN (VALUES (0), (1)) AS t(o)
    )
    GROUP BY win_start, event_type
    """,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h event-time windows (every event in two windows) —
    the batch oracle expands each event into its two window starts
    (hour-floor minus 0 and 1 hours), which is exactly Spark's
    window(ts, '2 hours', '1 hour') assignment."""
    from predictor_spark.streaming.windows import sliding_event_counts

    return sliding_event_counts(spark, sf_dir)
