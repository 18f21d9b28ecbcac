"""Catalog part 4 — multimodal binary-column plumbing.

The mapInPandas decode stage uses a deterministic md5-derived fake feature
vector (codecs absent in this container), which makes even the
Python/Arrow path oracle-checkable: DuckDB recomputes the same features
from md5 hex arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.operators.multimodal import attach_payload, decode_features, sample_frames
from predictor_spark.plans.catalog import query, _t


@query(
    "multimodal_ingest_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           'application/octet-stream' AS mime
    FROM documents
    """,
)
def multimodal_ingest_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload ingestion: opaque payload + typed metadata struct.
    Metadata-only projection never touches payload bytes at scan time
    (parquet column pruning)."""
    docs = _t(spark, sf_dir, "documents")
    out = attach_payload(docs)
    return out.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.content_md5").alias("content_md5"),
        F.col("media_meta.mime").alias("mime"),
    )


@query(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           round(CAST(('0x' || substr(md5(text), 1, 7))  AS BIGINT) / 268435456.0, 6) AS f0,
           round(CAST(('0x' || substr(md5(text), 8, 7))  AS BIGINT) / 268435456.0, 6) AS f1,
           round(CAST(('0x' || substr(md5(text), 15, 7)) AS BIGINT) / 268435456.0, 6) AS f2,
           round(CAST(('0x' || substr(md5(text), 22, 7)) AS BIGINT) / 268435456.0, 6) AS f3
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of binary
    payloads — the real decode seam (stubbed deterministic features; see
    operators/multimodal.py)."""
    docs = _t(spark, sf_dir, "documents")
    return decode_features(attach_payload(docs))


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(frame_idx * 64 AS BIGINT) AS byte_offset
    FROM documents,
         LATERAL (SELECT unnest(range(0, greatest(1, octet_length(encode(text)) // 64))) AS frame_idx)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled byte offset (video
    frame-sample analog); relational explode, decode happens downstream."""
    docs = _t(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs), every_n_bytes=64)
