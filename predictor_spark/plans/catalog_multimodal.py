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


@query(
    "multimodal_frame_dedup",
    oracle="""
    WITH frames AS (
        SELECT doc_id, frame_idx,
               md5(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS h
        FROM documents,
             LATERAL (SELECT unnest(range(0, greatest(1,
                          octet_length(encode(text)) // 64))) AS frame_idx)
    ),
    dup AS (
        SELECT h FROM frames GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT f.doc_id,
           count(*) AS n_frames,
           CAST(count(*) FILTER (f.h IN (SELECT h FROM dup)) AS BIGINT)
               AS n_dup_frames,
           round(CAST(count(*) FILTER (f.h IN (SELECT h FROM dup)) AS DOUBLE)
                 / count(*), 6) AS dup_ratio
    FROM frames f GROUP BY f.doc_id
    """,
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-asset frame-level dedup: hash every sampled 64-byte frame,
    mark frames whose hash occurs in ≥2 distinct assets, report per-asset
    duplicated-frame ratios — the video analog of document near-dup
    (stock-footage / intro-sequence detection).  Payload slices are ASCII
    text bytes here, so the byte-substring and the oracle's char-substr
    agree.

    Scale: frame hashing is map-side (only 16-byte hashes shuffle);
    the duplicate set is one groupBy + a left-semi mark; per-asset
    ratios are one more partial agg on the asset key.
    """
    from predictor_spark.operators.multimodal import attach_payload, frame_hashes

    docs = _t(spark, sf_dir, "documents")
    frames = frame_hashes(attach_payload(docs), every_n_bytes=64)
    dup = (
        frames.groupBy("frame_md5")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("frame_md5")
    )
    marked = frames.join(
        dup.withColumnRenamed("frame_md5", "dup_md5"),
        F.col("frame_md5") == F.col("dup_md5"), "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.when(F.col("dup_md5").isNotNull(), 1).otherwise(0))
            .cast("bigint").alias("n_dup_frames"),
            F.round(
                F.sum(F.when(F.col("dup_md5").isNotNull(), 1.0).otherwise(0.0))
                / F.count(F.lit(1)), 6).alias("dup_ratio"),
        )
    )
