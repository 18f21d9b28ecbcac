"""Catalog part — audio decode through the REAL WAV codec (STAGED r8).

The r5 PNG codec made image decode real but stayed pytest-only (no
SQL engine can parse PNG).  Audio goes one better: because the test
payloads are CONSTRUCTED from a closed-form integer sample formula,
the DuckDB oracle can predict every feature without parsing a byte —
while the Spark side must round-trip the actual bytes through
``encode_wav`` -> ``decode_wav`` (operators/wav_codec.py).  A codec
bug of any kind (header layout, chunk walk, sample unpack, channel
interleave) desynchronizes the two and fails the hash gate — this is
an oracle-backed REAL-decode row, not a fake-feature row.

- audio_wav_roundtrip_features  per-doc WAV synth -> real decode ->
                                (rate, channels, frames, duration,
                                rms, peak)

Sample formula (shared literal): s_k = ((doc_id*7919 + k*104729) %
20001) - 10000 for k in 0..n-1, n = (80 + doc_id%40) * channels,
channels = 1 + doc_id%2, rate = 8000 * (1 + doc_id%3).

Scale: encode+decode run inside ONE mapInPandas pass per batch (the
bytes never leave the worker); features are O(1) per doc.  At 100 TB
the encode half disappears (payloads come from storage) and the
decode half is exactly ``decode_audio_features``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

_N_DOCS = 100


@query(
    "audio_wav_roundtrip_features",
    oracle=f"""
    WITH params AS (
        SELECT doc_id,
               8000 * (1 + doc_id % 3) AS sample_rate,
               CAST(1 + doc_id % 2 AS INTEGER) AS channels,
               80 + doc_id % 40 AS n_frames
        FROM documents WHERE doc_id < {_N_DOCS}
    ),
    feats AS (
        SELECT doc_id, sample_rate, channels, n_frames,
               list_transform(range(0, n_frames * channels),
                   k -> (doc_id * 7919 + k * 104729) % 20001 - 10000) AS s
        FROM params
    )
    SELECT doc_id, TRUE AS decoded,
           CAST(sample_rate AS INTEGER) AS sample_rate, channels,
           CAST(n_frames AS BIGINT) AS n_frames,
           round(1000.0 * n_frames / sample_rate, 6) AS duration_ms,
           round(sqrt(CAST(list_sum(list_transform(s, x -> x * x))
                           AS DOUBLE) / len(s)) / 32768.0, 6) AS rms,
           round(CAST(list_max(list_transform(s, x -> abs(x)))
                      AS DOUBLE) / 32768.0, 6) AS peak
    FROM feats ORDER BY doc_id
    """,
)
def audio_wav_roundtrip_features(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Synthesize one canonical PCM16 WAV per doc from the shared
    integer sample formula, then decode it with the REAL codec and
    emit the feature row — the oracle recomputes the same features
    closed-form, so the byte round-trip is what's actually graded.

    Scale: one mapInPandas stage; the payload exists only inside the
    worker loop (at 100 TB swap the synth for the storage payload
    column and this IS decode_audio_features)."""
    import math
    from typing import Iterator

    import pandas as pd

    from predictor_spark.shiplib import ensure_workers_can_import

    docs = (_t(spark, sf_dir, "documents")
            .select("doc_id").where(F.col("doc_id") < _N_DOCS))

    schema = ("doc_id bigint, decoded boolean, sample_rate int, "
              "channels int, n_frames bigint, duration_ms double, "
              "rms double, peak double")

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from predictor_spark.operators.wav_codec import (decode_wav,
                                                         encode_wav)

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                rate = 8000 * (1 + i % 3)
                ch = 1 + i % 2
                n = (80 + i % 40) * ch
                samples = [(i * 7919 + k * 104729) % 20001 - 10000
                           for k in range(n)]
                # the REAL round-trip: any codec bug desyncs the oracle
                r_rate, r_ch, r_samples = decode_wav(
                    encode_wav(rate, ch, samples))
                n_frames = len(r_samples) // r_ch
                sq = 0
                peak = 0
                for s in r_samples:
                    sq += s * s
                    if abs(s) > peak:
                        peak = abs(s)
                rows.append((
                    i, True, r_rate, r_ch, n_frames,
                    round(1000.0 * n_frames / r_rate, 6),
                    round(math.sqrt(sq / len(r_samples)) / 32768.0, 6),
                    round(peak / 32768.0, 6)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "decoded", "sample_rate", "channels",
                "n_frames", "duration_ms", "rms", "peak"])

    ensure_workers_can_import(spark)
    return docs.mapInPandas(synth_decode, schema).orderBy("doc_id")
