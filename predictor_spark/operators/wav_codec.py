"""Pure-stdlib RIFF/WAVE codec for the multimodal audio-decode seam.

The build image carries no audio libraries (torchaudio / soundfile /
libav), so the audio half of the multimodal decode stage rode the
documented deterministic fake.  Canonical PCM WAVE, however, needs
nothing beyond ``struct``: this module implements a real decoder
(RIFF chunk walk, fmt validation, PCM sample unpack) and a matching
encoder for 16-bit integer PCM, 1-2 channels — the WAV subset every
recording pipeline emits (the reference treats audio as opaque
payloads; decode happens at feature-extraction time only, same as
images).

Production note: this is the correctness seam, not the throughput
path.  On a real cluster the same batch loop swaps in a vectorized
codec (libsndfile / ffmpeg bindings) behind ``DECODE_AVAILABLE``;
the Spark-side contract (Arrow batch in, feature frame out) is
identical — the point of the seam.

Format reference: the public RIFF/WAVE specification (Microsoft/IBM
Multimedia Programming Interface and Data Specifications 1.0, 1991;
canonical fmt/data chunk layout).
"""

from __future__ import annotations

import struct

_PCM = 1  # WAVE_FORMAT_PCM


def is_wav(data: bytes) -> bool:
    data = bytes(data)
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(sample_rate: int, channels: int,
               samples: list[int] | tuple[int, ...]) -> bytes:
    """Encode interleaved 16-bit PCM samples into a canonical WAV.

    ``samples`` is the flat interleaved frame stream (len must be a
    multiple of ``channels``); values must fit int16."""
    if channels not in (1, 2):
        raise ValueError(f"unsupported channel count {channels}")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of int16 range")
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", _PCM, channels, sample_rate, byte_rate,
                      block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a canonical PCM WAV -> (sample_rate, channels, samples).

    ``samples`` is the flat interleaved int16 stream.  Raises
    ValueError on ANY undecodable input — non-RIFF/WAVE payloads,
    non-PCM or non-16-bit formats, truncated chunks, and a data chunk
    shorter than its declared length (struct failures are wrapped, so
    the documented contract holds for external callers too — the
    lesson of the PNG codec's ADVICE r5 item).  Callers surface that
    as a quarantine row, never a task failure.
    """
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE payload")
    try:
        riff_len = struct.unpack_from("<I", data, 4)[0]
    except struct.error as exc:
        raise ValueError(f"corrupt RIFF header: {exc}") from exc
    if riff_len + 8 > len(data):
        raise ValueError("RIFF length exceeds payload")
    pos, end = 12, 8 + riff_len
    fmt_seen = None
    samples: list[int] | None = None
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        try:
            clen = struct.unpack_from("<I", data, pos + 4)[0]
        except struct.error as exc:
            raise ValueError(f"corrupt chunk header: {exc}") from exc
        body_start = pos + 8
        if body_start + clen > end:
            raise ValueError(f"chunk {cid!r} truncated "
                             f"({clen} bytes declared)")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, body_start)
            if tag != _PCM:
                raise ValueError(f"unsupported format tag {tag}")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
            if channels not in (1, 2):
                raise ValueError(f"unsupported channel count {channels}")
            fmt_seen = (rate, channels)
        elif cid == b"data":
            if fmt_seen is None:
                raise ValueError("data chunk before fmt chunk")
            if clen % 2:
                raise ValueError("odd data chunk length for 16-bit PCM")
            if clen % (fmt_seen[1] * 2):
                raise ValueError("data length not a whole frame count")
            samples = list(struct.unpack_from(f"<{clen // 2}h",
                                              data, body_start))
        # chunks are word-aligned: odd lengths carry a pad byte
        pos = body_start + clen + (clen & 1)
    if fmt_seen is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return fmt_seen[0], fmt_seen[1], samples
