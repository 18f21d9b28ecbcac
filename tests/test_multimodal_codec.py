"""Real image decode through the multimodal seam (r4 verdict #5).

The pure-stdlib PNG codec is tested two ways: (1) codec-level
round-trips over every supported color type and every filter the
encoder/decoder pair can express (incl. a hand-filtered Sub/Up/Avg/
Paeth stream so the decoder's unfilter arms are each exercised against
an independently computed expectation), and (2) end-to-end through
``decode_image_features``' mapInPandas path on a Spark DataFrame whose
payload column carries REAL PNG bytes, with the quarantine row for
undecodable payloads."""

from __future__ import annotations

import struct
import zlib

import pytest

from predictor_spark.operators.png_codec import (decode_png, encode_png,
                                                 is_png)


def _gradient(w: int, h: int, c: int) -> bytes:
    return bytes(((x * 7 + y * 13 + ch * 29) % 256)
                 for y in range(h) for x in range(w) for ch in range(c))


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    w, h = 13, 9  # deliberately non-square, odd sizes
    px = _gradient(w, h, channels)
    data = encode_png(w, h, channels, px)
    assert is_png(data)
    rw, rh, rc, rpx = decode_png(data)
    assert (rw, rh, rc) == (w, h, channels)
    assert bytes(rpx) == px


def test_png_decoder_unfilters_sub_up_avg_paeth():
    """Build an IDAT stream with one scanline per filter type, filtered
    by an independent straightforward forward-filter implementation, and
    assert the decoder reconstructs the original pixels exactly."""
    w, c = 6, 3
    rows = [_gradient(w, 1, c), _gradient(w, 2, c)[w * c:],
            bytes((i * 31) % 256 for i in range(w * c)),
            bytes((i * 17 + 5) % 256 for i in range(w * c)),
            bytes((255 - i * 3) % 256 for i in range(w * c))]

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)

    filtered = bytearray()
    for y, (ftype, row) in enumerate(zip([0, 1, 2, 3, 4], rows)):
        prev = rows[y - 1] if y else bytes(w * c)
        filtered.append(ftype)
        for x in range(w * c):
            left = row[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: paeth(left, up, ul)}[ftype]
            filtered.append((row[x] - pred) & 0xFF)

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, len(rows), 8, 2, 0, 0, 0)
    data = sig + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(bytes(filtered))) + chunk(b"IEND", b"")
    rw, rh, rc, rpx = decode_png(data)
    assert (rw, rh, rc) == (w, len(rows), c)
    assert bytes(rpx) == b"".join(rows)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"GIF89a not a png")
    # 16-bit depth
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"
    raw = (sig + struct.pack(">I", 13) + b"IHDR" + bad_ihdr
           + struct.pack(">I", zlib.crc32(b"IHDR" + bad_ihdr) & 0xFFFFFFFF))
    with pytest.raises(ValueError):
        decode_png(raw)


def test_decode_image_features_real_png_e2e(spark):
    from predictor_spark.operators.multimodal import decode_image_features

    w, h, c = 8, 4, 3
    px = _gradient(w, h, c)
    png = encode_png(w, h, c, px)
    expected_lum = round(sum(px) / (len(px) * 255.0), 6)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not an image"))],
        "doc_id bigint, payload binary")
    out = {r["doc_id"]: r.asDict()
           for r in decode_image_features(df).collect()}
    assert out[1] == {"doc_id": 1, "decoded": True, "width": w, "height": h,
                      "channels": c, "mean_lum": expected_lum}
    assert out[2] == {"doc_id": 2, "decoded": False, "width": None,
                      "height": None, "channels": None, "mean_lum": None}
