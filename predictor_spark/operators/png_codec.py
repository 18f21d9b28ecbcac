"""Pure-stdlib PNG codec for the multimodal decode seam.

The build image carries no image libraries (PIL / libav), so the r1-r4
multimodal decode stage was an honest documented stub.  PNG, however,
needs nothing beyond ``zlib`` + ``struct``: this module implements a
real decoder (chunk walk, IDAT inflate, per-scanline unfilter incl.
Paeth) and a matching encoder (filter-0 scanlines) for 8-bit
greyscale / grey+alpha / RGB / RGBA, non-interlaced — the PNG subset
that covers the reference's image-metadata use
(`app/plugins/…` treats images as opaque payloads; decode happens at
feature-extraction time only).

Production note: this is the correctness seam, not the throughput
path.  On a real cluster the same ``decode_features`` batch loop swaps
in a vectorized codec (PIL-SIMD / nvJPEG) behind ``DECODE_AVAILABLE``;
the Spark-side contract (Arrow batch in, feature frame out) is
identical, which is the point of the seam.

Format reference: the public PNG specification (RFC 2083 / W3C PNG,
section 6 filters, section 9 Paeth predictor).
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (8-bit, non-palette subset)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a PNG -> (width, height, channels, raw pixel bytes).

    Pixel bytes are row-major, ``height * width * channels`` long.
    Raises ValueError on ANY undecodable input — non-PNG, unsupported
    subtypes (palette, 16-bit, interlaced), truncated chunks, and
    corrupt IHDR/IDAT payloads (struct/zlib failures are wrapped, so
    the documented contract holds for external callers too, ADVICE r5)
    — callers surface that as a null-feature row, mirroring how a
    production decode stage routes undecodable payloads to a
    quarantine column instead of failing the job.
    """
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        if pos + 8 + length > len(data):
            raise ValueError("truncated chunk (body shorter than declared length)")
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if ctype == b"IHDR":
            if len(body) < 13:
                raise ValueError("truncated IHDR")
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13])
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width < 0 or not idat:
        raise ValueError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("scanline payload size mismatch")
    out = bytearray(height * stride)
    prev_start = -1
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        o = y * stride
        if f == 0:  # None
            out[o:o + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                left = out[o + x - channels] if x >= channels else 0
                out[o + x] = (line[x] + left) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                up = out[prev_start + x] if y else 0
                out[o + x] = (line[x] + up) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = out[o + x - channels] if x >= channels else 0
                up = out[prev_start + x] if y else 0
                out[o + x] = (line[x] + (left + up) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = out[o + x - channels] if x >= channels else 0
                up = out[prev_start + x] if y else 0
                ul = out[prev_start + x - channels] if (y and x >= channels) else 0
                out[o + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter byte {f}")
        prev_start = o
    return width, height, channels, out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode raw 8-bit pixels -> PNG (filter 0 scanlines). Fixture-side
    inverse of ``decode_png`` so decode tests run on REAL PNG streams."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    if len(pixels) != height * width * channels:
        raise ValueError("pixel buffer size mismatch")
    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride:(y + 1) * stride])
        for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))
