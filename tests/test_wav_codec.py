"""Real audio decode through the multimodal seam (the audio analog of
the r5 PNG codec work).

The pure-stdlib WAV codec is tested three ways: (1) round-trips over
mono/stereo and several rates, (2) cross-checked against the stdlib
``wave`` module as an INDEPENDENT implementation of the same spec
(both directions: our bytes parsed by ``wave``, ``wave``-built bytes
parsed by us), and (3) end-to-end through ``decode_audio_features``'
mapInPandas path on a Spark DataFrame whose payload column carries
REAL WAV bytes, with quarantine rows for undecodable payloads."""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from predictor_spark.operators.wav_codec import decode_wav, encode_wav, is_wav


def _sine_pcm(n: int, period: int = 25, amp: int = 12000) -> list[int]:
    return [int(amp * math.sin(2 * math.pi * k / period)) for k in range(n)]


class TestCodec:
    @pytest.mark.parametrize("channels,rate", [(1, 8000), (2, 16000),
                                               (1, 44100), (2, 48000)])
    def test_roundtrip(self, channels, rate):
        samples = _sine_pcm(240 * channels)
        data = encode_wav(rate, channels, samples)
        assert is_wav(data)
        r_rate, r_ch, r_samples = decode_wav(data)
        assert (r_rate, r_ch) == (rate, channels)
        assert r_samples == samples

    def test_wave_module_reads_our_bytes(self):
        samples = _sine_pcm(300)
        data = encode_wav(22050, 1, samples)
        with wave.open(io.BytesIO(data)) as w:
            assert w.getframerate() == 22050
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            raw = w.readframes(w.getnframes())
        assert list(struct.unpack(f"<{len(samples)}h", raw)) == samples

    def test_we_read_wave_module_bytes(self):
        samples = _sine_pcm(256, period=17)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(32000)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        rate, ch, got = decode_wav(buf.getvalue())
        assert (rate, ch) == (32000, 2)
        assert got == samples

    def test_empty_data_chunk_is_valid(self):
        data = encode_wav(8000, 1, [])
        rate, ch, samples = decode_wav(data)
        assert (rate, ch, samples) == (8000, 1, [])

    @pytest.mark.parametrize("mutate", [
        lambda d: d[:20],                      # truncated mid-fmt
        lambda d: b"RIFX" + d[4:],             # wrong magic
        lambda d: d[:8] + b"EVAW" + d[12:],    # wrong form type
        lambda d: d[:40] + b"\x00" * 2,        # data shorter than declared
        lambda d: d.replace(b"fmt ", b"fmtX"),  # fmt chunk missing
    ])
    def test_undecodable_raises_valueerror(self, mutate):
        data = encode_wav(8000, 1, _sine_pcm(64))
        with pytest.raises(ValueError):
            decode_wav(mutate(data))

    def test_nonpcm_and_bad_depth_rejected(self):
        data = bytearray(encode_wav(8000, 1, _sine_pcm(16)))
        fmt_at = data.index(b"fmt ") + 8
        bad_tag = bytes(data[:fmt_at]) + struct.pack("<H", 3) \
            + bytes(data[fmt_at + 2:])
        with pytest.raises(ValueError):
            decode_wav(bad_tag)
        bad_bits = bytes(data[:fmt_at + 14]) + struct.pack("<H", 8) \
            + bytes(data[fmt_at + 16:])
        with pytest.raises(ValueError):
            decode_wav(bad_bits)

    def test_odd_chunk_padding_walk(self):
        """A LIST chunk with odd length before data must be skipped via
        the word-alignment pad byte."""
        samples = _sine_pcm(32)
        data = encode_wav(8000, 1, samples)
        # splice an odd-length junk chunk right after the fmt chunk
        fmt_end = data.index(b"data")
        junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        spliced = data[:fmt_end] + junk + data[fmt_end:]
        spliced = (spliced[:4]
                   + struct.pack("<I", len(spliced) - 8)
                   + spliced[8:])
        rate, ch, got = decode_wav(spliced)
        assert got == samples


class TestSparkSeam:
    def test_decode_audio_features_end_to_end(self, spark):
        from pyspark.sql import functions as F

        from predictor_spark.operators.multimodal import (
            decode_audio_features)

        rows = []
        for doc_id in range(6):
            if doc_id == 4:
                payload = b"not audio at all"
            elif doc_id == 5:
                payload = encode_wav(8000, 1, [])  # zero frames: valid
            else:
                ch = 1 + (doc_id % 2)
                payload = encode_wav(8000 * (1 + doc_id % 3), ch,
                                     _sine_pcm(120 * ch, period=20 + doc_id))
            rows.append((doc_id, payload))
        df = spark.createDataFrame(rows, "doc_id bigint, payload binary")

        got = {r["doc_id"]: r for r in
               decode_audio_features(df).collect()}
        assert len(got) == 6
        assert got[4]["decoded"] is False and got[4]["rms"] is None
        assert got[5]["decoded"] is True and got[5]["n_frames"] == 0
        assert got[5]["rms"] is None  # zero-frame: valid decode, null rms
        for doc_id in (0, 1, 2, 3):
            ch = 1 + (doc_id % 2)
            samples = _sine_pcm(120 * ch, period=20 + doc_id)
            rate = 8000 * (1 + doc_id % 3)
            r = got[doc_id]
            assert r["decoded"] is True
            assert r["sample_rate"] == rate and r["channels"] == ch
            assert r["n_frames"] == 120
            assert r["duration_ms"] == pytest.approx(
                1000.0 * 120 / rate, abs=1e-5)
            rms = math.sqrt(sum(s * s for s in samples)
                            / len(samples)) / 32768.0
            assert r["rms"] == pytest.approx(rms, abs=1e-6)
            assert r["peak"] == pytest.approx(
                max(abs(s) for s in samples) / 32768.0, abs=1e-6)
        # a second call returns the same frame (stateless seam)
        again = {r["doc_id"]: r for r in decode_audio_features(df).collect()}
        assert again == got