"""Container-level multimodal codec tests (the Spark-side path is gated by
the ext_multimodal_features oracle; these pin the writers/parsers alone)."""

from __future__ import annotations

import struct

import pytest

from etl_airflow_adventureworks_spark.operators.multimodal import (
    decode_media,
    make_ppm,
    make_wav,
)


@pytest.mark.parametrize("n", [0, 1, 2, 7, 8, 255])
def test_wav_roundtrip_any_length(n):
    pcm = bytes(range(n % 256))[:n] or b""
    wav = make_wav(pcm)
    # spec conformance: total size is even and RIFF size == file size - 8
    assert len(wav) % 2 == 0
    assert struct.unpack("<I", wav[4:8])[0] == len(wav) - 8
    data, meta = decode_media(wav, "audio/wav")
    assert data == pcm
    assert meta["sample_rate"] == 8000 and meta["n_samples"] == n


def test_wav_odd_chunk_pad_allows_trailing_chunk():
    """The round-2 advice case: with the pad byte, a chunk appended AFTER
    an odd-sized data chunk still parses (word-aligned walk stays in
    sync); without it the reader would mis-parse the next chunk id."""
    pcm = b"\x01\x02\x03"  # odd
    wav = make_wav(pcm) + b"LIST" + struct.pack("<I", 4) + b"INFO"
    data, _ = decode_media(wav, "audio/wav")
    assert data == pcm


def test_ppm_roundtrip():
    pixels = bytes(2 * 3 * 3)
    ppm = make_ppm(2, 3, pixels)
    data, meta = decode_media(ppm, "image/x-portable-pixmap")
    assert data == pixels and (meta["width"], meta["height"]) == (2, 3)


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")
