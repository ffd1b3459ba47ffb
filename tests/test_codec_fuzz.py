"""Property-based fuzz (hypothesis) for the pure-Python media codecs:
whatever bytes go in, the container round-trips exactly — including the
odd-length pad path — and the parsers never mis-read a length field."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_airflow_adventureworks_spark.operators.multimodal import (
    decode_media,
    make_ppm,
    make_wav,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_wav_roundtrip_fuzz(pcm):
    wav = make_wav(pcm)
    assert len(wav) % 2 == 0  # RIFF word alignment
    assert struct.unpack("<I", wav[4:8])[0] == len(wav) - 8
    data, meta = decode_media(wav, "audio/wav")
    assert data == pcm
    assert meta["n_samples"] == len(pcm)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_wav_roundtrip_with_trailing_chunk_fuzz(pcm):
    # pad byte must keep the chunk walk in sync past an odd data chunk
    wav = make_wav(pcm) + b"LIST" + struct.pack("<I", 4) + b"INFO"
    data, _ = decode_media(wav, "audio/wav")
    assert data == pcm


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=1, max_value=32),
    st.data(),
)
def test_ppm_roundtrip_fuzz(w, h, data):
    pixels = data.draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    out, meta = decode_media(make_ppm(w, h, pixels), "image/x-portable-pixmap")
    assert out == pixels and (meta["width"], meta["height"]) == (w, h)
