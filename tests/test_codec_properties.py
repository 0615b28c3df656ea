"""Property tests for the round-13 real container codecs: encode →
decode must be the identity for arbitrary payload shapes (pure-numpy
kernels — no Spark session needed, so examples are cheap), and the
driver-side tokenizer twin must agree with the Spark pair on
arbitrary text (the corpus-wide parity test pins real data; this
pins generated edge cases driver-side for the deterministic half —
collapse/strip/split round-trip invariants)."""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from capital.llm.multimodal import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    decode_y4m_frames,
    encode_bmp,
    encode_ppm,
    encode_wav,
    encode_y4m,
)
from capital.llm.text import py_tokens

_fast = settings(max_examples=40, deadline=None)


@st.composite
def _image(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


@_fast
@given(_image())
def test_ppm_bmp_round_trip_property(img):
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@_fast
@given(
    st.integers(1, 500),
    st.integers(1, 2),
    st.integers(8000, 48000),
    st.integers(0, 2**31 - 1),
)
def test_wav_round_trip_property(n, ch, rate, seed):
    s = np.random.default_rng(seed).integers(
        -32768, 32768, size=(n, ch), dtype=np.int16
    )
    got_rate, dec = decode_wav(encode_wav(s if ch > 1 else s[:, 0], rate))
    assert got_rate == rate
    assert np.array_equal(dec, s)


@_fast
@given(st.integers(1, 6), st.integers(1, 8), st.integers(1, 8),
       st.integers(0, 2**31 - 1))
def test_y4m_round_trip_property(nf, hw, ww, seed):
    h, w = hw * 2, ww * 2  # C420 needs even dims
    frames = np.random.default_rng(seed).integers(
        0, 256, size=(nf, h, w), dtype=np.uint8
    )
    gw, gh, dec = decode_y4m_frames(encode_y4m(frames))
    assert (gw, gh, len(dec)) == (w, h, nf)
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))


@_fast
@given(st.text(alphabet=st.sampled_from(" \t\nabcXYZ09.!"), max_size=80))
def test_py_tokens_invariants(text):
    """ASCII-regime invariants of the tokenizer twin: tokens contain
    no whitespace, reconstruct the collapsed lowercase text, and the
    function is idempotent under re-joining."""
    toks = py_tokens(text)
    joined = " ".join(toks)
    collapsed = re.sub(r"\s+", " ", text.lower(), flags=re.ASCII).strip()
    assert joined == collapsed
    if toks != [""]:
        assert all(t and not re.search(r"\s", t) for t in toks)
    assert py_tokens(joined) == toks


@_fast
@given(_image(), st.one_of(st.none(), st.integers(0, 4)))
def test_png_round_trip_property(img, ft):
    """PNG (zlib + all five scanline filters) must round-trip any RGB
    raster byte-exactly — per-row filters (ft=None → row % 5) and each
    pinned filter type."""
    from capital.llm.multimodal import decode_png, encode_png

    assert np.array_equal(decode_png(encode_png(img, ft)), img)


@_fast
@given(_image(), st.integers(8, 200))
def test_png_truncation_and_corruption_raise_value_error(img, cut):
    """Truncated-after-signature and bit-flipped PNGs must surface as
    ValueError (CRC walk + dead-letter contract), never struct/zlib
    errors."""
    import pytest

    from capital.llm.multimodal import decode_png, encode_png

    data = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(data[: min(cut, len(data) - 1)])
    flipped = bytearray(data)
    flipped[len(flipped) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(flipped))


@st.composite
def _gray_blocks(draw):
    bh = draw(st.integers(1, 4))
    bw = draw(st.integers(1, 4))
    seed = draw(st.integers(0, 2**31 - 1))
    blocks = np.random.default_rng(seed).integers(0, 256, size=(bh, bw))
    return np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


@_fast
@given(_gray_blocks())
def test_jpeg_block_constant_round_trip_is_exact(img):
    """Baseline JPEG at quant 1 must round-trip 8x8-block-constant
    grayscale rasters BYTE-exactly (AC = 0, integer DC path) — the
    subspace the mm_jpeg_decode_real oracle lives in, across long DC
    prediction chains."""
    from capital.llm.multimodal import decode_jpeg_gray, encode_jpeg_gray

    assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(img)), img)


@st.composite
def _gray_image(draw):
    h = draw(st.integers(1, 40))
    w = draw(st.integers(1, 40))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8
    )


@_fast
@given(_gray_image())
def test_jpeg_round_trip_near_lossless_any_shape(img):
    """At quant 1 the only loss is DCT float rounding: any grayscale
    raster (odd dims exercise edge-replication padding + crop) must
    round-trip within +/-2 grey levels, exercising the AC run-length
    path for real."""
    from capital.llm.multimodal import decode_jpeg_gray, encode_jpeg_gray

    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


@_fast
@given(_gray_image(), st.integers(4, 120))
def test_jpeg_truncation_and_corruption_raise_value_error(img, cut):
    """Truncated / header-corrupted JPEG streams must surface as
    ValueError (the dead-letter contract), never struct errors or
    silent garbage from the Huffman walk."""
    import pytest

    from capital.llm.multimodal import decode_jpeg_gray, encode_jpeg_gray

    data = encode_jpeg_gray(img)
    with pytest.raises(ValueError):
        decode_jpeg_gray(data[: min(cut, len(data) - 1)])


def test_jpeg_coarse_quant_degrades_gracefully():
    """A realistic coarse quant table stays a VALID stream whose
    decode is close on smooth content (the lossy regime the codec is
    for) — mean error small on a gradient, exact nowhere required."""
    from capital.llm.multimodal import decode_jpeg_gray, encode_jpeg_gray

    q = np.full(64, 16, dtype=np.int64)
    q[0] = 8
    x = np.linspace(0, 255, 48)
    img = (x[None, :] * np.ones((24, 1))).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img, quant=q))
    assert out.shape == img.shape
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 8.0


def test_jpeg_unsupported_features_raise():
    """Progressive/multi-component/restart markers are the documented
    seam: explicit ValueError, not misdecoding."""
    import pytest

    from capital.llm.multimodal import decode_jpeg_gray, encode_jpeg_gray

    data = bytearray(encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(data))


def test_jpeg_short_declared_segment_length_is_value_error():
    """A segment whose declared length leaves a too-short body (e.g.
    SOF0 length 3 -> 1-byte body) hits fixed-offset unpacks — must
    surface as ValueError for the dead-letter catch, never
    struct.error/IndexError (round-16 ADVICE pin)."""
    import pytest

    from capital.llm.multimodal import decode_jpeg_gray

    # SOI + SOF0 with declared length 3 (one body byte), then EOI.
    data = b"\xff\xd8" + b"\xff\xc0\x00\x03\x08" + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg_gray(data)
    # DHT with a bits table that overruns the declared body.
    data = b"\xff\xd8" + b"\xff\xc4\x00\x04\x00\x01" + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg_gray(data)


def test_jpeg_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2 permits any number of 0xFF fill bytes before a
    marker code; a legal stream padded that way must decode to the
    same raster (round-16 ADVICE pin)."""
    from capital.llm.multimodal import decode_jpeg_gray, encode_jpeg_gray

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) // 8 * 8 + 16)
    data = encode_jpeg_gray(img)
    # Insert fill bytes immediately before the SOF0 and DHT markers
    # (safe spots: between segments, never inside a body).
    padded = data
    for marker in (b"\xff\xc0", b"\xff\xc4", b"\xff\xdb"):
        i = padded.find(marker)
        assert i > 0
        padded = padded[:i] + b"\xff\xff\xff" + padded[i:]
    assert np.array_equal(decode_jpeg_gray(bytes(padded)), img)
