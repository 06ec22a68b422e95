"""Unit tests: IBM32 codec (golden words), text header, binary header,
trace header pack/unpack — the reference's unit-test tier (SURVEY §5.1).
"""

from __future__ import annotations

import numpy as np
import pytest

from mdio_python_spark.sources import segy_codec as codec

# Public golden IBM32 encodings
IBM_GOLDENS = [
    (0x41100000, 1.0),
    (0xC1100000, -1.0),
    (0x40280000, 0.15625),
    (0x42764000, 118.25),
    (0xC276A000, -118.625),
    (0x00000000, 0.0),
]


@pytest.mark.parametrize("word,value", IBM_GOLDENS)
def test_ibm32_decode_goldens(word, value):
    got = codec.ibm32_to_ieee(np.array([word], dtype=np.uint32))[0]
    assert got == pytest.approx(value, abs=1e-12)


@pytest.mark.parametrize("word,value", IBM_GOLDENS)
def test_ibm32_encode_goldens(word, value):
    got = codec.ieee_to_ibm32(np.array([value]))[0]
    assert int(got) == word


def test_ibm32_roundtrip_random_float32():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(10_000) * np.power(10.0, rng.integers(-6, 7, 10_000))).astype(
        np.float32
    )
    words = codec.ieee_to_ibm32(x)
    back = codec.ibm32_to_ieee(words).astype(np.float32)
    # IBM32 has 21-24 effective fraction bits: relative error < 2^-20
    nz = x != 0
    rel = np.abs((back[nz] - x[nz]) / x[nz])
    assert rel.max() < 2**-20


def test_ibm32_double_roundtrip_is_byte_stable():
    """decode -> float32 -> encode must reproduce the original words
    (the byte-identical export path for IBM SEG-Ys)."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal(10_000).astype(np.float32)
    w1 = codec.ieee_to_ibm32(x)
    f = codec.ibm32_to_ieee(w1).astype(np.float32)
    w2 = codec.ieee_to_ibm32(f)
    assert np.array_equal(w1, w2)


def test_text_header_sanitize_and_validate():
    dirty = "C01 HELLO\n\n\nROW WITH \x07 BELL" + "X" * 200
    clean = codec.sanitize_text_header(dirty)
    codec.validate_text_header(clean)
    rows = clean.split("\n")
    assert len(rows) == 40
    assert all(len(r) == 80 for r in rows)
    assert "\x07" not in clean


def test_text_header_ebcdic_roundtrip():
    text = codec.sanitize_text_header("C01 CLIENT AREA\nC02 SURVEY")
    raw = codec.encode_text_header(text)
    assert len(raw) == 3200
    assert codec.decode_text_header(raw) == text


def test_binary_header_roundtrip():
    values = {
        "sample_interval": 2000,
        "samples_per_trace": 1501,
        "data_format": 1,
        "measurement_system": 2,
        "segy_revision": codec.encode_segy_revision(1, 0),
    }
    raw = codec.encode_binary_header(values)
    assert len(raw) == 400
    decoded = codec.decode_binary_header(raw)
    for k, v in values.items():
        assert decoded[k] == v
    assert decoded["segy_revision"] == 256  # (1<<8)|0


def test_trace_header_pack_unpack():
    n = 5
    vals = {
        "inline": np.arange(1, n + 1),
        "crossline": np.arange(10, 10 + n),
        "coordinate_scalar": np.full(n, -100),
        "cdp_x": np.arange(700001, 700001 + n),
    }
    raw = codec.encode_trace_headers(vals, n)
    assert raw.shape == (n, 240)
    decoded = codec.decode_trace_headers(raw, list(vals))
    for k, v in vals.items():
        assert np.array_equal(decoded[k], v)


def test_sample_codec_formats():
    rng = np.random.default_rng(5)
    s = rng.standard_normal((4, 10)).astype(np.float32)
    for fmt in (codec.FORMAT_IEEE32, codec.FORMAT_IBM32):
        raw = codec.encode_samples(s, fmt)
        back = codec.decode_samples(raw, fmt)
        np.testing.assert_allclose(back, s, rtol=2**-20)
    ints = (s * 100).astype(np.int32).astype(np.float32)
    raw = codec.encode_samples(ints, codec.FORMAT_INT16)
    back = codec.decode_samples(raw, codec.FORMAT_INT16)
    np.testing.assert_array_equal(back, ints)
