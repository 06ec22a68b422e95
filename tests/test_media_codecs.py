"""Media codec tests: decode fixtures are built with INDEPENDENT
struct-level byte assembly (not the library encoder) so decoder bugs can't
cancel encoder bugs; roundtrips and the Spark operator paths on top."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mdio_python_spark.operators import multimodal as mm
from mdio_python_spark.operators.media_codecs import (
    MediaDecodeError,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


def _manual_bmp(img_rgb: np.ndarray) -> bytes:
    """Hand-rolled bottom-up 24-bit BMP writer (independent of encode_bmp)."""
    h, w, _ = img_rgb.shape
    stride = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = img_rgb[y, x]
            row += bytes([b, g, r])  # BGR
        row += b"\x00" * (stride - len(row))
        body += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info + bytes(body)


def _manual_wav(samples_i16: np.ndarray, rate: int, channels: int) -> bytes:
    data = samples_i16.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_decode_bmp_manual_fixture():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)  # odd width: padding
    got = decode_bmp(_manual_bmp(img))
    assert np.array_equal(got, img)


def test_bmp_roundtrip_own_encoder():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_rejects_garbage_and_truncation():
    with pytest.raises(MediaDecodeError):
        decode_bmp(b"not a bmp")
    full = _manual_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(MediaDecodeError):
        decode_bmp(full[:-10])


def test_decode_wav_manual_fixture_stereo():
    # L channel ramps up, R channel ramps down; mono mean is constant
    n = 100
    left = np.linspace(-16384, 16383, n).astype(np.int16)
    right = -left
    interleaved = np.empty(2 * n, dtype=np.int16)
    interleaved[0::2], interleaved[1::2] = left, right
    frames, rate = decode_wav(_manual_wav(interleaved, 22050, 2))
    assert rate == 22050 and frames.shape == (n, 2)
    assert np.allclose(frames[:, 0], left / 32768.0)
    assert np.allclose(frames.mean(axis=1), (left + right) / 2 / 32768.0)


def test_wav_roundtrip_own_encoder():
    sig = np.sin(np.linspace(0, 20, 500))
    frames, rate = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000
    assert np.allclose(frames[:, 0], sig, atol=1 / 32768.0)


def test_wav_rejects_non_riff():
    with pytest.raises(MediaDecodeError):
        decode_wav(b"RIFXjunk")


# ---------------------------------------------------------------------------
# Spark operator paths over the real codecs
# ---------------------------------------------------------------------------


def _bmp_media_df(spark, imgs):
    rows = [(i, _manual_bmp(img)) for i, img in enumerate(imgs)]
    df = spark.createDataFrame(rows, "doc_id long, raw binary")
    h, w, _ = imgs[0].shape
    return mm.attach_payload(
        df, "raw", media_type="image/bmp", width=w, height=h, channels=3
    )


def test_image_features_real_bmp(spark):
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8) for _ in range(4)]
    out = {r.doc_id: r for r in mm.image_features(_bmp_media_df(spark, imgs)).collect()}
    for i, img in enumerate(imgs):
        f = img.astype(np.float64)
        assert out[i].n_pixels == 36
        assert out[i].mean_r == pytest.approx(f[..., 0].mean())
        assert out[i].mean_g == pytest.approx(f[..., 1].mean())
        assert out[i].mean_b == pytest.approx(f[..., 2].mean())
        assert out[i].std_all == pytest.approx(f.std())


def test_resize_real_bmp_output_still_decodes(spark):
    rng = np.random.default_rng(6)
    imgs = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(3)]
    out = mm.resize_images(_bmp_media_df(spark, imgs), 4, 4).collect()
    assert len(out) == 3
    for r in out:
        img = decode_bmp(bytes(r.payload))
        assert img.shape == (4, 4, 3)
        src = imgs[r.doc_id]
        # nearest-neighbor: output pixel (0,0) is source pixel (0,0)
        assert np.array_equal(img[0, 0], src[0, 0])
        assert r.meta.width == 4 and r.meta.height == 4


def test_audio_features_real_wav(spark):
    n = 1000
    sig = np.sin(np.linspace(0, 50 * np.pi, n))
    pcm = np.round(sig * 32767).astype(np.int16)
    df = spark.createDataFrame([(1, _manual_wav(pcm, 8000, 1))], "doc_id long, raw binary")
    media = mm.attach_payload(df, "raw", media_type="audio/wav")
    [r] = mm.audio_features(media).collect()
    assert r.n_samples == n
    decoded = pcm.astype(np.float64) / 32768.0
    assert r.rms == pytest.approx(np.sqrt((decoded**2).mean()))
    sign = np.sign(decoded)
    assert r.zero_crossings == int((sign[1:] != sign[:-1]).sum())


def test_unknown_media_type_raises(spark):
    df = spark.createDataFrame([(1, b"xxxx")], "doc_id long, raw binary")
    media = mm.attach_payload(df, "raw", media_type="image/jpeg")
    with pytest.raises(Exception, match="no codec"):
        mm.image_features(media).collect()


# --- exact-equality gates for the declared multimodal queries (VERDICT r4).
# Mirror the declared queries' deterministic synth AND the vectorized
# kernel math in pure numpy, then require bitwise-equal doubles on the
# FULL query output at sf0.001.

SF_SMOKE = "/root/testdata/sf0.001"


def test_image_features_query_exact(spark):
    from mdio_python_spark.plans.registry import registry
    from mdio_python_spark.sources.tables import load_table

    out = registry()["multimodal_image_features"].fn(spark, SF_SMOKE).toPandas()
    doc_ids = sorted(
        r.doc_id for r in load_table(spark, SF_SMOKE, "documents").select("doc_id").collect()
    )
    assert sorted(out["doc_id"]) == doc_ids
    y, x, c = np.meshgrid(np.arange(8), np.arange(8), np.arange(3), indexing="ij")
    by_id = out.set_index("doc_id")
    for i in doc_ids:
        img = ((int(i) + y * 8 + x + c * 37) % 256).astype(np.uint8)
        a = np.stack([img]).astype(np.float64)  # same layout as the kernel
        means = a.mean(axis=(1, 2))[0]
        std = a.std(axis=(1, 2, 3))[0]
        row = by_id.loc[i]
        assert int(row.n_pixels) == 64
        assert row.mean_r == means[0] and row.mean_g == means[1]
        assert row.mean_b == means[2]
        assert row.std_all == std


def test_audio_features_query_exact(spark):
    from mdio_python_spark.operators.media_codecs import encode_wav
    from mdio_python_spark.plans.registry import registry
    from mdio_python_spark.sources.tables import load_table

    out = registry()["multimodal_audio_features"].fn(spark, SF_SMOKE).toPandas()
    doc_ids = sorted(
        r.doc_id for r in load_table(spark, SF_SMOKE, "documents").select("doc_id").collect()
    )
    assert sorted(out["doc_id"]) == doc_ids
    t = np.arange(256, dtype=np.float64)
    by_id = out.set_index("doc_id")
    for i in doc_ids:
        sig = 0.5 * np.sin(2 * np.pi * (1 + int(i) % 16) * t / 64.0)
        frames, _rate = decode_wav(encode_wav(sig, sample_rate=8000))
        seg = frames.mean(axis=1)
        # mirror the kernel's reduceat-based (sequential) reductions
        sumsq = np.add.reduceat(seg * seg, np.array([0]))[0]
        rms = np.sqrt(sumsq / len(seg))
        sign = np.sign(seg)
        cross = np.zeros(len(seg), dtype=np.int64)
        cross[1:] = sign[1:] != sign[:-1]
        cross[0] = 0
        row = by_id.loc[i]
        assert int(row.n_samples) == 256
        assert row.rms == rms
        assert int(row.zero_crossings) == int(cross.sum())


def test_video_frames_query_exact(spark):
    """Exact local gate for multimodal_video_frames: re-derive every
    document's sampled frames with pure Python/numpy (text bytes tiled
    into 1 + doc_id % 5 frames of 4x4x3, every 2nd frame kept) and pin
    count, last index, and the crc32 sum over emitted frame bytes."""
    import zlib

    from mdio_python_spark.plans.registry import registry
    from mdio_python_spark.sources.tables import load_table

    out = (
        registry()["multimodal_video_frames"].fn(spark, SF_SMOKE).toPandas()
    )
    src = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert sorted(out["doc_id"]) == sorted(src)
    by_id = out.set_index("doc_id")
    for i, text in src.items():
        payload = text[:240].encode("utf-8") or b"\x00"
        nf = 1 + int(i) % 5
        n = nf * 4 * 4 * 3
        buf = np.frombuffer(payload, dtype=np.uint8)
        tiled = np.tile(buf, -(-n // len(buf)))[:n].reshape(nf, 4, 4, 3)
        kept = tiled[::2]
        crc = sum(zlib.crc32(f.tobytes()) for f in kept)
        row = by_id.loc[i]
        assert int(row.n_frames_kept) == len(kept)
        assert int(row.last_frame_idx) == (len(kept) - 1) * 2
        assert int(row.frames_crc) == crc
