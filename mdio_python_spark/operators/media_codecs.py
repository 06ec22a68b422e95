"""Pure-numpy media codecs: uncompressed BMP (24-bit) and PCM WAV.

This container has no PIL/ffmpeg/soundfile, but the two classic
uncompressed container formats are fully specified public byte layouts
(BMP: Windows BITMAPINFOHEADER; WAV: RIFF/PCM) and decode with header
arithmetic + one ``np.frombuffer`` — so the multimodal operators get REAL
decode kernels for these types and fall back to the declared deterministic
stub only for compressed formats (JPEG/MP3/H.264 genuinely need external
codecs).

Layouts implemented from the public format specifications:
- BMP: 14-byte file header (``BM``, file size, pixel-data offset) +
  40-byte BITMAPINFOHEADER (width, height, 24 bpp, BI_RGB), pixel rows
  bottom-up in BGR order, each row padded to a 4-byte boundary.
- WAV: ``RIFF``/``WAVE`` container, ``fmt `` chunk (PCM format 1 or
  extensible 0xFFFE, 8/16-bit), ``data`` chunk with interleaved frames.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaDecodeError(ValueError):
    """Malformed or unsupported media payload."""


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into ``(height, width, 3)`` RGB
    uint8 (top-down row order regardless of the file's orientation)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise MediaDecodeError("not a BMP payload")
    data_offset = int.from_bytes(payload[10:14], "little")
    header_size = int.from_bytes(payload[14:18], "little")
    if header_size < 40:
        raise MediaDecodeError(f"unsupported BMP header size {header_size}")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise MediaDecodeError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    if width <= 0 or height == 0:
        raise MediaDecodeError(f"bad BMP dimensions {width}x{height}")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    need = data_offset + stride * height
    if len(payload) < need:
        raise MediaDecodeError(
            f"truncated BMP: need {need} bytes, have {len(payload)}"
        )
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    rgb = bgr[..., ::-1]
    return rgb[::-1] if bottom_up else rgb


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode ``(height, width, 3)`` RGB uint8 as a bottom-up 24-bit BMP."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise MediaDecodeError(f"expected (h, w, 3) RGB, got {img.shape}")
    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixel_bytes = rows.tobytes()
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixel_bytes


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV into ``((n_frames, channels) float64 in [-1, 1),
    sample_rate)``. Supports 8-bit unsigned and 16-bit signed PCM."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaDecodeError("missing fmt/data chunk")
    audio_format, channels, sample_rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_format not in (1, 0xFFFE):
        raise MediaDecodeError(f"only PCM WAV supported (format {audio_format})")
    if channels < 1:
        raise MediaDecodeError("bad channel count 0")
    if bits == 16:
        pcm = np.frombuffer(
            data, dtype="<i2", count=len(data) // 2
        ).astype(np.float64) / 32768.0
    elif bits == 8:
        pcm = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    else:
        raise MediaDecodeError(f"unsupported bit depth {bits}")
    n_frames = len(pcm) // channels
    return pcm[: n_frames * channels].reshape(n_frames, channels), int(sample_rate)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000
) -> bytes:
    """Encode ``(n_frames,)`` or ``(n_frames, channels)`` float in
    [-1, 1) as 16-bit PCM WAV."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    pcm = np.clip(np.round(arr * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
