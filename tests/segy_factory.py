"""Synthetic SEG-Y factory for tests — builds files from the public SEG-Y
rev1 layout using plain struct packing (independent of the engine's write
path, so roundtrip tests aren't circular on the writer).
"""

from __future__ import annotations

import struct

import numpy as np

TEXT_BYTES = 3200
BIN_BYTES = 400


def _pack_binary_header(
    sample_interval: int, samples_per_trace: int, data_format: int, measurement: int
) -> bytes:
    buf = bytearray(BIN_BYTES)
    struct.pack_into(">h", buf, 16, sample_interval)
    struct.pack_into(">h", buf, 20, samples_per_trace)
    struct.pack_into(">h", buf, 24, data_format)
    struct.pack_into(">h", buf, 54, measurement)
    struct.pack_into(">H", buf, 300, 0x0100)  # rev 1.0
    struct.pack_into(">h", buf, 302, 1)  # fixed length traces
    return bytes(buf)


# (0-based offset, struct fmt) — independent restatement of the rev1 layout
FIELD_OFFSETS = {
    "trace_seq_line": (0, ">i"),
    "field_record": (8, ">i"),
    "channel": (12, ">i"),
    "cdp": (20, ">i"),
    "coordinate_scalar": (70, ">h"),
    "source_coord_x": (72, ">i"),
    "source_coord_y": (76, ">i"),
    "group_coord_x": (80, ">i"),
    "group_coord_y": (84, ">i"),
    "num_samples": (114, ">h"),
    "sample_interval": (116, ">h"),
    "cdp_x": (180, ">i"),
    "cdp_y": (184, ">i"),
    "inline": (188, ">i"),
    "crossline": (192, ">i"),
    "shot_point": (196, ">i"),
    # custom (test) fields in unassigned space
    "cable": (200, ">i"),
    "shot_line": (204, ">i"),
    "gun": (208, ">i"),
    "receiver": (212, ">i"),
    "component": (216, ">i"),
}


def _pack_trace_header(values: dict[str, int]) -> bytes:
    buf = bytearray(240)
    for name, v in values.items():
        off, fmt = FIELD_OFFSETS[name]
        struct.pack_into(fmt, buf, off, int(v))
    return bytes(buf)


def _encode_ieee(s: np.ndarray) -> bytes:
    return s.astype(">f4").tobytes()


def _encode_ibm(s: np.ndarray) -> bytes:
    """Independent scalar IBM32 encoder (slow; tests only)."""
    out = np.zeros(s.size, dtype=">u4")
    flat = s.astype(np.float64).ravel()
    for i, v in enumerate(flat):
        if v == 0 or not np.isfinite(v):
            continue
        sign = 0x80000000 if v < 0 else 0
        mag = abs(v)
        e = 0
        while mag >= 1.0:
            mag /= 16.0
            e += 1
        while mag < 1.0 / 16.0:
            mag *= 16.0
            e -= 1
        frac = int(round(mag * (1 << 24)))
        if frac >= 1 << 24:
            frac >>= 4
            e += 1
        out[i] = sign | ((e + 64) << 24) | frac
    return out.tobytes()


def write_segy_file(
    path: str,
    headers: list[dict[str, int]],
    samples: np.ndarray,
    sample_interval: int = 2000,
    data_format: int = 5,
    measurement: int = 1,
    text: str = "TEST SEG-Y",
    file_header_extras: dict[int, bytes] | None = None,
    extended_texts: list[bytes] | None = None,
) -> None:
    """``file_header_extras`` plants verbatim bytes at 0-based offsets
    within the 3600-byte file header (text 0-3199, binary 3200-3599) —
    content in positions the engine does NOT model, for raw-fidelity
    roundtrip tests. ``extended_texts`` appends rev1 extended textual
    header blocks (each padded/truncated to 3200 bytes) and sets the
    count at binary-header byte 304."""
    n, ns = samples.shape
    assert len(headers) == n
    card = text.ljust(80)[:80] + " " * 80 * 39
    file_header = bytearray(
        card.encode("cp037")
        + _pack_binary_header(sample_interval, ns, data_format, measurement)
    )
    ext_blocks = [b[:TEXT_BYTES].ljust(TEXT_BYTES, b"\x40") for b in extended_texts or []]
    if ext_blocks:
        struct.pack_into(">h", file_header, 3200 + 304, len(ext_blocks))
    for off, blob in (file_header_extras or {}).items():
        file_header[off : off + len(blob)] = blob
    with open(path, "wb") as f:
        f.write(bytes(file_header))
        for blob in ext_blocks:
            f.write(blob)
        enc = _encode_ibm if data_format == 1 else _encode_ieee
        for i in range(n):
            hdr = dict(headers[i])
            hdr.setdefault("num_samples", ns)
            hdr.setdefault("sample_interval", sample_interval)
            f.write(_pack_trace_header(hdr))
            f.write(enc(samples[i]))


def make_poststack_3d(
    path: str,
    n_inline: int = 12,
    n_crossline: int = 9,
    n_samples: int = 25,
    dead_fraction: float = 0.0,
    data_format: int = 5,
    seed: int = 7,
):
    """Teapot-shaped synthetic: full (inline, crossline) grid with optional
    dead cells, affine cdp_x/y with a coordinate scalar, zeros planted in
    samples (stats mask nonzero only)."""
    rng = np.random.default_rng(seed)
    headers, rows = [], []
    for il in range(1, n_inline + 1):
        for xl in range(1, n_crossline + 1):
            if dead_fraction and rng.random() < dead_fraction:
                continue
            headers.append(
                {
                    "inline": il,
                    "crossline": xl,
                    "cdp_x": 700000 + il * 100 + xl * 3,
                    "cdp_y": 900000 + xl * 100 - il * 2,
                    "coordinate_scalar": -100,
                }
            )
            rows.append((il, xl))
    n = len(headers)
    samples = rng.standard_normal((n, n_samples)).astype(np.float32)
    samples[rng.random((n, n_samples)) < 0.1] = 0.0  # exact zeros for the mask
    write_segy_file(path, headers, samples, data_format=data_format)
    return headers, samples, rows
