"""Seismic pipeline scale-stress row (VERDICT r5 item 6): time the FULL
ingest and export pipelines — header pass, grid strategies + QC, store
write, ordered export back to SEG-Y — at a base cube size and at
``--scale`` times the trace count, and flag superlinear growth.

The e2e correctness of this path is pinned by tests/test_segy_roundtrip.py
(byte-identical roundtrip at small size); what the per-round bench never
measured is how the pipeline's wall time scales in traces. Usage:

    python tools/stress_seismic.py --scale 30 --out BENCH_seismic_r06.json

The synthetic cube is generated with an independent vectorized writer
against the public SEG-Y rev1 layout (same field offsets as
tests/segy_factory.py; numpy-batched so generating the scaled cube does
not dominate the run). Trace count scales via the inline dim — the same
way a bigger survey grows, so per-crossline chunk geometry is unchanged.
"""

from __future__ import annotations

import argparse
import filecmp
import json
import shutil
import struct
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TEXT_BYTES = 3200
BIN_BYTES = 400
HDR_BYTES = 240

# base cube: 72 inlines x 64 crosslines x 128 samples ~ 4608 traces (3.5 MB)
BASE_IL, BASE_XL, BASE_NS = 72, 64, 128


def _file_header(ns: int, sample_interval: int = 2000) -> bytes:
    card = "STRESS CUBE".ljust(80)[:80] + " " * 80 * 39
    buf = bytearray(card.encode("cp037")) + bytearray(BIN_BYTES)
    struct.pack_into(">h", buf, TEXT_BYTES + 16, sample_interval)
    struct.pack_into(">h", buf, TEXT_BYTES + 20, ns)
    struct.pack_into(">h", buf, TEXT_BYTES + 24, 5)  # IEEE float32
    struct.pack_into(">h", buf, TEXT_BYTES + 54, 1)  # meters
    struct.pack_into(">H", buf, TEXT_BYTES + 300, 0x0100)  # rev 1.0
    struct.pack_into(">h", buf, TEXT_BYTES + 302, 1)  # fixed-length traces
    return bytes(buf)


def build_cube(path: str, n_inline: int, n_crossline: int, n_samples: int) -> int:
    """Vectorized synthetic poststack cube: full (inline, crossline) grid,
    affine cdp coords with a -100 scalar, seeded float32 samples with
    planted zeros. One numpy block per inline -> generation stays a few
    seconds even at 100x trace counts."""
    rng = np.random.default_rng(7)
    trace_bytes = HDR_BYTES + n_samples * 4

    def hdr_block(il: int) -> np.ndarray:
        xl = np.arange(1, n_crossline + 1, dtype=np.int64)
        blk = np.zeros((n_crossline, HDR_BYTES), dtype=np.uint8)

        def put_i32(off: int, vals: np.ndarray) -> None:
            blk[:, off : off + 4] = (
                vals.astype(">i4").view(np.uint8).reshape(n_crossline, 4)
            )

        def put_i16(off: int, vals: np.ndarray) -> None:
            blk[:, off : off + 2] = (
                vals.astype(">i2").view(np.uint8).reshape(n_crossline, 2)
            )

        put_i16(70, np.full(n_crossline, -100))  # coordinate_scalar
        put_i16(114, np.full(n_crossline, n_samples))
        put_i16(116, np.full(n_crossline, 2000))
        put_i32(180, 700000 + il * 100 + xl * 3)  # cdp_x
        put_i32(184, 900000 + xl * 100 - il * 2)  # cdp_y
        put_i32(188, np.full(n_crossline, il))  # inline
        put_i32(192, xl)  # crossline
        return blk

    with open(path, "wb") as f:
        f.write(_file_header(n_samples))
        for il in range(1, n_inline + 1):
            s = rng.standard_normal((n_crossline, n_samples)).astype(np.float32)
            s[rng.random(s.shape) < 0.1] = 0.0
            block = np.zeros((n_crossline, trace_bytes), dtype=np.uint8)
            block[:, :HDR_BYTES] = hdr_block(il)
            block[:, HDR_BYTES:] = (
                s.astype(">f4").view(np.uint8).reshape(n_crossline, n_samples * 4)
            )
            f.write(block.tobytes())
    return n_inline * n_crossline


def _run_leg(spark, segy_path: str, work: Path, tag: str) -> dict:
    from mdio_python_spark.pipelines.export import store_to_segy
    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry

    template = default_registry().get("PostStack3DTime")
    store_path = str(work / f"store_{tag}.mdio")
    out_path = str(work / f"export_{tag}.sgy")

    t0 = time.perf_counter()
    segy_to_store(spark, segy_path, store_path, template)
    ingest_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = store_to_segy(spark, store_path, out_path)
    export_s = time.perf_counter() - t0

    roundtrip_ok = filecmp.cmp(segy_path, out_path, shallow=False)
    shutil.rmtree(store_path, ignore_errors=True)
    Path(out_path).unlink(missing_ok=True)
    return {
        "n_traces": n,
        "ingest_s": round(ingest_s, 3),
        "export_s": round(export_s, 3),
        "roundtrip_byte_identical": roundtrip_ok,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=30)
    ap.add_argument("--out", default="BENCH_seismic_r06.json")
    ap.add_argument("--workdir", default="/tmp/mdio_seismic_stress")
    ns = ap.parse_args()

    from mdio_python_spark.session import get_spark

    work = Path(ns.workdir)
    work.mkdir(parents=True, exist_ok=True)
    spark = get_spark("mdio-seismic-stress")

    base_path = str(work / "base.sgy")
    build_cube(base_path, BASE_IL, BASE_XL, BASE_NS)
    scaled_path = str(work / f"x{ns.scale}.sgy")
    build_cube(scaled_path, BASE_IL * ns.scale, BASE_XL, BASE_NS)

    # warm codegen/classloading so the base leg isn't charged for it
    _run_leg(spark, base_path, work, "warm")
    base = _run_leg(spark, base_path, work, "base")
    scaled = _run_leg(spark, scaled_path, work, "scaled")

    ratios = {
        k: round(scaled[f"{k}_s"] / max(base[f"{k}_s"], 1e-6), 2)
        for k in ("ingest", "export")
    }
    superlinear = [k for k, r in ratios.items() if r > ns.scale * 1.6]
    out = {
        "metric": "seismic_pipeline_scale_ratio",
        "scale": ns.scale,
        "base": base,
        "scaled": scaled,
        "ratios": ratios,
        "superlinear": superlinear,
    }
    Path(__file__).resolve().parents[1].joinpath(ns.out).write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
