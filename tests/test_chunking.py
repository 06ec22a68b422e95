"""Unit + e2e tests for constrained auto-chunking (C2,
``core/utils_write.py:16-52`` / ``dataset_factory.py:191-200``)."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from tests.segy_factory import FIELD_OFFSETS, write_segy_file

from mdio_python_spark.pipelines.ingest import segy_to_store
from mdio_python_spark.schemas import chunking, default_registry
from mdio_python_spark.sources.store import open_store

SPEC = {
    name: (off, ">i4" if fmt == ">i" else ">i2")
    for name, (off, fmt) in FIELD_OFFSETS.items()
}


def test_constrained_chunks_budget_and_balance():
    shape = (10_000, 10_000, 1_000)
    chunk = chunking.constrained_chunks(shape, itemsize=4, max_bytes=256 << 20)
    assert math.prod(chunk) * 4 <= 256 << 20
    # halve-largest keeps shapes balanced: no dim more than ~2x another
    # after normalizing by the original aspect ratio
    assert max(chunk) / min(chunk) <= max(shape) / min(shape) * 2
    # uses a decent fraction of the budget (not degenerate 1x1x1)
    assert math.prod(chunk) * 4 > (256 << 20) / 8


def test_constrained_chunks_clamps_to_shape():
    assert chunking.constrained_chunks((3, 5), 8, 1 << 30) == (3, 5)


def test_constrained_chunks_unsatisfiable_budget_stops_at_ones():
    assert chunking.constrained_chunks((4, 4), itemsize=100, max_bytes=1) == (1, 1)


def test_ingest_chunks_clamps_template_to_dim_sizes():
    out = chunking.ingest_chunks(
        {"inline": 12, "crossline": 9}, {"inline": 128, "crossline": 128}, 25
    )
    assert out == {"inline": 12, "crossline": 9}


def test_ingest_chunks_shrinks_for_byte_budget():
    # 1024x1024 chunk x 4000 samples x 4B = 16 TiB >> 256 MiB
    out = chunking.ingest_chunks(
        {"inline": 4096, "crossline": 4096},
        {"inline": 1024, "crossline": 1024},
        4000,
    )
    assert math.prod(out.values()) * 4000 * 4 <= chunking.MAX_VARIABLE_BYTES
    assert all(v >= 1 for v in out.values())


def test_ingest_chunks_partition_guard_grows_tiny_chunks():
    # chunk=1 per dim on a 10k x 10k grid -> 100M cells; guard must grow
    sizes = {"inline": 10_000, "crossline": 10_000}
    out = chunking.ingest_chunks(
        sizes, {"inline": 1, "crossline": 1}, samples_per_trace=100
    )
    assert chunking.n_chunk_cells(sizes, out) <= chunking.MAX_PARTITIONS
    assert math.prod(out.values()) * 100 * 4 <= chunking.MAX_VARIABLE_BYTES


def test_ingest_records_resolved_chunks_in_manifest(tmp_path, spark, monkeypatch):
    """An ingest whose template chunks bust the (patched-tiny) byte budget
    picks shrunken chunks, records them in the manifest, and partitions
    the store by them."""
    headers = [
        {"inline": il, "crossline": xl}
        for il in range(1, 9)
        for xl in range(1, 9)
    ]
    rng = np.random.default_rng(3)
    samples = rng.standard_normal((len(headers), 64)).astype(np.float32)
    path = str(tmp_path / "auto.sgy")
    write_segy_file(path, headers, samples)

    # 8x8 template chunk x 64 samples x 4B = 16 KiB; cap at 2 KiB => the
    # resolver must shrink to 8 traces/chunk (e.g. 4x2 or 2x4)
    monkeypatch.setattr(chunking, "MAX_VARIABLE_BYTES", 2048)
    template = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": [], "chunks": [8, 8, 64]}
    )
    segy_to_store(spark, path, str(tmp_path / "store"), template, header_spec=SPEC)

    st = open_store(spark, str(tmp_path / "store"))
    import json

    with open(os.path.join(str(tmp_path / "store"), "manifest.json")) as f:
        manifest = json.load(f)
    chunks = manifest["chunks"]
    assert math.prod(chunks.values()) * 64 * 4 <= 2048
    amp = next(v for v in st.dataset.variables if v.name == "amplitude")
    assert amp.chunks[:2] == [chunks["inline"], chunks["crossline"]]
    # store physically partitioned by the resolved chunk keys
    part_dirs = os.listdir(os.path.join(str(tmp_path / "store"), "traces"))
    n_inline_parts = len(
        {d for d in part_dirs if d.startswith("inline_chunk=")}
    )
    assert n_inline_parts == math.ceil(8 / chunks["inline"])
    assert st.traces.count() == 64
