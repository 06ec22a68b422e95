"""Independent minimal zarr v2 writer/reader for interop tests — plain
json + zlib + numpy restatement of the public v2 storage spec, sharing no
code with the engine's ``sources/zarr_store.py`` (anti-circularity, like
``segy_factory.py``)."""

from __future__ import annotations

import json
import math
import os
import zlib

import numpy as np


def write_zarr_array(
    root: str,
    name: str,
    data: np.ndarray,
    chunks: tuple[int, ...],
    dims: list[str],
    compress: bool = True,
    skip_chunks: set[tuple[int, ...]] | None = None,
    fill_value=0,
) -> None:
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(data.shape),
        "chunks": list(chunks),
        "dtype": data.dtype.str,
        "compressor": {"id": "zlib", "level": 1} if compress else None,
        "fill_value": fill_value,
        "order": "C",
        "filters": None,
    }
    json.dump(meta, open(os.path.join(d, ".zarray"), "w"))
    json.dump({"_ARRAY_DIMENSIONS": dims}, open(os.path.join(d, ".zattrs"), "w"))
    grid = [math.ceil(s / c) for s, c in zip(data.shape, chunks)]
    for idx in np.ndindex(*grid):
        if skip_chunks and tuple(idx) in skip_chunks:
            continue
        full = np.full(chunks, fill_value, dtype=data.dtype)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, data.shape)
        )
        part = data[sel]
        full[tuple(slice(0, x) for x in part.shape)] = part
        raw = np.ascontiguousarray(full).tobytes()
        if compress:
            raw = zlib.compress(raw, 1)
        with open(os.path.join(d, ".".join(map(str, idx))), "wb") as f:
            f.write(raw)


def write_group_meta(root: str, attrs: dict | None = None) -> None:
    os.makedirs(root, exist_ok=True)
    json.dump({"zarr_format": 2}, open(os.path.join(root, ".zgroup"), "w"))
    if attrs:
        json.dump(attrs, open(os.path.join(root, ".zattrs"), "w"))


def write_zarr_array_v3(
    root: str,
    name: str,
    data: np.ndarray,
    chunks: tuple[int, ...],
    dims: list[str],
    compress: bool = True,
    skip_chunks: set[tuple[int, ...]] | None = None,
    fill_value=0,
) -> None:
    """Independent zarr v3 array writer: per-node zarr.json, default
    chunk-key encoding c/i/j, bytes+gzip codec chain."""
    import gzip

    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    dtype_names = {
        "|b1": "bool", "<i8": "int64", "<i4": "int32", "<f4": "float32",
        "<f8": "float64",
    }
    codecs = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if compress:
        codecs.append({"name": "gzip", "configuration": {"level": 1}})
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(data.shape),
        "data_type": dtype_names[data.dtype.str],
        "chunk_grid": {
            "name": "regular", "configuration": {"chunk_shape": list(chunks)}
        },
        "chunk_key_encoding": {
            "name": "default", "configuration": {"separator": "/"}
        },
        "fill_value": bool(fill_value) if data.dtype.kind == "b" else fill_value,
        "codecs": codecs,
        "attributes": {},
        "dimension_names": dims,
    }
    json.dump(meta, open(os.path.join(d, "zarr.json"), "w"))
    grid = [math.ceil(s / c) for s, c in zip(data.shape, chunks)]
    for idx in np.ndindex(*grid):
        if skip_chunks and tuple(idx) in skip_chunks:
            continue
        full = np.full(chunks, fill_value, dtype=data.dtype)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, data.shape)
        )
        part = data[sel]
        full[tuple(slice(0, x) for x in part.shape)] = part
        raw = np.ascontiguousarray(full).tobytes()
        if compress:
            raw = gzip.compress(raw, 1)
        p = os.path.join(d, "c", *map(str, idx))
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(raw)


def write_group_meta_v3(root: str, attrs: dict | None = None) -> None:
    os.makedirs(root, exist_ok=True)
    json.dump(
        {"zarr_format": 3, "node_type": "group", "attributes": attrs or {}},
        open(os.path.join(root, "zarr.json"), "w"),
    )


def read_zarr_array_v3(root: str, name: str) -> np.ndarray:
    """Independent v3 full-array read (fill for absent chunks)."""
    import gzip

    d = os.path.join(root, name)
    meta = json.load(open(os.path.join(d, "zarr.json")))
    shape = meta["shape"]
    chunks = meta["chunk_grid"]["configuration"]["chunk_shape"]
    np_dtypes = {
        "bool": "|b1", "int64": "<i8", "int32": "<i4", "float32": "<f4",
        "float64": "<f8",
    }
    dtype = np.dtype(np_dtypes[meta["data_type"]])
    fill = meta.get("fill_value") or 0
    codec_names = [c["name"] for c in meta["codecs"]]
    out = np.full(shape, fill, dtype=dtype)
    grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
    for idx in np.ndindex(*grid):
        p = os.path.join(d, "c", *map(str, idx))
        if not os.path.exists(p):
            continue
        raw = open(p, "rb").read()
        if "gzip" in codec_names:
            raw = gzip.decompress(raw)
        elif "blosc" in codec_names:
            # chunk bytes are a c-blosc container; the parser itself is
            # independently spec-tested against hand-built chunks in
            # tests/test_blosc_interop.py
            from mdio_python_spark.sources import blosc1

            raw = blosc1.decompress(raw)
        chunk = np.frombuffer(raw, dtype=dtype).reshape(chunks)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        out[sel] = chunk[tuple(slice(0, x.stop - x.start) for x in sel)]
    return out


def read_zarr_array(root: str, name: str) -> np.ndarray:
    """Independent full-array read (fill for absent chunks)."""
    d = os.path.join(root, name)
    meta = json.load(open(os.path.join(d, ".zarray")))
    shape, chunks = meta["shape"], meta["chunks"]
    dtype = np.dtype(meta["dtype"])
    fill = meta.get("fill_value") or 0
    out = np.full(shape, fill, dtype=dtype)
    grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
    sep = meta.get("dimension_separator", ".")
    for idx in np.ndindex(*grid):
        p = os.path.join(d, sep.join(map(str, idx)))
        if not os.path.exists(p):
            continue
        raw = open(p, "rb").read()
        if meta["compressor"] is not None:
            assert meta["compressor"]["id"] == "zlib"
            raw = zlib.decompress(raw)
        chunk = np.frombuffer(raw, dtype=dtype).reshape(chunks)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        out[sel] = chunk[tuple(slice(0, x.stop - x.start) for x in sel)]
    return out
