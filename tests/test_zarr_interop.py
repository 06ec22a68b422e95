"""Zarr v2 + v3 interop tests (S4 for real MDIO-shaped stores): read
cubes written by an independent writer, write cubes an independent reader
can open, and roundtrip the engine's own store through zarr — in both
storage-spec versions, mirroring the reference's format toggle
(``api/io.py:57-66``)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from tests.zarr_factory import (
    read_zarr_array,
    read_zarr_array_v3,
    write_group_meta,
    write_group_meta_v3,
    write_zarr_array,
    write_zarr_array_v3,
)

from mdio_python_spark.sources import zarr_store as zs


@pytest.fixture
def cube_zarr(tmp_path):
    """Independent-writer MDIO-shaped cube: 6x4 grid, 5 samples, one dead
    spatial chunk (absent chunk files = sparse write)."""
    root = str(tmp_path / "cube.zarr")
    rng = np.random.default_rng(31)
    amp = rng.standard_normal((6, 4, 5)).astype("<f4")
    mask = np.ones((6, 4), dtype="|b1")
    mask[4:, 2:] = False  # dead corner
    amp[~mask] = 0.0
    write_group_meta(
        root, {"attributes": {"defaultVariableName": "amplitude"}}
    )
    write_zarr_array(root, "inline", np.arange(10, 16, dtype="<i8"), (6,), ["inline"])
    write_zarr_array(root, "crossline", np.arange(100, 104, dtype="<i8"), (4,), ["crossline"])
    write_zarr_array(root, "time", np.arange(5, dtype="<i8"), (5,), ["time"])
    write_zarr_array(
        root, "amplitude", amp, (2, 2, 5), ["inline", "crossline", "time"]
    )
    write_zarr_array(root, "trace_mask", mask, (2, 2), ["inline", "crossline"])
    return root, amp, mask


def test_read_independent_cube(spark, cube_zarr):
    root, amp, mask = cube_zarr
    df = zs.zarr_cube_to_df(spark, root)
    rows = df.collect()
    assert len(rows) == int(mask.sum())
    for r in rows[:8]:
        il, xl = r["inline_idx"], r["crossline_idx"]
        assert r["inline"] == 10 + il and r["crossline"] == 100 + xl
        assert np.allclose(
            np.array(r["samples"], dtype=np.float32), amp[il, xl]
        )


def test_missing_chunks_read_as_fill(tmp_path, spark):
    root = str(tmp_path / "sparse.zarr")
    amp = np.ones((4, 2, 3), dtype="<f4")
    write_group_meta(root, {"attributes": {"defaultVariableName": "amplitude"}})
    write_zarr_array(
        root,
        "amplitude",
        amp,
        (2, 2, 3),
        ["inline", "crossline", "time"],
        skip_chunks={(1, 0, 0)},  # rows 2-3 absent
    )
    df = zs.zarr_cube_to_df(spark, root)
    # no mask array and no coord arrays: live = any nonzero sample,
    # dims fall back to indices
    rows = {(r["inline"], r["crossline"]) for r in df.collect()}
    assert rows == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_unsupported_codec_rejected(tmp_path):
    import json

    root = str(tmp_path / "blosc.zarr")
    os.makedirs(os.path.join(root, "a"))
    json.dump({"zarr_format": 2}, open(os.path.join(root, ".zgroup"), "w"))
    json.dump(
        {
            "zarr_format": 2,
            "shape": [2],
            "chunks": [2],
            "dtype": "<f4",
            "compressor": {"id": "lzma", "preset": 1},
            "fill_value": 0,
            "order": "C",
            "filters": None,
        },
        open(os.path.join(root, "a", ".zarray"), "w"),
    )
    with open(os.path.join(root, "a", "0"), "wb") as f:
        f.write(b"\x02\x01\x21\x04")
    g = zs.open_group(root)
    with pytest.raises(zs.UnsupportedCodecError, match="lzma"):
        zs.read_array(g.arrays["a"])


def test_store_to_zarr_roundtrip(tmp_path, spark):
    """Engine store -> zarr -> (a) independent reader sees the dense cube,
    (b) engine zarr reader reproduces the trace table."""
    from tests.segy_factory import make_poststack_3d

    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry
    from mdio_python_spark.sources.store import open_store

    sgy = str(tmp_path / "cube.sgy")
    headers, samples, rows = make_poststack_3d(
        sgy, n_inline=6, n_crossline=5, n_samples=8, dead_fraction=0.2
    )
    store_path = str(tmp_path / "store")
    template = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": []}
    )
    segy_to_store(spark, sgy, store_path, template)
    zarr_path = str(tmp_path / "out.zarr")
    n = zs.store_to_zarr(spark, store_path, zarr_path)
    assert n == len(headers)

    # (a) independent reader: dense cube + mask
    amp = read_zarr_array(zarr_path, "amplitude")
    mask = read_zarr_array(zarr_path, "trace_mask")
    inline_vals = read_zarr_array(zarr_path, "inline")
    assert amp.shape == (6, 5, 8)
    assert int(mask.sum()) == len(headers)
    assert list(inline_vals) == list(range(1, 7))
    for (il, xl), trace in zip(rows, samples):
        assert mask[il - 1, xl - 1]
        assert np.allclose(amp[il - 1, xl - 1], trace)

    # (b) engine reader round-trips the long format
    df = zs.zarr_cube_to_df(spark, zarr_path)
    got = {
        (r["inline"], r["crossline"]): np.array(r["samples"], dtype=np.float32)
        for r in df.collect()
    }
    assert set(got) == set(rows)
    st = open_store(spark, store_path)
    assert st.traces.count() == len(got)
    # consolidated metadata present and parseable by the engine reader
    assert os.path.exists(os.path.join(zarr_path, ".zmetadata"))
    g = zs.open_group(zarr_path)
    assert "amplitude" in g.arrays and g.arrays["amplitude"].dims == [
        "inline",
        "crossline",
        "time",
    ]


@pytest.fixture
def cube_zarr_v3(tmp_path):
    """Independent-writer v3 cube, same geometry as ``cube_zarr``."""
    root = str(tmp_path / "cube3.zarr")
    rng = np.random.default_rng(31)
    amp = rng.standard_normal((6, 4, 5)).astype("<f4")
    mask = np.ones((6, 4), dtype="|b1")
    mask[4:, 2:] = False
    amp[~mask] = 0.0
    write_group_meta_v3(
        root, {"attributes": {"defaultVariableName": "amplitude"}}
    )
    write_zarr_array_v3(root, "inline", np.arange(10, 16, dtype="<i8"), (6,), ["inline"])
    write_zarr_array_v3(root, "crossline", np.arange(100, 104, dtype="<i8"), (4,), ["crossline"])
    write_zarr_array_v3(root, "time", np.arange(5, dtype="<i8"), (5,), ["time"])
    write_zarr_array_v3(
        root, "amplitude", amp, (2, 2, 5), ["inline", "crossline", "time"]
    )
    write_zarr_array_v3(root, "trace_mask", mask, (2, 2), ["inline", "crossline"])
    return root, amp, mask


def test_read_independent_v3_cube(spark, cube_zarr_v3):
    root, amp, mask = cube_zarr_v3
    g = zs.open_group(root)
    assert g.arrays["amplitude"].dims == ["inline", "crossline", "time"]
    df = zs.zarr_cube_to_df(spark, root)
    rows = df.collect()
    assert len(rows) == int(mask.sum())
    for r in rows[:8]:
        il, xl = r["inline_idx"], r["crossline_idx"]
        assert r["inline"] == 10 + il and r["crossline"] == 100 + xl
        assert np.allclose(
            np.array(r["samples"], dtype=np.float32), amp[il, xl]
        )


def test_store_to_zarr_v3_roundtrip(tmp_path, spark):
    """Engine store -> v3 zarr -> (a) independent v3 reader sees the dense
    cube, (b) engine zarr reader reproduces the trace table, (c) open_mdio
    dispatches on the root zarr.json."""
    from tests.segy_factory import make_poststack_3d

    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry
    from mdio_python_spark.sources.store import open_mdio

    sgy = str(tmp_path / "cube.sgy")
    headers, samples, rows = make_poststack_3d(
        sgy, n_inline=6, n_crossline=5, n_samples=8, dead_fraction=0.2
    )
    store_path = str(tmp_path / "store")
    template = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": []}
    )
    segy_to_store(spark, sgy, store_path, template)
    zarr_path = str(tmp_path / "out3.zarr")
    n = zs.store_to_zarr(spark, store_path, zarr_path, zarr_format=3)
    assert n == len(headers)
    assert os.path.exists(os.path.join(zarr_path, "zarr.json"))
    assert not os.path.exists(os.path.join(zarr_path, ".zmetadata"))

    amp = read_zarr_array_v3(zarr_path, "amplitude")
    mask = read_zarr_array_v3(zarr_path, "trace_mask")
    assert amp.shape == (6, 5, 8)
    assert int(mask.sum()) == len(headers)
    for (il, xl), trace in zip(rows, samples):
        assert mask[il - 1, xl - 1]
        assert np.allclose(amp[il - 1, xl - 1], trace)

    got = {
        (r["inline"], r["crossline"]): np.array(r["samples"], dtype=np.float32)
        for r in open_mdio(spark, zarr_path).collect()
    }
    assert set(got) == set(rows)
    for (il, xl), trace in zip(rows, samples):
        assert np.allclose(got[(il, xl)], trace)


def test_store_to_zarr_v3_blosc_zstd_roundtrip(tmp_path, spark):
    """VERDICT r6 item 7: upstream MDIO writes its global default
    compressor — blosc-zstd clevel 5 (reference
    ``src/mdio/builder/schemas/compressors.py:20-29``) — under zarr v3
    exactly as under v2, so the v3 export must support the same blosc
    codec chain the v2 path already roundtrips. Checks: (a) the v3 codec
    chain is ``bytes + blosc(zstd)``, (b) every chunk file is a genuine
    c-blosc container (version/flags header, zstd inner codec id),
    (c) an independent decode reproduces the dense cube, (d) the engine's
    own zarr reader reproduces the trace table."""
    from tests.segy_factory import make_poststack_3d

    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry
    from mdio_python_spark.sources import blosc1
    from mdio_python_spark.sources.store import open_mdio

    sgy = str(tmp_path / "cube.sgy")
    headers, samples, rows = make_poststack_3d(
        sgy, n_inline=6, n_crossline=5, n_samples=8, dead_fraction=0.2
    )
    store_path = str(tmp_path / "store")
    template = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": []}
    )
    segy_to_store(spark, sgy, store_path, template)
    zarr_path = str(tmp_path / "out3blosc.zarr")
    comp = {"id": "blosc", "cname": "zstd", "clevel": 5, "shuffle": 1}
    n = zs.store_to_zarr(
        spark, store_path, zarr_path, compressor=comp, zarr_format=3
    )
    assert n == len(headers)

    import json as _json

    meta = _json.load(open(os.path.join(zarr_path, "amplitude", "zarr.json")))
    names = [c["name"] for c in meta["codecs"]]
    assert names == ["bytes", "blosc"], names
    blosc_cfg = meta["codecs"][1]["configuration"]
    assert blosc_cfg["cname"] == "zstd" and blosc_cfg["clevel"] == 5
    assert blosc_cfg["typesize"] == 4  # float32, auto-filled from dtype

    # raw chunk files: c-blosc containers with the zstd inner codec
    import glob as _glob

    chunk_files = [
        p
        for p in _glob.glob(
            os.path.join(zarr_path, "amplitude", "c", "**", "*"), recursive=True
        )
        if os.path.isfile(p)
    ]
    assert chunk_files
    for p in chunk_files:
        raw = open(p, "rb").read()
        assert raw[0] == 2  # c-blosc format version
        assert (raw[2] >> 5) == blosc1.CODEC_ZSTD
        assert raw[2] & blosc1.FLAG_SHUFFLE

    amp = read_zarr_array_v3(zarr_path, "amplitude")  # independent decode
    mask = read_zarr_array_v3(zarr_path, "trace_mask")
    assert amp.shape == (6, 5, 8)
    assert int(mask.sum()) == len(headers)
    for (il, xl), trace in zip(rows, samples):
        assert mask[il - 1, xl - 1]
        assert np.allclose(amp[il - 1, xl - 1], trace)

    got = {
        (r["inline"], r["crossline"]): np.array(r["samples"], dtype=np.float32)
        for r in open_mdio(spark, zarr_path).collect()
    }
    assert set(got) == set(rows)
    for (il, xl), trace in zip(rows, samples):
        assert np.allclose(got[(il, xl)], trace)


def test_v3_unsupported_codec_rejected(tmp_path):
    import json

    root = str(tmp_path / "zstd.zarr")
    os.makedirs(os.path.join(root, "a", "c"))
    json.dump(
        {"zarr_format": 3, "node_type": "group", "attributes": {}},
        open(os.path.join(root, "zarr.json"), "w"),
    )
    json.dump(
        {
            "zarr_format": 3,
            "node_type": "array",
            "shape": [2],
            "data_type": "float32",
            "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [2]}},
            "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
            "fill_value": 0.0,
            "codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "lzma", "configuration": {"preset": 5}},
            ],
            "attributes": {},
            "dimension_names": ["x"],
        },
        open(os.path.join(root, "a", "zarr.json"), "w"),
    )
    with open(os.path.join(root, "a", "c", "0"), "wb") as f:
        f.write(b"\x28\xb5\x2f\xfd")
    g = zs.open_group(root)
    with pytest.raises(zs.UnsupportedCodecError, match="lzma"):
        zs.read_array(g.arrays["a"])


def test_v3_v2_outputs_agree(tmp_path, spark):
    """The same store exported in both formats yields byte-identical
    dense cubes through the engine reader."""
    from tests.segy_factory import make_poststack_3d

    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry

    sgy = str(tmp_path / "c.sgy")
    make_poststack_3d(sgy, n_inline=4, n_crossline=3, n_samples=6)
    store = str(tmp_path / "store")
    template = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": []}
    )
    segy_to_store(spark, sgy, store, template)
    p2, p3 = str(tmp_path / "v2.zarr"), str(tmp_path / "v3.zarr")
    zs.store_to_zarr(spark, store, p2, zarr_format=2)
    zs.store_to_zarr(spark, store, p3, zarr_format=3)
    df2 = zs.zarr_cube_to_df(spark, p2).orderBy("inline", "crossline").collect()
    df3 = zs.zarr_cube_to_df(spark, p3).orderBy("inline", "crossline").collect()
    assert [r.asDict() for r in df2] == [r.asDict() for r in df3]


def test_cli_zarr_roundtrip(tmp_path, spark):
    """CLI surface: import -> export-zarr -> import-zarr parquet."""
    from tests.segy_factory import make_poststack_3d

    from mdio_python_spark.__main__ import main

    sgy = str(tmp_path / "c.sgy")
    make_poststack_3d(sgy, n_inline=4, n_crossline=3, n_samples=6)
    store = str(tmp_path / "store")
    zarr_path = str(tmp_path / "z.zarr")
    out_pq = str(tmp_path / "traces.parquet")
    assert main(["import", sgy, store]) == 0
    assert main(["export-zarr", store, zarr_path]) == 0
    assert main(["import-zarr", zarr_path, out_pq]) == 0
    df = spark.read.parquet(out_pq)
    assert df.count() == 12
    assert {"inline", "crossline", "samples"} <= set(df.columns)


def test_store_to_zarr_writes_coordinates(tmp_path, spark):
    """Physical coordinate columns (cdp_x/cdp_y) come through as
    dim-shaped float64 arrays, independently readable."""
    from tests.segy_factory import make_poststack_3d

    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry

    sgy = str(tmp_path / "c.sgy")
    headers, samples, rows = make_poststack_3d(
        sgy, n_inline=4, n_crossline=3, n_samples=6
    )
    store = str(tmp_path / "store")
    segy_to_store(
        spark, sgy, store, default_registry().get("PostStack3DTime")
    )
    zarr_path = str(tmp_path / "z.zarr")
    zs.store_to_zarr(spark, store, zarr_path)
    cdp_x = read_zarr_array(zarr_path, "cdp_x")
    assert cdp_x.shape == (4, 3)
    # factory: cdp_x = 700000 + il*100 + xl*3, scalar -100 => /100
    for il, xl in rows:
        assert cdp_x[il - 1, xl - 1] == pytest.approx(
            (700000 + il * 100 + xl * 3) / 100.0
        )


def test_store_to_zarr_v3_writes_coordinates_and_labels(tmp_path, spark):
    """v3 export with physical coordinates: every array node (amplitude,
    mask, dim coords, vertical labels, cdp_x/cdp_y) must carry v3
    zarr.json metadata — no stray v2 .zarray — and be readable back."""
    import json

    from tests.segy_factory import make_poststack_3d

    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry

    sgy = str(tmp_path / "c.sgy")
    headers, samples, rows = make_poststack_3d(
        sgy, n_inline=4, n_crossline=3, n_samples=6
    )
    store = str(tmp_path / "store")
    segy_to_store(spark, sgy, store, default_registry().get("PostStack3DTime"))
    zarr_path = str(tmp_path / "z3.zarr")
    zs.store_to_zarr(spark, store, zarr_path, zarr_format=3)

    g = zs.open_group(zarr_path)
    for name in ("amplitude", "trace_mask", "inline", "crossline", "time", "cdp_x"):
        assert name in g.arrays, f"{name} missing from v3 group: {sorted(g.arrays)}"
        node_dir = os.path.join(zarr_path, name)
        assert os.path.exists(os.path.join(node_dir, "zarr.json")), name
        assert not os.path.exists(os.path.join(node_dir, ".zarray")), name
        meta = json.load(open(os.path.join(node_dir, "zarr.json")))
        assert meta["zarr_format"] == 3 and meta["node_type"] == "array", name

    time_labels = zs.read_array(g.arrays["time"])
    assert len(time_labels) == 6
    cdp_x = zs.read_array(g.arrays["cdp_x"])
    assert cdp_x.shape == (4, 3)
    for il, xl in rows:
        assert cdp_x[il - 1, xl - 1] == pytest.approx(
            (700000 + il * 100 + xl * 3) / 100.0
        )


def test_v3_unknown_array_codec_not_silently_dropped(tmp_path):
    """A spec-valid chain [transpose, bytes, gzip] must raise — gunzipping
    and reshaping without undoing the transpose would scramble values."""
    import json

    root = str(tmp_path / "tr.zarr")
    os.makedirs(os.path.join(root, "a", "c"))
    json.dump(
        {"zarr_format": 3, "node_type": "group", "attributes": {}},
        open(os.path.join(root, "zarr.json"), "w"),
    )
    json.dump(
        {
            "zarr_format": 3,
            "node_type": "array",
            "shape": [2, 2],
            "data_type": "float32",
            "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [2, 2]}},
            "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
            "fill_value": 0.0,
            "codecs": [
                {"name": "transpose", "configuration": {"order": [1, 0]}},
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "gzip", "configuration": {"level": 1}},
            ],
            "attributes": {},
            "dimension_names": ["x", "y"],
        },
        open(os.path.join(root, "a", "zarr.json"), "w"),
    )
    import gzip as _gz

    os.makedirs(os.path.join(root, "a", "c", "0"), exist_ok=True)
    with open(os.path.join(root, "a", "c", "0", "0"), "wb") as f:
        f.write(_gz.compress(b"\x00" * 16, 1))
    g = zs.open_group(root)
    with pytest.raises(zs.UnsupportedCodecError, match="transpose"):
        zs.read_array(g.arrays["a"])


def test_cli_zarr_v3_roundtrip(tmp_path, spark):
    """CLI surface: export-zarr --zarr-format 3 -> import-zarr."""
    from tests.segy_factory import make_poststack_3d

    from mdio_python_spark.__main__ import main

    sgy = str(tmp_path / "c.sgy")
    make_poststack_3d(sgy, n_inline=4, n_crossline=3, n_samples=6)
    store = str(tmp_path / "store")
    zarr_path = str(tmp_path / "z3.zarr")
    out_pq = str(tmp_path / "traces3.parquet")
    assert main(["import", sgy, store]) == 0
    assert main(["export-zarr", store, zarr_path, "--zarr-format", "3"]) == 0
    assert os.path.exists(os.path.join(zarr_path, "zarr.json"))
    assert main(["import-zarr", zarr_path, out_pq]) == 0
    df = spark.read.parquet(out_pq)
    assert df.count() == 12


def test_v3_write_translates_zlib_to_gzip(tmp_path):
    """ADVICE r3: an explicit {'id':'zlib'} with zarr_format=3 must not
    emit codec name 'zlib' (not a v3 spec codec). Metadata AND chunk bytes
    both carry the gzip translation, so the store self-reads."""
    import json as _json

    root = str(tmp_path / "v3zlib.zarr")
    os.makedirs(root)
    write_group_meta_v3(root)
    data = np.arange(12, dtype="<f4").reshape(3, 4)
    zs.write_array_meta(
        root, "a", (3, 4), (3, 4), np.dtype("<f4"), ["x", "y"],
        {"id": "zlib", "level": 3}, zarr_format=3,
    )
    zs.write_chunk(
        root, "a", (0, 0), data, (3, 4), {"id": "zlib", "level": 3},
        zarr_format=3,
    )
    meta = _json.load(open(os.path.join(root, "a", "zarr.json")))
    names = [c["name"] for c in meta["codecs"]]
    assert "zlib" not in names and "gzip" in names
    grp = zs.open_group(root)
    got = zs.read_array(grp.arrays["a"])
    np.testing.assert_array_equal(got, data)


def test_v3_write_rejects_unknown_codec(tmp_path):
    root = str(tmp_path / "v3bad.zarr")
    os.makedirs(root)
    with pytest.raises(zs.UnsupportedCodecError, match="lzma"):
        zs.write_array_meta(
            root, "a", (2,), (2,), np.dtype("<f4"), ["x"],
            {"id": "lzma", "preset": 1}, zarr_format=3,
        )


@pytest.mark.parametrize("zarr_format", [2, 3])
def test_nan_fill_serializes_as_spec_string(tmp_path, zarr_format):
    """Non-finite float fills must serialize as the spec's string forms
    ("NaN"/"Infinity"/"-Infinity"), never a bare NaN JSON token."""
    import json as _json

    root = str(tmp_path / f"nanfill{zarr_format}.zarr")
    os.makedirs(root)
    (write_group_meta_v3 if zarr_format == 3 else write_group_meta)(root)
    zs.write_array_meta(
        root, "a", (4,), (2,), np.dtype("<f4"), ["x"], None,
        fill_value=float("nan"), zarr_format=zarr_format,
    )
    meta_file = os.path.join(
        root, "a", "zarr.json" if zarr_format == 3 else ".zarray"
    )
    raw = open(meta_file).read()
    assert '"NaN"' in raw
    _json.loads(raw)  # strict: must be valid JSON without NaN tokens
    # only chunk 1 written; chunk 0 must materialize as NaN fill
    zs.write_chunk(
        root, "a", (1,), np.array([7, 8], dtype="<f4"), (2,), None,
        zarr_format=zarr_format,
    )
    grp = zs.open_group(root)
    got = zs.read_array(grp.arrays["a"])
    assert np.isnan(got[:2]).all()
    np.testing.assert_array_equal(got[2:], [7.0, 8.0])


def test_zarr_roundtrip_query_exact(spark):
    """Exact-value local gate for the declared ``zarr_store_roundtrip``
    query: SEG-Y -> store -> zarr v2 -> open_mdio must reproduce bit-exact
    stats of the synthesized cube (same mirror as the SEG-Y gate)."""
    from tests.test_segy_roundtrip import _mirror_exact_stats

    from mdio_python_spark.plans.registry import registry
    from mdio_python_spark.plans.seismic_queries import _synthetic_cube

    [row] = registry()["zarr_store_roundtrip"].fn(spark, "unused").collect()
    cube = _synthetic_cube(spark, 6, 5, 16).select("samples").collect()
    samples = np.array([r.samples for r in cube], dtype=np.float32).ravel()
    n, mean, std = _mirror_exact_stats(samples)
    assert row.n_traces == 30
    assert row["count"] == n == 480
    assert row["mean"] == mean
    assert row["std"] == std


def _shard_bytes(inner_blocks, grid, index_location="end", crc=True, comp=None):
    """Independently construct one v3 shard per the public spec: inner
    chunk payloads + uint64-LE (offset, nbytes) index (+crc32c)."""
    import struct as _struct
    import zlib as _zlib

    n = 1
    for g in grid:
        n *= g
    payloads = {}
    for flat, block in inner_blocks.items():
        raw = block.tobytes()
        payloads[flat] = _zlib.compress(raw, 1) if comp == "zlib" else (
            __import__("gzip").compress(raw, 1, mtime=0) if comp == "gzip" else raw
        )
    index = []
    body = b""
    idx_size = n * 16 + (4 if crc else 0)
    offset = idx_size if index_location == "start" else 0
    for flat in range(n):
        if flat in payloads:
            index.append((offset, len(payloads[flat])))
            body += payloads[flat]
            offset += len(payloads[flat])
        else:
            index.append(((1 << 64) - 1, (1 << 64) - 1))
    table = b"".join(_struct.pack("<QQ", o, s) for o, s in index)
    if crc:
        from mdio_python_spark.sources.zarr_store import _crc32c

        table += _struct.pack("<I", _crc32c(table))
    return (table + body) if index_location == "start" else (body + table)


@pytest.mark.parametrize("index_location,crc", [("end", True), ("start", False)])
def test_v3_sharding_indexed_read(tmp_path, index_location, crc):
    """Read an independently-constructed sharded v3 array: 8x6 array,
    4x6 shards, 2x3 inner chunks (gzip), one ABSENT inner chunk that must
    materialize as fill."""
    import json

    root = str(tmp_path / f"shard_{index_location}.zarr")
    os.makedirs(os.path.join(root, "a", "c", "0"))
    os.makedirs(os.path.join(root, "a", "c", "1"))
    json.dump(
        {"zarr_format": 3, "node_type": "group", "attributes": {}},
        open(os.path.join(root, "zarr.json"), "w"),
    )
    index_codecs = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if crc:
        index_codecs.append({"name": "crc32c"})
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [8, 6],
        "data_type": "float32",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4, 6]}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": -1.0,
        "codecs": [
            {
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": [2, 3],
                    "codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        {"name": "gzip", "configuration": {"level": 1}},
                    ],
                    "index_codecs": index_codecs,
                    "index_location": index_location,
                },
            }
        ],
        "attributes": {},
        "dimension_names": ["x", "y"],
    }
    json.dump(meta, open(os.path.join(root, "a", "zarr.json"), "w"))

    data = np.arange(48, dtype="<f4").reshape(8, 6)
    # shard (0,0): rows 0-3; shard (1,0): rows 4-7. inner grid (2,2).
    for srow, missing in ((0, None), (1, 3)):  # shard 1 drops inner chunk 3
        shard_data = data[srow * 4 : (srow + 1) * 4]
        inner_blocks = {}
        for flat in range(4):
            if flat == missing:
                continue
            ci, cj = divmod(flat, 2)
            inner_blocks[flat] = shard_data[ci * 2 : (ci + 1) * 2, cj * 3 : (cj + 1) * 3]
        raw = _shard_bytes(
            inner_blocks, (2, 2), index_location=index_location, crc=crc, comp="gzip"
        )
        with open(os.path.join(root, "a", "c", str(srow), "0"), "wb") as f:
            f.write(raw)

    grp = zs.open_group(root)
    arr = grp.arrays["a"]
    assert arr.sharding is not None
    assert arr.sharding.inner_chunks == (2, 3)
    got = zs.read_array(arr)
    expect = data.copy()
    expect[6:8, 3:6] = -1.0  # the absent inner chunk -> fill
    np.testing.assert_array_equal(got, expect)
    # region read crossing shard boundaries
    sub = zs.read_region(arr, (slice(3, 7), slice(2, 6)))
    np.testing.assert_array_equal(sub, expect[3:7, 2:6])


def test_v3_shard_index_crc_mismatch_rejected(tmp_path):
    import json

    root = str(tmp_path / "shardbad.zarr")
    os.makedirs(os.path.join(root, "a", "c", "0"))
    json.dump(
        {"zarr_format": 3, "node_type": "group", "attributes": {}},
        open(os.path.join(root, "zarr.json"), "w"),
    )
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [2, 3],
        "data_type": "int64",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [2, 3]}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": 0,
        "codecs": [
            {
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": [2, 3],
                    "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
                    "index_codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        {"name": "crc32c"},
                    ],
                    "index_location": "end",
                },
            }
        ],
        "attributes": {},
        "dimension_names": ["x", "y"],
    }
    json.dump(meta, open(os.path.join(root, "a", "zarr.json"), "w"))
    block = np.arange(6, dtype="<i8").reshape(2, 3)
    raw = bytearray(_shard_bytes({0: block}, (1, 1), crc=True))
    raw[-1] ^= 0xFF  # corrupt the crc
    with open(os.path.join(root, "a", "c", "0", "0"), "wb") as f:
        f.write(bytes(raw))
    grp = zs.open_group(root)
    with pytest.raises(ValueError, match="crc32c mismatch"):
        zs.read_array(grp.arrays["a"])


def _independent_read_sharded_v3(root: str, name: str) -> np.ndarray:
    """Spec-level independent reader for our sharded WRITER's output:
    parses zarr.json + each shard's trailing uint64 index + crc32c and
    gunzips inner chunks, sharing no code with zarr_store."""
    import gzip
    import json
    import math
    import zlib

    d = os.path.join(root, name)
    meta = json.load(open(os.path.join(d, "zarr.json")))
    [outer] = [c for c in meta["codecs"] if c["name"] == "sharding_indexed"]
    cfg = outer["configuration"]
    assert cfg["index_location"] == "end"
    assert [c["name"] for c in cfg["index_codecs"]] == ["bytes", "crc32c"]
    inner_chunks = tuple(cfg["chunk_shape"])
    gz = any(c["name"] == "gzip" for c in cfg["codecs"])
    shard_chunks = tuple(meta["chunk_grid"]["configuration"]["chunk_shape"])
    shape = tuple(meta["shape"])
    dtype = np.dtype({"int32": "<i4", "float32": "<f4"}[meta["data_type"]])
    fill = meta["fill_value"]
    out = np.full(shape, fill, dtype=dtype)
    sgrid = [math.ceil(s / c) for s, c in zip(shape, shard_chunks)]
    igrid = tuple(s // c for s, c in zip(shard_chunks, inner_chunks))
    n_inner = int(np.prod(igrid))
    for sidx in np.ndindex(*sgrid):
        p = os.path.join(d, "c", *map(str, sidx))
        if not os.path.exists(p):
            continue
        raw = open(p, "rb").read()
        idx = raw[-(n_inner * 16 + 4):]
        table, crc = idx[:-4], idx[-4:]
        # crc32c != zlib.crc32; recompute with the bit-reflected 0x1EDC6F41
        def crc32c(bs):
            c = 0xFFFFFFFF
            for b in bs:
                c ^= b
                for _ in range(8):
                    c = (c >> 1) ^ (0x82F63B78 if c & 1 else 0)
            return c ^ 0xFFFFFFFF
        assert int.from_bytes(crc, "little") == crc32c(table)
        pairs = np.frombuffer(table, dtype="<u8").reshape(n_inner, 2)
        for flat, cidx in enumerate(np.ndindex(*igrid)):
            off, nb = int(pairs[flat, 0]), int(pairs[flat, 1])
            if off == 2**64 - 1:
                continue
            buf = raw[off:off + nb]
            if gz:
                buf = gzip.decompress(buf)
            inner = np.frombuffer(buf, dtype=dtype).reshape(inner_chunks)
            base = [si * sc + ci * ic for si, sc, ci, ic in
                    zip(sidx, shard_chunks, cidx, inner_chunks)]
            sel = tuple(
                slice(b, min(b + ic, s))
                for b, ic, s in zip(base, inner_chunks, shape)
            )
            out[sel] = inner[tuple(slice(0, x.stop - x.start) for x in sel)]
    del zlib
    return out


def test_v3_sharded_write_roundtrip_and_independent_read(tmp_path):
    """Write a sharded v3 array with write_array_meta + write_shard; read
    it back with our reader AND an independent spec-level parser."""
    root = str(tmp_path / "shardw.zarr")
    write_group_meta_v3(root)
    rng = np.random.default_rng(7)
    data = rng.integers(0, 1000, size=(10, 9), dtype=np.int32)
    # plant an all-fill inner-chunk region: shard (0,0)'s inner chunk (1,1)
    data[2:4, 3:6] = 0
    shard_chunks, inner = (4, 6), (2, 3)
    zs.write_array_meta(
        root, "v", data.shape, inner, np.dtype("<i4"), ["i", "j"],
        {"id": "gzip", "level": 1}, fill_value=0, zarr_format=3,
        shard_chunks=shard_chunks,
    )
    import math as _math
    sgrid = [
        _math.ceil(s / c) for s, c in zip(data.shape, shard_chunks)
    ]
    for sidx in np.ndindex(*sgrid):
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(sidx, shard_chunks, data.shape)
        )
        zs.write_shard(
            root, "v", sidx, data[sel], shard_chunks, inner,
            {"id": "gzip", "level": 1}, fill_value=0,
        )
    # our reader
    g = zs.open_group(root)
    arr = g.arrays["v"]
    assert arr.sharding is not None and arr.sharding.inner_chunks == inner
    np.testing.assert_array_equal(zs.read_array(arr), data)
    # independent spec-level parser
    np.testing.assert_array_equal(
        _independent_read_sharded_v3(root, "v"), data
    )
    # the planted fill inner chunk must be ABSENT in shard (0,0)'s index
    raw = open(os.path.join(root, "v", "c", "0", "0"), "rb").read()
    n_inner = 4  # (4,6) shard over (2,3) inner -> 2x2
    table = raw[-(n_inner * 16 + 4):-4]
    pairs = np.frombuffer(table, dtype="<u8").reshape(n_inner, 2)
    assert pairs[3, 0] == 2**64 - 1 and pairs[3, 1] == 2**64 - 1


def test_v3_sharded_meta_rejects_non_multiple_and_v2(tmp_path):
    root = str(tmp_path / "bad.zarr")
    with pytest.raises(ValueError, match="multiple"):
        zs.write_array_meta(
            root, "v", (8, 8), (3, 3), np.dtype("<i4"), ["i", "j"], None,
            zarr_format=3, shard_chunks=(4, 4),
        )
    with pytest.raises(ValueError, match="v3"):
        zs.write_array_meta(
            root, "v", (8, 8), (2, 2), np.dtype("<i4"), ["i", "j"], None,
            zarr_format=2, shard_chunks=(4, 4),
        )


def test_store_to_zarr_sharded_output_equals_unsharded(tmp_path, spark):
    """shard_factor changes the FILE layout only: the sharded v3 export
    must read back identical to the unsharded one, with fewer chunk
    files on disk."""
    from tests.segy_factory import make_poststack_3d

    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry

    sgy = str(tmp_path / "c.sgy")
    make_poststack_3d(sgy, n_inline=6, n_crossline=5, n_samples=4)
    store = str(tmp_path / "store")
    template = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": [], "chunks": [2, 2, 4]}
    )
    segy_to_store(spark, sgy, store, template)
    plain, sharded = str(tmp_path / "p.zarr"), str(tmp_path / "s.zarr")
    n1 = zs.store_to_zarr(spark, store, plain, zarr_format=3)
    n2 = zs.store_to_zarr(
        spark, store, sharded, zarr_format=3, shard_factor=2
    )
    assert n1 == n2 == 30
    a = zs.zarr_cube_to_df(spark, plain).orderBy("inline", "crossline").collect()
    b = zs.zarr_cube_to_df(spark, sharded).orderBy("inline", "crossline").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    g = zs.open_group(sharded)
    assert g.arrays["amplitude"].sharding is not None

    def n_files(root, name):
        tot = 0
        for r, _d, fs in os.walk(os.path.join(root, name, "c")):
            tot += len(fs)
        return tot

    assert n_files(sharded, "amplitude") < n_files(plain, "amplitude")


def test_store_to_zarr_shard_factor_validation(tmp_path, spark):
    with pytest.raises(ValueError, match="zarr_format=3"):
        zs.store_to_zarr(spark, "x", "y", zarr_format=2, shard_factor=2)
    with pytest.raises(ValueError, match=">= 1"):
        zs.store_to_zarr(spark, "x", "y", zarr_format=3, shard_factor=0)


def test_zfp_fence_names_codec():
    """ZFP chunks are a DOCUMENTED fence (SCALING.md 'ZFP read path'):
    the error must name the codec and its mode, never misparse or fall
    through to a generic message."""
    import pytest

    from mdio_python_spark.sources import zarr_store as zs

    with pytest.raises(zs.UnsupportedCodecError, match="zfp.*mode=4"):
        zs._decode_chunk(b"\x00" * 32, {"id": "zfpy", "mode": 4})
    with pytest.raises(zs.UnsupportedCodecError, match="zfp"):
        zs._decode_chunk(b"\x00" * 32, {"id": "zfp"})
