"""Access-pattern views (C5) + CLI surface tests."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.segy_factory import make_poststack_3d

from mdio_python_spark.operators import access_pattern as ap
from mdio_python_spark.pipelines.ingest import segy_to_store
from mdio_python_spark.schemas import default_registry
from mdio_python_spark.sources.store import open_store


@pytest.fixture(scope="module")
def small_store(tmp_path_factory, spark):
    tmp = tmp_path_factory.mktemp("apviews")
    sgy = str(tmp / "cube.sgy")
    make_poststack_3d(sgy, n_inline=10, n_crossline=6, n_samples=20)
    store_path = str(tmp / "store")
    segy_to_store(spark, sgy, store_path, default_registry().get("PostStack3DTime"))
    return store_path, sgy


def test_fast_view_sorted_and_manifest(small_store, spark):
    store_path, _ = small_store
    st = open_store(spark, store_path)
    ap.build_access_view(st, "crossline", num_partitions=4)
    view = ap.open_access_view(spark, st, "crossline")
    assert view.count() == st.traces.count()
    # range partitioning: files hold disjoint crossline ranges
    from pyspark.sql import functions as F

    per_file = (
        view.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("crossline").alias("lo"), F.max("crossline").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    assert all(hi < lo2 for (_, hi), (lo2, _) in zip(spans, spans[1:]))
    with open(os.path.join(store_path, "manifest.json")) as f:
        assert "fast_crossline" in json.load(f)["accessViews"]


def test_lossy_quantization_bounds_error(small_store, spark):
    store_path, _ = small_store
    st = open_store(spark, store_path)
    std = st.dataset.variable("amplitude").stats.std
    tol = 0.01 * std
    q = ap.quantize_samples(st.traces, tolerance=tol)
    orig = np.concatenate([r["samples"] for r in st.traces.orderBy("inline", "crossline").collect()])
    quant = np.concatenate([r["samples"] for r in q.orderBy("inline", "crossline").collect()])
    assert np.abs(orig - quant).max() <= tol * (1 + 1e-6)


def test_cli_info_and_export(small_store, tmp_path):
    store_path, sgy = small_store
    out = subprocess.run(
        [sys.executable, "-m", "mdio_python_spark", "info", store_path],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    info = json.loads(out.stdout)
    assert info["dimensions"] == {"inline": 10, "crossline": 6, "time": 20}
    assert "amplitude" in info["variables"]
    assert info["stats"]["count"] > 0


def test_cli_copy_preserves_layout_and_views(small_store, spark, tmp_path):
    """Regression: copy must keep the chunk-partitioned traces layout and
    ship any materialized access views the manifest advertises."""
    store_path, _ = small_store
    st = open_store(spark, store_path)
    ap.build_access_view(st, "inline", num_partitions=2)
    dest = str(tmp_path / "copy")
    out = subprocess.run(
        [
            sys.executable, "-m", "mdio_python_spark", "copy",
            store_path, dest, "--with-traces",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    copied = open_store(spark, dest)
    assert copied.traces.count() == st.traces.count()
    # chunk partition layout preserved (hive-style partition dirs)
    chunk_col = copied.chunk_cols[0]
    subdirs = [d for d in os.listdir(os.path.join(dest, "traces")) if "=" in d]
    assert any(d.startswith(f"{chunk_col}=") for d in subdirs)
    # access view directory shipped and readable
    view = ap.open_access_view(spark, copied, "inline")
    assert view.count() == st.traces.count()


def test_cli_copy_metadata_and_headers_modes(small_store, spark, tmp_path):
    """`mdio copy` parity: default = metadata+grid only; --with-headers
    ships header columns without samples; an existing destination is
    refused without --overwrite."""
    store_path, _ = small_store
    st = open_store(spark, store_path)

    meta_dest = str(tmp_path / "meta_copy")
    out = subprocess.run(
        [sys.executable, "-m", "mdio_python_spark", "copy", store_path, meta_dest],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert os.path.exists(os.path.join(meta_dest, "manifest.json"))
    assert os.path.exists(os.path.join(meta_dest, "dims", "inline"))
    # the skeleton must remain an OPENABLE store: schema-bearing empty
    # traces, manifest not advertising excluded access views
    skeleton = open_store(spark, meta_dest)
    assert skeleton.traces.count() == 0
    assert "samples" not in skeleton.traces.columns
    meta = json.load(open(os.path.join(meta_dest, "manifest.json")))
    assert "accessViews" not in meta

    # refuses to clobber without --overwrite
    out = subprocess.run(
        [sys.executable, "-m", "mdio_python_spark", "copy", store_path, meta_dest],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 1

    hdr_dest = str(tmp_path / "hdr_copy")
    out = subprocess.run(
        [
            sys.executable, "-m", "mdio_python_spark", "copy",
            store_path, hdr_dest, "--with-headers",
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    headers = spark.read.parquet(os.path.join(hdr_dest, "traces"))
    assert headers.count() == st.traces.count()
    assert "samples" not in headers.columns
    assert "inline" in headers.columns
