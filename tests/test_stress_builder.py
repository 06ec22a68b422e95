"""Scale-stress dataset builder: replica counts, key disjointness, and
the shingle-breaking text perturbation that keeps dedup outputs linear
in the scale factor."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mdio_python_spark.operators.dedup import word_shingles
from mdio_python_spark.pipelines.stress import KEY_STRIDE, build_scaled_dir
from mdio_python_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_scaled_counts_and_key_disjointness(spark, tmp_path):
    out = build_scaled_dir(spark, SF, str(tmp_path / "x3"), 3)
    for table in ("documents", "lineitem", "events", "embeddings"):
        base_n = load_table(spark, SF, table).count()
        assert load_table(spark, out, table).count() == 3 * base_n
    for table in ("nation", "region"):  # dims copied once
        assert (
            load_table(spark, out, table).count()
            == load_table(spark, SF, table).count()
        )
    # each replica's ids live in a disjoint stride band
    docs = load_table(spark, out, "documents")
    bands = (
        docs.groupBy((F.col("doc_id") / KEY_STRIDE).cast("long").alias("band"))
        .count()
        .collect()
    )
    base_n = load_table(spark, SF, "documents").count()
    assert {r.band for r in bands} == {0, 1, 2}
    assert all(r["count"] == base_n for r in bands)


def test_scaled_replicas_share_no_shingles(spark, tmp_path):
    """Every 3rd word perturbed => zero 3-gram overlap across replicas,
    so LSH/near-dup output scales linearly instead of quadratically."""
    out = build_scaled_dir(spark, SF, str(tmp_path / "x2"), 2)
    docs = load_table(spark, out, "documents").where(
        F.col("doc_id") % KEY_STRIDE < 20
    )
    sh = word_shingles(docs, 3).withColumn(
        "band", (F.col("doc_id") / KEY_STRIDE).cast("long")
    )
    overlap = (
        sh.where(F.col("band") == 0)
        .select("shingle")
        .intersect(sh.where(F.col("band") == 1).select("shingle"))
        .count()
    )
    assert overlap == 0


def test_builder_idempotent_marker(spark, tmp_path):
    out_dir = str(tmp_path / "x2")
    build_scaled_dir(spark, SF, out_dir, 2)
    marker = json.loads((tmp_path / "x2" / "_STRESS_MARKER.json").read_text())
    before = marker.copy()
    build_scaled_dir(spark, SF, out_dir, 2)  # no rebuild, marker unchanged
    assert (
        json.loads((tmp_path / "x2" / "_STRESS_MARKER.json").read_text())
        == before
    )


def test_seismic_stress_cube_parses(tmp_path, spark):
    """The vectorized stress-cube writer must produce a cube the engine
    reads identically to the struct-packed test factory layout: file
    info, trace count, header fields, and sample decode all line up."""
    import numpy as np

    from tools.stress_seismic import build_cube

    from mdio_python_spark.sources import segy

    path = str(tmp_path / "cube.sgy")
    n = build_cube(path, n_inline=4, n_crossline=3, n_samples=8)
    info = segy.segy_file_info(path)
    assert info.num_traces == n == 12
    assert info.samples_per_trace == 8
    assert info.data_format == 5
    df = segy.read_traces(
        spark, info, fields=["inline", "crossline", "cdp_x"], include_samples=True
    )
    rows = df.orderBy("inline", "crossline").collect()
    assert [(r.inline, r.crossline) for r in rows] == [
        (il, xl) for il in range(1, 5) for xl in range(1, 4)
    ]
    assert rows[0].cdp_x == 700000 + 1 * 100 + 1 * 3
    assert all(np.isfinite(rows[0].samples))
