"""Multi-file SEG-Y ingest (VERDICT r7 item 7): a directory of
shot/sail-line files merged into ONE store — per-file S1 validation,
global trace ordinals via prefix-sum offsets, provenance column, and
byte-identical PER-FILE export roundtrips under each file's verbatim
raw headers.
"""

from __future__ import annotations

import filecmp

import pytest
from pyspark.sql import functions as F


def _cube(spark, il_lo: int, il_hi: int, n_xl: int, ns: int):
    """Deterministic poststack slab covering inlines [il_lo, il_hi]."""
    n_il = il_hi - il_lo + 1
    base = spark.range(n_il * n_xl).select(
        (F.col("id") / n_xl + il_lo).cast("long").alias("inline"),
        (F.col("id") % n_xl + 1).cast("long").alias("crossline"),
    )
    samples = F.transform(
        F.sequence(F.lit(0), F.lit(ns - 1)),
        lambda i: (
            (F.col("inline") * 31 + F.col("crossline") * 7 + i) % 97
        ).cast("float"),
    )
    return base.withColumns(
        {
            "cdp_x": F.lit(700000) + F.col("inline") * 100 + F.col("crossline") * 3,
            "cdp_y": F.lit(900000) + F.col("crossline") * 100 - F.col("inline") * 2,
            "samples": samples,
        }
    )


def _write_cube(spark, df, path: str, ns: int, text: str = ""):
    from mdio_python_spark.sources import segy

    spec = segy.SegyWriteSpec(
        samples_per_trace=ns,
        sample_interval=2000,
        data_format=5,
        text_header=text,
    )
    segy.write_segy(
        df,
        path,
        order_by=["inline", "crossline"],
        write_spec=spec,
        header_fields=["inline", "crossline", "cdp_x", "cdp_y"],
    )


@pytest.fixture(scope="module")
def multi_store(spark, tmp_path_factory):
    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry

    tmp = tmp_path_factory.mktemp("multifile")
    ns, n_xl = 12, 4
    f_a, f_b = str(tmp / "slab_a.sgy"), str(tmp / "slab_b.sgy")
    # distinct text headers so per-file raw-header fidelity is observable
    _write_cube(spark, _cube(spark, 1, 5, n_xl, ns), f_a, ns, text="SLAB A")
    _write_cube(spark, _cube(spark, 6, 11, n_xl, ns), f_b, ns, text="SLAB B")
    store_path = str(tmp / "store")
    ds = segy_to_store(
        spark,
        [f_a, f_b],
        store_path,
        default_registry().get("PostStack3DTime"),
    )
    return {
        "paths": [f_a, f_b],
        "store": store_path,
        "dataset": ds,
        "tmp": tmp,
        "n_xl": n_xl,
    }


def test_merged_grid_and_ordinals(spark, multi_store):
    from mdio_python_spark.sources.store import open_store

    st = open_store(spark, multi_store["store"])
    dims = {d.name: d.size for d in st.dataset.dimensions}
    assert dims["inline"] == 11  # 5 from slab A + 6 from slab B
    assert st.traces.count() == 11 * multi_store["n_xl"]
    files = st.dataset.attributes["sourceFiles"]
    assert [f["traceOffset"] for f in files] == [0, 5 * multi_store["n_xl"]]
    # global ordinal: contiguous, file-offset, collision-free
    rows = st.traces.select("src_trace_idx", "source_file").collect()
    idx = sorted(r["src_trace_idx"] for r in rows)
    assert idx == list(range(11 * multi_store["n_xl"]))
    by_file = {r["src_trace_idx"]: r["source_file"] for r in rows}
    cut = 5 * multi_store["n_xl"]
    assert all(v == (0 if k < cut else 1) for k, v in by_file.items())


def test_per_file_export_byte_identical(spark, multi_store):
    from mdio_python_spark.pipelines.export import store_to_segy

    expected_traces = [5 * multi_store["n_xl"], 6 * multi_store["n_xl"]]
    for i, src in enumerate(multi_store["paths"]):
        out = str(multi_store["tmp"] / f"roundtrip_{i}.sgy")
        n = store_to_segy(spark, multi_store["store"], out, source_file=i)
        assert n == expected_traces[i]
        assert filecmp.cmp(src, out, shallow=False), src


def test_mismatched_files_rejected(spark, tmp_path):
    from mdio_python_spark.pipelines.ingest import (
        SegyFileMismatchError,
        segy_to_store,
    )
    from mdio_python_spark.schemas import default_registry

    f_a = str(tmp_path / "a.sgy")
    f_b = str(tmp_path / "b.sgy")
    _write_cube(spark, _cube(spark, 1, 3, 4, 12), f_a, 12)
    _write_cube(spark, _cube(spark, 4, 6, 4, 16), f_b, 16)  # ns differs
    with pytest.raises(SegyFileMismatchError, match="samples_per_trace"):
        segy_to_store(
            spark,
            [f_a, f_b],
            str(tmp_path / "store"),
            default_registry().get("PostStack3DTime"),
        )


def test_single_file_contract_unchanged(spark, multi_store):
    """A one-path list behaves exactly like the scalar path: no
    source_file column, no sourceFiles attribute."""
    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry
    from mdio_python_spark.sources.store import open_store

    store_path = str(multi_store["tmp"] / "single_store")
    segy_to_store(
        spark,
        multi_store["paths"][0],
        store_path,
        default_registry().get("PostStack3DTime"),
    )
    st = open_store(spark, store_path)
    assert "source_file" not in st.traces.columns
    assert "sourceFiles" not in st.dataset.attributes
