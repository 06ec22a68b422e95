"""End-to-end golden tests (SURVEY §5.2, modeled on the reference's Teapot
roundtrip ``tests/integration/test_segy_roundtrip_teapot.py``):

synthetic 3-D poststack SEG-Y -> segy_to_store -> store checks (stats,
dims, strided-slice query) -> store_to_segy -> byte-identical compare.
"""

from __future__ import annotations

import filecmp
import os

import numpy as np
import pytest

from tests.segy_factory import make_poststack_3d

from mdio_python_spark.pipelines.export import store_to_segy
from mdio_python_spark.pipelines.ingest import segy_to_store
from mdio_python_spark.schemas import default_registry
from mdio_python_spark.sources.store import dense_slice, open_store


@pytest.fixture(scope="module")
def cube(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("segy3d")
    path = str(tmp / "cube.sgy")
    headers, samples, rows = make_poststack_3d(
        path, n_inline=12, n_crossline=9, n_samples=25, dead_fraction=0.1
    )
    return path, headers, samples, rows, str(tmp)


@pytest.fixture(scope="module")
def ingested(cube, spark):
    path, headers, samples, rows, tmp = cube
    store_path = os.path.join(tmp, "store.mdio")
    template = default_registry().get("PostStack3DTime")
    dataset = segy_to_store(spark, path, store_path, template)
    return dataset, store_path


def test_stats_match_numpy(ingested, cube):
    _, _, samples, _, _ = cube
    dataset, _ = ingested
    st = dataset.variable("amplitude").stats
    nz = samples[samples != 0].astype(np.float64)
    assert st.count == nz.size
    assert st.min == pytest.approx(nz.min(), rel=1e-6)
    assert st.max == pytest.approx(nz.max(), rel=1e-6)
    # exact-decimal sums quantize each value at 1e-7
    assert st.sum == pytest.approx(nz.sum(), abs=1e-7 * nz.size)
    assert st.mean == pytest.approx(nz.mean(), rel=1e-6)
    assert st.std == pytest.approx(nz.std(ddof=1), rel=1e-6)


def test_dims_and_manifest(ingested, spark):
    dataset, store_path = ingested
    st = open_store(spark, store_path)
    assert st.spatial_dims == ["inline", "crossline"]
    sizes = {d.name: d.size for d in st.dataset.dimensions}
    assert sizes["inline"] == 12 and sizes["crossline"] == 9 and sizes["time"] == 25
    il = st.dims["inline"].orderBy("inline").toPandas()
    assert list(il["inline"]) == list(range(1, 13))
    assert list(il["inline_idx"]) == list(range(12))
    # coordinate scalar applied: cdp_x stored as double / 100
    row = st.traces.where("inline = 1").orderBy("crossline").limit(1).collect()[0]
    assert row["cdp_x"] == pytest.approx((700000 + 100 + 3) / 100.0)


def test_strided_slice_query(ingested, cube, spark):
    """The reference's flagship query shape: strided slice mean/std
    (``test_segy_roundtrip_teapot.py:264-283``)."""
    _, headers, samples, rows, _ = cube
    _, store_path = ingested
    st = open_store(spark, store_path)
    from pyspark.sql import functions as F

    got = (
        st.traces.where(F.col("inline") % 3 == 0)
        .select(F.explode("samples").alias("s"))
        .agg(F.avg("s").alias("mean"), F.stddev("s").alias("std"))
        .collect()[0]
    )
    mask = np.array([il % 3 == 0 for il, _ in rows])
    expect = samples[mask].astype(np.float64)
    assert got["mean"] == pytest.approx(expect.mean(), rel=1e-6)
    assert got["std"] == pytest.approx(expect.std(ddof=1), rel=1e-6)


def test_dense_slice_rectangle(ingested, spark):
    _, store_path = ingested
    st = open_store(spark, store_path)
    rect = dense_slice(st, spark, {"inline": (1, 4), "crossline": (1, 9)})
    assert rect.count() == 4 * 9  # dense: dead cells present as null rows
    live = rect.where("samples IS NOT NULL").count()
    assert live <= 36


def test_byte_identical_roundtrip(ingested, cube, spark):
    """Export equals input byte-for-byte (reference golden:
    ``test_segy_roundtrip_teapot.py:286-310``). Input was written in
    (inline, crossline) order, which is the export order."""
    path, _, _, _, tmp = cube
    _, store_path = ingested
    out = os.path.join(tmp, "export.sgy")
    n = store_to_segy(spark, store_path, out)
    assert os.path.getsize(out) == os.path.getsize(path)
    assert filecmp.cmp(path, out, shallow=False)
    assert n > 0


def test_masked_export(ingested, cube, spark):
    """P3 selection-mask export (masked matrix,
    ``test_segy_import_export_masked.py``)."""
    path, headers, samples, rows, tmp = cube
    _, store_path = ingested
    st = open_store(spark, store_path)
    mask = st.dims["inline"].where("inline <= 6").select("inline")
    out = os.path.join(tmp, "masked.sgy")
    n = store_to_segy(spark, store_path, out, selection_mask=mask)
    n_expected = sum(1 for il, _ in rows if il <= 6)
    assert n == n_expected
    # masked file contains exactly those traces, in order, byte-identical
    trace_bytes = 240 + 25 * 4
    with open(path, "rb") as f:
        f.seek(3600)
        original = f.read()
    with open(out, "rb") as f:
        f.seek(3600)
        masked = f.read()
    assert len(masked) == n_expected * trace_bytes
    assert masked == original[: n_expected * trace_bytes]


def test_empty_selection_raises(ingested, spark):
    from mdio_python_spark.pipelines.export import EmptySelectionError

    _, store_path = ingested
    st = open_store(spark, store_path)
    empty = st.dims["inline"].where("inline > 1000").select("inline")
    with pytest.raises(EmptySelectionError):
        store_to_segy(spark, store_path, "/tmp/should-not-exist.sgy", selection_mask=empty)


def test_raw_file_header_fidelity(spark, tmp_path):
    """Unmodeled file-header bytes survive ingest -> export verbatim (F7,
    reference ``ingestion/segy/file_headers.py:45-53`` +
    ``test_segy_roundtrip_teapot.py:139-148``): non-printable EBCDIC in the
    text header, and nonzero bytes in binary-header positions the engine
    does not model. The round-1 pipeline re-encoded both from decoded
    views, silently zeroing everything unmodeled."""
    import numpy as np

    from tests.segy_factory import write_segy_file

    extras = {
        # text header: non-printable EBCDIC content at card row 13
        1000: bytes(range(1, 32)),
        # binary header unmodeled positions: reel constants area + tail
        3200 + 60: b"\xde\xad\xbe\xef",
        3200 + 398: b"\x7f\x01",
        # modeled-but-unpropagated fields: job id / line number
        3200 + 0: (42).to_bytes(4, "big"),
        3200 + 4: (7).to_bytes(4, "big"),
    }
    headers = [
        {"inline": il, "crossline": xl}
        for il in range(1, 5)
        for xl in range(1, 4)
    ]
    rng = np.random.default_rng(23)
    samples = rng.standard_normal((len(headers), 10)).astype(np.float32)
    path = str(tmp_path / "raw.sgy")
    write_segy_file(path, headers, samples, file_header_extras=extras)

    store_path = str(tmp_path / "store")
    template = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": []}
    )
    segy_to_store(spark, path, store_path, template)
    out = str(tmp_path / "export.sgy")
    store_to_segy(spark, store_path, out)
    assert filecmp.cmp(path, out, shallow=False)
    # explicit: the planted bytes specifically are present
    with open(out, "rb") as f:
        exported = f.read(3600)
    for off, blob in extras.items():
        assert exported[off : off + len(blob)] == blob


def test_extended_headers_roundtrip(spark, tmp_path):
    """A rev2-style file with extended textual headers parses correctly
    (trace seeks account for the extra 3200-byte blocks) and exports
    byte-identically (round 1 failed the whole-trace divisibility check
    with a misleading 'trailing bytes' error,
    ``sources/segy.py`` data-offset fix per ADVICE)."""
    import numpy as np

    from tests.segy_factory import write_segy_file
    from mdio_python_spark.sources.segy import segy_file_info

    headers = [
        {"inline": il, "crossline": xl}
        for il in range(1, 5)
        for xl in range(1, 4)
    ]
    rng = np.random.default_rng(29)
    samples = rng.standard_normal((len(headers), 10)).astype(np.float32)
    path = str(tmp_path / "ext.sgy")
    write_segy_file(
        path,
        headers,
        samples,
        extended_texts=[b"EXTENDED HEADER ONE", b"\x01\x02 second block \xff"],
    )

    info = segy_file_info(path)
    assert info.extended_headers == 2
    assert info.num_traces == len(headers)
    assert len(info.raw_extended_headers) == 2 * 3200

    store_path = str(tmp_path / "store")
    template = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": []}
    )
    segy_to_store(spark, path, store_path, template)
    out = str(tmp_path / "export.sgy")
    store_to_segy(spark, store_path, out)
    assert filecmp.cmp(path, out, shallow=False)


def test_variable_extended_headers_rejected(tmp_path):
    """extended_headers = -1 (variable count) is rejected explicitly."""
    import numpy as np
    import pytest as _pytest

    from tests.segy_factory import write_segy_file
    from mdio_python_spark.sources.segy import segy_file_info

    path = str(tmp_path / "varext.sgy")
    write_segy_file(
        path,
        [{"inline": 1, "crossline": 1}],
        np.zeros((1, 4), dtype=np.float32),
        file_header_extras={3200 + 304: (-1).to_bytes(2, "big", signed=True)},
    )
    with _pytest.raises(ValueError, match="variable extended text header"):
        segy_file_info(path)


def test_ibm32_byte_identical_roundtrip(spark, tmp_path):
    """IBM32 (data_format=1) SEG-Y survives ingest -> export byte-for-byte
    (reference: ``test_segy_ibm32_header_roundtrip.py``): decode promotes
    IBM32 to float, export re-encodes, and the normalized words produced by
    an independent scalar encoder must reproduce exactly."""
    path = str(tmp_path / "ibm.sgy")
    make_poststack_3d(path, n_inline=5, n_crossline=4, n_samples=12, data_format=1)
    store_path = str(tmp_path / "store")
    segy_to_store(spark, path, store_path, default_registry().get("PostStack3DTime"))
    out = str(tmp_path / "export.sgy")
    n = store_to_segy(spark, store_path, out)
    assert n == 20
    assert os.path.getsize(out) == os.path.getsize(path)
    assert filecmp.cmp(path, out, shallow=False)


def _mirror_exact_stats(samples: np.ndarray):
    """Pure-Python mirror of summary_statistics' exact-decimal path
    (functions/determinism.py): per-value HALF_UP quantize at scale 4,
    exact decimal sums, then the same IEEE double formulas."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    vals = samples[samples != 0].astype(np.float64)
    q = Decimal("0.0001")
    decs = [Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP) for v in vals]
    n = len(decs)
    sum_d = float(sum(decs))
    ssq_d = float(sum(d * d for d in decs))
    mean = sum_d / float(n)
    var = (ssq_d - (sum_d * sum_d) / float(n)) / (float(n) - 1.0)
    return n, mean, math.sqrt(var)


def test_seismic_roundtrip_query_exact(spark):
    """Exact-value local gate for the declared ``seismic_ingest_roundtrip``
    query (VERDICT r4 item 4): the whole SEG-Y write -> ingest -> store ->
    stats pipeline must reproduce bit-exact statistics of the synthesized
    cube (collected once from the same Spark expressions)."""
    from mdio_python_spark.plans.registry import registry
    from mdio_python_spark.plans.seismic_queries import _synthetic_cube

    [row] = registry()["seismic_ingest_roundtrip"].fn(spark, "unused").collect()
    cube = _synthetic_cube(spark, 6, 5, 16).select("samples").collect()
    samples = np.array([r.samples for r in cube], dtype=np.float32).ravel()
    n, mean, std = _mirror_exact_stats(samples)
    assert (row.n_inline, row.n_crossline) == (6, 5)
    assert row["count"] == n == 480
    assert row["mean"] == mean
    assert row["std"] == std
