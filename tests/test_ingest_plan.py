"""Scale-shape regression tests for the ingest trace pass.

The round-1 pipeline joined the payload to the header-pass assignment on
``src_trace_idx`` (an equal-cardinality sort-merge join: one full payload
shuffle) and then shuffled again on the chunk keys. The rewrite replays
strategies per-row from broadcast literals, so the ONLY hash exchange in
the trace-pass plan must be the chunk-key repartition, and statsV1 must
fall out of the same action via observe() (no extra payload job).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.segy_factory import FIELD_OFFSETS, write_segy_file

from mdio_python_spark.operators import grid as grid_mod
from mdio_python_spark.pipelines import ingest as ing
from mdio_python_spark.schemas import default_registry
from mdio_python_spark.sources import store as store_mod

SPEC = {
    name: (off, ">i4" if fmt == ">i" else ">i2")
    for name, (off, fmt) in FIELD_OFFSETS.items()
}


@pytest.fixture
def poststack_file(tmp_path):
    headers = [
        {"inline": il, "crossline": xl}
        for il in range(1, 11)
        for xl in range(1, 11)
    ]
    rng = np.random.default_rng(5)
    samples = rng.standard_normal((len(headers), 16)).astype(np.float32)
    path = str(tmp_path / "plan.sgy")
    write_segy_file(path, headers, samples)
    return path, samples


def test_trace_pass_single_hash_exchange(tmp_path, spark, poststack_file, monkeypatch):
    """The trace-pass payload plan never sort-merge-joins or windows the
    payload, and carries AT MOST the one chunk-key hash exchange — ZERO
    when the header stats prove the file grid-ordered (round-8 direct
    write: each scan task lands in O(1) chunk dirs, so the consolidation
    shuffle is skipped; a scrambled file keeps exactly one)."""
    path, samples = poststack_file
    captured = {}
    orig = store_mod.write_data

    def spy(traces, dim_tables, store_path, chunks, codec="zstd", direct=False):
        spatial = list(chunks)
        with_keys = grid_mod.chunk_keys(
            traces, spatial, [chunks[d] for d in spatial]
        )
        chunk_cols = [f"{d}_chunk" for d in spatial]
        if not direct:
            with_keys = with_keys.repartition(*chunk_cols)
        captured["plan"] = (
            with_keys._jdf.queryExecution().executedPlan().toString()
        )
        captured["direct"] = direct
        return orig(traces, dim_tables, store_path, chunks, codec, direct)

    monkeypatch.setattr(store_mod, "write_data", spy)
    monkeypatch.setattr(ing.store, "write_data", spy)

    tmpl = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": []}
    )
    ds = ing.segy_to_store(
        spark, path, str(tmp_path / "store"), tmpl, header_spec=SPEC
    )

    plan = captured["plan"]
    # the factory file is inline/crossline-ordered: the measured header
    # stats must pick the direct path and the payload plan must be
    # exchange-free
    assert captured["direct"] is True
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "SortMergeJoin" not in plan, plan
    assert "WindowExec" not in plan, plan

    # statsV1 folded into the write action: compare to a direct numpy pass
    s = samples.astype(np.float64)
    nz = s[s != 0.0]
    st = ds.variables[0].stats
    assert st.count == nz.size
    assert st.min == pytest.approx(nz.min(), abs=0)
    assert st.max == pytest.approx(nz.max(), abs=0)
    assert st.sum == pytest.approx(nz.sum(), abs=1e-5)
    assert st.sum_squares == pytest.approx((nz * nz).sum(), abs=1e-5)


def test_store_roundtrip_values_after_rewrite(tmp_path, spark, poststack_file):
    """Cell assignment via broadcast literals matches the header values:
    every (inline, crossline) cell holds its original trace samples."""
    path, samples = poststack_file
    tmpl = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": []}
    )
    ing.segy_to_store(spark, path, str(tmp_path / "store"), tmpl, header_spec=SPEC)
    st = store_mod.open_store(spark, str(tmp_path / "store"))
    rows = st.traces.select(
        "inline", "crossline", "inline_idx", "crossline_idx", "src_trace_idx", "samples"
    ).collect()
    assert len(rows) == 100
    for r in rows:
        # file order was inline-major 10x10, values 1..10 -> idx = value-1
        assert r["inline_idx"] == r["inline"] - 1
        assert r["crossline_idx"] == r["crossline"] - 1
        expect = samples[(r["inline"] - 1) * 10 + (r["crossline"] - 1)]
        assert np.allclose(np.array(r["samples"], dtype=np.float32), expect)
        assert r["src_trace_idx"] == (r["inline"] - 1) * 10 + (r["crossline"] - 1)


def test_shot_dense_paths_identical(spark, monkeypatch):
    """The Type-A dense shot map must be identical whether it is collected
    to a driver literal (small maps) or kept distributed past the
    SHOT_DENSE_LITERAL_MAX cardinality guard (the 100x path — a
    multi-million-row dim table through spark.createDataFrame is a driver
    stall; reference parity anchor: index_strategies.py:292-297 collects
    unconditionally)."""
    from mdio_python_spark.schemas.overrides import GridOverrides

    class _SchemaStub:
        dimensions = ()
        spatial_dims = ["shot_line", "gun", "shot_index"]

    # Type A: both guns share the same shot values per line
    data = [
        (line, gun, sp)
        for line in (1, 2)
        for gun in (1, 2)
        for sp in range(10, 35)
    ]
    headers = spark.createDataFrame(
        data, "shot_line long, gun long, shot_point long"
    )
    ov = GridOverrides(calculate_shot_index=True)

    plan_lit = ing._build_strategy_plan(spark, headers, _SchemaStub(), ov)
    monkeypatch.setattr(ing, "SHOT_DENSE_LITERAL_MAX", 0)
    plan_dist = ing._build_strategy_plan(spark, headers, _SchemaStub(), ov)

    assert plan_lit.shot_mode == plan_dist.shot_mode == "dense"
    lit_rows = sorted(map(tuple, plan_lit.shot_dense.collect()))
    dist_rows = sorted(map(tuple, plan_dist.shot_dense.collect()))
    assert lit_rows == dist_rows
    assert len(lit_rows) == 50  # 2 lines x 25 unique shots

    # the applying join produces the same per-trace assignment either way
    out_lit = sorted(
        map(tuple, ing._apply_plan(headers, plan_lit).collect())
    )
    out_dist = sorted(
        map(tuple, ing._apply_plan(headers, plan_dist).collect())
    )
    assert out_lit == out_dist


def test_scrambled_file_keeps_consolidation_shuffle(tmp_path, spark, monkeypatch):
    """A file whose trace order scatters across the chunk grid must keep
    the chunk-key exchange (direct write would explode file counts)."""
    import random

    rng = random.Random(3)
    # the grid must span > DIRECT_WRITE_MAX_KEYS_PER_BLOCK chunk keys
    # (inline chunk = 128) or even a scrambled file fits one chunk and
    # direct is correctly chosen: 640 inlines = 5 inline chunks
    cells = [
        {"inline": il, "crossline": xl}
        for il in range(1, 641)
        for xl in range(1, 3)
    ]
    rng.shuffle(cells)
    rs = np.random.default_rng(6)
    samples = rs.standard_normal((len(cells), 8)).astype(np.float32)
    path = str(tmp_path / "scrambled.sgy")
    write_segy_file(path, cells, samples)

    captured = {}
    orig = store_mod.write_data

    def spy(traces, dim_tables, store_path, chunks, codec="zstd", direct=False):
        captured["direct"] = direct
        return orig(traces, dim_tables, store_path, chunks, codec, direct)

    monkeypatch.setattr(store_mod, "write_data", spy)
    monkeypatch.setattr(ing.store, "write_data", spy)
    tmpl = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": []}
    )
    sc = {}
    ing.segy_to_store(
        spark, path, str(tmp_path / "store"), tmpl, header_spec=SPEC,
        block_size=10, stage_clock=sc,
    )
    assert captured["direct"] is False
    assert sc["write_mode"] == "shuffle"

    from mdio_python_spark.sources.store import open_store

    st = open_store(spark, str(tmp_path / "store"))
    assert st.traces.count() == len(cells)
