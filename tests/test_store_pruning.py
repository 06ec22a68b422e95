"""Chunk-partition pruning on store reads: slice_traces must turn
dim-value ranges into PartitionFilters on the chunk directories (a plain
value predicate reads every chunk's footers at scale)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tests.segy_factory import make_poststack_3d

from mdio_python_spark.pipelines.ingest import segy_to_store
from mdio_python_spark.schemas import default_registry
from mdio_python_spark.sources.store import open_store, slice_traces


@pytest.fixture(scope="module")
def pruning_store(tmp_path_factory, spark):
    tmp = tmp_path_factory.mktemp("prune")
    sgy = str(tmp / "cube.sgy")
    make_poststack_3d(sgy, n_inline=16, n_crossline=8, n_samples=8)
    template = default_registry().get("PostStack3DTime").model_copy(
        update={"coordinates": [], "chunks": [4, 4, 8]}
    )
    store_path = str(tmp / "store")
    segy_to_store(spark, sgy, store_path, template)
    return open_store(spark, store_path)


def _partition_filters(df) -> str:
    # FileScan metadata truncates at spark.sql.maxMetadataStringLength
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    return m.group(0) if m else ""


def test_value_filter_alone_does_not_prune(pruning_store):
    plain = pruning_store.traces.where(F.col("inline").between(1, 4))
    assert "inline_chunk" not in _partition_filters(plain)


def test_slice_traces_prunes_partitions(pruning_store):
    sel = slice_traces(pruning_store, {"inline": (1, 4), "crossline": (1, 4)})
    pf = _partition_filters(sel)
    assert "inline_chunk" in pf and "crossline_chunk" in pf
    # values match the unpruned filter exactly
    expect = (
        pruning_store.traces.where(
            F.col("inline").between(1, 4) & F.col("crossline").between(1, 4)
        )
        .select("inline", "crossline")
        .collect()
    )
    got = sel.select("inline", "crossline").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))
    assert len(got) == 16


def test_slice_traces_empty_range(pruning_store):
    sel = slice_traces(pruning_store, {"inline": (100, 200)})
    assert sel.count() == 0
    assert sel.columns == pruning_store.traces.columns
