"""spark.read.format("segy") — DataSource API parity with the plain-function
scan path."""

from __future__ import annotations

import numpy as np
import pytest

from mdio_python_spark.sources import segy, segy_datasource
from tests.segy_factory import make_poststack_3d


@pytest.fixture(scope="module")
def segy_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ds") / "cube.segy")
    make_poststack_3d(path, n_inline=6, n_crossline=5, n_samples=16)
    return path


def test_format_segy_reads_headers_and_samples(spark, segy_file):
    if not segy_datasource.register(spark):
        pytest.skip("pyspark build lacks the Python DataSource API")
    df = (
        spark.read.format("segy")
        .option("path", segy_file)
        .option("fields", "inline,crossline,cdp_x")
        .option("block_size", "7")  # force multiple partitions
        .load()
    )
    assert [f.name for f in df.schema.fields] == [
        "src_trace_idx",
        "inline",
        "crossline",
        "cdp_x",
        "samples",
    ]
    rows = df.orderBy("src_trace_idx").collect()
    assert len(rows) == 30

    info = segy.segy_file_info(segy_file)
    expected = segy.read_traces(
        spark, info, ["inline", "crossline", "cdp_x"], include_samples=True
    ).orderBy("src_trace_idx").collect()
    for got, want in zip(rows, expected):
        assert (got.inline, got.crossline, got.cdp_x) == (
            want.inline,
            want.crossline,
            want.cdp_x,
        )
        np.testing.assert_array_equal(got.samples, want.samples)


def test_format_segy_header_only_prunes_samples(spark, segy_file):
    if not segy_datasource.register(spark):
        pytest.skip("pyspark build lacks the Python DataSource API")
    df = (
        spark.read.format("segy")
        .option("path", segy_file)
        .option("fields", "inline,crossline")
        .option("samples", "false")
        .load()
    )
    assert "samples" not in df.columns
    assert df.count() == 30
    agg = df.groupBy("inline").count().orderBy("inline").collect()
    assert [r["count"] for r in agg] == [5] * 6


def test_format_segy_unknown_field_errors(spark, segy_file):
    if not segy_datasource.register(spark):
        pytest.skip("pyspark build lacks the Python DataSource API")
    with pytest.raises(Exception, match="unknown header fields"):
        (
            spark.read.format("segy")
            .option("path", segy_file)
            .option("fields", "not_a_field")
            .load()
            .collect()
        )
