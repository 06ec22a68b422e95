"""Caching contract: operators that persist intermediate stages attach the
handles to their result so callers can release them (ADVICE r3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mdio_python_spark.operators import geometry, grid
from mdio_python_spark.operators.caching import CACHE_ATTR, release_cached


def _storage_used(df) -> bool:
    return any(h.storageLevel.useMemory or h.storageLevel.useDisk
               for h in getattr(df, CACHE_ATTR, []))


def test_ordered_export_attaches_and_releases(spark):
    df = spark.range(1000).select(
        (F.col("id") % 37).alias("a"), F.col("id").alias("b")
    )
    out = grid.ordered_export(df, ["a", "b"])
    assert _storage_used(out)
    out.count()
    cached = list(getattr(out, CACHE_ATTR))
    release_cached(out, blocking=True)
    assert getattr(out, CACHE_ATTR) == []
    for h in cached:
        assert not (h.storageLevel.useMemory or h.storageLevel.useDisk)


def test_gun_geometry_attaches_and_releases(spark):
    df = spark.range(500).select(
        (F.col("id") % 3).alias("shot_line"),
        (F.col("id") % 2).alias("gun"),
        (F.col("id") % 50).alias("shot_point"),
    )
    out = geometry.gun_geometry_analysis(df)
    assert _storage_used(out)
    out.collect()
    release_cached(out, blocking=True)
    assert getattr(out, CACHE_ATTR) == []


def test_release_is_noop_without_attachment(spark):
    df = spark.range(5)
    release_cached(df)  # must not raise
