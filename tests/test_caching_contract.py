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


def test_rotation_bounds_repeat_callers_to_one_generation(spark):
    """Regression (r4 review): a caller that never release_cached()s —
    the declared-query harness pattern — must not accumulate one
    persisted relation per call."""
    from mdio_python_spark.operators.grid import ordered_export

    spark.catalog.clearCache()  # isolate from other tests' cached relations

    def jvm_ids() -> set[int]:
        return {
            int(k)
            for k in spark.sparkContext._jsc.getPersistentRDDs().keySet()
        }

    # earlier tests' localCheckpoint RDDs (the round-11 kernel gates)
    # are RDD-level persists that clearCache() does not drop and whose
    # cleanup is GC-driven — measure the DELTA this test creates, not
    # the session-global count
    before = jvm_ids()
    df = spark.range(100).selectExpr("id AS a", "id % 7 AS b")
    for _ in range(4):
        ordered_export(df, ["a", "b"]).write.format("noop").mode(
            "overwrite"
        ).save()
    assert len(jvm_ids() - before) <= 1  # only the latest generation survives
    # explicit release still works on the final generation
    out = ordered_export(df, ["a", "b"])
    out.write.format("noop").mode("overwrite").save()
    from mdio_python_spark.operators.caching import release_cached

    release_cached(out)
    assert jvm_ids() - before == set()
