"""Caller-managed release for operators that persist intermediate stages.

Some operators (``grid.ordered_export``, ``geometry.gun_geometry_analysis``)
persist a corpus-sized intermediate because two consuming branches defeat
exchange reuse (see their docstrings). The cache is part of the returned
plan, so the operator cannot unpersist it before the caller's terminal
action — instead the persisted handles ride on the returned DataFrame and
the caller releases them once the action completes:

    out = ordered_export(df, dims)
    out.write.parquet(...)
    release_cached(out)

Long-lived sessions that skip ``release_cached`` accumulate cached
relations (and their disk spill); short-lived jobs can rely on session
teardown. ``spark.catalog.clearCache()`` also drops them, at the cost of
every other cached relation in the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CACHE_ATTR = "_mdio_cached_stages"


def attach_cached(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record ``cached`` (persisted upstream stages) on ``result`` so
    :func:`release_cached` can unpersist them after the terminal action."""
    existing = list(getattr(result, CACHE_ATTR, []))
    setattr(result, CACHE_ATTR, existing + list(cached))
    return result


def release_cached(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist every cached stage attached to ``df`` (no-op otherwise)."""
    for handle in getattr(df, CACHE_ATTR, []):
        handle.unpersist(blocking)
    setattr(df, CACHE_ATTR, [])
