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


def eager(df: DataFrame) -> DataFrame:
    """Materialize a persisted DataFrame NOW (one cheap ``count()``) and
    return it, so every plan built against it afterwards sees MEASURED
    ``InMemoryRelation`` statistics instead of the child plan's static
    estimates.

    Why this matters (round-6 100x driver kill): an *unmaterialized*
    cached relation reports its child's optimistic ``sizeInBytes`` to the
    static planner. At 100x corpus scale that estimate came in under
    ``spark.sql.autoBroadcastJoinThreshold`` for a multi-GiB shingle
    relation, the planner picked a broadcast join, and the
    BroadcastExchange blew past ``spark.driver.maxResultSize`` — and AQE
    can *upgrade* a shuffle join to broadcast at runtime but can never
    *demote* a statically-chosen broadcast, so there is no runtime safety
    net for that mis-plan. Once the cache is materialized,
    ``InMemoryRelation.computeStats`` returns the actual cached bytes:
    tiny relations still broadcast (statically or via AQE), corpus-sized
    ones sort-merge — the scale-correct choice at every SF, without
    blanket strategy hints that overpay when a side really is small.

    The count is ~free: the first consumer was going to materialize the
    cache anyway; doing it eagerly just moves that work before dependent
    plan construction (one extra job submission, no extra data pass).
    """
    df.count()
    return df


_SCOPED_PREV: dict[str, list[DataFrame]] = {}


def rotate_scoped(scope: str, *cached: DataFrame) -> None:
    """Self-limiting fallback for callers that never call
    :func:`release_cached` (e.g. a declared query run repeatedly by a
    correctness harness): each operator invocation unpersists the
    PREVIOUS invocation's persisted stages under the same ``scope``, so
    a long-lived session holds at most ONE generation per operator
    instead of one per call. Unpersist is always semantics-preserving —
    if some caller still holds an unexecuted plan over the previous
    stage it recomputes, it never breaks — so rotation trades worst-case
    recompute for a bounded memory/disk footprint. Explicit
    ``release_cached`` remains the precise path (double unpersist is a
    no-op)."""
    for handle in _SCOPED_PREV.get(scope, []):
        if any(_same_plan(handle, new) for new in cached):
            # The new call's persist() deduped onto THIS handle's cache
            # entry (Spark's CacheManager keys on the semantic plan, and
            # repeated invocations of the same query build the same
            # plan — it logs "Asked to cache already cached data").
            # Unpersisting the old handle would evict the shared entry
            # and leave the NEW call uncached; keep it instead.
            continue
        handle.unpersist(False)
    _SCOPED_PREV[scope] = list(cached)


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    """True when two DataFrames share a semantically-equal analyzed plan
    (the CacheManager's cache key)."""
    try:
        pa = a._jdf.queryExecution().analyzed()
        return bool(pa.sameResult(b._jdf.queryExecution().analyzed()))
    except Exception:  # noqa: BLE001 — fall back to rotating (safe)
        return False
