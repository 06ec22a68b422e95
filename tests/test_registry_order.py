"""Registry-order invariants: the driver's correctness harness checks the
FIRST 50 registered queries, so the ordering is part of the verification
contract (see plans/registry.py). These guards fail if a future
registration pushes a high-risk query out of the checked window."""

from __future__ import annotations

from mdio_python_spark.plans.registry import (
    _DRIVER_CHECK_TAIL,
    oracle_sql,
    queries,
    registry,
)

DRIVER_WINDOW = 50

# Queries that have historically broken at the environment boundary (event
# time, streams, binary pipelines) or are newest: must stay driver-checked.
RISKY = {
    "asof_view_attribution",
    "error_click_correlation",
    "events_gap_fill",
    "events_sessions",
    "events_hourly",
    "customer_order_gaps",
    "seismic_ingest_roundtrip",
    "zarr_store_roundtrip",
    "multimodal_image_features",
    "multimodal_audio_features",
    "streaming_events_hourly",
    "streaming_user_sessions",
    "streaming_dedup_replayed",
    "bm25_topk",
    "term_stats",
    "temperature_resample",
    "dataset_card_stats",
    "document_chunks",
    "embedding_pq_adc",
}


def test_risky_queries_inside_driver_window():
    order = list(queries())
    window = set(order[:DRIVER_WINDOW])
    missing = RISKY - window
    assert not missing, (
        f"high-risk queries outside the driver's first-{DRIVER_WINDOW} "
        f"window: {sorted(missing)} — demote more stable queries to "
        "_DRIVER_CHECK_TAIL in plans/registry.py"
    )


def test_tail_names_all_exist():
    reg = registry()
    stale = [n for n in _DRIVER_CHECK_TAIL if n not in reg]
    assert not stale, f"_DRIVER_CHECK_TAIL names not in registry: {stale}"


def test_tail_queries_all_have_oracles():
    """A query may only ride outside the driver window if the local
    exact-equality oracle gate still covers it."""
    osql = oracle_sql()
    uncovered = [n for n in _DRIVER_CHECK_TAIL if n not in osql]
    assert not uncovered, (
        f"tail queries without a local oracle: {uncovered} — rows-only "
        "queries must stay inside the driver window"
    )


def test_new_queries_default_into_window():
    """Anything not explicitly demoted must precede the whole tail."""
    order = list(queries())
    first_tail_pos = min(order.index(n) for n in _DRIVER_CHECK_TAIL)
    head = order[:first_tail_pos]
    assert not set(head) & set(_DRIVER_CHECK_TAIL)
    assert set(order) - set(_DRIVER_CHECK_TAIL) == set(head)
