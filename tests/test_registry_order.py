"""Registry invariants: natural registration order, complete coverage.

The registry is exposed in natural registration order (no curation of
which queries an external check window samples — removed on advisor
guidance). What we pin instead: every registered query is either
oracle-paired (DuckDB SQL exact-equality, run by tests/test_oracle_parity)
or carries a declared local exact gate (oracle="local:<test>"), so nothing
is verified by row-count alone.
"""

from __future__ import annotations

from mdio_python_spark.plans.registry import oracle_sql, queries, registry

# Queries whose semantics DuckDB cannot oracle (binary pipelines,
# streaming). Each must declare its local exact-equality gate via the
# spec's oracle="local:<test module>" marker.
NON_SQL = {
    "seismic_ingest_roundtrip",
    "zarr_store_roundtrip",
    "multimodal_image_features",
    "multimodal_audio_features",
    "streaming_events_hourly",
    "streaming_user_sessions",
    "streaming_dedup_replayed",
}


def test_natural_registration_order():
    """registry() must reflect insertion order — no reordering layer."""
    reg = registry()
    from mdio_python_spark.plans.registry import _REGISTRY

    assert list(reg) == list(_REGISTRY)


def test_every_query_has_exact_gate():
    """No query is verified by row-count alone: SQL oracle or local gate."""
    reg = registry()
    osql = oracle_sql()
    ungated = [
        n
        for n, spec in reg.items()
        if n not in osql and not (spec.oracle or "").startswith("local:")
    ]
    assert not ungated, (
        f"queries with neither a DuckDB oracle nor a declared local "
        f"exact-equality gate: {ungated}"
    )


def test_non_sql_queries_declare_local_gates():
    reg = registry()
    for name in NON_SQL:
        assert name in reg, name
        assert (reg[name].oracle or "").startswith("local:"), (
            f"{name} is non-SQL-oracleable and must declare its local "
            f"exact gate as oracle='local:<test>'"
        )


def test_oracle_sql_excludes_local_gates():
    """The driver must see local-gated queries as rows-only (no SQL)."""
    osql = oracle_sql()
    for name, sql in osql.items():
        assert not sql.startswith("local:"), name
        assert "select" in sql.lower(), f"{name} oracle is not SQL"


def test_queries_callable_and_named():
    reg = registry()
    assert len(reg) >= 74
    for name, spec in reg.items():
        assert spec.name == name
        assert callable(spec.fn)
