"""Declared-query registry shared by all query modules.

Conventions (driver contract, see /root/repo/__spark_entry__.py):
- each builder takes ``(spark, sf_dir)`` and returns a DataFrame;
- every computed column is aliased identically in Spark and oracle SQL;
- float aggregates use exact-decimal determinism (functions.determinism);
- window functions order by a total order over output-visible columns;
- no raw TIMESTAMP columns in outputs (ns/us precision differs).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    # oracle semantics:
    #   "SELECT ..."        => DuckDB exact-equality oracle (driver + local)
    #   "local:<test ref>"  => non-SQL-expressible; exact-equality gate
    #                          lives in the named local test (driver sees
    #                          rows-only). Every query must have one or the
    #                          other — None is reserved for migration only.
    bench: bool = True  # False => fixed-cost smoke (e.g. pipeline roundtrip
    # on synthesized input) whose runtime is independent of sf — declared
    # for correctness but excluded from the sf-scaling bench metric
    eager: bool = False  # True => CONSTRUCTION performs unbounded
    # distributed work (a connected-components fixpoint loop, a sampled
    # k-means fit, a caching.eager() cache materialization — anything
    # whose build-time jobs scale with the corpus), so the bench must
    # start its clock BEFORE the builder call or that work escapes
    # measurement entirely. Round 7 flipped the whole shingle-verify
    # family to eager=True when their persisted shingle forks gained
    # eager materialization (the measured-stats fix for the 100x static
    # broadcast kill) — their construction now runs the shingle subtree.
    # Bounded driver literals (k centroid rows, a dim lookup) do NOT set
    # this — they are plan constants, the same class as the
    # geometry/1-row QC collects.


_REGISTRY: dict[str, QuerySpec] = {}

# The registry is exposed in NATURAL registration order (module import
# order in _ensure_loaded, then source order within a module). An earlier
# round reordered it so selected queries always landed inside an external
# harness's fixed-size check window; that curation was removed on advisor
# guidance — the code under test must not steer which queries external
# verification samples. Every oracle-declared query (head and tail alike)
# runs under the identical exact-equality DuckDB gate in
# tests/test_oracle_parity.py on every suite run, and the non-SQL queries
# carry exact local gates (oracle="local:<test>").


def register(
    name: str, oracle: str | None, bench: bool = True, eager: bool = False
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = QuerySpec(name, fn, oracle, bench, eager)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """SQL oracles only — ``local:`` gates are enforced by the test
    suite, not the cross-engine driver (DuckDB can't run them)."""
    return {
        name: spec.oracle
        for name, spec in registry().items()
        if spec.oracle is not None and not spec.oracle.startswith("local:")
    }


def _ensure_loaded() -> None:
    """Import every query module exactly once (registration side effect)."""
    # model_queries imports LAST: the round-6 fit-leg queries append to
    # the registry without shifting any earlier query's natural position.
    from mdio_python_spark.plans import (  # noqa: F401
        llm_queries,
        queries,
        seismic_queries,
    )
    from mdio_python_spark.plans import model_queries  # noqa: F401

    # qc_queries imports AFTER model_queries (round-6b gate-QC batch):
    # same append-only rule.
    from mdio_python_spark.plans import qc_queries  # noqa: F401

    # pipeline_queries appends the round-6d batch after qc_queries.
    from mdio_python_spark.plans import pipeline_queries  # noqa: F401
