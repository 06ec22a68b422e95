"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``mdio_python_spark.plans.queries`` — the declared-query
registry covering SURVEY.md §2's operator inventory plus the
LLM-data-pipeline extensions.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mdio_python_spark.plans import registry as _q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the pricing-summary aggregation (the
    statsV1-style groupBy/agg at the heart of the ingest pipeline)."""
    return _q.queries()["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
