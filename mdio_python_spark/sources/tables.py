"""Loaders for the driver's deterministic parquet tables (TESTDATA.md).

Schemas are declared, never inferred — mirroring the reference's
declared-schema discipline (``src/mdio/builder/schemas/core.py:10-19``:
pydantic ``extra="forbid"`` validation). Parquet carries its own schema so
declaration here is a *check*, not inference.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to a canonical TimestampType,
    shared by the batch and streaming event readers. The driver's
    ``events.parquet`` layout has varied across rounds:

    - TIMESTAMP(NANOS): with ``spark.sql.legacy.parquet.nanosAsLong`` the
      column arrives as int64 nanos; rebuild a microsecond TimestampType
      with integer division (a double round-trip would lose precision at
      ~1.7e18 ns). DuckDB truncates ns->us the same way, so oracles match.
    - timestamp[us] without tz: Spark 4 reads it as TIMESTAMP_NTZ; cast to
      TimestampType. The session tz is pinned UTC (session.py), so the
      wall-clock values are unchanged and DuckDB ``epoch_us`` parity holds.
    - already TimestampType: no-op."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    elif dtype == "int":
        # defensive: epoch seconds (another plausible on-disk drift)
        df = df.withColumn(col, F.expr(f"timestamp_seconds({col})"))
    elif dtype == "string":
        # defensive: ISO-8601 strings; UTC session tz keeps parity
        df = df.withColumn(col, F.to_timestamp(F.col(col)))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS); Spark 4 rejects it unless
        # read as raw int64.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_nanos_ts(spark.read.parquet(table_path(sf_dir, name)))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load the named tables and register them as temp views.

    Registering views lets operator code mix DataFrame API and SQL freely;
    Catalyst produces the same plan for either.
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
