"""Scalar functions from the reference's surface (SURVEY §2.9).

Each is a pure Column expression — JVM-side, whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

VALID_COORDINATE_SCALARS = (1, 10, 100, 1000, 10000)


def apply_coordinate_scalar(value: Column, scalar: Column) -> Column:
    """SEG-Y coordinate-scalar semantics (F1).

    Negative scalar => divide by |scalar|, positive => multiply.
    Reference: ``src/mdio/segy/scalar.py:20-59``.
    """
    return (
        F.when(scalar < 0, value / F.abs(scalar))
        .otherwise(value * scalar)
        .cast("double")
    )


def normalize_sample_labels(label_us: Column) -> Column:
    """Sample-label normalization (F2): microvalue / 1000, downcast to
    long when exact. Reference: ``src/mdio/ingestion/segy/reader.py:85-87``.

    Returns a double; callers that know divisibility downcast themselves.
    """
    return (label_us / F.lit(1000.0)).cast("double")


def hash64(col: Column | str) -> Column:
    """Deterministic 60-bit hash shared bit-for-bit with DuckDB.

    ``conv(substr(md5(x),1,15),16,10)`` here ==
    ``('0x' || substr(md5(x),1,15))::BIGINT`` in DuckDB.

    Used by the dedup / fingerprint operators so their oracles hash-match.
    15 hex digits = 60 bits, always fits a signed BIGINT.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def sql_hash64(expr: str) -> str:
    """DuckDB fragment matching :func:`hash64`."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


def encode_segy_revision(major: Column, minor: Column) -> Column:
    """SEG-Y revision code ``(major<<8)|minor`` (F6).

    Reference: ``src/mdio/segy/compat.py:92-121``.
    """
    return (F.shiftleft(major.cast("int"), 8) | minor.cast("int")).cast("int")
