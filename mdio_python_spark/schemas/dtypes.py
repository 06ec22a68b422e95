"""Scalar & structured dtypes with the Spark SQL mapping (SURVEY §1.2).

Reference: ``src/mdio/builder/schemas/dtype.py:16-51`` (scalar enum +
flat structured records, nesting unsupported), fill values
``src/mdio/constants.py:51-68``.

Spark has no unsigned ints: uint8/16/32 widen to the next signed type;
uint64 maps to DECIMAL(20,0) when sentinel fidelity matters, else LONG.
float128/complex have no Spark analog (reference uses them only as fill
metadata): complex maps to a struct of two doubles, float128 is rejected.
"""

from __future__ import annotations

import enum
import math

from pyspark.sql import types as T


class ScalarType(str, enum.Enum):
    BOOL = "bool"
    INT8 = "int8"
    INT16 = "int16"
    INT32 = "int32"
    INT64 = "int64"
    UINT8 = "uint8"
    UINT16 = "uint16"
    UINT32 = "uint32"
    UINT64 = "uint64"
    FLOAT16 = "float16"
    FLOAT32 = "float32"
    FLOAT64 = "float64"
    COMPLEX64 = "complex64"
    COMPLEX128 = "complex128"
    V240 = "bytes240"  # raw 240-byte trace-header blob


_SPARK_TYPES: dict[ScalarType, T.DataType] = {
    ScalarType.BOOL: T.BooleanType(),
    ScalarType.INT8: T.ByteType(),
    ScalarType.INT16: T.ShortType(),
    ScalarType.INT32: T.IntegerType(),
    ScalarType.INT64: T.LongType(),
    ScalarType.UINT8: T.ShortType(),
    ScalarType.UINT16: T.IntegerType(),
    ScalarType.UINT32: T.LongType(),
    ScalarType.UINT64: T.DecimalType(20, 0),
    ScalarType.FLOAT16: T.FloatType(),
    ScalarType.FLOAT32: T.FloatType(),
    ScalarType.FLOAT64: T.DoubleType(),
    ScalarType.COMPLEX64: T.StructType(
        [T.StructField("re", T.DoubleType()), T.StructField("im", T.DoubleType())]
    ),
    ScalarType.COMPLEX128: T.StructType(
        [T.StructField("re", T.DoubleType()), T.StructField("im", T.DoubleType())]
    ),
    ScalarType.V240: T.BinaryType(),
}

# Fill values per dtype (``src/mdio/constants.py:51-68``): NaN for floats,
# int-max sentinels for ints, zeroed blob for V240. In the sparse Spark
# store these appear only at dense export, via coalesce().
FILL_VALUES: dict[ScalarType, object] = {
    ScalarType.BOOL: False,
    ScalarType.INT8: 2**7 - 1,
    ScalarType.INT16: 2**15 - 1,
    ScalarType.INT32: 2**31 - 1,
    ScalarType.INT64: 2**63 - 1,
    ScalarType.UINT8: 2**8 - 1,
    ScalarType.UINT16: 2**16 - 1,
    ScalarType.UINT32: 2**32 - 1,
    ScalarType.UINT64: 2**64 - 1,
    ScalarType.FLOAT16: math.nan,
    ScalarType.FLOAT32: math.nan,
    ScalarType.FLOAT64: math.nan,
    ScalarType.V240: b"\x00" * 240,
}


def to_spark_type(dtype: ScalarType) -> T.DataType:
    return _SPARK_TYPES[dtype]


class StructuredField:
    """Flat named scalar field (nesting unsupported, matching
    ``src/mdio/converters/type_converter.py:46-53``)."""

    def __init__(self, name: str, format: ScalarType) -> None:  # noqa: A002
        if not name:
            raise ValueError("field name must be non-empty")
        self.name = name
        self.format = format

    def __repr__(self) -> str:
        return f"StructuredField({self.name!r}, {self.format.value})"


class StructuredType:
    """Record type = ordered flat list of scalar fields."""

    def __init__(self, fields: list[StructuredField]) -> None:
        names = [f.name for f in fields]
        if len(names) != len(set(names)):
            raise ValueError(f"duplicate field names in {names}")
        self.fields = list(fields)

    def to_spark(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, to_spark_type(f.format), True) for f in self.fields]
        )
