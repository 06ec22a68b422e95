"""Dataset document model: dimensions, coordinates, variables, stats.

Reference: ``src/mdio/builder/schemas/v1/{dataset,variable}.py`` and
``stats.py:48-71``. Pydantic with ``extra="forbid"`` mirrors the
reference's strict validation (``builder/schemas/core.py:10-19``).

The Spark physical story (SURVEY §1.1): a Dataset is a chunk-partitioned
long-format Parquet table + this document as its JSON manifest; Variables
are columns; dims are both columns and tiny dim tables.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pydantic import BaseModel, ConfigDict, Field, model_validator

from mdio_python_spark.schemas.dtypes import ScalarType


class StrictModel(BaseModel):
    model_config = ConfigDict(extra="forbid", validate_assignment=True)


class NamedDimension(StrictModel):
    """Label + extent, no values (``builder/schemas/dimension.py:8-12``)."""

    name: str
    size: int = Field(gt=0)


class UnitInfo(StrictModel):
    """Unit attached to a variable/coordinate (``v1/units.py:14-105``).

    We persist the pint-style symbol; resolution from SEG-Y binary header
    (m/ft) happens at ingest (``ingestion/segy/coordinates.py:76-119``).
    """

    unit: str  # e.g. "m", "ft", "ms", "s", "deg"


class SummaryStatistics(StrictModel):
    """statsV1 (``v1/stats.py:48-71``): raw partials; mean/std derived."""

    count: int = 0
    sum: float = 0.0
    sum_squares: float = 0.0
    min: float = float("inf")
    max: float = float("-inf")
    histogram: dict[str, Any] | None = None  # reference ships an empty stub

    @property
    def mean(self) -> float:
        return self.sum / self.count if self.count else float("nan")

    @property
    def std(self) -> float:
        if self.count < 2:
            return float("nan")
        var = (self.sum_squares - self.sum * self.sum / self.count) / (self.count - 1)
        return var**0.5

    def merge(self, other: SummaryStatistics) -> SummaryStatistics:
        return SummaryStatistics(
            count=self.count + other.count,
            sum=self.sum + other.sum,
            sum_squares=self.sum_squares + other.sum_squares,
            min=min(self.min, other.min),
            max=max(self.max, other.max),
        )


class Compressor(StrictModel):
    """Compressor config (``builder/schemas/compressors.py:20-98``).

    In the Spark store, lossless maps to Parquet codec settings; lossy
    (ZFP-style fixed accuracy) maps to an optional quantization transform
    whose tolerance = quality * std from SummaryStatistics.
    """

    name: str = "zstd"  # parquet codec: zstd/snappy/gzip/none
    level: int = 5
    lossy_tolerance: float | None = None  # None => lossless


class Coordinate(StrictModel):
    """Labeled array attached to dims (``v1/variable.py:48-55``)."""

    name: str
    dimensions: list[str]
    data_type: ScalarType = ScalarType.FLOAT64
    unit: UnitInfo | None = None
    metadata: dict[str, Any] = Field(default_factory=dict)


class Variable(StrictModel):
    """Named N-D array (``v1/variable.py:58-65``): dims + dtype +
    compressor + attached coordinates."""

    name: str
    dimensions: list[str]
    data_type: ScalarType = ScalarType.FLOAT32
    compressor: Compressor = Field(default_factory=Compressor)
    coordinates: list[str] = Field(default_factory=list)
    chunks: list[int] | None = None
    stats: SummaryStatistics | None = None
    metadata: dict[str, Any] = Field(default_factory=dict)

    @model_validator(mode="after")
    def _check_chunks(self) -> Variable:
        if self.chunks is not None and len(self.chunks) != len(self.dimensions):
            raise ValueError(
                f"chunks rank {len(self.chunks)} != dims rank {len(self.dimensions)}"
            )
        return self


class Dataset(StrictModel):
    """Dataset document (``v1/dataset.py:13-41``): variables + metadata.

    Serialized as the store manifest JSON; ``api_version`` pins the
    document schema.
    """

    name: str
    api_version: str = "1.0.0"
    created_on: str = Field(
        default_factory=lambda: dt.datetime.now(dt.timezone.utc).isoformat()
    )
    dimensions: list[NamedDimension] = Field(default_factory=list)
    coordinates: list[Coordinate] = Field(default_factory=list)
    variables: list[Variable] = Field(default_factory=list)
    attributes: dict[str, Any] = Field(default_factory=dict)

    @model_validator(mode="after")
    def _check_refs(self) -> Dataset:
        dim_names = {d.name for d in self.dimensions}
        coord_names = {c.name for c in self.coordinates}
        for c in self.coordinates:
            missing = set(c.dimensions) - dim_names
            if missing:
                raise ValueError(f"coordinate {c.name}: unknown dims {missing}")
        for v in self.variables:
            missing = set(v.dimensions) - dim_names
            if missing:
                raise ValueError(f"variable {v.name}: unknown dims {missing}")
            bad = set(v.coordinates) - coord_names
            if bad:
                raise ValueError(f"variable {v.name}: unknown coordinates {bad}")
        return self

    def variable(self, name: str) -> Variable:
        for v in self.variables:
            if v.name == name:
                return v
        raise KeyError(name)

    def _repr_html_(self) -> str:
        """Notebook repr (reference ``builder/formatting_html.py:186``)."""
        from mdio_python_spark.schemas.formatting_html import dataset_repr_html

        return dataset_repr_html(self)
