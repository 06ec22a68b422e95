"""Declared (never inferred) data model, mirroring the reference's schema
discipline (``src/mdio/builder/schemas``): scalar/structured dtypes,
dimensions, coordinates, variables, datasets, templates, grid overrides,
and the ingestion-ready resolved schema.
"""

from mdio_python_spark.schemas.dataset import (
    Coordinate,
    Dataset,
    NamedDimension,
    SummaryStatistics,
    Variable,
)
from mdio_python_spark.schemas.dtypes import ScalarType, StructuredField, StructuredType
from mdio_python_spark.schemas.overrides import GridOverrides
from mdio_python_spark.schemas.resolver import (
    CoordinateSpec,
    DimensionSpec,
    ResolvedSchema,
    SchemaResolver,
)
from mdio_python_spark.schemas.templates import (
    AbstractDatasetTemplate,
    TemplateRegistry,
    default_registry,
)

__all__ = [
    "AbstractDatasetTemplate",
    "Coordinate",
    "CoordinateSpec",
    "Dataset",
    "DimensionSpec",
    "GridOverrides",
    "NamedDimension",
    "ResolvedSchema",
    "ScalarType",
    "SchemaResolver",
    "StructuredField",
    "StructuredType",
    "SummaryStatistics",
    "TemplateRegistry",
    "Variable",
    "default_registry",
]
