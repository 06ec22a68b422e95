"""Schema resolution (``src/mdio/ingestion/schema/resolver.py:28-76`` and
the schema effects ``ingestion/segy/schema_effects.py:21-133``).

Produces the ingestion-ready ``ResolvedSchema``: ordered DimensionSpecs
(with spatial/calculated flags), CoordinateSpecs, and the chunk shape —
the logical-plan input every pipeline stage consumes.
"""

from __future__ import annotations

from pydantic import Field

from mdio_python_spark.schemas.dataset import StrictModel
from mdio_python_spark.schemas.dtypes import ScalarType
from mdio_python_spark.schemas.overrides import GridOverrides
from mdio_python_spark.schemas.templates import AbstractDatasetTemplate


class DimensionSpec(StrictModel):
    name: str
    spatial: bool = True  # False for the vertical (sample) dim
    calculated: bool = False  # derived, not read from a header field
    chunk: int = 1


class CoordinateSpec(StrictModel):
    name: str
    dimensions: list[str]
    data_type: ScalarType = ScalarType.FLOAT64


class ResolvedSchema(StrictModel):
    dimensions: list[DimensionSpec]
    coordinates: list[CoordinateSpec] = Field(default_factory=list)
    default_variable_name: str = "amplitude"

    @property
    def spatial_dims(self) -> list[str]:
        return [d.name for d in self.dimensions if d.spatial]

    @property
    def chunks(self) -> list[int]:
        return [d.chunk for d in self.dimensions]

    def required_fields(self) -> list[str]:
        """Header fields the scan must parse
        (``ingestion/schema/models.py:55-59``)."""
        fields = [d.name for d in self.dimensions if d.spatial and not d.calculated]
        fields += [c.name for c in self.coordinates]
        return list(dict.fromkeys(fields))


class SchemaResolver:
    """Template + overrides -> ResolvedSchema, applying at most one schema
    effect (``index_strategies.py:331-368``: <=1 effect per composite)."""

    def resolve(
        self, template: AbstractDatasetTemplate, overrides: GridOverrides | None = None
    ) -> ResolvedSchema:
        overrides = overrides or GridOverrides()
        dims: list[DimensionSpec] = [
            DimensionSpec(
                name=d,
                spatial=True,
                calculated=d in template.calculated_dims,
                chunk=template.chunks[i],
            )
            for i, d in enumerate(template.spatial_dims)
        ]
        vertical = DimensionSpec(
            name=template.vertical_dim, spatial=False, chunk=template.chunks[-1]
        )

        if overrides.has_duplicates:
            # insert a calculated `trace` dim (chunk 1) before the vertical
            # (``schema_effects.py:21-47``)
            dims.append(DimensionSpec(name="trace", calculated=True, chunk=1))
        elif overrides.non_binned:
            # collapse selected dims into `trace` with user chunksize;
            # collapsed dims become per-trace coordinates
            # (``schema_effects.py:50-133``)
            collapsed = set(
                overrides.non_binned_dims
                or [d.name for d in dims if d.name not in template.calculated_dims][-1:]
            )
            kept = [d for d in dims if d.name not in collapsed]
            coords_from_collapsed = [
                CoordinateSpec(
                    name=d.name,
                    dimensions=[x.name for x in kept] + ["trace"],
                    data_type=ScalarType.INT32,
                )
                for d in dims
                if d.name in collapsed
            ]
            dims = [
                *kept,
                DimensionSpec(
                    name="trace", calculated=True, chunk=overrides.chunksize or 1
                ),
            ]
            return ResolvedSchema(
                dimensions=[*dims, vertical],
                coordinates=[
                    CoordinateSpec(
                        name=c.name, dimensions=c.dimensions, data_type=c.data_type
                    )
                    for c in template.coordinates
                ]
                + coords_from_collapsed,
                default_variable_name=template.default_variable_name,
            )

        return ResolvedSchema(
            dimensions=[*dims, vertical],
            coordinates=[
                CoordinateSpec(
                    name=c.name, dimensions=c.dimensions, data_type=c.data_type
                )
                for c in template.coordinates
            ],
            default_variable_name=template.default_variable_name,
        )
