"""Dataset templates + registry (``src/mdio/builder/templates/base.py:31-55``,
registry ``builder/template_registry.py:50-150``).

A template predeclares dimension names, coordinate specs, and chunk shape
for a dataset archetype; only dim *values* are scanned from data. The chunk
shapes are the reference's defaults (``BASELINE.md``) and become the store's
partition granularity (``floor(dim_idx / chunk)``).
"""

from __future__ import annotations

from pydantic import Field

from mdio_python_spark.schemas.dataset import StrictModel
from mdio_python_spark.schemas.dtypes import ScalarType


class CoordinateDecl(StrictModel):
    name: str
    dimensions: list[str]  # subset of the template's spatial dims
    data_type: ScalarType = ScalarType.FLOAT64


class AbstractDatasetTemplate(StrictModel):
    """Declarative dataset archetype. ``spatial_dims`` are scanned from
    trace headers; ``vertical_dim`` comes from sample labels."""

    name: str
    spatial_dims: list[str]
    vertical_dim: str = "time"
    coordinates: list[CoordinateDecl] = Field(default_factory=list)
    chunks: list[int]  # rank = len(spatial_dims) + 1
    calculated_dims: list[str] = Field(default_factory=list)  # e.g. shot_index
    default_variable_name: str = "amplitude"

    @property
    def all_dims(self) -> list[str]:
        return [*self.spatial_dims, self.vertical_dim]

    def required_header_fields(self) -> list[str]:
        """Header fields ingestion must parse: spatial dims (except
        calculated ones) + coordinate sources
        (``ingestion/schema/models.py:55-59``)."""
        fields = [d for d in self.spatial_dims if d not in self.calculated_dims]
        for c in self.coordinates:
            fields.append(c.name)
        return list(dict.fromkeys(fields))


def _std_coords(prefix: tuple[str, ...] = ("cdp_x", "cdp_y"), dims: list[str] | None = None) -> list[CoordinateDecl]:
    dims = dims or ["inline", "crossline"]
    return [CoordinateDecl(name=n, dimensions=list(dims)) for n in prefix]


class TemplateRegistry:
    """Name -> template, with user registration
    (``builder/template_registry.py:97-118``)."""

    def __init__(self) -> None:
        self._templates: dict[str, AbstractDatasetTemplate] = {}

    def register(self, template: AbstractDatasetTemplate) -> None:
        if template.name in self._templates:
            raise KeyError(f"template {template.name!r} already registered")
        self._templates[template.name] = template

    def get(self, name: str) -> AbstractDatasetTemplate:
        return self._templates[name]

    def names(self) -> list[str]:
        return sorted(self._templates)


def default_registry() -> TemplateRegistry:
    reg = TemplateRegistry()
    reg.register(
        AbstractDatasetTemplate(
            name="PostStack3DTime",
            spatial_dims=["inline", "crossline"],
            vertical_dim="time",
            coordinates=_std_coords(),
            chunks=[128, 128, 128],
        )
    )
    reg.register(
        AbstractDatasetTemplate(
            name="PostStack3DDepth",
            spatial_dims=["inline", "crossline"],
            vertical_dim="depth",
            coordinates=_std_coords(),
            chunks=[128, 128, 128],
        )
    )
    reg.register(
        AbstractDatasetTemplate(
            name="PostStack2DTime",
            spatial_dims=["cdp"],
            vertical_dim="time",
            coordinates=[
                CoordinateDecl(name="cdp_x", dimensions=["cdp"]),
                CoordinateDecl(name="cdp_y", dimensions=["cdp"]),
            ],
            chunks=[1024, 1024],
        )
    )
    reg.register(
        AbstractDatasetTemplate(
            name="Cdp3DGathers",
            spatial_dims=["inline", "crossline", "offset"],
            vertical_dim="time",
            coordinates=_std_coords(),
            chunks=[8, 8, 32, 512],
        )
    )
    reg.register(
        AbstractDatasetTemplate(
            name="StreamerShotGathers3D",
            spatial_dims=["shot_point", "cable", "channel"],
            vertical_dim="time",
            coordinates=[
                CoordinateDecl(name="gun", dimensions=["shot_point"], data_type=ScalarType.INT16),
                CoordinateDecl(name="source_coord_x", dimensions=["shot_point"]),
                CoordinateDecl(name="source_coord_y", dimensions=["shot_point"]),
                CoordinateDecl(
                    name="group_coord_x", dimensions=["shot_point", "cable", "channel"]
                ),
                CoordinateDecl(
                    name="group_coord_y", dimensions=["shot_point", "cable", "channel"]
                ),
            ],
            chunks=[8, 1, 128, 2048],
        )
    )
    reg.register(
        AbstractDatasetTemplate(
            name="ObnReceiverGathers3D",
            spatial_dims=["component", "receiver", "shot_line", "gun", "shot_index"],
            vertical_dim="time",
            coordinates=[
                CoordinateDecl(
                    name="shot_point", dimensions=["shot_line", "gun", "shot_index"]
                ),
            ],
            chunks=[1, 1, 1, 1, 512, 4096],
            calculated_dims=["shot_index", "component"],
        )
    )
    return reg
