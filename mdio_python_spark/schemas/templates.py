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

    def _repr_html_(self) -> str:
        """Notebook repr (reference ``builder/formatting_html.py:255``)."""
        from mdio_python_spark.schemas.formatting_html import template_repr_html

        return template_repr_html(self)


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

    def _repr_html_(self) -> str:
        """Notebook repr (reference ``builder/formatting_html.py:328``)."""
        from mdio_python_spark.schemas.formatting_html import registry_repr_html

        return registry_repr_html(self)


def _xy(names: tuple[str, ...], dims: list[str]) -> list[CoordinateDecl]:
    return [CoordinateDecl(name=n, dimensions=list(dims)) for n in names]


def default_registry() -> TemplateRegistry:
    """The reference's full default template zoo
    (``builder/template_registry.py:120-157``), one entry per registered
    name; dims/chunks mirror the reference templates
    (``builder/templates/seismic_*.py``). Naming deviation: this engine
    uses ``shot_line`` uniformly where the reference's streamer templates
    say ``sail_line`` (the shot-wrapping line field is the same role,
    ``index_strategies.py:253``). ``Cdp3DGathers`` is kept as a repo-local
    alias of ``CdpOffsetGathers3DTime`` for round-1 compatibility."""
    reg = TemplateRegistry()

    # --- post-stack (``seismic_2d_poststack.py``, ``seismic_3d_poststack.py``)
    for domain in ("time", "depth"):
        reg.register(
            AbstractDatasetTemplate(
                name=f"PostStack3D{domain.capitalize()}",
                spatial_dims=["inline", "crossline"],
                vertical_dim=domain,
                coordinates=_std_coords(),
                chunks=[128, 128, 128],
            )
        )
        reg.register(
            AbstractDatasetTemplate(
                name=f"PostStack2D{domain.capitalize()}",
                spatial_dims=["cdp"],
                vertical_dim=domain,
                coordinates=_xy(("cdp_x", "cdp_y"), ["cdp"]),
                chunks=[1024, 1024],
            )
        )

    # --- CDP/CMP gathers (``seismic_3d_cdp.py`` (8,8,32,512),
    #     ``seismic_2d_cdp.py`` (16,64,1024); offset and angle domains)
    for domain in ("time", "depth"):
        for gather in ("offset", "angle"):
            reg.register(
                AbstractDatasetTemplate(
                    name=f"Cdp{gather.capitalize()}Gathers3D{domain.capitalize()}",
                    spatial_dims=["inline", "crossline", gather],
                    vertical_dim=domain,
                    coordinates=_std_coords(),
                    chunks=[8, 8, 32, 512],
                )
            )
            reg.register(
                AbstractDatasetTemplate(
                    name=f"Cdp{gather.capitalize()}Gathers2D{domain.capitalize()}",
                    spatial_dims=["cdp", gather],
                    vertical_dim=domain,
                    coordinates=_xy(("cdp_x", "cdp_y"), ["cdp"]),
                    chunks=[16, 64, 1024],
                )
            )

    # --- COCA gathers (``seismic_3d_coca.py`` (8,8,32,1,1024))
    for domain in ("time", "depth"):
        reg.register(
            AbstractDatasetTemplate(
                name=f"CocaGathers3D{domain.capitalize()}",
                spatial_dims=["inline", "crossline", "offset", "azimuth"],
                vertical_dim=domain,
                coordinates=_std_coords(),
                chunks=[8, 8, 32, 1, 1024],
            )
        )

    # --- offset tiles (``seismic_3d_offset_tiles.py`` (4,4,6,6,4096))
    for domain in ("time", "depth"):
        reg.register(
            AbstractDatasetTemplate(
                name=f"OffsetTiles3D{domain.capitalize()}",
                spatial_dims=[
                    "inline",
                    "crossline",
                    "inline_offset_tile",
                    "crossline_offset_tile",
                ],
                vertical_dim=domain,
                coordinates=_std_coords(),
                chunks=[4, 4, 6, 6, 4096],
            )
        )

    # --- receiver gathers, OBN/OBC/land fixed spread
    #     (``seismic_3d_receiver_gathers.py`` (1,1,512,4096))
    reg.register(
        AbstractDatasetTemplate(
            name="ReceiverGathers3D",
            spatial_dims=["receiver", "shot_line", "shot_point"],
            vertical_dim="time",
            coordinates=_xy(
                ("receiver_x", "receiver_y", "source_coord_x", "source_coord_y"),
                ["receiver", "shot_line", "shot_point"],
            ),
            chunks=[1, 1, 512, 4096],
        )
    )

    # --- streamer shot gathers (``seismic_2d_streamer_shot.py`` (16,32,2048),
    #     ``seismic_3d_streamer_shot.py`` (8,1,128,2048))
    reg.register(
        AbstractDatasetTemplate(
            name="StreamerShotGathers2D",
            spatial_dims=["shot_point", "channel"],
            vertical_dim="time",
            coordinates=_xy(
                (
                    "source_coord_x",
                    "source_coord_y",
                    "group_coord_x",
                    "group_coord_y",
                ),
                ["shot_point", "channel"],
            ),
            chunks=[16, 32, 2048],
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

    # --- streamer field records, 6-D
    #     (``seismic_3d_streamer_field.py`` (1,1,16,1,32,1024))
    reg.register(
        AbstractDatasetTemplate(
            name="StreamerFieldRecords3D",
            spatial_dims=["shot_line", "gun", "shot_index", "cable", "channel"],
            vertical_dim="time",
            coordinates=_xy(
                (
                    "source_coord_x",
                    "source_coord_y",
                    "group_coord_x",
                    "group_coord_y",
                ),
                ["shot_line", "gun", "shot_index", "cable", "channel"],
            )
            + [
                CoordinateDecl(
                    name="shot_point",
                    dimensions=["shot_line", "gun", "shot_index"],
                    data_type=ScalarType.INT32,
                ),
                CoordinateDecl(
                    name="field_record",
                    dimensions=["shot_line", "gun", "shot_index"],
                    data_type=ScalarType.INT32,
                ),
            ],
            chunks=[1, 1, 16, 1, 32, 1024],
            calculated_dims=["shot_index"],
        )
    )

    # --- OBN receiver gathers (``seismic_3d_obn.py`` (1,1,1,1,512,4096))
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

    # --- land/OBC shot-receiver lines
    #     (``seismic_3d_shot_receiver_line.py`` (1,32,1,32,2048))
    reg.register(
        AbstractDatasetTemplate(
            name="ShotReceiverLineGathers3D",
            spatial_dims=["shot_line", "shot_point", "receiver_line", "receiver"],
            vertical_dim="time",
            coordinates=_xy(
                (
                    "source_coord_x",
                    "source_coord_y",
                    "group_coord_x",
                    "group_coord_y",
                ),
                ["shot_line", "shot_point", "receiver_line", "receiver"],
            )
            + [
                CoordinateDecl(
                    name="field_record",
                    dimensions=["shot_line", "shot_point"],
                    data_type=ScalarType.INT32,
                )
            ],
            chunks=[1, 32, 1, 32, 2048],
        )
    )

    # --- repo-local alias retained from round 1
    reg.register(
        AbstractDatasetTemplate(
            name="Cdp3DGathers",
            spatial_dims=["inline", "crossline", "offset"],
            vertical_dim="time",
            coordinates=_std_coords(),
            chunks=[8, 8, 32, 512],
        )
    )
    return reg
