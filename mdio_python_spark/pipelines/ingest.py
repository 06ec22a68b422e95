"""SEG-Y -> store ingestion: the flagship pipeline (SURVEY §3.1,
``src/mdio/ingestion/segy/pipeline.py:117-195``), re-expressed as two Spark
jobs mirroring the reference's two passes:

1. header pass — cheap scan of dims/coords; index strategies (W1-W7);
   dim tables; grid QC (A6/A7)
2. trace pass — full read joined to the per-trace assignment, repartitioned
   by chunk key, written to the store; statsV1 via one df.agg (A1)

Driver stages (validate / file info / unit resolution / schema resolution)
stay plain Python, exactly like the reference's analyzer stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mdio_python_spark.functions.scalars import apply_coordinate_scalar
from mdio_python_spark.operators import geometry, grid, index_transforms, stats
from mdio_python_spark.schemas.dataset import (
    Coordinate,
    Dataset,
    NamedDimension,
    SummaryStatistics,
    UnitInfo,
    Variable,
)
from mdio_python_spark.schemas.dtypes import ScalarType
from mdio_python_spark.schemas.overrides import GridOverrides
from mdio_python_spark.schemas.resolver import ResolvedSchema, SchemaResolver
from mdio_python_spark.schemas.templates import AbstractDatasetTemplate
from mdio_python_spark.sources import segy, store
from mdio_python_spark.sources.segy import SegyFileInfo


COORD_SCALAR_FIELDS = frozenset(
    {"cdp_x", "cdp_y", "source_coord_x", "source_coord_y", "group_coord_x", "group_coord_y"}
)


class GridTraceCountError(ValueError):
    """Duplicate dim tuples (``converters/exceptions.py:13-23``)."""


class GridTraceSparsityError(ValueError):
    """Grid cells / traces beyond the error threshold
    (``ingestion/grid_qc.py:19-69``)."""


SPARSITY_WARN = 2.0
SPARSITY_ERROR = 10.0


def _apply_strategies(
    headers: DataFrame,
    schema: ResolvedSchema,
    overrides: GridOverrides,
    template: AbstractDatasetTemplate,
) -> DataFrame:
    """W1-W7 composition per the override flags
    (``index_strategies.py:371-459``), gated on geometry auto-detection.

    The A3/A4 detectors run as tiny aggregations over the header scan and
    the classification decision happens driver-side on the agg result —
    the Spark analog of the reference's driver-side
    ``analyze_streamer_headers`` / ``analyze_lines_for_guns`` numpy passes
    (``header_analysis.py:82-191``):

    * ChannelWrapping (``index_strategies.py:218-233``): Type A
      (overlapping per-cable channel ranges, i.e. numbering restarts per
      cable) passes through; only Type B (sequential across cables)
      rebases to 1..N per cable.
    * ShotWrapping (``index_strategies.py:267-299``): Type B (shots
      interleaved across guns) floor-wraps with the *detected* max
      per-line gun count; Type A passes through for ``auto_shot_wrap``
      (streamer) and emits the dense per-line searchsorted index for
      ``calculate_shot_index`` (OBN ``always_calculate=True``).
    """
    out = headers
    if overrides.auto_channel_wrap:
        ranges = geometry.channel_ranges(out, "cable", "channel").collect()
        if geometry.detect_channel_geometry(ranges) == "B":
            out = index_transforms.wrap_channels(out, "cable", "channel")
    if overrides.auto_shot_wrap or overrides.calculate_shot_index:
        analysis = geometry.gun_geometry_analysis(
            out, "shot_line", "gun", "shot_point"
        ).collect()
        geom, num_guns = geometry.detect_gun_geometry(analysis)
        if geom == "B":
            # ref subtracts the per-LINE min (not per line+gun):
            # index_strategies.py:287-291
            out = index_transforms.shot_index_floor(
                out, ["shot_line"], "shot_point", num_guns=num_guns
            )
        elif overrides.calculate_shot_index:
            # Type A + always_calculate: searchsorted over per-line unique
            # shots (index_strategies.py:292-297)
            out = index_transforms.shot_index_dense(
                out, ["shot_line"], "shot_point"
            )
        # else: Type A streamer — per-gun shot points already dense;
        # pass through (index_strategies.py:279-280)
    if "component" in [d.name for d in schema.dimensions]:
        out = index_transforms.synthesize_component(out)
    spatial = [d for d in schema.spatial_dims if d != "trace"]
    if overrides.has_duplicates:
        out = index_transforms.duplicate_ordinal(
            out, dim_cols=spatial, order_cols=["src_trace_idx"], out_col="trace"
        )
    elif overrides.non_binned:
        out = index_transforms.nonbinned_collapse(
            out, kept_dims=spatial, order_cols=["src_trace_idx"], out_col="trace"
        )
    return out


def segy_to_store(
    spark: SparkSession,
    segy_path: str,
    store_path: str,
    template: AbstractDatasetTemplate,
    overrides: GridOverrides | None = None,
    header_spec: dict[str, tuple[int, str]] | None = None,
    block_size: int = 10_000,
) -> Dataset:
    overrides = overrides or GridOverrides()
    schema = SchemaResolver().resolve(template, overrides)

    # S1 file info + unit resolution (driver)
    info: SegyFileInfo = segy.segy_file_info(segy_path)
    spatial_unit = "ft" if info.measurement_system == 2 else "m"

    # pass 1: header scan (S2) with column pruning (P1). Strategies declare
    # their own required header fields (``index_strategies.py:331-368``
    # re-validates per step) — union them into the pruned scan.
    strategy_fields: list[str] = []
    if overrides.auto_channel_wrap:
        strategy_fields += ["cable", "channel"]
    if overrides.auto_shot_wrap or overrides.calculate_shot_index:
        strategy_fields += ["shot_line", "gun", "shot_point"]
    fields = list(
        dict.fromkeys(
            [f for f in schema.required_fields() if f != "trace"] + strategy_fields
        )
    )
    scaled_coords = [f for f in fields if f in COORD_SCALAR_FIELDS]
    if scaled_coords and "coordinate_scalar" not in fields:
        fields = [*fields, "coordinate_scalar"]
    headers = segy.read_traces(
        spark,
        info,
        fields=fields,
        include_samples=False,
        block_size=block_size,
        spec=header_spec,
    )
    # F1: coordinate scalar (negative => divide) on physical coords
    for c in scaled_coords:
        headers = headers.withColumn(
            c, apply_coordinate_scalar(F.col(c), F.col("coordinate_scalar"))
        )
    headers = _apply_strategies(headers, schema, overrides, template)
    spatial = schema.spatial_dims

    # grid QC (A6/A7) on the transformed headers
    qc = stats.grid_sparsity(headers, spatial).collect()[0]
    if qc["sparsity_ratio"] > SPARSITY_ERROR:
        raise GridTraceSparsityError(
            f"grid cells {qc['grid_cells']} vs traces {qc['num_traces']}"
        )
    dupes = grid.duplicate_cells(headers, spatial).limit(1).collect()
    if dupes:
        raise GridTraceCountError(f"duplicate dim tuple: {dupes[0].asDict()}")

    # J1: per-trace cell assignment via broadcast dim tables
    assigned = grid.assign_cells(headers, spatial)
    dim_tables = {d: grid.dim_values(headers, d) for d in spatial}

    # pass 2: full trace read joined to the assignment
    traces = segy.read_traces(
        spark,
        info,
        fields=[],
        include_samples=True,
        include_raw_header=True,
        block_size=block_size,
        spec=header_spec,
    )
    full = traces.join(assigned, on="src_trace_idx", how="inner")

    # statsV1 (A1): nonzero-masked sample statistics, one agg.
    # scale=7: seismic amplitudes are O(1), so 1e-7 quantization keeps the
    # exact-decimal determinism while matching float64 stats to ~1e-8.
    srow = stats.samples_statistics(full, "samples", scale=7).collect()[0]
    summary = SummaryStatistics(
        count=srow["count"],
        sum=srow["sum"],
        sum_squares=srow["sum_squares"],
        min=srow["min"],
        max=srow["max"],
    )

    # dataset document
    dim_sizes = {d: dim_tables[d].count() for d in spatial}
    chunks = {
        d.name: d.chunk for d in schema.dimensions if d.spatial or d.name == "trace"
    }
    chunks = {d: chunks[d] for d in spatial}
    dataset = Dataset(
        name=template.name,
        dimensions=[NamedDimension(name=d, size=dim_sizes[d]) for d in spatial]
        + [
            NamedDimension(
                name=schema.dimensions[-1].name, size=info.samples_per_trace
            )
        ],
        coordinates=[
            Coordinate(
                name=c.name,
                dimensions=c.dimensions,
                data_type=c.data_type,
                unit=UnitInfo(unit=spatial_unit),
            )
            for c in schema.coordinates
            if c.name in headers.columns
        ],
        variables=[
            Variable(
                name=schema.default_variable_name,
                dimensions=[*spatial, schema.dimensions[-1].name],
                data_type=ScalarType.FLOAT32,
                chunks=[chunks[d] for d in spatial]
                + [schema.dimensions[-1].chunk],
                stats=summary,
            ),
            Variable(
                name="headers",
                dimensions=list(spatial),
                data_type=ScalarType.V240,
            ),
        ],
        attributes={
            "spatialDims": spatial,
            "verticalDim": schema.dimensions[-1].name,
            "defaultVariableName": schema.default_variable_name,
            "textHeader": info.text_header,
            "binaryHeader": info.binary_header,
            "sampleIntervalUs": info.sample_interval,
            "dataFormat": info.data_format,
            "gridOverrides": overrides.model_dump(mode="json"),
            "sourcePath": segy_path,
        },
    )

    store.write_store(full, dim_tables, dataset, store_path, chunks)
    return dataset
