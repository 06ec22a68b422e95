"""Template-zoo shape tests, mirroring the reference's per-template
configuration tests (``tests/unit/v1/templates/test_seismic_*.py``):
every registered name exists, chunk rank == dim rank, dims/chunks match
the reference definitions, header-spec coverage for non-calculated dims.
"""

from __future__ import annotations

import pytest

from mdio_python_spark.schemas import default_registry
from mdio_python_spark.schemas.resolver import SchemaResolver
from mdio_python_spark.sources.segy_codec import DEFAULT_TRACE_HEADER_SPEC

REG = default_registry()

# name -> (spatial_dims, vertical_dim, chunks) per the reference templates
EXPECTED = {
    "PostStack2DTime": (["cdp"], "time", [1024, 1024]),
    "PostStack2DDepth": (["cdp"], "depth", [1024, 1024]),
    "PostStack3DTime": (["inline", "crossline"], "time", [128, 128, 128]),
    "PostStack3DDepth": (["inline", "crossline"], "depth", [128, 128, 128]),
    "CdpOffsetGathers3DTime": (
        ["inline", "crossline", "offset"], "time", [8, 8, 32, 512]),
    "CdpAngleGathers3DDepth": (
        ["inline", "crossline", "angle"], "depth", [8, 8, 32, 512]),
    "CdpOffsetGathers2DTime": (["cdp", "offset"], "time", [16, 64, 1024]),
    "CdpAngleGathers2DDepth": (["cdp", "angle"], "depth", [16, 64, 1024]),
    "CocaGathers3DTime": (
        ["inline", "crossline", "offset", "azimuth"], "time", [8, 8, 32, 1, 1024]),
    "OffsetTiles3DTime": (
        ["inline", "crossline", "inline_offset_tile", "crossline_offset_tile"],
        "time",
        [4, 4, 6, 6, 4096],
    ),
    "ReceiverGathers3D": (
        ["receiver", "shot_line", "shot_point"], "time", [1, 1, 512, 4096]),
    "StreamerShotGathers2D": (["shot_point", "channel"], "time", [16, 32, 2048]),
    "StreamerShotGathers3D": (
        ["shot_point", "cable", "channel"], "time", [8, 1, 128, 2048]),
    "StreamerFieldRecords3D": (
        ["shot_line", "gun", "shot_index", "cable", "channel"],
        "time",
        [1, 1, 16, 1, 32, 1024],
    ),
    "ObnReceiverGathers3D": (
        ["component", "receiver", "shot_line", "gun", "shot_index"],
        "time",
        [1, 1, 1, 1, 512, 4096],
    ),
    "ShotReceiverLineGathers3D": (
        ["shot_line", "shot_point", "receiver_line", "receiver"],
        "time",
        [1, 32, 1, 32, 2048],
    ),
}

ALL_REFERENCE_NAMES = [
    *EXPECTED,
    "CdpOffsetGathers3DDepth",
    "CdpAngleGathers3DTime",
    "CdpOffsetGathers2DDepth",
    "CdpAngleGathers2DTime",
    "CocaGathers3DDepth",
    "OffsetTiles3DDepth",
]


def test_full_reference_zoo_registered():
    """All 22 reference default registrations resolve
    (``builder/template_registry.py:120-157``: 4 post-stack, 8 CDP, 2
    COCA, 1 receiver-gathers, 2 offset-tiles, 3 streamer, 1 OBN, 1
    shot-receiver-line)."""
    for name in ALL_REFERENCE_NAMES:
        assert REG.get(name) is not None, name
    assert len(ALL_REFERENCE_NAMES) == 22


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_template_configuration(name):
    t = REG.get(name)
    dims, vertical, chunks = EXPECTED[name]
    assert t.spatial_dims == dims
    assert t.vertical_dim == vertical
    assert t.chunks == chunks
    assert len(t.chunks) == len(t.spatial_dims) + 1


@pytest.mark.parametrize("name", sorted(ALL_REFERENCE_NAMES))
def test_template_resolves_and_scans_known_fields(name):
    """Every template passes schema resolution, and every non-calculated
    dim that is a standard rev1 field appears in the default header spec
    (nonstandard dims — azimuth, tiles, receiver_line — require a custom
    spec, as in the reference's SegySpec customization)."""
    t = REG.get(name)
    schema = SchemaResolver().resolve(t)
    assert schema.spatial_dims == t.spatial_dims
    nonstandard = {
        "azimuth",
        "angle",
        "inline_offset_tile",
        "crossline_offset_tile",
        "receiver_line",
        "receiver",
        "cable",
        "shot_line",
        "gun",
        "component",
    }
    for d in t.spatial_dims:
        if d in t.calculated_dims or d in nonstandard:
            continue
        assert d in DEFAULT_TRACE_HEADER_SPEC, f"{name}: {d}"


def test_header_spec_covers_rev1_surface():
    """The out-of-box spec carries the full rev1 named-field layout
    (~90 fields), not the round-1 20-field subset."""
    spec = DEFAULT_TRACE_HEADER_SPEC
    assert len(spec) >= 85
    # spot-check canonical offsets from the public standard
    assert spec["trace_seq_line"] == (0, ">i4")
    assert spec["offset"] == (36, ">i4")
    assert spec["coordinate_scalar"] == (70, ">i2")
    assert spec["year"] == (156, ">i2")
    assert spec["inline"] == (188, ">i4")
    assert spec["source_measurement_unit"] == (230, ">i2")
    # no overlaps: each field's byte range is disjoint
    import numpy as np

    used = np.zeros(240, dtype=bool)
    for off, fmt in spec.values():
        w = np.dtype(fmt).itemsize
        assert not used[off : off + w].any(), (off, fmt)
        used[off : off + w] = True
