"""Schema-layer tests: templates, overrides validation, resolver effects
(mirrors the reference's builder/validation unit tier, SURVEY §5.1).
"""

from __future__ import annotations

import pytest

from mdio_python_spark.schemas import (
    GridOverrides,
    ScalarType,
    SchemaResolver,
    default_registry,
)
from mdio_python_spark.schemas.dataset import Dataset, NamedDimension, Variable


def test_registry_has_core_templates():
    reg = default_registry()
    for name in (
        "PostStack3DTime",
        "PostStack2DTime",
        "StreamerShotGathers3D",
        "ObnReceiverGathers3D",
    ):
        t = reg.get(name)
        assert len(t.chunks) == len(t.spatial_dims) + 1


def test_registry_rejects_duplicates():
    reg = default_registry()
    with pytest.raises(KeyError):
        reg.register(reg.get("PostStack3DTime"))


def test_overrides_validation():
    with pytest.raises(ValueError):
        GridOverrides(non_binned=True)  # chunksize required
    with pytest.raises(ValueError):
        GridOverrides(non_binned=True, chunksize=4, has_duplicates=True)
    with pytest.raises(ValueError):
        GridOverrides(chunksize=4)  # only valid with non_binned
    ov = GridOverrides(auto_channel_wrap=True, has_duplicates=True)
    assert ov.strategy_names() == ["ChannelWrapping", "DuplicateHandling"]
    assert GridOverrides().strategy_names() == ["RegularGrid"]


def test_resolver_plain():
    reg = default_registry()
    schema = SchemaResolver().resolve(reg.get("PostStack3DTime"))
    assert [d.name for d in schema.dimensions] == ["inline", "crossline", "time"]
    assert schema.required_fields() == ["inline", "crossline", "cdp_x", "cdp_y"]
    assert schema.chunks == [128, 128, 128]


def test_resolver_duplicates_effect():
    reg = default_registry()
    schema = SchemaResolver().resolve(
        reg.get("StreamerShotGathers3D"), GridOverrides(has_duplicates=True)
    )
    names = [d.name for d in schema.dimensions]
    # trace dim inserted before the vertical (schema_effects.py:21-47)
    assert names == ["shot_point", "cable", "channel", "trace", "time"]
    assert schema.dimensions[3].chunk == 1


def test_resolver_nonbinned_effect():
    reg = default_registry()
    schema = SchemaResolver().resolve(
        reg.get("StreamerShotGathers3D"),
        GridOverrides(non_binned=True, chunksize=16, non_binned_dims=["channel"]),
    )
    names = [d.name for d in schema.dimensions]
    assert names == ["shot_point", "cable", "trace", "time"]
    # collapsed dim becomes a per-trace coordinate
    coord_names = [c.name for c in schema.coordinates]
    assert "channel" in coord_names
    trace = schema.dimensions[2]
    assert trace.chunk == 16 and trace.calculated


def test_dataset_document_validation():
    with pytest.raises(ValueError):
        Dataset(
            name="bad",
            dimensions=[NamedDimension(name="inline", size=3)],
            variables=[Variable(name="amp", dimensions=["inline", "nope"])],
        )
    ds = Dataset(
        name="ok",
        dimensions=[NamedDimension(name="inline", size=3)],
        variables=[
            Variable(name="amp", dimensions=["inline"], data_type=ScalarType.FLOAT32)
        ],
    )
    assert ds.variable("amp").data_type == ScalarType.FLOAT32
    # manifest round-trip
    doc = ds.model_dump(mode="json")
    assert Dataset.model_validate(doc) == ds


def test_unit_models_mirror_reference_surface():
    """Unit enums/models (``builder/schemas/v1/units.py:14-105``): same
    quantities and members, reference-shaped JSON, exact conversions."""
    from mdio_python_spark.schemas import units as U

    assert [u.value for u in U.LengthUnit] == [
        "mm", "cm", "m", "km", "in", "ft", "yd", "mi"]
    assert len(U.TimeUnit) == 7 and len(U.VoltageUnit) == 3
    assert U.LengthUnitModel(length="ft").model_dump() == {
        "length": U.LengthUnit.FOOT
    }
    assert U.LengthUnitModel(length="ft").model_dump_json() == '{"length":"ft"}'
    import pytest as _pytest

    assert U.convert(1.0, U.LengthUnit.FOOT, U.LengthUnit.METER) == 0.3048
    assert U.convert(1.0, U.TimeUnit.MILLISECOND, U.TimeUnit.MICROSECOND) == _pytest.approx(1000.0)
    with _pytest.raises(ValueError):
        U.convert(1.0, U.LengthUnit.METER, U.TimeUnit.SECOND)
    assert U.measurement_system_unit(2) == U.LengthUnit.FOOT
    assert U.measurement_system_unit(1) == U.LengthUnit.METER
