"""HTML reprs for templates / registry / dataset: structure, escaping,
and that every registered default template renders without error
(reference parity surface: ``builder/formatting_html.py``)."""

from __future__ import annotations

from mdio_python_spark.schemas.dataset import (
    Coordinate,
    Dataset,
    NamedDimension,
    Variable,
)
from mdio_python_spark.schemas.templates import (
    AbstractDatasetTemplate,
    CoordinateDecl,
    default_registry,
)


def test_template_repr_contains_fields():
    t = AbstractDatasetTemplate(
        name="demo_3d",
        spatial_dims=["inline", "crossline"],
        chunks=[64, 64, 512],
        coordinates=[
            CoordinateDecl(name="cdp_x", dimensions=["inline", "crossline"])
        ],
    )
    h = t._repr_html_()
    for needle in ("demo_3d", "inline", "crossline", "cdp_x", "64"):
        assert needle in h
    assert h.startswith("<div")


def test_registry_repr_renders_all_defaults():
    reg = default_registry()
    h = reg._repr_html_()
    assert f"{len(reg.names())} templates" in h
    for name in reg.names():
        assert name in h
    # every individual template also renders standalone
    for name in reg.names():
        assert reg.get(name)._repr_html_().startswith("<div")


def test_dataset_repr_escapes_and_hides_raw_headers():
    ds = Dataset(
        name="seismic <&> test",
        dimensions=[NamedDimension(name="inline", size=10),
                    NamedDimension(name="time", size=100)],
        coordinates=[Coordinate(name="cdp_x", dimensions=["inline"])],
        variables=[
            Variable(name="amplitude", dimensions=["inline", "time"],
                     coordinates=["cdp_x"], chunks=[10, 100])
        ],
        attributes={"rawFileHeaders": "A" * 4000, "surveyType": "3d"},
    )
    h = ds._repr_html_()
    assert "seismic &lt;&amp;&gt; test" in h  # escaped
    assert "amplitude" in h and "surveyType" in h
    assert "AAAA" not in h  # raw header blob hidden from the repr
