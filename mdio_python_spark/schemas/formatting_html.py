"""Notebook HTML reprs for datasets, templates, and the template
registry — the cosmetic parity surface of the reference's
``builder/formatting_html.py`` (dataset/template/registry reprs),
rendered with our own minimal markup (no JS, inline styles only, safe
under both light and dark notebook themes via ``currentColor`` and
low-alpha grays).

Everything is HTML-escaped; these functions are pure string builders
with no Spark dependency, so they are safe to call on the driver of any
session (or with no session at all).
"""

from __future__ import annotations

import html
from typing import TYPE_CHECKING, Iterable

if TYPE_CHECKING:
    from mdio_python_spark.schemas.dataset import Dataset
    from mdio_python_spark.schemas.templates import (
        AbstractDatasetTemplate,
        TemplateRegistry,
    )

_BOX = (
    "border:1px solid rgba(128,128,128,.35);border-radius:5px;"
    "padding:10px 12px;margin:4px 0;font-family:monospace;font-size:12px;"
    "color:currentColor;max-width:56em;"
)
_TITLE = "font-weight:bold;margin-bottom:6px;"
_TH = (
    "text-align:left;padding:2px 10px 2px 0;"
    "border-bottom:1px solid rgba(128,128,128,.35);"
)
_TD = "padding:2px 10px 2px 0;vertical-align:top;"
_DIM = "opacity:.65;"


def _esc(v: object) -> str:
    return html.escape(str(v))


def _table(headers: Iterable[str], rows: Iterable[Iterable[object]]) -> str:
    head = "".join(f'<th style="{_TH}">{_esc(h)}</th>' for h in headers)
    body = "".join(
        "<tr>" + "".join(f'<td style="{_TD}">{_esc(c)}</td>' for c in r) + "</tr>"
        for r in rows
    )
    return (
        f'<table style="border-collapse:collapse;">'
        f"<thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"
    )


def _kv(items: Iterable[tuple[str, object]]) -> str:
    return "".join(
        f'<div><span style="{_DIM}">{_esc(k)}:</span> {_esc(v)}</div>'
        for k, v in items
    )


def template_repr_html(template: "AbstractDatasetTemplate") -> str:
    """One template: dims, chunking, coordinates, required headers."""
    coords = _table(
        ("coordinate", "dimensions", "dtype"),
        (
            (c.name, " × ".join(c.dimensions), c.data_type.value)
            for c in template.coordinates
        ),
    )
    return (
        f'<div style="{_BOX}">'
        f'<div style="{_TITLE}">mdio template · {_esc(template.name)}</div>'
        + _kv(
            [
                ("dims", " × ".join(template.all_dims)),
                ("chunks", " × ".join(map(str, template.chunks))),
                (
                    "calculated",
                    ", ".join(template.calculated_dims) or "—",
                ),
                ("variable", template.default_variable_name),
                (
                    "required headers",
                    ", ".join(template.required_header_fields()) or "—",
                ),
            ]
        )
        + (f'<div style="margin-top:6px;">{coords}</div>' if template.coordinates else "")
        + "</div>"
    )


def registry_repr_html(registry: "TemplateRegistry") -> str:
    """All registered templates as one overview table, each expandable."""
    names = registry.names()
    rows = []
    for n in names:
        t = registry.get(n)
        rows.append(
            (
                n,
                " × ".join(t.all_dims),
                " × ".join(map(str, t.chunks)),
                len(t.coordinates),
            )
        )
    details = "".join(
        f"<details><summary style=\"cursor:pointer;\">{_esc(n)}</summary>"
        f"{template_repr_html(registry.get(n))}</details>"
        for n in names
    )
    return (
        f'<div style="{_BOX}">'
        f'<div style="{_TITLE}">mdio template registry · {len(names)} templates</div>'
        f"{_table(('template', 'dims', 'chunks', 'coords'), rows)}"
        f'<div style="margin-top:6px;">{details}</div></div>'
    )


def dataset_repr_html(dataset: "Dataset") -> str:
    """Dataset manifest: dimensions, coordinates, variables."""
    dims = _table(
        ("dimension", "size"), ((d.name, d.size) for d in dataset.dimensions)
    )
    coords = _table(
        ("coordinate", "dimensions", "dtype"),
        (
            (c.name, " × ".join(c.dimensions), c.data_type.value)
            for c in dataset.coordinates
        ),
    )
    variables = _table(
        ("variable", "dimensions", "dtype", "chunks", "compressor"),
        (
            (
                v.name,
                " × ".join(v.dimensions),
                v.data_type.value,
                " × ".join(map(str, v.chunks)) if v.chunks else "—",
                getattr(v.compressor, "name", None) or str(v.compressor),
            )
            for v in dataset.variables
        ),
    )
    attrs = {k: v for k, v in dataset.attributes.items() if k != "rawFileHeaders"}
    return (
        f'<div style="{_BOX}">'
        f'<div style="{_TITLE}">mdio dataset · {_esc(dataset.name)}</div>'
        + _kv([("api", dataset.api_version), ("created", dataset.created_on)])
        + f'<div style="margin-top:6px;">{dims}</div>'
        + (f'<div style="margin-top:6px;">{coords}</div>' if dataset.coordinates else "")
        + f'<div style="margin-top:6px;">{variables}</div>'
        + (
            f'<details style="margin-top:6px;"><summary style="cursor:pointer;">'
            f"attributes ({len(attrs)})</summary>"
            f"<pre style=\"margin:4px 0;\">{_esc(attrs)}</pre></details>"
            if attrs
            else ""
        )
        + "</div>"
    )
