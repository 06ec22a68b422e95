"""Geometry detectors (A3/A4) — groupBy aggregations + driver-side decision.

The reference scans header tables with pandas-style loops
(``src/mdio/ingestion/segy/header_analysis.py:82-191``). Here each detector
is one aggregation; the classification rule runs on the tiny agg result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def channel_ranges(
    df: DataFrame, cable_col: str = "cable", channel_col: str = "channel"
) -> DataFrame:
    """A3 — per-cable channel min/max (``header_analysis.py:82-139``)."""
    return (
        df.groupBy(cable_col)
        .agg(
            F.min(channel_col).alias("chan_min"),
            F.max(channel_col).alias("chan_max"),
        )
        .orderBy(cable_col)
    )


def detect_channel_geometry(ranges: list[tuple]) -> str:
    """Driver-side overlap test on the A3 result: overlapping per-cable
    channel ranges => geometry A (restarts per cable); disjoint increasing
    ranges => geometry B (sequential across cables)."""
    spans = sorted((r["chan_min"], r["chan_max"]) for r in ranges)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        if lo <= hi:
            return "A"
    return "B"


def gun_analysis(
    df: DataFrame,
    line_col: str = "shot_line",
    gun_col: str = "gun",
    shot_col: str = "shot_point",
    num_guns: int | None = None,
) -> DataFrame:
    """A4 — per (line, gun): distinct shots vs distinct wrapped shots
    (``header_analysis.py:142-191``). If ``floor(shot/num_guns)`` is unique
    per gun the shots are interleaved across guns (Type B)."""
    grouped = df.groupBy(line_col, gun_col)
    aggs = [F.count_distinct(shot_col).alias("n_shots")]
    if num_guns is not None:
        aggs.append(
            F.count_distinct(F.floor(F.col(shot_col) / F.lit(num_guns))).alias(
                "n_wrapped_shots"
            )
        )
    return grouped.agg(*aggs).orderBy(line_col, gun_col)
