"""Grid overrides (``src/mdio/segy/geometry.py:29-105``): typed flags that
select index strategies (SURVEY §2.6) during ingestion.

Validation mirrors ``segy/geometry.py:125-168`` +
``ingestion/segy/validation.py:15-38``: mutually-exclusive flags, required
parameters for NonBinned.
"""

from __future__ import annotations

from pydantic import Field, model_validator

from mdio_python_spark.schemas.dataset import StrictModel


class GridOverrides(StrictModel):
    auto_channel_wrap: bool = False
    auto_shot_wrap: bool = False
    calculate_shot_index: bool = False
    has_duplicates: bool = False
    non_binned: bool = False
    chunksize: int | None = None  # NonBinned trace-dim chunk
    non_binned_dims: list[str] = Field(default_factory=list)

    @model_validator(mode="after")
    def _validate(self) -> GridOverrides:
        if self.non_binned and self.has_duplicates:
            raise ValueError("NonBinned and HasDuplicates are mutually exclusive")
        if self.non_binned and self.chunksize is None:
            raise ValueError("NonBinned requires chunksize")
        if (self.chunksize is not None or self.non_binned_dims) and not self.non_binned:
            raise ValueError("chunksize/non_binned_dims only valid with non_binned")
        if self.auto_shot_wrap and self.calculate_shot_index:
            raise ValueError(
                "auto_shot_wrap already implies shot-index calculation"
            )
        return self

    def strategy_names(self) -> list[str]:
        """Ordered strategy list (``index_strategies.py:397-459``)."""
        out: list[str] = []
        if self.auto_channel_wrap:
            out.append("ChannelWrapping")
        if self.auto_shot_wrap or self.calculate_shot_index:
            out.append("ShotWrapping")
        if self.has_duplicates:
            out.append("DuplicateHandling")
        if self.non_binned:
            out.append("NonBinned")
        if not out:
            out.append("RegularGrid")
        return out
