"""Summary statistics (A1) — the reference's statsV1.

Reference semantics (``src/mdio/segy/_workers.py:179-194``): statistics are
computed over **nonzero** samples only; partials (count/min/max/sum/
sumSquares) are merged on the driver (``src/mdio/segy/blocked_io.py:41-51``).

Spark gives partial+final aggregation automatically; one ``df.agg`` is the
whole operator, and it scales to any cluster width with a single reduce.
Derived mean/std are computed from the exact sums (see
``functions.determinism``) so results are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mdio_python_spark.functions.determinism import dsum, dsum_sq


def summary_statistics(
    df: DataFrame,
    value_col: str,
    nonzero_only: bool = True,
    scale: int = 4,
) -> DataFrame:
    """One-row DataFrame: count / min / max / sum / sum_squares / mean / std.

    ``nonzero_only=True`` reproduces the reference's zero-masking.
    """
    col = F.col(value_col)
    if nonzero_only:
        df = df.where(col != 0)
    agg = df.agg(
        F.count(col).alias("count"),
        F.min(col).cast("double").alias("min"),
        F.max(col).cast("double").alias("max"),
        dsum(col, scale).alias("sum"),
        dsum_sq(col, scale).alias("sum_squares"),
    )
    # mean/std from exact sums: identical IEEE double ops in any engine.
    n = F.col("count").cast("double")
    mean = F.col("sum") / n
    var = (F.col("sum_squares") - (F.col("sum") * F.col("sum")) / n) / (n - F.lit(1.0))
    return agg.select(
        "count",
        "min",
        "max",
        "sum",
        "sum_squares",
        mean.alias("mean"),
        F.sqrt(var).alias("std"),
    )


def samples_statistics(
    df: DataFrame, samples_col: str = "samples", scale: int = 4
) -> DataFrame:
    """statsV1 over an ``array<float>`` sample-vector column.

    The explode stays inside whole-stage codegen (Generate node); at 100 TB
    the partial agg collapses each task's samples to 5 numbers before the
    single-stage reduce — no shuffle of sample data.
    """
    exploded = df.select(F.explode(F.col(samples_col)).alias("sample"))
    return summary_statistics(exploded, "sample", nonzero_only=True, scale=scale)


def grid_sparsity(df: DataFrame, dims: list[str]) -> DataFrame:
    """Grid sparsity QC (A6): cells(grid) / live traces.

    Reference: ``src/mdio/ingestion/grid_qc.py:19-69`` (warn > 2.0,
    error > 10.0). Returns the ratio plus its inputs; thresholding is a
    driver-side policy decision, as in the reference.
    """
    cells: Column = F.lit(1).cast("long")
    aggs = [F.count_distinct(F.col(d)).alias(f"card_{d}") for d in dims]
    out = df.agg(*aggs, F.count(F.lit(1)).alias("num_traces"))
    for d in dims:
        cells = cells * F.col(f"card_{d}")
    return out.select(
        *[f"card_{d}" for d in dims],
        "num_traces",
        cells.alias("grid_cells"),
        (cells.cast("double") / F.col("num_traces")).alias("sparsity_ratio"),
    )
