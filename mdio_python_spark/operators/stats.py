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


def exact_group_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    id_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact per-group discrete quantiles: the element at rank
    ``ceil(q * n)`` under the total order ``(value, id)``.

    Discrete (lower) quantiles are chosen over interpolating percentiles
    deliberately: the rank is pure integer arithmetic, so the result is an
    actual corpus value and bit-identical across engines — interpolation
    formulas differ subtly between implementations (see
    ``plans/llm_queries.py::dataset_card_stats`` for the same policy on
    medians).

    Scale shape: one combinable groupBy for the counts (tiny, broadcast
    back) and one partitioned window sort per group — the unavoidable
    cost of an EXACT quantile. At 100 TB swap in ``approx_percentile``
    for monitoring and keep this form for audit runs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(value_col, id_col)
    ranked = df.select(*keys, value_col, id_col).withColumn(
        "_rn", F.row_number().over(w)
    )
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    joined = ranked.join(F.broadcast(counts), keys)
    aggs = [F.max("_n").alias("n_rows")]
    for q in qs:
        num, den = q.as_integer_ratio()
        # ceil(q*n) = (num*n + den - 1) div den, exactly, in integers
        rank = F.expr(f"({num} * _n + {den} - 1) div {den}")
        aggs.append(
            F.max(F.when(F.col("_rn") == rank, F.col(value_col))).alias(
                f"p{int(q * 100)}"
            )
        )
    return joined.groupBy(*keys).agg(*aggs)
