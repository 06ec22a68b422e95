"""Token-stream sequence packing: map each document to its position in a
fixed-context training stream.

GPT-style packing concatenates the tokenized corpus in a deterministic
order and chops it into ``ctx_len``-token sequences; a document therefore
owns a start sequence, an offset within it, and possibly spans several
sequences. The whole assignment is a function of one number per doc — the
exclusive prefix sum of token counts in corpus order — so the operator
reduces to a scale-safe global running sum.

``global_running_sum`` generalizes the ordered-export ordinal
(``operators/grid.py::ordered_export``): range-partition on the order
keys, in-partition exclusive prefix via a partition-local window, then
broadcast cumulative per-partition totals. One corpus exchange (the range
shuffle); the offsets table is <= one row per partition. The round-1-style
alternative — ``SUM() OVER (ORDER BY ...)`` with no partition — serializes
the corpus through a single task and is pinned out by
``tests/test_query_plans.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mdio_python_spark.operators.text import token_count


def global_running_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    weight_col: str,
    out_col: str = "cum_before",
) -> DataFrame:
    """Exclusive prefix sum of ``weight_col`` over the global
    ``order_cols`` order (which must be a total order — supply a unique
    tie-break column).

    Range-partition + local window + broadcast offsets: the only
    corpus-sized exchange is the range shuffle, the per-partition window
    carries O(1) state, and the cross-partition carry is a <=
    num-partitions-row cumulative joined back by partition id.
    """
    parted = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    local = parted.select(
        "*",
        F.shiftright(F.monotonically_increasing_id(), 33)
        .cast("int")
        .alias("_pid"),
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = local.withColumn(
        "_local_cum", F.coalesce(F.sum(weight_col).over(w_local), F.lit(0))
    )
    totals = local.groupBy("_pid").agg(F.sum(weight_col).alias("_n"))
    # `_pid % 1` keeps a deliberate single partition for the tiny offsets
    # window without the foldable-partition WindowExec warning.
    w_off = (
        Window.partitionBy(F.col("_pid") % F.lit(1))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_local_cum")).cast("long"))
        .drop("_pid", "_local_cum", "_offset")
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document its slot in the packed token stream.

    Returns ``(id_col, n_tokens, cum_before, seq_id, seq_offset,
    n_seqs_spanned)`` where ``seq_id = cum_before div ctx_len`` is the
    training sequence holding the doc's first token, ``seq_offset`` its
    position there, and ``n_seqs_spanned`` how many sequences the doc
    crosses (boundary-crossing docs are the norm in packed training).
    Corpus order is ``id_col`` — deterministic across engines and runs.
    """
    ctx = F.lit(ctx_len)
    with_counts = docs.select(
        id_col, token_count(F.col(text_col)).alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    cum = global_running_sum(with_counts, [id_col], "n_tokens")
    return cum.select(
        id_col,
        "n_tokens",
        "cum_before",
        F.expr(f"cum_before div {ctx_len}").alias("seq_id"),
        F.pmod(F.col("cum_before"), ctx).cast("long").alias("seq_offset"),
        (
            F.expr(f"(cum_before + n_tokens - 1) div {ctx_len}")
            - F.expr(f"cum_before div {ctx_len}")
            + F.lit(1)
        )
        .cast("long")
        .alias("n_seqs_spanned"),
    )
