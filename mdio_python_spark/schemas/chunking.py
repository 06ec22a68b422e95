"""Constrained auto-chunking (C2) — byte-budget chunk selection.

Reference: ``src/mdio/core/utils_write.py:16-52`` sizes chunks with dask's
``normalize_chunks("auto", limit=max_bytes)`` + balancing, applied by
``ingestion/dataset_factory.py:191-200`` (256 MiB live-mask cap, 32 MiB
coordinate cap). Here the same budgets govern the store's parquet
partition granularity: a "chunk" is one partition holding
``prod(spatial_chunks)`` traces x ``ns`` samples.

Two guards, both absent in round 1 (fixed template chunks only):

* **byte budget** — shrink (halve the largest chunk dim) until one chunk
  fits ``max_bytes``; a 10k x 10k survey with template chunk 128x128 and
  4k samples would otherwise make 256 GiB partitions that no executor can
  hold.
* **partition-count guard** — grow (double the dim with the most chunk
  cells) until the total chunk-cell count fits ``max_partitions``;
  chunk=1 dims on large surveys would otherwise create millions of tiny
  parquet partitions and kill the driver/filesystem metadata path. This
  guard is Spark-specific: Zarr tolerates huge chunk counts, distributed
  file listings do not.

The halve-largest/double-worst loops produce balanced shapes like dask's
``_balance_chunksizes`` without importing dask (not available here).
"""

from __future__ import annotations

import math
from collections.abc import Mapping, Sequence

MAX_VARIABLE_BYTES = 256 << 20  # per-chunk payload cap (live-mask analog)
MAX_COORDINATE_BYTES = 32 << 20  # per-chunk cap for coordinate-only views
MAX_PARTITIONS = 32_768  # chunk-cell (parquet partition) count cap


def constrained_chunks(
    shape: Sequence[int], itemsize: int, max_bytes: int
) -> tuple[int, ...]:
    """Largest balanced chunk shape with ``prod(chunk) * itemsize <=
    max_bytes`` (``utils_write.py:16-44`` analog): start from the full
    shape and halve the largest dim until the budget holds."""
    chunk = [max(1, int(s)) for s in shape]
    while math.prod(chunk) * itemsize > max_bytes:
        i = max(range(len(chunk)), key=lambda j: chunk[j])
        if chunk[i] == 1:
            break  # all dims at 1: budget unsatisfiable, nothing to halve
        chunk[i] = math.ceil(chunk[i] / 2)
    return tuple(chunk)


def n_chunk_cells(sizes: Mapping[str, int], chunks: Mapping[str, int]) -> int:
    """Total number of chunk cells (= store partitions) for a grid."""
    return math.prod(math.ceil(sizes[d] / chunks[d]) for d in sizes)


def ingest_chunks(
    dim_sizes: Mapping[str, int],
    template_chunks: Mapping[str, int],
    samples_per_trace: int,
    itemsize: int = 4,
    max_bytes: int | None = None,
    max_partitions: int | None = None,
) -> dict[str, int]:
    """Resolve the store's spatial chunk shape from template defaults.

    1. clamp each template chunk to its dim size (``-1``/oversized chunks
       mean "whole dim", ``dataset_factory.py:54-64``),
    2. shrink (halve largest) while one chunk exceeds ``max_bytes`` —
       every trace carries the full vertical dim, so chunk bytes =
       ``prod(spatial_chunks) * samples_per_trace * itemsize``,
    3. grow (double the dim with the most chunk cells) while the total
       cell count exceeds ``max_partitions``.

    The byte budget wins over the partition guard if they ever conflict
    (growth stops at the byte budget); at the defaults that requires a
    grid beyond any real survey.
    """
    # resolved at call time so the module-level budgets act as config
    max_bytes = MAX_VARIABLE_BYTES if max_bytes is None else max_bytes
    max_partitions = MAX_PARTITIONS if max_partitions is None else max_partitions
    spatial = list(dim_sizes)
    chunk = {
        d: max(1, min(int(template_chunks[d]), int(dim_sizes[d])))
        if int(template_chunks[d]) > 0
        else int(dim_sizes[d])
        for d in spatial
    }

    trace_bytes = samples_per_trace * itemsize
    while math.prod(chunk.values()) * trace_bytes > max_bytes:
        d = max(spatial, key=lambda x: chunk[x])
        if chunk[d] == 1:
            break
        chunk[d] = math.ceil(chunk[d] / 2)

    while n_chunk_cells(dim_sizes, chunk) > max_partitions:
        growable = [d for d in spatial if chunk[d] < dim_sizes[d]]
        if not growable:
            break  # every dim already one chunk
        d = max(growable, key=lambda x: math.ceil(dim_sizes[x] / chunk[x]))
        grown = min(dim_sizes[d], chunk[d] * 2)
        if math.prod({**chunk, d: grown}.values()) * trace_bytes > max_bytes:
            break  # byte budget wins
        chunk[d] = grown

    return chunk
