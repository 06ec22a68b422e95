"""Distributed SEG-Y source & sink.

Reading (S1/S2/S3, ``src/mdio/segy/file.py:152-186``, ``parsers.py:23-76``,
``_raw_trace_wrapper.py:14-49``): the driver scans the 3600-byte file header
once; trace blocks are then read by executor tasks, each seeking its own
byte range — the Spark analog of the reference's 10k-trace process-pool
fan-out, except partitioning is declarative (one input partition per block)
and decode happens in Arrow-batched numpy, not per row.

Writing (K3/K4, ``segy/blocked_io.py:214-302``, ``creation.py:61-125``):
``repartitionByRange(dims) + sortWithinPartitions`` gives totally-ordered
part files (range partition i holds keys < partition i+1), so the driver's
in-order concat replaces the reference's hierarchical merge tree.

Scale: at 100 TB the read path is embarrassingly parallel byte-range scans
(no shuffle); the write path shuffles once on the export sort key — the
minimum any globally-ordered output requires.
"""

from __future__ import annotations

import io
import math
import os
import shutil
import time
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from mdio_python_spark.sources import segy_codec as codec
from mdio_python_spark.sources import staging as staging_mod


@dataclass
class SegyFileInfo:
    """S1 file-info scan result (``segy/file.py:152-186``)."""

    path: str
    num_traces: int
    samples_per_trace: int
    sample_interval: int  # microseconds
    data_format: int
    measurement_system: int
    text_header: str
    binary_header: dict[str, int]
    sample_bytes: int = 4
    # verbatim file-header bytes (F7, ``ingestion/segy/file_headers.py:45-53``):
    # the decoded dict/str views above model only the named fields; real
    # files carry content in unmodeled positions that must survive roundtrip
    raw_text_header: bytes = b""
    raw_binary_header: bytes = b""
    # rev1 extended textual headers (binary-header count at byte 304):
    # 3200-byte blocks between the binary header and the first trace
    extended_headers: int = 0
    raw_extended_headers: bytes = b""

    @property
    def trace_bytes(self) -> int:
        return codec.TRACE_HEADER_BYTES + self.samples_per_trace * self.sample_bytes

    @property
    def data_offset(self) -> int:
        """Byte offset of the first trace: 3600 + extended text headers."""
        return codec.FILE_HEADER_BYTES + self.extended_headers * codec.TEXT_HEADER_BYTES

    def sample_labels_us(self) -> np.ndarray:
        """Sample labels in microvalue units; /1000 normalization (F2)
        happens in the ingest pipeline."""
        return np.arange(self.samples_per_trace, dtype=np.int64) * self.sample_interval


def segy_file_info(path: str, text_encoding: str = "cp037") -> SegyFileInfo:
    """Driver-side one-shot scan of text header, binary header, extended
    text headers, trace count (rev-compat handling:
    ``src/mdio/segy/compat.py``)."""
    file_size = os.path.getsize(path)
    with open(path, "rb") as f:
        text_raw = f.read(codec.TEXT_HEADER_BYTES)
        bin_raw = f.read(codec.BINARY_HEADER_BYTES)
        bin_hdr = codec.decode_binary_header(bin_raw)
        n_ext = bin_hdr["extended_headers"]
        if n_ext < 0:
            # -1 means "variable number, terminated by a marker record"
            # (rev1 §3.3) — unsupported: reject explicitly instead of
            # misparsing every trace
            raise ValueError(
                f"{path}: variable extended text header count "
                f"({n_ext}) is unsupported"
            )
        ext_raw = f.read(n_ext * codec.TEXT_HEADER_BYTES)
    if len(ext_raw) != n_ext * codec.TEXT_HEADER_BYTES:
        raise ValueError(
            f"{path}: binary header declares {n_ext} extended text headers "
            "but the file is too short"
        )
    data_format = bin_hdr["data_format"] or codec.FORMAT_IEEE32
    sample_bytes = codec.SAMPLE_BYTES[data_format]
    ns = bin_hdr["samples_per_trace"]
    trace_bytes = codec.TRACE_HEADER_BYTES + ns * sample_bytes
    payload = file_size - codec.FILE_HEADER_BYTES - len(ext_raw)
    if payload % trace_bytes:
        raise ValueError(
            f"{path}: trailing {payload % trace_bytes} bytes — not a whole trace"
        )
    return SegyFileInfo(
        path=path,
        num_traces=payload // trace_bytes,
        samples_per_trace=ns,
        sample_interval=bin_hdr["sample_interval"],
        data_format=data_format,
        measurement_system=bin_hdr["measurement_system"],
        text_header=codec.decode_text_header(text_raw, text_encoding),
        binary_header=bin_hdr,
        sample_bytes=sample_bytes,
        raw_text_header=text_raw,
        raw_binary_header=bin_raw,
        extended_headers=n_ext,
        raw_extended_headers=ext_raw,
    )


def read_traces(
    spark: SparkSession,
    info: SegyFileInfo,
    fields: list[str],
    include_samples: bool = True,
    include_raw_header: bool = False,
    include_sample_stats: bool = False,
    block_size: int = 10_000,
    spec: dict[str, tuple[int, str]] | None = None,
) -> DataFrame:
    """S2/S3 — distributed trace scan: one input partition per trace block.

    Column pruning is explicit: only ``fields`` are decoded (P1,
    ``ingestion/segy/reader.py:48-57``). Output schema:
    ``src_trace_idx long, <field> long ..., [raw_header binary,]
    [samples array<float>]``.

    ``include_sample_stats`` appends per-trace nonzero-sample partials
    (``n_nz, s_sum, s_ssq, s_min, s_max``) computed vectorized in numpy at
    decode time — the statsV1 accumulation the reference folds into its
    trace workers (``segy/_workers.py:179-194``). Downstream an
    ``observe()`` over these five longs/doubles yields the dataset summary
    during the write action with zero extra payload passes. Traces with no
    nonzero samples carry ±inf sentinels in ``s_min``/``s_max`` (Spark
    min/max would otherwise be poisoned by NaN ordering).
    """
    path = info.path
    trace_bytes = info.trace_bytes
    data_offset = info.data_offset
    ns = info.samples_per_trace
    data_format = info.data_format
    n_blocks = max(1, math.ceil(info.num_traces / block_size))
    num_traces = info.num_traces

    parts = [
        "src_trace_idx long",
        *[f"{f} long" for f in fields],
    ]
    if include_raw_header:
        parts.append("raw_header binary")
    if include_samples:
        parts.append("samples array<float>")
    if include_sample_stats:
        parts.append(
            "n_nz long, s_sum double, s_ssq double, s_min double, s_max double"
        )
    schema = ", ".join(parts)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as f:
            for pdf in batches:
                for block_id in pdf["id"]:
                    start = int(block_id) * block_size
                    n = min(block_size, num_traces - start)
                    if n <= 0:
                        continue
                    f.seek(data_offset + start * trace_bytes)
                    raw = np.frombuffer(
                        f.read(n * trace_bytes), dtype=np.uint8
                    ).reshape(n, trace_bytes)
                    headers = raw[:, : codec.TRACE_HEADER_BYTES]
                    cols: dict[str, object] = {
                        "src_trace_idx": np.arange(start, start + n, dtype=np.int64)
                    }
                    cols.update(codec.decode_trace_headers(headers, fields, spec))
                    if include_raw_header:
                        hdr_bytes = headers.tobytes()
                        hb = codec.TRACE_HEADER_BYTES
                        cols["raw_header"] = [
                            hdr_bytes[i * hb : (i + 1) * hb] for i in range(n)
                        ]
                    if include_samples:
                        samples = codec.decode_samples(
                            raw[:, codec.TRACE_HEADER_BYTES :].reshape(n, -1),
                            data_format,
                        ).reshape(n, ns)
                        cols["samples"] = list(samples)
                        if include_sample_stats:
                            s = samples.astype(np.float64)
                            nz = s != 0.0
                            masked = np.where(nz, s, 0.0)
                            cols["n_nz"] = nz.sum(axis=1).astype(np.int64)
                            cols["s_sum"] = masked.sum(axis=1)
                            cols["s_ssq"] = (masked * masked).sum(axis=1)
                            cols["s_min"] = np.where(nz, s, np.inf).min(axis=1)
                            cols["s_max"] = np.where(nz, s, -np.inf).max(axis=1)
                    yield pd.DataFrame(cols)

    # contiguous block ranges per partition (spark.range's native
    # slicing — NO round-robin repartition): a task's traces are a
    # contiguous file range, so direct-mode ingest writes each chunk
    # directory from O(1) tasks instead of scattering every task across
    # every directory (measured: ~3.7k tiny store files -> ~1 per chunk)
    blocks = spark.range(0, n_blocks, numPartitions=min(n_blocks, 256))
    return blocks.mapInPandas(scan, schema=schema)


@dataclass
class SegyWriteSpec:
    """K4 skeleton parameters + encoding config for export."""

    samples_per_trace: int
    sample_interval: int
    data_format: int = codec.FORMAT_IEEE32
    measurement_system: int = 1
    text_header: str = ""
    revision_major: int = 1
    revision_minor: int = 0
    extra_binary_fields: dict[str, int] = field(default_factory=dict)
    # verbatim 3200/400-byte headers: written as-is when present (F7);
    # re-encoding from the modeled fields is the fallback only
    raw_text_header: bytes | None = None
    raw_binary_header: bytes | None = None
    raw_extended_headers: bytes | None = None

    def binary_header(self) -> dict[str, int]:
        out = {
            "sample_interval": self.sample_interval,
            "samples_per_trace": self.samples_per_trace,
            "data_format": self.data_format,
            "measurement_system": self.measurement_system,
            "segy_revision": codec.encode_segy_revision(
                self.revision_major, self.revision_minor
            ),
            "fixed_length_flag": 1,
        }
        out.update(self.extra_binary_fields)
        return out


def _encode_trace_block(
    pdf: pd.DataFrame,
    use_raw: bool,
    header_fields: list[str],
    hdr_spec,
    data_format: int,
) -> bytes:
    """One batch of trace rows -> contiguous SEG-Y trace bytes (verbatim
    ``raw_header`` when present, re-encoded fields otherwise; samples
    through the format codec). Shared by the range-shuffle export and
    the chunk-aligned export so the two paths cannot drift."""
    n = len(pdf)
    if use_raw:
        headers = np.frombuffer(
            b"".join(pdf["raw_header"]), dtype=np.uint8
        ).reshape(n, codec.TRACE_HEADER_BYTES)
    else:
        headers = codec.encode_trace_headers(
            {fname: pdf[fname].to_numpy() for fname in header_fields},
            n,
            hdr_spec,
        )
    samples = np.stack(pdf["samples"].to_numpy()).astype(np.float32)
    raw_samples = codec.encode_samples(samples, data_format)
    return np.concatenate([headers, raw_samples], axis=1).tobytes()


def _export_skeleton(write_spec: SegyWriteSpec, text_encoding: str) -> bytes:
    """File skeleton: 3200-byte text + 400-byte binary + extended
    headers — verbatim raw bytes when the spec carries them (F7)."""
    if write_spec.raw_text_header is not None:
        assert len(write_spec.raw_text_header) == codec.TEXT_HEADER_BYTES
        skeleton = bytes(write_spec.raw_text_header)
    else:
        skeleton = codec.encode_text_header(write_spec.text_header, text_encoding)
    if write_spec.raw_binary_header is not None:
        assert len(write_spec.raw_binary_header) == codec.BINARY_HEADER_BYTES
        skeleton += write_spec.raw_binary_header
    else:
        skeleton += codec.encode_binary_header(write_spec.binary_header())
    if write_spec.raw_extended_headers:
        assert len(write_spec.raw_extended_headers) % codec.TEXT_HEADER_BYTES == 0
        skeleton += write_spec.raw_extended_headers
    return skeleton


def _compose_export(
    spark,
    store,
    out_path: str,
    skeleton: bytes,
    stage_clock: dict | None,
) -> None:
    """Merge staged parts behind the skeleton. Preferred: executor-
    parallel ranged compose — each part lands at its exact final offset
    in one pass (pwrite locally; multipart upload on object stores), so
    the driver stream stops being the export ceiling (the reference
    parallelizes only its INTERMEDIATE merge tree, blocked_io.py:
    226-251, and still single-streams the final append,
    creation.concat_files:236-264). Fallback: the driver in-order
    stream. Both paths drop each part as soon as it is composed
    (delete_parts): peak disk ~ one output, not parts + output."""
    _t0 = time.perf_counter()
    sink = staging_mod.ranged_sink_for(out_path)
    use_ranged = sink is not None and len(store.list()) > 1
    if use_ranged:
        sink.truncate_to(0)  # fresh file: drop any previous contents
        sink.write_at(0, io.BytesIO(skeleton))
        staging_mod.compose_parts_ranged(
            spark, store, sink, len(skeleton), delete_parts=True
        )
    else:
        with open(out_path, "wb") as out:
            out.write(skeleton)
            staging_mod.concat_parts(store, out, delete_parts=True)
    store.remove_all()
    if stage_clock is not None:
        stage_clock["export_concat_s"] = round(time.perf_counter() - _t0, 3)
        stage_clock["export_concat_mode"] = (
            "ranged_parallel" if use_ranged else "driver_stream"
        )


def write_segy(
    df: DataFrame,
    out_path: str,
    order_by: list[str],
    write_spec: SegyWriteSpec,
    header_fields: list[str] | None = None,
    spec: dict[str, tuple[int, str]] | None = None,
    num_partitions: int | None = None,
    n_rows: int | None = None,
    text_encoding: str = "cp037",
    staging: "str | staging_mod.StagingStore | None" = None,
    stage_clock: dict | None = None,
) -> None:
    """K3/K4 — ordered SEG-Y export. ``n_rows`` (when the caller already
    knows the trace count — ingest does, export just counted) avoids the
    extra full count job that sizing partitions otherwise needs.

    ``df`` columns: the ``order_by`` dims, either ``raw_header`` (binary,
    written verbatim — byte-identical roundtrip path) or the listed
    ``header_fields`` (re-encoded per spec, F4), and ``samples``.

    Physical plan: one range shuffle on the export key; each task streams
    its ordered slice to ``part-<i>`` in the staging store; the driver
    concatenates parts in partition order (range partitions are globally
    ordered, replacing the reference's merge tree,
    ``blocked_io.py:226-251``).

    ``staging`` is where executors put part files: a URI (``file://...``
    or a scheme registered via ``sources.staging.register_scheme``) or a
    ready ``StagingStore``. Default: ``<out_path>.parts`` on the local
    filesystem — correct for local mode and POSIX-shared clusters; on an
    object-store cluster pass the store-backed staging URI so executors
    and driver never need a shared mount (the reference has the same
    contract: its partial-file merge runs over shared storage,
    ``blocked_io.py:214-302``).
    """
    ns = write_spec.samples_per_trace
    data_format = write_spec.data_format
    use_raw = "raw_header" in df.columns
    header_fields = header_fields or []
    hdr_spec = spec or codec.DEFAULT_TRACE_HEADER_SPEC

    store = staging_mod.staging_for(
        staging if staging is not None else out_path + ".parts"
    )

    if num_partitions is None:
        # ~300 MB processing chunks, matching the reference's export
        # rechunk target (``segy/utilities.py:146-198``, C3)
        if n_rows is None:
            n_rows = df.count()
        rows_per_part = max(1, (300 << 20) // (240 + ns * 4))
        num_partitions = max(1, math.ceil(n_rows / rows_per_part))

    ordered = df.repartitionByRange(num_partitions, *order_by).sortWithinPartitions(
        *order_by
    )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        part_name = f"part-{pid:06d}"
        n_written = 0
        with store.open_write(part_name) as f:
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                f.write(
                    _encode_trace_block(
                        pdf, use_raw, header_fields, hdr_spec, data_format
                    )
                )
                n_written += n
        if n_written == 0:
            store.delete(part_name)
        yield pd.DataFrame({"partition": [pid], "n_traces": [n_written]})

    _t0 = time.perf_counter()
    counts = ordered.mapInPandas(
        write_partition, schema="partition int, n_traces long"
    ).collect()
    del counts
    if stage_clock is not None:
        stage_clock["export_encode_s"] = round(time.perf_counter() - _t0, 3)

    skeleton = _export_skeleton(write_spec, text_encoding)
    _compose_export(df.sparkSession, store, out_path, skeleton, stage_clock)


def write_segy_store_aligned(
    spark: SparkSession,
    traces_root: str,
    dims: list[str],
    write_spec: SegyWriteSpec,
    out_path: str,
    text_encoding: str = "cp037",
    staging: "str | staging_mod.StagingStore | None" = None,
    stage_clock: dict | None = None,
    max_part_bytes: int = 1 << 30,
) -> int | None:
    """CHUNK-ALIGNED export: zero-shuffle ``store -> SEG-Y`` for the
    common case (whole store, dim order). Returns the trace count, or
    ``None`` when the layout doesn't qualify (caller falls back to the
    range-shuffle :func:`write_segy`).

    The store's trace parquet is hive-partitioned by the chunk keys, and
    the MAJOR dim's chunks are disjoint RANGES of the export sort order:
    every row with ``dims[0]`` in chunk i precedes every row in chunk
    i+1, whatever the minor-dim chunking. So each major chunk is one
    contiguous byte range of the output — a Spark task reads that
    chunk's parquet files directly (pyarrow, the read_traces pattern:
    executors fetch their own byte ranges), sorts the in-memory slice by
    the full dim tuple, encodes, and stages ``part-<chunk>``; the ranged
    compose then lands every part at its exact offset. No
    repartitionByRange sampling pass, no payload exchange, no shuffle
    spill — the export becomes read + encode + positional write, which
    is the disk-bandwidth shape a 22 GB leg needs to fit next to its own
    store (the 30x stress point died on shuffle + parts + output disk
    before this path existed).

    Memory gate: a major chunk whose encoded size exceeds
    ``max_part_bytes`` (fat minor dims) disqualifies the layout — the
    shuffle path streams instead."""
    prefix = f"{dims[0]}_chunk="
    try:
        entries = [
            e for e in os.listdir(traces_root) if e.startswith(prefix)
        ]
    except OSError:
        return None
    if not entries:
        return None
    chunk_dirs = sorted(
        (int(e[len(prefix):]), os.path.join(traces_root, e)) for e in entries
    )
    files_by_chunk: list[tuple[int, list[str]]] = []
    total_bytes = 0
    for pos, (_, d) in enumerate(chunk_dirs):
        files = sorted(
            os.path.join(root, f)
            for root, _dirs, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )
        if not files:
            continue
        files_by_chunk.append((pos, files))
        total_bytes += sum(os.path.getsize(f) for f in files)
    if not files_by_chunk:
        return None
    # Per-task memory gate on the EXACT decoded size — row counts from
    # the parquet footers x the fixed trace width (240-byte header +
    # ns 4-byte samples). A compressed-size multiple is NOT safe here:
    # zstd on low-entropy seismic (quiet/constant traces) routinely
    # decodes past 3x, and an over-admitted chunk OOMs the encode task
    # instead of falling back to the streaming shuffle path (ADVICE r8).
    # The exact row basis carries a x3 COPY-HEADROOM factor (ADVICE r9):
    # encode_chunk holds ~3-4 concurrent copies of the decoded bytes
    # (concatenated Arrow table, flat numpy array, the flat[order]
    # reorder copy, the encoded output block — the Arrow table drops
    # before the output block materializes), so admitting up to
    # max_part_bytes of DECODED data would peak the task at several
    # times the budget on incompressible cubes — exactly the OOM the
    # gate exists to route to the streaming shuffle path instead.
    import pyarrow.parquet as _pq

    ns = write_spec.samples_per_trace
    trace_bytes = 240 + ns * 4
    max_chunk_rows = max(
        sum(_pq.ParquetFile(f).metadata.num_rows for f in fs)
        for _, fs in files_by_chunk
    )
    if max_chunk_rows * trace_bytes * 3 > max_part_bytes:
        return None
    data_format = write_spec.data_format
    store = staging_mod.staging_for(
        staging if staging is not None else out_path + ".parts"
    )
    hdr_spec = codec.DEFAULT_TRACE_HEADER_SPEC

    manifest = spark.createDataFrame(
        [(pos, fs) for pos, fs in files_by_chunk],
        "pos int, files array<string>",
    ).repartition(min(len(files_by_chunk), 512))

    def encode_chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for bdf in batches:
            for pos, files in zip(bdf["pos"], bdf["files"]):
                tables = [pq.read_table(f) for f in files]
                import pyarrow as pa

                table = pa.concat_tables(tables)
                use_raw = "raw_header" in table.column_names
                cols = {d: table.column(d).to_numpy() for d in dims}
                order = np.lexsort(tuple(cols[d] for d in reversed(dims)))
                n = len(order)
                flat = (
                    table.column("samples")
                    .combine_chunks()
                    .flatten()
                    .to_numpy(zero_copy_only=False)
                    .reshape(n, ns)
                )
                pdf = pd.DataFrame({d: cols[d][order] for d in dims})
                pdf["samples"] = list(flat[order])
                if use_raw:
                    raw = table.column("raw_header").to_pylist()
                    pdf["raw_header"] = [raw[i] for i in order]
                # header_fields=[] mirrors store_to_segy -> write_segy
                # exactly: verbatim raw_header when the store has it,
                # blank re-encoded headers otherwise
                block = _encode_trace_block(
                    pdf, use_raw, [], hdr_spec, data_format
                )
                with store.open_write(f"part-{int(pos):06d}") as f:
                    f.write(block)
                yield pd.DataFrame({"pos": [int(pos)], "n": [n]})

    _t0 = time.perf_counter()
    counts = manifest.mapInPandas(encode_chunk, schema="pos int, n long").collect()
    n_total = int(sum(r["n"] for r in counts))
    if stage_clock is not None:
        stage_clock["export_encode_s"] = round(time.perf_counter() - _t0, 3)
        stage_clock["export_encode_mode"] = "chunk_aligned"

    skeleton = _export_skeleton(write_spec, text_encoding)
    _compose_export(spark, store, out_path, skeleton, stage_clock)
    return n_total
