"""Oracle-less declared queries for the non-SQL-expressible surfaces:
the SEG-Y ingest/export roundtrip and Structured Streaming. The driver
records a weaker rows-only check for these (no DuckDB oracle can run a
binary-format pipeline or a stream); the full value assertions live in
``tests/test_segy_roundtrip.py`` and ``tests/test_streaming.py``.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd  # module scope: pandas_udf resolves string type hints here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mdio_python_spark.plans.registry import register


def _synthetic_cube(spark: SparkSession, n_il: int, n_xl: int, ns: int) -> DataFrame:
    """Deterministic little poststack cube as a trace DataFrame — pure
    column arithmetic, no RNG, so every driver run writes identical bytes."""
    base = spark.range(n_il * n_xl).select(
        (F.col("id") / n_xl + 1).cast("long").alias("inline"),
        (F.col("id") % n_xl + 1).cast("long").alias("crossline"),
    )
    k = F.sequence(F.lit(0), F.lit(ns - 1))
    samples = F.transform(
        k,
        lambda i: (
            F.sin(F.col("inline") * 0.7 + F.col("crossline") * 0.3 + i * 0.11)
        ).cast("float"),
    )
    return base.withColumns(
        {
            "cdp_x": (F.lit(700000) + F.col("inline") * 100 + F.col("crossline") * 3),
            "cdp_y": (F.lit(900000) + F.col("crossline") * 100 - F.col("inline") * 2),
            "samples": samples,
        }
    )


@register("seismic_ingest_roundtrip", "local:tests/test_segy_roundtrip.py::test_seismic_roundtrip_query_exact", bench=False)
def q_seismic_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship seismic pipeline end-to-end in one declared query:
    write a deterministic SEG-Y (K3/K4) -> ingest to the chunked store
    (S1/S2/S3, J1, A1/A2, K2) -> reopen (S4) -> return dims + nonzero
    stats as one row. ``sf_dir`` is unused: the cube is synthesized so the
    check is scale-independent and byte-deterministic."""
    from mdio_python_spark.operators.stats import summary_statistics
    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry
    from mdio_python_spark.sources import segy
    from mdio_python_spark.sources.store import open_store

    n_il, n_xl, ns = 6, 5, 16
    tmp = tempfile.mkdtemp(prefix="seismic-rt-")
    segy_path = os.path.join(tmp, "cube.segy")
    store_path = os.path.join(tmp, "store")

    traces = _synthetic_cube(spark, n_il, n_xl, ns)
    spec = segy.SegyWriteSpec(
        samples_per_trace=ns, sample_interval=2000, data_format=5
    )
    segy.write_segy(
        traces,
        segy_path,
        order_by=["inline", "crossline"],
        write_spec=spec,
        header_fields=["inline", "crossline", "cdp_x", "cdp_y"],
    )

    segy_to_store(
        spark, segy_path, store_path, default_registry().get("PostStack3DTime")
    )
    st = open_store(spark, store_path)
    flat = st.traces.select(F.explode("samples").alias("amplitude"))
    stats = summary_statistics(flat, "amplitude", nonzero_only=True)
    dims = {d.name: d.size for d in st.dataset.dimensions}
    return stats.select(
        F.lit(dims.get("inline", -1)).alias("n_inline"),
        F.lit(dims.get("crossline", -1)).alias("n_crossline"),
        F.col("count"),
        F.col("mean"),
        F.col("std"),
    )


@register("zarr_store_roundtrip", "local:tests/test_zarr_interop.py::test_zarr_roundtrip_query_exact", bench=False)
def q_zarr_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zarr v2 interop surface (S4 for real MDIO-shaped containers):
    synthesize a cube -> ingest to the engine store -> export to an
    xarray-convention zarr group (pure-numpy v2 writer, zlib) -> reopen
    through open_mdio (zarr branch) -> one summary row. Deterministic and
    scale-independent like seismic_ingest_roundtrip."""
    from mdio_python_spark.operators.stats import summary_statistics
    from mdio_python_spark.pipelines.ingest import segy_to_store
    from mdio_python_spark.schemas import default_registry
    from mdio_python_spark.sources import segy
    from mdio_python_spark.sources.store import open_mdio
    from mdio_python_spark.sources.zarr_store import store_to_zarr

    n_il, n_xl, ns = 6, 5, 16
    tmp = tempfile.mkdtemp(prefix="zarr-rt-")
    segy_path = os.path.join(tmp, "cube.segy")
    store_path = os.path.join(tmp, "store")
    zarr_path = os.path.join(tmp, "cube.zarr")

    traces = _synthetic_cube(spark, n_il, n_xl, ns)
    spec = segy.SegyWriteSpec(
        samples_per_trace=ns, sample_interval=2000, data_format=5
    )
    segy.write_segy(
        traces,
        segy_path,
        order_by=["inline", "crossline"],
        write_spec=spec,
        header_fields=["inline", "crossline", "cdp_x", "cdp_y"],
    )
    segy_to_store(
        spark, segy_path, store_path, default_registry().get("PostStack3DTime")
    )
    n = store_to_zarr(spark, store_path, zarr_path)
    flat = open_mdio(spark, zarr_path).select(F.explode("samples").alias("a"))
    stats = summary_statistics(flat, "a", nonzero_only=True)
    return stats.select(
        F.lit(n).alias("n_traces"),
        F.col("count"),
        F.col("mean"),
        F.col("std"),
    )


@register("multimodal_image_features", "local:tests/test_media_codecs.py::test_image_features_query_exact", bench=False)
def q_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal surface as a declared query (rows-only: binary decode
    has no SQL oracle). Synthesizes a valid 8x8 24-bit BMP per document
    (deterministic pixels from doc_id) with ``media_codecs.encode_bmp``,
    then runs the REAL pure-numpy BMP decode + batch-vectorized
    mapInPandas feature extraction — the full decode path, no stub."""
    from pyspark.sql.functions import pandas_udf

    from mdio_python_spark.operators import multimodal as mm
    from mdio_python_spark.operators.media_codecs import encode_bmp
    from mdio_python_spark.sources.tables import load_table

    @pandas_udf("binary")
    def synth_bmp(ids: pd.Series) -> pd.Series:
        import numpy as np

        y, x, c = np.meshgrid(
            np.arange(8), np.arange(8), np.arange(3), indexing="ij"
        )
        return ids.map(
            lambda i: encode_bmp(
                ((int(i) + y * 8 + x + c * 37) % 256).astype(np.uint8)
            )
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = mm.attach_payload(
        docs.withColumn("_bmp", synth_bmp("doc_id")),
        "_bmp",
        media_type="image/bmp",
        width=8,
        height=8,
        channels=3,
    )
    return mm.image_features(media)


@register("streaming_events_hourly", "local:tests/test_streaming.py::test_streaming_hourly_equals_batch_frame", bench=False)
def q_streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming surface as a declared query: file-source stream
    over the events table -> watermark -> tumbling hourly window -> memory
    sink, driven to completion (bounded input). Same aggregation as the
    batch ``events_hourly`` query — one logical plan, two execution modes."""
    from mdio_python_spark.streaming import events as ev

    stream = ev.stream_events(spark, sf_dir)
    agg = ev.windowed_counts(stream, window="1 hour", watermark="2 hours")
    out = ev.run_to_memory(agg, "streaming_events_hourly_q")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n_events",
    )


@register("streaming_user_sessions", "local:tests/test_streaming.py::test_streaming_sessions_equals_batch_frame", bench=False)
def q_streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization as a declared query: file-source stream ->
    watermark -> ``session_window`` (30 min gap) per user -> memory sink,
    driven to completion. State is bounded by open sessions per key; the
    batch twin is ``events_sessions``. Rows-only check (streams have no
    SQL oracle); value assertions live in tests/test_streaming.py."""
    from mdio_python_spark.streaming import events as ev

    stream = ev.stream_events(spark, sf_dir)
    sess = ev.sessionized(stream, gap="30 minutes")
    out = ev.run_to_memory(sess, "streaming_user_sessions_q")
    return out.select(
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("end"),
        "user_id",
        "n_events",
    )


@register("streaming_dedup_replayed", "local:tests/test_streaming.py::test_streaming_dedup_exact_cardinality", bench=False)
def q_streaming_dedup_replayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under at-least-once redelivery: the events
    file is staged TWICE into the watch directory (every event replayed)
    and ``dropDuplicatesWithinWatermark`` on event_id collapses the
    replays back to the exact single-copy cardinality. State is bounded
    by event-rate x watermark horizon — the property that keeps an
    unbounded feed safe. Rows-only check; the cardinality assertion
    lives in tests/test_streaming.py."""
    from mdio_python_spark.streaming import events as ev

    stream = ev.stream_events(spark, sf_dir, copies=2)
    deduped = ev.deduped(stream, watermark="1 hour")
    out = ev.run_to_memory(
        deduped, "streaming_dedup_replayed_q", output_mode="append"
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_id").alias("n_distinct_events"),
    )


@register("streaming_error_click_pairs", "local:tests/test_streaming.py::test_streaming_interval_join_equals_batch_pairs", bench=False)
def q_streaming_error_click_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join as a declared query: error events
    joined to the same user's clicks within 5 minutes after, both sides
    watermarked so the join state stays bounded by rate x horizon. The
    batch twin is ``bucketed_range_join``'s matched pairs (the
    ``error_click_correlation`` building block); the local gate asserts
    full-frame equality between the two. Rows-only (streams have no SQL
    oracle)."""
    from mdio_python_spark.streaming import events as ev

    stream = ev.stream_events(spark, sf_dir)
    errors = stream.where(F.col("event_type") == "error")
    clicks = stream.where(F.col("event_type") == "click")
    pairs = ev.interval_joined(errors, clicks, horizon="5 minutes")
    return ev.run_to_memory(
        pairs, "streaming_error_click_pairs_q", output_mode="append"
    )


@register("multimodal_audio_features", "local:tests/test_media_codecs.py::test_audio_features_query_exact", bench=False)
def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio surface as a declared query (rows-only): synthesizes a valid
    16-bit PCM WAV per document (deterministic sine burst keyed on doc_id)
    with ``media_codecs.encode_wav``, then runs the REAL RIFF parse +
    batch-vectorized ``mapInPandas`` RMS/zero-crossing extraction — the
    full decode path, no stub."""
    from pyspark.sql.functions import pandas_udf

    from mdio_python_spark.operators import multimodal as mm
    from mdio_python_spark.operators.media_codecs import encode_wav
    from mdio_python_spark.sources.tables import load_table

    @pandas_udf("binary")
    def synth_wav(ids: pd.Series) -> pd.Series:
        import numpy as np

        t = np.arange(256, dtype=np.float64)
        return ids.map(
            lambda i: encode_wav(
                0.5 * np.sin(2 * np.pi * (1 + int(i) % 16) * t / 64.0),
                sample_rate=8000,
            )
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = mm.attach_payload(
        docs.withColumn("_wav", synth_wav("doc_id")),
        "_wav",
        media_type="audio/wav",
        sample_rate=8000,
    )
    return mm.audio_features(media)


@register(
    "multimodal_video_frames",
    "local:tests/test_media_codecs.py::test_video_frames_query_exact",
    bench=False,
)
def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video surface as a declared query (rows-only): each document gets a
    deterministic multi-frame ``video/fake`` payload (its text bytes,
    1 + doc_id % 5 frames of 4x4x3 — the documented stub boundary for
    compressed video codecs), frame-sampled every 2nd frame through the
    real explode-shaped ``mapInPandas`` plumbing, and rolled up per doc
    with a crc32 over the emitted frame bytes so the gate pins exact
    payload content, not just counts."""
    from mdio_python_spark.operators import multimodal as mm
    from mdio_python_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 240).alias("_clip")
    )
    media = mm.attach_payload(
        docs,
        "_clip",
        media_type="video/fake",
        width=4,
        height=4,
        channels=3,
        n_frames=F.lit(1) + F.pmod(F.col("doc_id"), F.lit(5)),
    )
    frames = mm.sample_frames(media, every_nth=2)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames_kept"),
        F.max("frame_idx").alias("last_frame_idx"),
        F.sum(F.crc32("payload")).alias("frames_crc"),
    )


@register(
    "streaming_hourly_distinct_users",
    "local:tests/test_streaming.py::test_streaming_hll_equals_batch",
    bench=False,
)
def q_streaming_hourly_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming distinct-user estimation: the deterministic HLL's
    register aggregate runs INSIDE the stream (max per (window, type,
    bucket) — bounded state, no distinct-user set), the tiny finalize
    runs on the materialized result. Rows-only (streams have no SQL
    oracle); the local gate pins bit-equality with the batch
    ``hll_distinct`` over the same rows."""
    from mdio_python_spark.operators.stats import hll_finalize
    from mdio_python_spark.streaming import events as ev

    stream = ev.stream_events(spark, sf_dir)
    regs = ev.windowed_hll_registers(stream)
    out = ev.run_to_memory(regs, "streaming_hourly_distinct_users_q")
    est = hll_finalize(out, ["window_start", "event_type"])
    return est.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "hll_estimate",
    )


@register(
    "streaming_hourly_countmin",
    "local:tests/test_streaming.py::test_streaming_countmin_equals_batch",
    bench=False,
)
def q_streaming_hourly_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming frequency sketch: count-min cell counts of user_id
    occurrences per hour, aggregated INSIDE the stream (additive counts
    — bounded d x w state per open window, mergeable across windows and
    clusters by cell-wise addition). Rows-only (streams have no SQL
    oracle); the local gate pins bit-equality of every cell with the
    batch ``stats.countmin_cells`` over the same rows."""
    from mdio_python_spark.streaming import events as ev

    stream = ev.stream_events(spark, sf_dir)
    cells = ev.windowed_countmin_cells(stream)
    out = ev.run_to_memory(cells, "streaming_hourly_countmin_q")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "r",
        "bucket",
        "cell_count",
    )
