"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

Beyond-reference surface (BASELINE.json north star). The *decode* kernels
are STUBS — image/audio libraries are not in this container — but every
Spark-facing piece is real and tested: schemas, batch iteration, partition
behavior, UDF signatures. Swap ``_decode_*`` for PIL/ffmpeg kernels and the
plumbing is production-shaped.

Scale notes: payload processing is a shuffle-free scan; Arrow moves each
batch to Python once; per-batch numpy work amortizes interpreter overhead.
Decoded features are small fixed-width vectors, so the expensive bytes
never shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Typed metadata struct carried beside every payload column.
MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, channels int, "
    "sample_rate int, n_frames int"
)

FAKE_DECODE = True  # container has no codec libs; deterministic fake kernel


def _decode_image(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """STUB image decode. Real implementation: PIL.Image.open(BytesIO(...)).

    The deterministic fake derives pixels from the payload bytes so tests
    can assert exact values end-to-end.
    """
    if not FAKE_DECODE:
        raise NotImplementedError("image codecs not available in this container")
    n = width * height * channels
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    # empty/null payloads decode to a black image instead of failing the job
    reps = -(-n // len(buf))
    return np.tile(buf, reps)[:n].reshape(height, width, channels)


def _decode_audio(payload: bytes, sample_rate: int) -> np.ndarray:
    """STUB audio decode (real: soundfile/ffmpeg). Fake: int8 view as PCM."""
    if not FAKE_DECODE:
        raise NotImplementedError("audio codecs not available in this container")
    return np.frombuffer(payload or b"", dtype=np.int8).astype(np.float32) / 128.0


def attach_payload(
    df: DataFrame,
    source_col: str,
    media_type: str = "image/fake",
    width: int = 16,
    height: int = 16,
    channels: int = 3,
    sample_rate: int = 8000,
) -> DataFrame:
    """Build a (payload, meta) pair from an existing column — the schema
    pattern every multimodal table uses: opaque bytes + typed metadata."""
    return df.withColumns(
        {
            "payload": F.col(source_col).cast("binary"),
            "meta": F.struct(
                F.lit(media_type).alias("media_type"),
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.lit(channels).alias("channels"),
                F.lit(sample_rate).alias("sample_rate"),
                F.lit(1).alias("n_frames"),
            ),
        }
    )


def image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode -> per-channel mean/std feature extraction.

    mapInPandas: each Arrow batch decoded with the (stub) kernel; output is
    a fixed-width feature row per image — the bytes never leave the task.
    """
    schema = (
        f"{id_col} long, n_pixels long, mean_r double, mean_g double, "
        "mean_b double, std_all double"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                m = row["meta"]
                img = _decode_image(
                    row["payload"], m["width"], m["height"], m["channels"]
                ).astype(np.float64)
                rows.append(
                    {
                        id_col: row[id_col],
                        "n_pixels": img.shape[0] * img.shape[1],
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                        "std_all": float(img.std()),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload", "meta").mapInPandas(extract, schema=schema)


def resize_images(
    df: DataFrame, out_width: int, out_height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-emit payload + updated meta.

    Nearest-neighbor on index grids is pure numpy (no codec needed), so the
    resize math is REAL even though decode is stubbed.
    """
    schema = f"{id_col} long, payload binary, meta struct<{MEDIA_META_SCHEMA}>"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                m = row["meta"]
                img = _decode_image(
                    row["payload"], m["width"], m["height"], m["channels"]
                )
                ys = (np.arange(out_height) * m["height"] // out_height).astype(int)
                xs = (np.arange(out_width) * m["width"] // out_width).astype(int)
                resized = img[np.ix_(ys, xs)]
                out.append(
                    {
                        id_col: row[id_col],
                        "payload": resized.tobytes(),
                        "meta": {
                            "media_type": m["media_type"],
                            "width": out_width,
                            "height": out_height,
                            "channels": m["channels"],
                            "sample_rate": m["sample_rate"],
                            "n_frames": m["n_frames"],
                        },
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, "payload", "meta").mapInPandas(resize, schema=schema)


def sample_frames(
    df: DataFrame, every_nth: int, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame sampling: one output row per kept frame (explode-shaped
    mapInPandas). Frame decode is the stub kernel; the row-explosion,
    frame indexing and batch shapes are the real pipeline."""
    schema = f"{id_col} long, frame_idx int, payload binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                m = row["meta"]
                # decode once per row, not per kept frame — with a real
                # ffmpeg kernel the decode dominates
                img = _decode_image(
                    row["payload"], m["width"], m["height"], m["channels"]
                )
                for fi in range(0, int(m["n_frames"]), every_nth):
                    out.append(
                        {
                            id_col: row[id_col],
                            "frame_idx": fi,
                            "payload": img.tobytes(),
                        }
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, "payload", "meta").mapInPandas(sample, schema=schema)


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Audio decode -> RMS/zero-crossing features (stub decode, real math)."""
    schema = f"{id_col} long, n_samples long, rms double, zero_crossings long"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                pcm = _decode_audio(row["payload"], row["meta"]["sample_rate"])
                rows.append(
                    {
                        id_col: row[id_col],
                        "n_samples": len(pcm),
                        "rms": float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0,
                        "zero_crossings": int((np.diff(np.sign(pcm)) != 0).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload", "meta").mapInPandas(extract, schema=schema)
