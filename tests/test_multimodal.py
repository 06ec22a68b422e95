"""Multimodal plumbing tests: the decode kernels are stubs, but schema,
batching, partition behavior, and the numeric feature math are real.
"""

from __future__ import annotations

import numpy as np
import pytest

from mdio_python_spark.operators import multimodal as mm
from mdio_python_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def payloads(spark):
    docs = load_table(spark, SF, "documents").limit(40)
    return mm.attach_payload(docs, "text", width=8, height=8, channels=3)


def test_payload_schema(payloads):
    d = dict(payloads.dtypes)
    assert d["payload"] == "binary"
    assert d["meta"].startswith("struct<media_type:string,width:int")


def test_image_features_deterministic(payloads, spark):
    feats = mm.image_features(payloads).orderBy("doc_id")
    rows = feats.collect()
    assert len(rows) == 40
    assert all(r["n_pixels"] == 64 for r in rows)
    # recompute one row's features locally against the same fake kernel
    first = payloads.orderBy("doc_id").limit(1).collect()[0]
    img = mm._decode_image(first["payload"], 8, 8, 3).astype(np.float64)
    assert rows[0]["mean_r"] == pytest.approx(img[:, :, 0].mean())
    assert rows[0]["std_all"] == pytest.approx(img.std())


def test_resize_halves_dims(payloads):
    resized = mm.resize_images(payloads, out_width=4, out_height=4)
    row = resized.limit(1).collect()[0]
    assert row["meta"]["width"] == 4 and row["meta"]["height"] == 4
    assert len(row["payload"]) == 4 * 4 * 3


def test_frame_sampling_explodes_rows(payloads):
    from pyspark.sql import functions as F

    vids = payloads.withColumn(
        "meta",
        F.col("meta").withField("n_frames", F.lit(10)).withField(
            "media_type", F.lit("video/fake")
        ),
    )
    frames = mm.sample_frames(vids, every_nth=3)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)  # frames 0,3,6,9
    idx = sorted(
        r["frame_idx"] for r in frames.where("doc_id = 0").collect()
    )
    assert idx == [0, 3, 6, 9]


def test_audio_features(payloads):
    from pyspark.sql import functions as F

    audio = payloads.withColumn(
        "meta", F.col("meta").withField("media_type", F.lit("audio/fake"))
    )
    feats = mm.audio_features(audio)
    row = feats.where("doc_id = 0").collect()[0]
    assert row["n_samples"] > 0
    assert 0.0 <= row["rms"] <= 1.0


def test_empty_and_null_payloads_do_not_crash(spark):
    """Regression: empty text -> empty payload, null text -> null payload;
    decode must yield a black image / empty PCM, not fail the job."""
    from mdio_python_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "data")], "doc_id long, text string"
    )
    media = multimodal.attach_payload(df, "text", width=4, height=4, channels=3)
    feats = {r.doc_id: r for r in multimodal.image_features(media).collect()}
    assert set(feats) == {1, 2, 3}
    assert feats[1].mean_r == 0.0 and feats[2].mean_r == 0.0
    audio = {r.doc_id: r for r in multimodal.audio_features(media).collect()}
    assert audio[1].n_samples == 0 and audio[2].n_samples == 0


def test_frame_sampling_slices_true_frames(payloads):
    """Each emitted frame must be the payload's OWN byte slice for that
    frame index (not a repeat of frame 0), matching the tiled fake-decode
    layout: frame f covers bytes [f*h*w*c, (f+1)*h*w*c) of the tiled
    buffer."""
    from pyspark.sql import functions as F

    vids = payloads.withColumn(
        "meta",
        F.col("meta").withField("n_frames", F.lit(4)).withField(
            "media_type", F.lit("video/fake")
        ),
    )
    frames = mm.sample_frames(vids, every_nth=1)
    got = {
        r["frame_idx"]: bytes(r["payload"])
        for r in frames.where("doc_id = 0").collect()
    }
    src = payloads.where("doc_id = 0").collect()[0]["payload"]
    n = 4 * 8 * 8 * 3
    tiled = np.tile(
        np.frombuffer(bytes(src), dtype=np.uint8), -(-n // len(src))
    )[:n].reshape(4, 8 * 8 * 3)
    assert set(got) == {0, 1, 2, 3}
    for f in range(4):
        assert got[f] == tiled[f].tobytes()
    assert len({got[f] for f in range(4)}) > 1  # frames genuinely differ
