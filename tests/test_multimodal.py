"""Multimodal binary-column plumbing (driver brief): magic-byte
sniffing is pure JVM; decode/feature/frame kernels are Arrow-batched with
REAL schema/batch shape and clearly-stubbed bodies (no codec libs in the
container — WAV is the fully-real path, tested in test_audio.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from protovalidate_spark.audio.wav import synth_sine_wav
from protovalidate_spark.pipeline import (
    extract_media_meta, feature_extract, frame_sample, sniff_format,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, bytes(synth_sine_wav(440.0, 16000, 50))),         # RIFF/WAV
        (1, b"\x89PNG\r\n\x1a\n" + b"x" * 600),               # png
        (2, b"\xff\xd8\xff\xe0" + b"y" * 300),                # jpeg
        (3, b"ID3\x04\x00" + b"z" * 100),                     # mp3
        (4, b"\x00\x01\x02\x03 unknown container"),           # unknown
        (5, None),
    ]
    return spark.createDataFrame(rows, "id int, bytes binary").persist()


def test_sniff_format_magic_bytes_jvm_side(spark, media):
    got = {r["id"]: r["format"]
           for r in sniff_format(media, "bytes").collect()}
    assert got == {0: "riff", 1: "png", 2: "jpeg", 3: "mp3",
                   4: None, 5: None}
    plan = sniff_format(media, "bytes")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan  # pure JVM expression


def test_extract_media_meta_schema_and_nulls(spark, media):
    out = extract_media_meta(media, "bytes")
    assert [f.name for f in out.schema.fields] == \
        ["id", "bytes", "format", "n_bytes", "width", "height", "n_frames"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[5]["n_bytes"] is None          # NULL payload → NULL meta
    assert rows[1]["n_bytes"] == 608
    assert 16 <= rows[1]["width"] and 16 <= rows[1]["height"]
    # deterministic stub: same bytes → same meta on re-run
    again = {r["id"]: r for r in extract_media_meta(media, "bytes").collect()}
    assert again[2]["width"] == rows[2]["width"]


def test_feature_extract_unit_vectors(spark, media):
    out = feature_extract(media, "bytes", dim=16)
    rows = {r["id"]: r["features"] for r in out.collect()}
    assert rows[5] is None
    for i in range(5):
        v = np.array(rows[i], dtype=np.float64)
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    assert rows[0] != rows[1]  # content-dependent


def test_frame_sample_shapes(spark, media):
    out = frame_sample(media, "bytes", every_n=2)
    rows = {r["id"]: r["frames"] for r in out.collect()}
    assert rows[5] is None
    f1 = rows[1]
    assert f1[0]["frame_idx"] == 0 and len(f1[0]["frame_bytes"]) == 256
    assert all(f1[i]["frame_idx"] == 2 * i for i in range(len(f1)))


def test_feature_vectors_feed_ann_pipeline(spark, media):
    """The multimodal features column plugs straight into the ANN ops —
    the pipeline composes (brief: similarity search over an embedding
    column)."""
    from protovalidate_spark.pipeline import cosine_topk
    feats = feature_extract(media, "bytes", dim=16) \
        .filter(F.col("features").isNotNull()) \
        .select("id", F.transform("features",
                                  lambda x: x.cast("double")).alias("vec"))
    q = feats.filter(F.col("id") == 0).first()["vec"]
    top = cosine_topk(feats, "id", "vec", q, k=2).collect()
    assert top[0]["id"] == 0 and top[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
