"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Driver brief: image/audio/video as ``binary`` columns; decode /
feature-extract / resize / frame-sample as Arrow-batched UDFs over
``mapInPandas``. The container has no image/audio codec libraries, so the
*decode kernels* for non-WAV media are STUBBED (deterministic fake clearly
marked), while the Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is real and tested. WAV audio decode is fully real
(protovalidate_spark.audio).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "52494646": "riff",   # wav/avi container
    "664C6143": "flac",
    "4F676753": "ogg",    # opus
    "494433": "mp3",
    "1A45DFA3": "webm",
}


def sniff_format(df: DataFrame, bytes_col: str = "bytes",
                 out_col: str = "format") -> DataFrame:
    """Container sniffing from magic bytes — pure JVM expression
    (hex prefix match), no Python."""
    hx = F.hex(F.substring(F.col(bytes_col), 1, 4))
    expr = F.lit(None).cast("string")
    for magic, name in sorted(MAGIC.items(), key=lambda kv: -len(kv[0])):
        expr = F.when(hx.startswith(magic), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, F.when(F.col(bytes_col).isNull(),
                                         F.lit(None)).otherwise(expr))


MEDIA_META_TYPE = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])

FEATURE_DIM = 16


def _fake_decode_meta(b: bytes) -> dict:
    """STUB decode: deterministic pseudo-metadata derived from content
    hash. Replace the body with PIL/ffmpeg at deploy; signature and schema
    stay identical."""
    import zlib
    h = zlib.crc32(b)
    return {"format": None, "n_bytes": len(b),
            "width": 16 + h % 4080, "height": 16 + (h >> 8) % 2140,
            "n_frames": 1 + (h >> 16) % 240}


def extract_media_meta(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """mapInPandas stage appending media metadata struct fields. Batch
    shape: pass-through columns + meta columns (schema is explicit so the
    plan is stable for downstream rules)."""
    fields = [T.StructField(f.name, f.dataType) for f in df.schema.fields]
    out_schema = T.StructType(fields + list(MEDIA_META_TYPE.fields))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _fake_decode_meta(bytes(b)) if b is not None else
                {"format": None, "n_bytes": None, "width": None,
                 "height": None, "n_frames": None}
                for b in pdf[bytes_col]
            ]
            m = pd.DataFrame(metas)
            yield pd.concat([pdf.reset_index(drop=True), m], axis=1)

    return df.mapInPandas(gen, out_schema)


def feature_extract(df: DataFrame, bytes_col: str = "bytes",
                    out_col: str = "features",
                    dim: int = FEATURE_DIM) -> DataFrame:
    """Arrow-batched feature extraction → array<float>. STUB kernel:
    deterministic hash-seeded unit vector (real kernel: CNN/CLAP embedding
    inside the same batch loop — GPU-dispatchable per batch)."""

    def _features(bs: pd.Series) -> pd.Series:
        import zlib
        out = []
        for b in bs:
            if b is None:
                out.append(None)
                continue
            rng = np.random.RandomState(zlib.crc32(bytes(b)) % (2**31))
            v = rng.randn(dim).astype(np.float32)
            out.append(v / max(float(np.linalg.norm(v)), 1e-12))
        return pd.Series(out)

    udf = F.pandas_udf(_features, T.ArrayType(T.FloatType()))
    return df.withColumn(out_col, udf(F.col(bytes_col)))


def frame_sample(df: DataFrame, bytes_col: str = "bytes",
                 every_n: int = 10, out_col: str = "frames") -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits an array of
    (frame_idx, frame_bytes) structs. STUB kernel: slices the payload
    deterministically (real kernel: ffmpeg keyframe extraction)."""
    ftype = T.ArrayType(T.StructType([
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]))

    def _frames(bs: pd.Series) -> pd.Series:
        out = []
        for b in bs:
            if b is None:
                out.append(None)
                continue
            b = bytes(b)
            n_frames = max(len(b) // 256, 1)
            out.append([
                {"frame_idx": i, "frame_bytes": b[i * 256:(i + 1) * 256]}
                for i in range(0, n_frames, every_n)
            ])
        return pd.Series(out)

    udf = F.pandas_udf(_frames, ftype)
    return df.withColumn(out_col, udf(F.col(bytes_col)))
