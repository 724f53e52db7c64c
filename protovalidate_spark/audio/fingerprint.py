"""Spectral audio fingerprinting + duplicate-audio detection.

Byte-level exact dedup misses content duplicates: the same recording
re-encoded (other sample rate, bit depth, sample format, or gain) has
different bytes but the same spectral content. The fingerprint here is
the set of quantized dominant frequencies (semitone bins) per coarse
time chunk — invariant across uncompressed re-encodings because peaks
are located in Hz (not FFT-bin index) and quantized to a ~6%-wide
log-frequency grid, while amplitude scaling and quantization noise are
excluded by a relative-magnitude floor.

Scale shape: fingerprinting is ONE Arrow-batched stage reusing the
vectorized batch decoder (no second decode, no per-row Python
dispatch); duplicate grouping shuffles only (id, 16-byte fp key) — the
audio payload never leaves the scan stage. Reference analog: a custom
``WithRuleFunc``/``Interface().WithCast`` derived value
(pkg/rules/inerface.go:69-74) feeding the engine's dedup family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .decode import _decode_series

FINGERPRINT_TYPE = T.StructType([
    T.StructField("ok", T.BooleanType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
])

_A1_HZ = 55.0  # semitone grid anchor

# prefix of the per-row keys minted for non-content (undecodable/empty)
# rows; consumers must treat these as excluded-from-dedup, NOT as
# groupable content keys (byte-identical garbage collides on id+crc)
SENTINEL_PREFIX = "__undup__:"


def spectral_tokens(x: np.ndarray, sr: int, chunks: int = 4,
                    peaks: int = 3, min_rel_mag: float = 0.1) -> np.ndarray:
    """Sorted distinct int32 tokens ``chunk*10000 + semitone`` for the
    dominant spectral peaks of each coarse time chunk.

    Per chunk: Hann-windowed rFFT magnitude, then iterative peak
    picking with ±1-semitone neighborhood suppression (so spectral
    leakage around one true peak cannot spend the whole peak budget).
    Peaks below ``min_rel_mag`` of the chunk's top peak are dropped —
    8-bit / G.711 quantization noise sits 30 dB+ down and must not
    mint tokens that split re-encodings of the same content apart."""
    n = x.size
    if n < 2 or sr <= 0:
        return np.array([], dtype=np.int32)
    out = []
    bounds = np.linspace(0, n, chunks + 1).astype(np.int64)
    for c in range(chunks):
        seg = x[bounds[c]:bounds[c + 1]].astype(np.float64)
        m = seg.size
        if m < 2:
            continue
        seg = seg * np.hanning(m)
        mag = np.abs(np.fft.rfft(seg))
        mag[0] = 0.0  # DC is gain/offset, not content
        hz = np.arange(mag.size) * (sr / m)
        with np.errstate(divide="ignore"):
            semi = np.where(hz > 0,
                            np.round(12.0 * np.log2(
                                np.maximum(hz, 1e-9) / _A1_HZ)), -1)
        top = float(mag.max())
        if top <= 0.0:
            continue
        floor = top * min_rel_mag
        work = mag.copy()
        for _ in range(peaks):
            j = int(np.argmax(work))
            if work[j] < floor or semi[j] < 0:
                break
            out.append(c * 10000 + int(semi[j]))
            work[np.abs(semi - semi[j]) <= 1] = 0.0
    return np.unique(np.asarray(out, dtype=np.int32))


def _fp_series(bs: pd.Series, chunks: int, peaks: int,
               min_rel_mag: float) -> pd.DataFrame:
    dec = _decode_series(bs, want_pcm=True)
    ok = dec["ok"].to_numpy()
    tokens = [None] * len(bs)
    for i in np.nonzero(ok)[0]:
        tokens[i] = spectral_tokens(dec["pcm"][i], int(dec["sr"][i]),
                                    chunks, peaks, min_rel_mag)
    return pd.DataFrame({"ok": dec["ok"], "tokens": tokens})


def with_fingerprint(df: DataFrame, bytes_col: str = "bytes",
                     out_col: str = "_fp", chunks: int = 4,
                     peaks: int = 3, min_rel_mag: float = 0.1) -> DataFrame:
    """Append struct(ok, tokens) — single Arrow-batched decode+FFT
    stage."""
    def _udf(bs: pd.Series) -> pd.DataFrame:
        return _fp_series(bs, chunks, peaks, min_rel_mag)
    return df.withColumn(out_col,
                         pandas_udf(_udf, FINGERPRINT_TYPE)(F.col(bytes_col)))


def fingerprint_key(fp_col: Column) -> Column:
    """16-byte dedup key: md5 over the canonical token list (JVM-side;
    the Arrow stage ships only the small token array)."""
    return F.md5(F.array_join(
        F.transform(fp_col["tokens"], lambda t: t.cast("string")), ","))


def keyed_fingerprints(df: DataFrame, id_col: str = "clip_id",
                       bytes_col: str = "bytes", chunks: int = 4,
                       peaks: int = 3, min_rel_mag: float = 0.1,
                       extra_cols: "Sequence[str]" = ()) -> DataFrame:
    """(id, fp_key, is_content[, extras...]) per row — the shared front
    half of batch ``audio_dup_groups``, the streaming content-dedup
    check, and the transcript-conflict gate (which carries the
    transcript through via ``extra_cols``).

    Everything derived from the UDF struct lives in ONE projection: an
    early ``.filter(is_content)`` would be pushed below the project and
    Catalyst would re-instantiate the Python stage in both operators
    (no cross-operator CSE). Non-content rows get a per-row sentinel
    key — singleton groups the consumers drop — instead of a shared
    NULL key, which at scale would funnel every undecodable clip into
    one skewed shuffle partition."""
    fp = with_fingerprint(df, bytes_col, "_fp", chunks, peaks, min_rel_mag)
    fpc = F.col("_fp")
    is_content = fpc["ok"] & (F.size(fpc["tokens"]) > 0)
    # every piece is coalesced: crc32(NULL bytes) is NULL and would
    # null the whole concat, collapsing ALL null-payload rows onto one
    # NULL key — one skewed state/window group and (in streaming,
    # where null keys are kept) false duplicate flags
    key = F.when(is_content, fingerprint_key(fpc)) \
           .otherwise(F.concat(F.lit(SENTINEL_PREFIX),
                               F.coalesce(F.col(id_col).cast("string"),
                                          F.lit("")),
                               F.lit(":"),
                               F.coalesce(F.crc32(F.col(bytes_col)),
                                          F.lit(-1))))
    return fp.select(F.col(id_col).alias("id"), key.alias("fp_key"),
                     is_content.alias("is_content"),
                     *[F.col(c) for c in extra_cols])


def audio_dup_groups(df: DataFrame, id_col: str = "clip_id",
                     bytes_col: str = "bytes", chunks: int = 4,
                     peaks: int = 3, min_rel_mag: float = 0.1) -> DataFrame:
    """Content-duplicate clip groups: (id, group_id, group_size) for
    every decodable clip whose spectral fingerprint is shared by at
    least one other clip; group_id is the group's smallest id (the
    conventional keeper). ONE shuffle on the 16-byte key (window, not
    groupBy + self-join-back — a self-join would re-run the Arrow
    decode+FFT stage on both branches, Catalyst has no cross-branch
    CSE) and the Python stage runs exactly once, pinned in
    test_audio."""
    from pyspark.sql import Window

    keyed = keyed_fingerprints(df, id_col, bytes_col, chunks, peaks,
                               min_rel_mag)
    w = Window.partitionBy("fp_key")
    return (keyed
            .withColumn("group_size", F.count("*").over(w))
            .withColumn("group_id", F.min("id").over(w))
            .filter((F.col("group_size") > 1) & F.col("is_content"))
            .select("id", "group_id", "group_size"))
