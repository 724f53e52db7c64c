"""Arrow-batched audio decode stage.

The reference's extension point for opaque values is
``Interface[T]().WithCast(fn)`` / ``WithRuleFunc``
(/root/reference/pkg/rules/inerface.go:69-74, rule.go:43-60) — a custom
decode validated per value. Here that becomes ONE vectorized pandas UDF
over the ``bytes`` column (Arrow batch transfer, no per-row Python
dispatch — BASELINE.json input_hint), producing a decoded struct that is
computed once and reused by every downstream consistency rule
(SURVEY.md §4 "decode once into a struct column").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..errors import Code
from ..rules.object import ObjectRule
from .wav import (_DATA, _FMT, _FMT_BITS, _RIFF, _WAVE, _samples_to_float,
                  decode_bytes)

# Programmatic DataTypes (not DDL strings): pandas_udf must be creatable on
# executors at module import where no SparkSession exists to parse DDL.
_BASE_FIELDS = [
    T.StructField("ok", T.BooleanType()),
    T.StructField("sr", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("dur_ms", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
]
DECODED_TYPE = T.StructType(_BASE_FIELDS)
DECODED_PCM_TYPE = T.StructType(
    _BASE_FIELDS + [T.StructField("pcm", T.ArrayType(T.FloatType()))])
DECODED_DDL = "struct<ok:boolean,sr:int,n_samples:bigint,dur_ms:int,rms:double>"


_LE32 = np.array([1, 1 << 8, 1 << 16, 1 << 24], dtype=np.int64)


def _decode_series(bs: pd.Series, want_pcm: bool,
                   downmix: bool = False) -> pd.DataFrame:
    """Batched WAV decode: ONE vectorized header parse for the whole
    Arrow batch (44-byte headers gathered into an (n, 44) uint8 matrix,
    field extraction as column arithmetic — no per-row struct.unpack or
    chunk-walk branches on the standard canonical layout), then per-row
    zero-copy int16 views + one BLAS dot each for RMS (no payload slice
    copy). Rows with a non-canonical chunk layout (extra LIST/fact
    chunks) fall back to the exact chunk-walking parser in wav.py."""
    n_rows = len(bs)
    bufs = bs.to_numpy()
    lens = np.fromiter(
        (0 if b is None else len(b) for b in bufs), dtype=np.int64,
        count=n_rows)
    has_hdr = lens >= 44

    H = np.zeros((n_rows, 44), dtype=np.uint8)
    for i in np.nonzero(has_hdr)[0]:
        H[i] = np.frombuffer(bufs[i], dtype=np.uint8, count=44)

    def tag_eq(sl, tag):
        return (H[:, sl] == np.frombuffer(tag, np.uint8)).all(axis=1)

    sr = H[:, 24:28].astype(np.int64) @ _LE32
    fmt_size = H[:, 16:20].astype(np.int64) @ _LE32
    audio_fmt = H[:, 20].astype(np.int64) + (H[:, 21].astype(np.int64) << 8)
    channels = H[:, 22].astype(np.int64) + (H[:, 23].astype(np.int64) << 8)
    bits = H[:, 34].astype(np.int64) + (H[:, 35].astype(np.int64) << 8)
    dsize = H[:, 40:44].astype(np.int64) @ _LE32
    # (fmt, bits) admissibility + bytes-per-sample, vectorized over the
    # same table wav.py uses — every uncompressed format (PCM 8/16/24/32,
    # float 32/64, G.711) takes this path when the chunk layout is the
    # canonical 44-byte one; EXTENSIBLE (fmt_size 40) and multi-chunk
    # layouts fall to the exact walker below
    fmt_ok = np.zeros(n_rows, dtype=bool)
    for code, allowed in _FMT_BITS.items():
        fmt_ok |= (audio_fmt == code) & np.isin(bits, allowed)
    bytes_per = np.maximum(bits >> 3, 1)
    canonical = (has_hdr & tag_eq(slice(0, 4), _RIFF)
                 & tag_eq(slice(8, 12), _WAVE) & tag_eq(slice(12, 16), _FMT)
                 & (fmt_size == 16) & fmt_ok & (channels == 1)
                 & tag_eq(slice(36, 40), _DATA)
                 & (sr > 0) & (dsize % bytes_per == 0) & (44 + dsize == lens))
    # equality (not <=): a canonical 44-byte prefix followed by MORE chunks
    # must take the exact chunk walker, whose later-data-chunk-wins rule
    # would otherwise diverge from this first-data-chunk fast path

    ok = canonical.copy()
    n_samp = np.where(canonical, dsize // bytes_per, 0)
    sr_out = np.where(canonical, sr, 0).astype(np.int64)
    dur = np.zeros(n_rows, dtype=np.int64)
    dur[canonical] = np.round(
        n_samp[canonical] * 1000.0 / sr[canonical]).astype(np.int64)
    rms = np.zeros(n_rows, dtype=np.float64)
    pcm = [None] * n_rows if want_pcm else None

    is_pcm16 = canonical & (audio_fmt == 1) & (bits == 16)
    for i in np.nonzero(is_pcm16)[0]:
        n = int(n_samp[i])
        if n:
            x16 = np.frombuffer(bufs[i], dtype="<i2", count=n, offset=44)
            x = x16.astype(np.float32)
            rms[i] = float(np.sqrt(np.dot(x, x) / n) / 32768.0)
            if want_pcm:
                pcm[i] = x / np.float32(32768.0)
        elif want_pcm:
            pcm[i] = np.array([], dtype=np.float32)
    for i in np.nonzero(canonical & ~is_pcm16)[0]:
        x = _samples_to_float(bufs[i][44:], int(audio_fmt[i]), int(bits[i]))
        n = int(x.size)
        rms[i] = float(np.sqrt(np.dot(x, x) / n)) if n else 0.0
        if want_pcm:
            pcm[i] = x

    # exact fallback for non-canonical-but-maybe-valid layouts
    # (multi-channel input lands here too: the canonical fast path is
    # channels==1, and the walker honors the downmix policy)
    for i in np.nonzero(has_hdr & ~canonical)[0]:
        d = decode_bytes(bytes(bufs[i]), "wav", want_pcm, downmix)
        ok[i] = d.ok
        sr_out[i], n_samp[i], dur[i], rms[i] = d.sr, d.n_samples, d.dur_ms, d.rms
        if want_pcm:
            pcm[i] = d.pcm

    cols = {"ok": ok, "sr": sr_out.astype(np.int32),
            "n_samples": n_samp.astype(np.int64),
            "dur_ms": dur.astype(np.int32), "rms": rms}
    out = pd.DataFrame(cols)
    if want_pcm:
        out["pcm"] = pcm
    return out


def _make_udf(include_pcm: bool, downmix: bool = False):
    rt = DECODED_PCM_TYPE if include_pcm else DECODED_TYPE

    def decode_wav_udf(bs: pd.Series) -> pd.DataFrame:
        return _decode_series(bs, want_pcm=include_pcm, downmix=downmix)

    return pandas_udf(decode_wav_udf, rt)


def with_decoded(df: DataFrame, bytes_col: str = "bytes",
                 out_col: str = "_decoded", include_pcm: bool = False,
                 downmix: bool = False) -> DataFrame:
    """Append the decoded struct column (single Arrow-batched stage).
    ``downmix=True`` additionally accepts multi-channel WAV via
    per-frame channel-mean downmix (default: multi-channel is a DECODE
    violation — the validation stance for a mono table)."""
    return df.withColumn(out_col,
                         _make_udf(include_pcm, downmix)(F.col(bytes_col)))


# ---------------------------------------------------------------------------
# Consistency rules over the decoded struct (object rules; FIXTURES.md §6)
# ---------------------------------------------------------------------------

def decode_ok_rule(bytes_col: str = "bytes", decoded_col: str = "_decoded") -> ObjectRule:
    """bytes must decode (DECODE). NULL bytes are reported by the
    Binary().required() field rule, not here."""
    return ObjectRule(
        rule_id=Code.DECODE,
        predicate=lambda get: get(bytes_col).isNull() | get(decoded_col)["ok"],
        message="payload is not a decodable audio container",
        field_path=f"/{bytes_col}",
        actual=lambda get: F.substring(F.hex(get(bytes_col)), 1, 50),
    )


def sr_consistency_rule(sr_col: str = "sr_hz", decoded_col: str = "_decoded") -> ObjectRule:
    """Column sr_hz must equal decoded header sample rate (CONSISTENT)."""
    return ObjectRule(
        rule_id=Code.CONSISTENT,
        predicate=lambda get: (~F.coalesce(get(decoded_col)["ok"], F.lit(False)))
        | (get(sr_col) == get(decoded_col)["sr"]),
        message="sr_hz does not match decoded sample rate",
        field_path=f"/{sr_col}",
        actual=lambda get: F.concat(get(sr_col).cast("string"), F.lit("!="),
                                    get(decoded_col)["sr"].cast("string")),
    )


def dur_consistency_rule(dur_col: str = "dur_ms", decoded_col: str = "_decoded",
                         tolerance_ms: int = 10) -> ObjectRule:
    """Column dur_ms must match decoded duration within tolerance."""
    return ObjectRule(
        rule_id=Code.CONSISTENT,
        predicate=lambda get: (~F.coalesce(get(decoded_col)["ok"], F.lit(False)))
        | (F.abs(get(dur_col) - get(decoded_col)["dur_ms"]) <= tolerance_ms),
        message=f"dur_ms does not match decoded duration (±{tolerance_ms}ms)",
        field_path=f"/{dur_col}",
        actual=lambda get: F.concat(get(dur_col).cast("string"), F.lit("!="),
                                    get(decoded_col)["dur_ms"].cast("string")),
    )
