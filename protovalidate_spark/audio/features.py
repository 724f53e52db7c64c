"""Per-clip PCM feature extraction + audio/transcript consistency rules.

A training-data pipeline over audio wants more than "does it decode":
clipping detection, silence screening, and a transcript-vs-duration
plausibility check are the standard first-pass quality gates. Peak /
clipping ratio / silence ratio / zero-crossing rate are computed from
the decoded PCM inside ONE Arrow-batched stage (the same vectorized
batch decoder the DECODE rule uses — no second decode, no per-row
Python dispatch); speech rate is a pure JVM column expression over
(transcript, dur_ms), no decode needed at all.

Reference analog: these compose like any other rule-builder output —
the feature struct is a column, so ``Float64().max(0.01)`` style rules
apply to its fields, and the violation rows carry the same
(field_path, rule_id, actual) shape as every other rule in the engine
(reference pkg/rules/rule.go:43-60 WithRuleFunc custom checks).
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
from .decode import _decode_series

AUDIO_FEATURES_TYPE = T.StructType([
    T.StructField("ok", T.BooleanType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("clip_ratio", T.DoubleType()),
    T.StructField("silence_ratio", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
    T.StructField("rms_dbfs", T.DoubleType()),
    T.StructField("dc_offset", T.DoubleType()),
])

# all-zero PCM has no finite dBFS; a fixed floor keeps the column typed
# double (no NULL/-inf special case in rules) and sits far below any
# real recording (16-bit quantization noise alone is ~-96 dBFS)
SILENCE_DBFS = -200.0

# decode struct + feature fields in ONE column: a suite that wants both
# the DECODE/CONSISTENT rules and the feature rules pays a single Arrow
# stage and a single decode (field names match DECODED_TYPE, so every
# decode-consumer rule works on this column unchanged)
from .decode import _BASE_FIELDS  # noqa: E402  (after pandas/pyspark imports)

DECODED_FEATURES_TYPE = T.StructType(
    _BASE_FIELDS + [T.StructField("peak", T.DoubleType()),
                    T.StructField("clip_ratio", T.DoubleType()),
                    T.StructField("silence_ratio", T.DoubleType()),
                    T.StructField("zcr", T.DoubleType()),
                    T.StructField("rms_dbfs", T.DoubleType()),
                    T.StructField("dc_offset", T.DoubleType())])


def _features_series(bs: pd.Series, frame_ms: int, silence_rms: float,
                     clip_level: float, _decoded=None) -> pd.DataFrame:
    """Decode the whole Arrow batch once (vectorized kernel), then one
    numpy pass per clip: peak, clipping ratio (|x| at/above full scale),
    silence ratio (fraction of frame_ms frames under silence_rms), and
    zero-crossing rate. Undecodable rows -> ok=false, null features.
    Pass ``_decoded`` (a _decode_series(want_pcm=True) frame) to reuse
    an already-decoded batch instead of decoding again."""
    dec = _decode_series(bs, want_pcm=True) if _decoded is None else _decoded
    n_rows = len(bs)
    ok = dec["ok"].to_numpy()
    peak = np.full(n_rows, np.nan)
    clip_r = np.full(n_rows, np.nan)
    sil_r = np.full(n_rows, np.nan)
    zcr = np.full(n_rows, np.nan)
    dbfs = np.full(n_rows, np.nan)
    dc = np.full(n_rows, np.nan)
    for i in np.nonzero(ok)[0]:
        x = dec["pcm"][i]
        sr = int(dec["sr"][i])
        n = x.size
        if n == 0:
            peak[i] = clip_r[i] = sil_r[i] = zcr[i] = dc[i] = 0.0
            dbfs[i] = SILENCE_DBFS
            continue
        ax = np.abs(x)
        peak[i] = float(ax.max())
        clip_r[i] = float(np.count_nonzero(ax >= clip_level) / n)
        zcr[i] = float(np.count_nonzero(x[1:] * x[:-1] < 0) / max(n - 1, 1))
        # integrated level + DC bias from the same float64 accumulation
        # the decoder's RMS uses (decode.py) — dBFS re full scale 1.0
        x64 = x.astype(np.float64)
        rms = float(np.sqrt(np.dot(x64, x64) / n))
        dbfs[i] = 20.0 * np.log10(rms) if rms > 0.0 else SILENCE_DBFS
        dc[i] = float(x64.mean())
        flen = max(int(sr * frame_ms / 1000), 1)
        nf = n // flen
        if nf:
            frames = x[:nf * flen].reshape(nf, flen).astype(np.float64)
            frms = np.sqrt(np.einsum("ij,ij->i", frames, frames) / flen)
            sil_r[i] = float(np.count_nonzero(frms < silence_rms) / nf)
        else:  # clip shorter than one frame: all-or-nothing
            rms = float(np.sqrt(np.dot(x.astype(np.float64), x) / n))
            sil_r[i] = 1.0 if rms < silence_rms else 0.0
    out = pd.DataFrame({"ok": dec["ok"], "peak": peak, "clip_ratio": clip_r,
                        "silence_ratio": sil_r, "zcr": zcr,
                        "rms_dbfs": dbfs, "dc_offset": dc})
    return out


def with_audio_features(df: DataFrame, bytes_col: str = "bytes",
                        out_col: str = "_afeat", frame_ms: int = 20,
                        silence_rms: float = 0.01,
                        clip_level: float = 0.999) -> DataFrame:
    """Append the feature struct column (single Arrow-batched stage)."""
    def _udf(bs: pd.Series) -> pd.DataFrame:
        return _features_series(bs, frame_ms, silence_rms, clip_level)
    return df.withColumn(out_col,
                         pandas_udf(_udf, AUDIO_FEATURES_TYPE)(F.col(bytes_col)))


def with_decoded_features(df: DataFrame, bytes_col: str = "bytes",
                          out_col: str = "_decoded", frame_ms: int = 20,
                          silence_rms: float = 0.01,
                          clip_level: float = 0.999) -> DataFrame:
    """Decode struct AND feature fields from ONE fused Arrow stage —
    drop-in replacement for ``with_decoded`` when feature rules are on
    (decode_ok/sr/dur consistency rules read the same field names)."""
    def _udf(bs: pd.Series) -> pd.DataFrame:
        dec = _decode_series(bs, want_pcm=True)
        feat = _features_series(bs, frame_ms, silence_rms, clip_level,
                                _decoded=dec)
        return pd.DataFrame({
            "ok": dec["ok"], "sr": dec["sr"], "n_samples": dec["n_samples"],
            "dur_ms": dec["dur_ms"], "rms": dec["rms"],
            "peak": feat["peak"], "clip_ratio": feat["clip_ratio"],
            "silence_ratio": feat["silence_ratio"], "zcr": feat["zcr"],
            "rms_dbfs": feat["rms_dbfs"], "dc_offset": feat["dc_offset"]})
    return df.withColumn(out_col,
                         pandas_udf(_udf, DECODED_FEATURES_TYPE)(F.col(bytes_col)))


#: decode struct + feature fields + VAD fields in ONE column — the
#: everything-on audio stage (suite `audio_vad`): decode-consumer rules,
#: feature rules, and VAD/SNR rules all read the same struct, ONE Arrow
#: stage, ONE decode
FULL_AUDIO_TYPE = T.StructType(
    DECODED_FEATURES_TYPE.fields + [
        T.StructField("segments", T.ArrayType(T.StructType([
            T.StructField("start_ms", T.IntegerType()),
            T.StructField("end_ms", T.IntegerType()),
        ]))),
        T.StructField("speech_ms", T.IntegerType()),
        T.StructField("speech_ratio", T.DoubleType()),
        T.StructField("n_segments", T.IntegerType()),
        T.StructField("longest_gap_ms", T.IntegerType()),
        T.StructField("snr_db", T.DoubleType()),
    ])


#: FULL_AUDIO_TYPE + effective-bandwidth fields (with_full_audio(...,
#: bandwidth=True)); field names match BANDWIDTH_TYPE so bandwidth_rule
#: reads the fused column unchanged via bw_col=
FULL_AUDIO_BW_TYPE = T.StructType(
    FULL_AUDIO_TYPE.fields + [
        T.StructField("rolloff_hz", T.DoubleType()),
        T.StructField("bandwidth_ratio", T.DoubleType()),
    ])


def with_full_audio(df: DataFrame, bytes_col: str = "bytes",
                    out_col: str = "_audio", frame_ms: int = 20,
                    silence_rms: float = 0.01, clip_level: float = 0.999,
                    vad_threshold_rms: float = 0.01,
                    hangover_frames: int = 2,
                    min_speech_frames: int = 2,
                    bandwidth: bool = False, rolloff: float = 0.99,
                    n_fft: int = 2048) -> DataFrame:
    """Decode struct + PCM features + energy-VAD/SNR from ONE fused
    Arrow stage — a suite with EVERY audio gate enabled (decode/sr/dur
    consistency, clipping/silence/quiet/DC, speech-presence/max-gap/
    min-SNR) still pays a single Python round-trip and a single decode.
    Field names match DECODED_TYPE / AUDIO_FEATURES_TYPE / SEGMENTS_TYPE,
    so every rule consumes this column unchanged via its *_col kwarg.
    ``bandwidth=True`` additionally computes the effective-bandwidth
    fields (audio/bandwidth.py) in the SAME stage — opt-in because the
    per-frame rffts cost more than every other feature combined."""
    from .segments import _segments_series

    def _udf(bs: pd.Series) -> pd.DataFrame:
        dec = _decode_series(bs, want_pcm=True)
        feat = _features_series(bs, frame_ms, silence_rms, clip_level,
                                _decoded=dec)
        vad = _segments_series(bs, frame_ms, vad_threshold_rms,
                               hangover_frames, min_speech_frames,
                               _decoded=dec)
        out = pd.DataFrame({
            "ok": dec["ok"], "sr": dec["sr"], "n_samples": dec["n_samples"],
            "dur_ms": dec["dur_ms"], "rms": dec["rms"],
            "peak": feat["peak"], "clip_ratio": feat["clip_ratio"],
            "silence_ratio": feat["silence_ratio"], "zcr": feat["zcr"],
            "rms_dbfs": feat["rms_dbfs"], "dc_offset": feat["dc_offset"],
            "segments": vad["segments"], "speech_ms": vad["speech_ms"],
            "speech_ratio": vad["speech_ratio"],
            "n_segments": vad["n_segments"],
            "longest_gap_ms": vad["longest_gap_ms"],
            "snr_db": vad["snr_db"]})
        if bandwidth:
            from .bandwidth import _bandwidth_frame
            roll, ratio = _bandwidth_frame(dec, len(bs), rolloff, n_fft)
            out["rolloff_hz"] = roll
            out["bandwidth_ratio"] = ratio
        return out

    otype = FULL_AUDIO_BW_TYPE if bandwidth else FULL_AUDIO_TYPE
    return df.withColumn(out_col,
                         pandas_udf(_udf, otype)(F.col(bytes_col)))


def clipping_rule(bytes_col: str = "bytes", feat_col: str = "_afeat",
                  max_ratio: float = 0.01) -> ObjectRule:
    """Clipped-sample ratio must stay under max_ratio (MAX). Only
    decodable clips are judged — DECODE reports the rest.

    Note: clip_level is an absolute full-scale threshold. G.711
    mu-law/A-law saturate at ~0.980/0.984 of int16 full scale, below
    the 0.999 default — for telephony tables pass
    ``with_audio_features(..., clip_level=0.97)``. Unsigned PCM8 is
    asymmetric: the positive rail is 127/128 = 0.9922 (only the -1.0
    negative rail clears 0.999), so for 8-bit tables use
    ``clip_level=0.99`` to count both rails."""
    return ObjectRule(
        rule_id=Code.MAX,
        predicate=lambda get: (~F.coalesce(get(feat_col)["ok"], F.lit(False)))
        | (get(feat_col)["clip_ratio"] <= max_ratio),
        message=f"clipped-sample ratio exceeds {max_ratio}",
        field_path=f"/{bytes_col}/clip_ratio",
        actual=lambda get: F.round(get(feat_col)["clip_ratio"], 6).cast("string"),
    )


def silence_rule(bytes_col: str = "bytes", feat_col: str = "_afeat",
                 max_ratio: float = 0.9) -> ObjectRule:
    """Mostly-silent clips (silent-frame ratio above max_ratio) fail MAX."""
    return ObjectRule(
        rule_id=Code.MAX,
        predicate=lambda get: (~F.coalesce(get(feat_col)["ok"], F.lit(False)))
        | (get(feat_col)["silence_ratio"] <= max_ratio),
        message=f"silent-frame ratio exceeds {max_ratio}",
        field_path=f"/{bytes_col}/silence_ratio",
        actual=lambda get: F.round(get(feat_col)["silence_ratio"], 6).cast("string"),
    )


def quiet_rule(bytes_col: str = "bytes", feat_col: str = "_afeat",
               min_dbfs: float = -45.0) -> ObjectRule:
    """Integrated RMS level must reach min_dbfs (MIN) — a near-inaudible
    recording is a capture failure even when it isn't digitally silent,
    and gain-starved clips poison loudness-sensitive training.
    All-zero PCM reports the SILENCE_DBFS floor (-200), so fully-silent
    clips fail this rule too (silence_rule additionally localizes
    per-frame silence). Loud clips are clipping_rule's finding."""
    return ObjectRule(
        rule_id=Code.MIN,
        predicate=lambda get: (~F.coalesce(get(feat_col)["ok"], F.lit(False)))
        | (get(feat_col)["rms_dbfs"] >= min_dbfs),
        message=f"integrated level below {min_dbfs} dBFS",
        field_path=f"/{bytes_col}/rms_dbfs",
        actual=lambda get: F.round(get(feat_col)["rms_dbfs"], 2).cast("string"),
    )


def dc_offset_rule(bytes_col: str = "bytes", feat_col: str = "_afeat",
                   max_abs: float = 0.02) -> ObjectRule:
    """Mean sample value must stay within ±max_abs of zero (MAX) — a DC
    bias flags a broken capture chain (mic preamp / ADC coupling) and
    wastes headroom; it also skews energy-based VAD and any feature
    computed from raw sample moments."""
    return ObjectRule(
        rule_id=Code.MAX,
        predicate=lambda get: (~F.coalesce(get(feat_col)["ok"], F.lit(False)))
        | (F.abs(get(feat_col)["dc_offset"]) <= max_abs),
        message=f"DC offset magnitude exceeds {max_abs}",
        field_path=f"/{bytes_col}/dc_offset",
        actual=lambda get: F.round(get(feat_col)["dc_offset"], 6).cast("string"),
    )


def speech_rate(transcript_col: Column, dur_col: Column) -> Column:
    """Whitespace tokens per second — pure JVM expression, THE same
    token definition as pipeline.text.token_count (imported, not
    re-implemented, so the two can never drift apart; SQL-oracle
    parity rides on that single definition)."""
    from ..pipeline.text import token_count
    # try_divide: NULL (not an ANSI error) on dur<=0 rows — those are the
    # MIN_EXCLUSIVE rule's findings, and `actual` must stay evaluable
    return F.try_divide(token_count(transcript_col).cast("double"),
                        dur_col.cast("double") / F.lit(1000.0))


def speech_rate_rule(transcript_col: str = "transcript",
                     dur_col: str = "dur_ms", min_wps: float = 0.4,
                     max_wps: float = 8.0) -> ObjectRule:
    """Transcript/duration plausibility (CONSISTENT): a real speech clip
    carries roughly 0.4-8 words per second; a 2-word transcript on a
    60-second clip (or an essay on a 300 ms clip) is a pairing error.
    NULL transcript / non-positive duration are the REQUIRED /
    MIN_EXCLUSIVE rules' findings, not this one's."""
    def pred(get):
        rate = speech_rate(get(transcript_col), get(dur_col))
        judged = (get(transcript_col).isNotNull()
                  & (F.length(F.trim(get(transcript_col))) > 0)
                  & get(dur_col).isNotNull() & (get(dur_col) > 0))
        return (~judged) | ((rate >= min_wps) & (rate <= max_wps))

    return ObjectRule(
        rule_id=Code.CONSISTENT,
        predicate=pred,
        message=f"speech rate outside [{min_wps}, {max_wps}] words/sec",
        field_path=f"/{transcript_col}",
        actual=lambda get: F.round(
            speech_rate(get(transcript_col), get(dur_col)), 4).cast("string"),
    )
