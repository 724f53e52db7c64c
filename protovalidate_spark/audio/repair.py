"""Audio repair transforms: DC removal + peak normalization with
re-encode — the FIX half of the capture-quality gates. ``quiet_rule`` /
``dc_offset_rule`` (features.py) DETECT gain-starved and DC-biased
captures; this module repairs them in place of dropping, the standard
salvage step a training pipeline runs between validation and curation.

One Arrow-batched stage: the same vectorized batch decoder feeds a pure
numpy fix (subtract mean, scale to target peak under a gain cap) and the
same ``_pack_samples`` encoder the decoder's round-trip tests pin —
repaired bytes decode through the unmodified pipeline. Reference analog:
``Interface().WithCast`` (inerface.go:69-74) — a value-transforming
extension, expressed as a column transform.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .decode import _decode_series
from .wav import synth_wav

NORMALIZED_TYPE = T.StructType([
    T.StructField("ok", T.BooleanType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("gain_db", T.DoubleType()),
    T.StructField("dc_removed", T.DoubleType()),
])


def normalize_pcm(x: np.ndarray, target_peak: float = 0.95,
                  remove_dc: bool = True, max_gain_db: float = 30.0,
                  target_rms_dbfs: float = None):
    """(fixed samples, applied gain dB, removed DC): subtract the mean,
    then scale so the peak hits ``target_peak`` — but never amplify by
    more than ``max_gain_db`` (a near-silent noise floor boosted 60 dB
    is garbage made loud, not a repair; attenuation is uncapped).
    All-zero input comes back unchanged at 0 dB.

    ``target_rms_dbfs`` switches to LOUDNESS normalization: gain so the
    RMS hits the target (the collate-friendly "every clip at −20 dBFS"
    convention), still ceilinged so the peak never exceeds
    ``target_peak`` (clipping is not a repair) and still gain-capped."""
    x = x.astype(np.float64)
    dc = float(x.mean()) if (remove_dc and x.size) else 0.0
    if dc:
        x = x - dc
    peak = float(np.abs(x).max()) if x.size else 0.0
    if peak <= 0.0:
        return x, 0.0, dc
    if target_rms_dbfs is None:
        gain = target_peak / peak
    else:
        rms = float(np.sqrt(np.mean(x * x)))
        gain = (10.0 ** (target_rms_dbfs / 20.0)) / rms
        gain = min(gain, target_peak / peak)
    cap = 10.0 ** (max_gain_db / 20.0)
    gain = min(gain, cap)
    return x * gain, 20.0 * float(np.log10(gain)), dc


def trim_silence_pcm(x: np.ndarray, sr: int,
                     threshold_dbfs: float = -40.0, pad_ms: int = 50,
                     frame_ms: int = 10):
    """(trimmed samples, leading ms removed, trailing ms removed):
    cut leading/trailing frames whose RMS sits below ``threshold_dbfs``,
    keeping ``pad_ms`` of context on each side. Interior silence is
    untouched (that is segmentation's job, segments.py). All-silent
    input trims to zero samples."""
    x = x.astype(np.float64)
    if x.size == 0:
        return x, 0.0, 0.0
    flen = max(1, int(sr * frame_ms / 1000))
    n_frames = (x.size + flen - 1) // flen
    padded = np.zeros(n_frames * flen, dtype=np.float64)
    padded[:x.size] = x
    frames = padded.reshape(n_frames, flen)
    rms = np.sqrt(np.mean(frames * frames, axis=1))
    thr = 10.0 ** (threshold_dbfs / 20.0)
    active = np.nonzero(rms > thr)[0]
    if active.size == 0:
        return np.zeros(0, dtype=np.float64), \
            1000.0 * x.size / sr, 0.0
    pad = int(sr * pad_ms / 1000)
    lo = max(0, int(active[0]) * flen - pad)
    hi = min(x.size, (int(active[-1]) + 1) * flen + pad)
    return x[lo:hi], 1000.0 * lo / sr, 1000.0 * (x.size - hi) / sr


def resample_linear(x: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Linear-interpolation resample — the deterministic, dependency-free
    kernel (a windowed-sinc polyphase filter belongs to a real DSP lib;
    for rate STANDARDIZATION of speech the linear kernel's aliasing sits
    below the quantization floor of typical 8-16 kHz telephone-band
    content). Same-rate input passes through untouched."""
    if sr == target_sr or x.size == 0:
        return x
    n_out = int(round(x.size * target_sr / sr))
    if n_out <= 0:
        return np.zeros(0, dtype=np.float64)
    t_out = np.arange(n_out, dtype=np.float64) * (sr / target_sr)
    return np.interp(t_out, np.arange(x.size, dtype=np.float64),
                     x.astype(np.float64))


STANDARDIZED_TYPE = T.StructType([
    T.StructField("ok", T.BooleanType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("src_sr", T.IntegerType()),
    T.StructField("src_dur_ms", T.IntegerType()),
])


def with_standardized_audio(df: DataFrame, bytes_col: str = "bytes",
                            out_col: str = "_std",
                            target_sr: int = 16000,
                            fmt: str = "pcm16") -> DataFrame:
    """Re-encode every decodable clip to ONE (sample rate, sample
    format) — the rate/format standardization a training pipeline runs
    so batches collate ("all clips → pcm16 @ 16 kHz"). Struct(ok, bytes,
    src_sr, src_dur_ms); undecodable rows pass through ok=false with
    NULL bytes. ONE Arrow stage (decode + linear resample + encode);
    compose with :func:`with_normalized_audio` for level repair."""
    def _udf(bs: pd.Series) -> pd.DataFrame:
        dec = _decode_series(bs, want_pcm=True)
        ok = dec["ok"].to_numpy()
        n = len(bs)
        out_b = [None] * n
        for i in np.nonzero(ok)[0]:
            x = resample_linear(dec["pcm"][i], int(dec["sr"][i]), target_sr)
            out_b[i] = synth_wav(x, target_sr, fmt=fmt)
        return pd.DataFrame({
            "ok": dec["ok"], "bytes": out_b,
            "src_sr": pd.array(
                [int(dec["sr"][i]) if ok[i] else None for i in range(n)],
                dtype="Int32"),
            "src_dur_ms": pd.array(
                [int(dec["dur_ms"][i]) if ok[i] else None
                 for i in range(n)], dtype="Int32")})

    return df.withColumn(out_col,
                         pandas_udf(_udf, STANDARDIZED_TYPE)(F.col(bytes_col)))


TRIMMED_TYPE = T.StructType([
    T.StructField("ok", T.BooleanType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("lead_ms", T.DoubleType()),
    T.StructField("tail_ms", T.DoubleType()),
    T.StructField("out_dur_ms", T.IntegerType()),
])


def with_trimmed_audio(df: DataFrame, bytes_col: str = "bytes",
                       out_col: str = "_trim",
                       threshold_dbfs: float = -40.0, pad_ms: int = 50,
                       frame_ms: int = 10,
                       fmt: str = "pcm16") -> DataFrame:
    """Leading/trailing silence trim, re-encoded — the dead-air cut a
    training pipeline runs before packing (dead air is paid-for window
    space). Struct(ok, bytes, lead_ms, tail_ms, out_dur_ms); an
    all-silent clip trims to a 0-sample WAV (out_dur_ms=0 — a gate can
    then MIN_EXCLUSIVE it away); undecodable rows pass through ok=false
    with NULL bytes. ONE Arrow stage (decode + trim + encode)."""
    def _udf(bs: pd.Series) -> pd.DataFrame:
        dec = _decode_series(bs, want_pcm=True)
        ok = dec["ok"].to_numpy()
        n = len(bs)
        out_b = [None] * n
        lead = np.full(n, np.nan)
        tail = np.full(n, np.nan)
        odur = [None] * n
        for i in np.nonzero(ok)[0]:
            sr = int(dec["sr"][i])
            x, lo, hi = trim_silence_pcm(dec["pcm"][i], sr,
                                         threshold_dbfs, pad_ms, frame_ms)
            out_b[i] = synth_wav(x, sr, fmt=fmt)
            lead[i], tail[i] = lo, hi
            odur[i] = int(round(1000.0 * x.size / sr))
        return pd.DataFrame({
            "ok": dec["ok"], "bytes": out_b, "lead_ms": lead,
            "tail_ms": tail,
            "out_dur_ms": pd.array(odur, dtype="Int32")})

    return df.withColumn(out_col,
                         pandas_udf(_udf, TRIMMED_TYPE)(F.col(bytes_col)))


def with_normalized_audio(df: DataFrame, bytes_col: str = "bytes",
                          out_col: str = "_norm",
                          target_peak: float = 0.95,
                          remove_dc: bool = True,
                          max_gain_db: float = 30.0,
                          fmt: str = "pcm16",
                          target_rms_dbfs: float = None) -> DataFrame:
    """Append struct(ok, bytes, gain_db, dc_removed): the repaired WAV
    re-encoded as ``fmt`` at the clip's own sample rate. Undecodable
    rows pass through ok=false with NULL bytes — repair never invents
    audio. ONE Arrow stage (decode + fix + encode)."""
    def _udf(bs: pd.Series) -> pd.DataFrame:
        dec = _decode_series(bs, want_pcm=True)
        ok = dec["ok"].to_numpy()
        n = len(bs)
        out_b = [None] * n
        gain = np.full(n, np.nan)
        dc = np.full(n, np.nan)
        for i in np.nonzero(ok)[0]:
            x, g, d = normalize_pcm(dec["pcm"][i], target_peak,
                                    remove_dc, max_gain_db,
                                    target_rms_dbfs)
            out_b[i] = synth_wav(x, int(dec["sr"][i]), fmt=fmt)
            gain[i] = g
            dc[i] = d
        return pd.DataFrame({"ok": dec["ok"], "bytes": out_b,
                             "gain_db": gain, "dc_removed": dc})

    return df.withColumn(out_col,
                         pandas_udf(_udf, NORMALIZED_TYPE)(F.col(bytes_col)))
