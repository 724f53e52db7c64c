"""Pure-numpy RIFF/PCM16 WAV synthesis + decode.

No external audio libraries (container has none) — WAV is a trivial chunked
container, synthesized and parsed in-process. This is the deterministic
"decoder" behind ``Binary().decodable('wav')``; other codecs (flac/opus/mp3)
are stubbed behind :func:`decode_bytes` with a clear NotImplementedError as
the container lacks codec libs (the Spark-side plumbing — schema, Arrow
batching, consistency rules — is identical and fully tested on WAV).
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Optional

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"
_FMT = b"fmt "
_DATA = b"data"


class Decoded(NamedTuple):
    ok: bool
    sr: int
    n_samples: int
    dur_ms: int
    rms: float
    pcm: Optional[np.ndarray]  # float32 in [-1, 1], None unless requested


def synth_sine_wav(freq_hz: float, sr: int, dur_ms: int, amp: float = 0.5) -> bytes:
    """Mono PCM16 WAV of a sine wave. Deterministic for fixed args."""
    n = int(sr * dur_ms / 1000)
    t = np.arange(n, dtype=np.float64) / sr
    x = amp * np.sin(2.0 * np.pi * freq_hz * t)
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = (
        _RIFF + struct.pack("<I", 36 + len(data)) + _WAVE
        + _FMT + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + _DATA + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(b: Optional[bytes], want_pcm: bool = False) -> Decoded:
    """Parse a RIFF/PCM16 mono WAV; any malformation ⇒ ok=False."""
    bad = Decoded(False, 0, 0, 0, 0.0, None)
    if b is None or len(b) < 44:
        return bad
    if b[0:4] != _RIFF or b[8:12] != _WAVE:
        return bad
    pos, sr, bits, channels, data = 12, 0, 0, 0, None
    try:
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (size,) = struct.unpack_from("<I", b, pos + 4)
            body = b[pos + 8:pos + 8 + size]
            if cid == _FMT and len(body) >= 16:
                fmt_code, channels, sr, _br, _ba, bits = struct.unpack_from(
                    "<HHIIHH", body, 0)
                if fmt_code != 1:
                    return bad
            elif cid == _DATA:
                if len(body) < size:  # truncated payload
                    return bad
                data = body
            pos += 8 + size + (size & 1)
    except struct.error:
        return bad
    if sr <= 0 or bits != 16 or channels != 1 or data is None or len(data) % 2:
        return bad
    pcm16 = np.frombuffer(data, dtype="<i2")
    n = pcm16.size
    dur_ms = int(round(n * 1000.0 / sr))
    # rms on normalized samples — cheap decoded-signal fingerprint.
    # BLAS dot on the raw int16 widened once to float32: no squared temp
    # array, SIMD accumulation (~2× the naive mean-of-squares)
    if n:
        x = pcm16.astype(np.float32)
        rms = float(np.sqrt(np.dot(x, x) / n) / 32768.0)
    else:
        rms = 0.0
    f32 = (pcm16.astype(np.float32) / 32768.0) if want_pcm else None
    return Decoded(True, int(sr), int(n), dur_ms, rms, f32)


def _soundfile():
    """Optional decoder backend: the ``soundfile`` module if importable,
    else None (this container ships no codec libs). Cached per process —
    the check runs once per executor, not per batch."""
    global _SF_CACHE
    if _SF_CACHE is None:
        try:
            import soundfile as sf  # noqa: F401 — optional dependency
            _SF_CACHE = sf
        except ImportError:
            _SF_CACHE = False
    return _SF_CACHE or None


_SF_CACHE = None


def _decode_soundfile(sf, b: bytes, want_pcm: bool) -> Decoded:
    """Compressed-codec decode via soundfile (libsndfile). Mono only —
    the same channel rule the in-process WAV parser enforces; any decode
    failure ⇒ ok=False (malformed payloads are violations, not errors)."""
    import io
    bad = Decoded(False, 0, 0, 0, 0.0, None)
    if b is None:
        return bad
    try:
        x, sr = sf.read(io.BytesIO(bytes(b)), dtype="float32",
                        always_2d=True)
    except Exception:
        return bad
    if x.shape[1] != 1 or sr <= 0:
        return bad
    x = x[:, 0]
    n = int(x.size)
    rms = float(np.sqrt(np.dot(x, x) / n)) if n else 0.0
    return Decoded(True, int(sr), n, int(round(n * 1000.0 / sr)), rms,
                   x if want_pcm else None)


def decode_bytes(b: Optional[bytes], codec: str = "wav", want_pcm: bool = False) -> Decoded:
    """Codec dispatch. WAV decodes in-process; compressed codecs
    (flac/opus/mp3) dispatch to ``soundfile`` WHEN IMPORTABLE — inside
    the same Arrow batch UDF, same Decoded shape — and otherwise remain
    a clearly-marked stub (this container has no codec libs; the
    Spark-side plumbing is codec-agnostic and fully tested on WAV)."""
    if codec in ("wav", "", None):
        return decode_wav(b, want_pcm)
    if codec in ("flac", "opus", "mp3"):
        sf = _soundfile()
        if sf is not None:
            return _decode_soundfile(sf, b, want_pcm)
        # STUB fallback: no codec libraries in this container.
        raise NotImplementedError(
            f"codec {codec!r} requires an external decoder library")
    raise ValueError(f"unknown codec {codec!r}")


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` vs ``ref`` in dB (correctness gate:
    decoded-PCM allclose at SNR≥30dB, BASELINE.json input_hint)."""
    n = min(ref.size, test.size)
    if n == 0:
        return float("-inf")
    ref = ref[:n].astype(np.float64)
    noise = ref - test[:n].astype(np.float64)
    p_sig = float(np.sum(ref * ref))
    p_noise = float(np.sum(noise * noise))
    if p_noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_noise) if p_sig > 0 else float("-inf")
