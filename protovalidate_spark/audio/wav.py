"""Pure-numpy RIFF WAV synthesis + decode — the full uncompressed family.

No external audio libraries (container has none) — WAV is a trivial chunked
container, synthesized and parsed in-process. Supported sample formats
(all mono, little-endian, fully vectorized numpy):

  fmt 1      PCM           8 (unsigned) / 16 / 24 / 32-bit signed
  fmt 3      IEEE float    32 / 64-bit
  fmt 6      G.711 A-law   8-bit (256-entry decode table)
  fmt 7      G.711 mu-law  8-bit (256-entry decode table)
  fmt 0xFFFE EXTENSIBLE    wrapper; effective code from the SubFormat GUID

This is the deterministic "decoder" behind ``Binary().decodable('wav')``;
compressed codecs (flac/opus/mp3) dispatch to ``soundfile`` when importable
and otherwise stay behind a clear NotImplementedError as the container
lacks codec libs (the Spark-side plumbing — schema, Arrow batching,
consistency rules — is identical and fully tested on WAV).
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


# WAVE format codes (public RIFF/Microsoft registry values)
FMT_PCM = 1
FMT_FLOAT = 3
FMT_ALAW = 6
FMT_MULAW = 7
FMT_EXTENSIBLE = 0xFFFE

# bits-per-sample each format code admits (mono, little-endian)
_FMT_BITS = {FMT_PCM: (8, 16, 24, 32), FMT_FLOAT: (32, 64),
             FMT_ALAW: (8,), FMT_MULAW: (8,)}

_TABLE_CACHE = {}


def _g711_table(law: str) -> np.ndarray:
    """256-entry decode table, G.711 expansion formulas vectorized over
    all byte values; float32 normalized to [-1, 1] (int16 scale /32768)."""
    if law not in _TABLE_CACHE:
        v = np.arange(256, dtype=np.int64)
        if law == "mulaw":
            u = ~v & 0xFF
            exp = (u >> 4) & 0x7
            mant = u & 0xF
            mag = (((mant << 3) + 0x84) << exp) - 0x84
            val = np.where(u & 0x80, -mag, mag)
        else:  # alaw — NOTE: in A-law the sign bit SET means POSITIVE
            # (CCITT alaw2linear: `(a_val & SIGN_BIT) ? t : -t`), the
            # opposite of mu-law's inverted-byte convention
            a = v ^ 0x55
            exp = (a >> 4) & 0x7
            mant = a & 0xF
            mag = np.where(exp > 0,
                           ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
                           (mant << 4) + 8)
            val = np.where(a & 0x80, mag, -mag)
        _TABLE_CACHE[law] = (val.astype(np.float32) / np.float32(32768.0))
    return _TABLE_CACHE[law]


def _g711_encode(x: np.ndarray, law: str) -> np.ndarray:
    """Nearest-decode-value encoder (SNR-optimal for the table): map each
    normalized sample to the byte whose G.711 expansion is closest."""
    table = _g711_table(law)
    order = np.argsort(table)
    sorted_vals = table[order]
    idx = np.searchsorted(sorted_vals, x.astype(np.float32))
    idx = np.clip(idx, 1, 255)
    left_closer = (np.abs(x - sorted_vals[idx - 1])
                   <= np.abs(sorted_vals[idx] - x))
    idx = np.where(left_closer, idx - 1, idx)
    return order[idx].astype(np.uint8)


def _pack_samples(x: np.ndarray, fmt: str) -> tuple:
    """(fmt_code, bits, data bytes) for normalized float64 samples."""
    if fmt == "pcm8":
        q = np.clip(np.round(x * 127.0), -128, 127) + 128
        return FMT_PCM, 8, q.astype(np.uint8).tobytes()
    if fmt == "pcm16":
        q = np.clip(np.round(x * 32767.0), -32768, 32767)
        return FMT_PCM, 16, q.astype("<i2").tobytes()
    if fmt == "pcm24":
        q = np.clip(np.round(x * 8388607.0), -8388608, 8388607).astype("<i4")
        b = q.view(np.uint8).reshape(-1, 4)[:, :3]  # low 3 LE bytes
        return FMT_PCM, 24, b.tobytes()
    if fmt == "pcm32":
        q = np.clip(np.round(x * 2147483647.0), -2147483648, 2147483647)
        return FMT_PCM, 32, q.astype("<i4").tobytes()
    if fmt == "float32":
        return FMT_FLOAT, 32, x.astype("<f4").tobytes()
    if fmt == "float64":
        return FMT_FLOAT, 64, x.astype("<f8").tobytes()
    if fmt == "mulaw":
        return FMT_MULAW, 8, _g711_encode(x, "mulaw").tobytes()
    if fmt == "alaw":
        return FMT_ALAW, 8, _g711_encode(x, "alaw").tobytes()
    raise ValueError(f"unknown synth fmt {fmt!r}")


def synth_sine_wav(freq_hz: float, sr: int, dur_ms: int, amp: float = 0.5,
                   fmt: str = "pcm16", extensible: bool = False) -> bytes:
    """Mono WAV of a sine wave in any supported sample format.
    Deterministic for fixed args; ``extensible=True`` wraps the same
    samples in a WAVE_FORMAT_EXTENSIBLE fmt chunk (SubFormat GUID)."""
    n = int(sr * dur_ms / 1000)
    t = np.arange(n, dtype=np.float64) / sr
    x = amp * np.sin(2.0 * np.pi * freq_hz * t)
    return synth_wav(x, sr, fmt=fmt, extensible=extensible)


def synth_wav(x: "np.ndarray", sr: int, fmt: str = "pcm16",
              extensible: bool = False) -> bytes:
    """WAV from a float sample array in [-1, 1] — the general synth
    entry (sine/segment/noise fixtures all route here), encoding
    through the same ``_pack_samples`` paths the decoder is tested
    against. Deterministic for a fixed array. A 1-D array is mono; a
    2-D ``(frames, channels)`` array is interleaved multi-channel."""
    x = np.asarray(x, dtype=np.float64)
    ch = x.shape[1] if x.ndim == 2 else 1
    fmt_code, bits, data = _pack_samples(x.reshape(-1), fmt)
    bytes_per = (bits // 8) * ch
    if extensible:
        # 40-byte fmt body: base 16 + cbSize(2) + validBits(2) + mask(4)
        # + SubFormat GUID (effective code + fixed PCM-GUID tail)
        guid = struct.pack("<H", fmt_code) + bytes.fromhex(
            "000000001000800000aa00389b71")
        body = struct.pack("<HHIIHH", FMT_EXTENSIBLE, ch, sr,
                           sr * bytes_per, bytes_per, bits) + struct.pack(
            "<HHI", 22, bits, 0x4) + guid
        fmt_chunk = _FMT + struct.pack("<I", len(body)) + body
    else:
        fmt_chunk = _FMT + struct.pack(
            "<IHHIIHH", 16, fmt_code, ch, sr, sr * bytes_per, bytes_per,
            bits)
    hdr = (_RIFF + struct.pack("<I", 4 + len(fmt_chunk) + 8 + len(data))
           + _WAVE + fmt_chunk + _DATA + struct.pack("<I", len(data)))
    return hdr + data


def _samples_to_float(data: bytes, fmt_code: int, bits: int):
    """Normalized float32 samples, or None when (fmt, bits, len) is not
    a valid combination. All paths are vectorized numpy."""
    if fmt_code not in _FMT_BITS or bits not in _FMT_BITS[fmt_code]:
        return None
    bytes_per = bits // 8
    if len(data) % bytes_per:
        return None
    if fmt_code == FMT_PCM:
        if bits == 8:   # PCM8 is unsigned by convention
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            return (x - 128.0) / np.float32(128.0)
        if bits == 16:
            return np.frombuffer(data, dtype="<i2").astype(np.float32) / np.float32(32768.0)
        if bits == 24:  # widen 3-byte LE to int32 with sign extension
            b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            v = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int8).astype(np.int32) << 16))
            return v.astype(np.float32) / np.float32(8388608.0)
        return np.frombuffer(data, dtype="<i4").astype(np.float32) / np.float32(2147483648.0)
    if fmt_code == FMT_FLOAT:
        dt = "<f4" if bits == 32 else "<f8"
        return np.frombuffer(data, dtype=dt).astype(np.float32)
    law = "alaw" if fmt_code == FMT_ALAW else "mulaw"
    return _g711_table(law)[np.frombuffer(data, dtype=np.uint8)]


def decode_wav(b: Optional[bytes], want_pcm: bool = False,
               downmix: bool = False) -> Decoded:
    """Parse a RIFF WAV in any supported uncompressed format
    (PCM 8/16/24/32, IEEE float 32/64, G.711 A-law/mu-law, plus the
    EXTENSIBLE wrapper); any malformation ⇒ ok=False.

    Channel policy: mono decodes everywhere; multi-channel input is
    INVALID by default (a validation engine should flag a stereo clip
    in a mono table, not paper over it) and decodes only when
    ``downmix=True`` — de-interleave + per-frame channel mean, with
    n_samples/dur_ms counted in FRAMES."""
    bad = Decoded(False, 0, 0, 0, 0.0, None)
    if b is None or len(b) < 44:
        return bad
    if b[0:4] != _RIFF or b[8:12] != _WAVE:
        return bad
    pos, sr, bits, channels, data, fmt_code = 12, 0, 0, 0, None, -1
    try:
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (size,) = struct.unpack_from("<I", b, pos + 4)
            body = b[pos + 8:pos + 8 + size]
            if cid == _FMT and len(body) >= 16:
                fmt_code, channels, sr, _br, _ba, bits = struct.unpack_from(
                    "<HHIIHH", body, 0)
                if fmt_code == FMT_EXTENSIBLE:
                    # effective code = first 2 bytes of the SubFormat GUID
                    if len(body) < 40:
                        return bad
                    (fmt_code,) = struct.unpack_from("<H", body, 24)
            elif cid == _DATA:
                if len(body) < size:  # truncated payload
                    return bad
                data = body
            pos += 8 + size + (size & 1)
    except struct.error:
        return bad
    if sr <= 0 or channels < 1 or data is None:
        return bad
    if channels != 1:
        if not downmix:
            return bad
        x = _samples_to_float(data, fmt_code, bits)
        if x is None or x.size % channels:
            return bad
        frames = x.size // channels
        x = x.reshape(frames, channels).mean(axis=1).astype(np.float32) \
            if frames else np.array([], dtype=np.float32)
        rms = float(np.sqrt(np.dot(x, x) / frames)) if frames else 0.0
        return Decoded(True, int(sr), frames,
                       int(round(frames * 1000.0 / sr)), rms,
                       x if want_pcm else None)
    if fmt_code == FMT_PCM and bits == 16:
        if len(data) % 2:
            return bad
        pcm16 = np.frombuffer(data, dtype="<i2")
        n = pcm16.size
        # rms on normalized samples — cheap decoded-signal fingerprint.
        # BLAS dot on the raw int16 widened once to float32: no squared
        # temp array, SIMD accumulation (~2× naive mean-of-squares)
        if n:
            x = pcm16.astype(np.float32)
            rms = float(np.sqrt(np.dot(x, x) / n) / 32768.0)
        else:
            rms = 0.0
        f32 = (pcm16.astype(np.float32) / 32768.0) if want_pcm else None
        return Decoded(True, int(sr), int(n),
                       int(round(n * 1000.0 / sr)), rms, f32)
    x = _samples_to_float(data, fmt_code, bits)
    if x is None:
        return bad
    n = int(x.size)
    rms = float(np.sqrt(np.dot(x, x) / n)) if n else 0.0
    return Decoded(True, int(sr), n, int(round(n * 1000.0 / sr)), rms,
                   x if want_pcm else None)


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


def decode_bytes(b: Optional[bytes], codec: str = "wav",
                 want_pcm: bool = False, downmix: bool = False) -> Decoded:
    """Codec dispatch. WAV decodes in-process; compressed codecs
    (flac/opus/mp3) dispatch to ``soundfile`` WHEN IMPORTABLE — inside
    the same Arrow batch UDF, same Decoded shape — and otherwise remain
    a clearly-marked stub (this container has no codec libs; the
    Spark-side plumbing is codec-agnostic and fully tested on WAV)."""
    if codec in ("wav", "", None):
        return decode_wav(b, want_pcm, downmix)
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
