"""Deterministic spectral audio embeddings (time-chunked log-band
energy vectors).

Spectral fingerprints (audio/fingerprint.py) catch EXACT content
duplicates across re-encodings; they cannot rank *similar* audio. The
embedding here is the classic pre-neural audio descriptor: per
time-chunk, power in log-spaced frequency bands, normalized to the
chunk's total in-range power (relative spectral shape — gain
invariant), compressed (sqrt — keeps quiet bands visible without the
log's noise-floor blowup), concatenated across chunks and
L2-normalized. The result is an ``array<float>`` column that plugs
UNCHANGED into the engine's existing vector family:
``pipeline.dedup.embedding_near_dups`` (sign-LSH near-dup),
``pipeline.similarity.cosine_topk`` / ``lsh_topk`` / ``ivf_topk``
(ANN), ``quantize_embeddings`` (int8 index) — cosine is
scale-invariant, so every probe composes as-is.

Scale shape: ONE Arrow-batched decode+FFT stage reusing the vectorized
batch decoder (no second decode, no per-row Python dispatch);
everything downstream shuffles only (id, dim-float vector) — the audio
payload never leaves the scan stage. Reference analog: a custom
``Interface().WithCast`` derived value feeding the engine's dedup /
similarity family (reference pkg/rules/inerface.go:69-74).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .decode import _decode_series

# Band grid bounds: 60 Hz (below = rumble/DC leakage) to 3.8 kHz — the
# highest band edge must stay under the Nyquist of the LOWEST sample
# rate the table carries (telephony 8 kHz -> 4 kHz), or re-encodings of
# the same content at different rates would disagree on the top bands.
DEFAULT_FMIN = 60.0
DEFAULT_FMAX = 3800.0


def band_edges(bands: int, fmin: float = DEFAULT_FMIN,
               fmax: float = DEFAULT_FMAX) -> np.ndarray:
    """``bands + 1`` log-spaced band edges in Hz."""
    return np.geomspace(fmin, fmax, bands + 1)


def audio_embedding(x: np.ndarray, sr: int, chunks: int = 4,
                    bands: int = 16, fmin: float = DEFAULT_FMIN,
                    fmax: float = DEFAULT_FMAX) -> np.ndarray:
    """``chunks * bands`` float32 descriptor of a PCM clip.

    Per time chunk: Hann-windowed rFFT power spectrum, summed into
    log-spaced Hz bands (Hz, not bin index — sample-rate invariant),
    each chunk normalized to its total in-range power so pure gain
    changes cancel, sqrt-compressed, then the whole vector
    L2-normalized. A silent chunk contributes zeros; an all-silent
    clip returns the zero vector (callers treat zero-norm as
    no-content, same contract as fingerprint's empty token set).
    """
    dim = chunks * bands
    n = x.size
    if n < 2 or sr <= 0:
        return np.zeros(dim, dtype=np.float32)
    edges = band_edges(bands, fmin, fmax)
    out = np.zeros(dim, dtype=np.float64)
    bounds = np.linspace(0, n, chunks + 1).astype(np.int64)
    for c in range(chunks):
        seg = x[bounds[c]:bounds[c + 1]].astype(np.float64)
        m = seg.size
        if m < 2:
            continue
        mag = np.abs(np.fft.rfft(seg * np.hanning(m)))
        power = mag * mag
        hz = np.arange(power.size) * (sr / m)
        idx = np.searchsorted(edges, hz, side="right") - 1
        valid = (idx >= 0) & (idx < bands) & (hz >= fmin)
        if not valid.any():
            continue
        be = np.bincount(idx[valid], weights=power[valid], minlength=bands)
        total = be.sum()
        if total <= 0.0:
            continue
        out[c * bands:(c + 1) * bands] = np.sqrt(be / total)
    norm = float(np.sqrt(np.dot(out, out)))
    if norm > 0.0:
        out /= norm
    return out.astype(np.float32)


def _embed_series(bs: pd.Series, chunks: int, bands: int,
                  fmin: float, fmax: float) -> pd.Series:
    dec = _decode_series(bs, want_pcm=True)
    ok = dec["ok"].to_numpy()
    vecs = [None] * len(bs)
    for i in np.nonzero(ok)[0]:
        vecs[i] = audio_embedding(dec["pcm"][i], int(dec["sr"][i]),
                                  chunks, bands, fmin, fmax)
    return pd.Series(vecs)


def with_audio_embedding(df: DataFrame, bytes_col: str = "bytes",
                         out_col: str = "_aemb", chunks: int = 4,
                         bands: int = 16, fmin: float = DEFAULT_FMIN,
                         fmax: float = DEFAULT_FMAX) -> DataFrame:
    """Append the ``array<float>`` embedding column (single
    Arrow-batched decode+FFT stage; NULL for undecodable payloads)."""
    def _udf(bs: pd.Series) -> pd.Series:
        return _embed_series(bs, chunks, bands, fmin, fmax)
    return df.withColumn(
        out_col, pandas_udf(_udf, T.ArrayType(T.FloatType()))(F.col(bytes_col)))


def audio_embeddings_frame(df: DataFrame, id_col: str = "clip_id",
                           bytes_col: str = "bytes", chunks: int = 4,
                           bands: int = 16, fmin: float = DEFAULT_FMIN,
                           fmax: float = DEFAULT_FMAX) -> DataFrame:
    """(id, embedding) for every decodable, non-silent clip — the
    adapter between the audio scan stage and the vector family
    (``embedding_near_dups(vec_col="embedding")`` etc.).

    The content gate must NOT be a plain filter on the UDF output: a
    predicate referencing the aliased column is substituted through the
    projection by PushDownPredicates and the decode+FFT Python stage is
    instantiated TWICE (once for the filter, once for the project).
    Instead the gate rides an ``explode_outer`` of a 0/1-element array
    — the filter then references the GENERATED attribute, which cannot
    be pushed below the Generate (the same barrier ObjectRuleSet.
    violations uses, rules/object.py:350; pinned in test_audio_embed).
    """
    emb = with_audio_embedding(df, bytes_col, "_aemb", chunks, bands,
                               fmin, fmax)
    # zero-norm = all-silent: aggregate(v, 0.0, acc+x*x) > 0 keeps only
    # content rows; NULL embedding (undecodable) yields NULL -> dropped
    sq = F.aggregate(F.col("_aemb"), F.lit(0.0),
                     lambda acc, v: acc + v.cast("double") * v.cast("double"))
    content = F.when(sq > F.lit(0.0), F.array(F.col("_aemb")))
    return (emb.select(F.col(id_col).alias("id"),
                       F.explode_outer(content).alias("embedding"))
            .filter(F.col("embedding").isNotNull()))
