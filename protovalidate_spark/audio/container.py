"""Declared-codec vs container-format consistency.

The `codec` metadata column is a PROMISE about the payload; nothing in
the row-level membership check (NOTALLOWED) or the referential check
(REF) verifies the bytes actually honor it. A row declaring ``pcm16``
whose payload is G.711 A-law decodes fine, passes every level gate, and
silently ships 8-bit telephony dynamics into a 16-bit training mix —
the metadata/payload mismatch is only visible by comparing the declared
codec against the container's actual format code.

This stage parses ONLY the RIFF header chain — effective WAVE format
code + bits per sample, EXTENSIBLE resolved through the SubFormat GUID,
later fmt chunk wins exactly like the decoder (wav.py decode_wav) so
the two can never disagree on what the container claims. No payload
decode, no RMS: per-row Python work is a few header chunks, inside the
same Arrow-batched stage family as every other bytes check.

Rule gating mirrors the engine contract: undecodable/headerless rows
are DECODE's finding; codec values outside the mapping (compressed
codecs this build cannot parse, free text) are the membership/REF
checks' findings; only rows where BOTH sides are judgeable are judged.
"""

from __future__ import annotations

import struct
from typing import Dict, Optional, Set, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..errors import Code
from ..rules.object import ObjectRule
from .wav import _FMT, _RIFF, _WAVE, FMT_EXTENSIBLE

CONTAINER_TYPE = T.StructType([
    T.StructField("ok", T.BooleanType()),
    T.StructField("fmt_code", T.IntegerType()),
    T.StructField("bits", T.IntegerType()),
])

#: declared codec string -> admissible (format code, bits) pairs.
#: "wav" admits the whole uncompressed family (the coarse label case);
#: precise labels admit exactly their encoding.
CODEC_FORMATS: Dict[str, Set[Tuple[int, int]]] = {
    "pcm8": {(1, 8)}, "pcm16": {(1, 16)},
    "pcm24": {(1, 24)}, "pcm32": {(1, 32)},
    "float32": {(3, 32)}, "float64": {(3, 64)},
    "alaw": {(6, 8)}, "mulaw": {(7, 8)},
    "wav": {(1, 8), (1, 16), (1, 24), (1, 32),
            (3, 32), (3, 64), (6, 8), (7, 8)},
}


def container_format(b: Optional[bytes]) -> Tuple[bool, int, int]:
    """(ok, effective fmt code, bits) from the RIFF header chain, or
    (False, -1, -1) when there is no parseable fmt chunk. Chunk-walk
    semantics mirror wav.py decode_wav: later fmt chunk wins,
    EXTENSIBLE's effective code comes from the SubFormat GUID."""
    if b is None or len(b) < 20 or b[0:4] != _RIFF or b[8:12] != _WAVE:
        return (False, -1, -1)
    pos, fmt_code, bits = 12, -1, -1
    try:
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (size,) = struct.unpack_from("<I", b, pos + 4)
            if cid == _FMT and size >= 16 and pos + 8 + 16 <= len(b):
                code, _ch, _sr, _br, _ba, nb = struct.unpack_from(
                    "<HHIIHH", b, pos + 8)
                if code == FMT_EXTENSIBLE:
                    if size < 40 or pos + 8 + 26 > len(b):
                        return (False, -1, -1)
                    (code,) = struct.unpack_from("<H", b, pos + 8 + 24)
                fmt_code, bits = int(code), int(nb)
            pos += 8 + size + (size & 1)
    except struct.error:
        return (False, -1, -1)
    if fmt_code < 0:
        return (False, -1, -1)
    return (True, fmt_code, bits)


def _container_series(bs: pd.Series) -> pd.DataFrame:
    n = len(bs)
    ok = np.zeros(n, dtype=bool)
    fmt = np.full(n, -1, dtype=np.int32)
    bits = np.full(n, -1, dtype=np.int32)
    for i, b in enumerate(bs.to_numpy()):
        o, f, nb = container_format(None if b is None else bytes(b))
        ok[i], fmt[i], bits[i] = o, f, nb
    return pd.DataFrame({"ok": ok, "fmt_code": fmt, "bits": bits})


def with_container_format(df: DataFrame, bytes_col: str = "bytes",
                          out_col: str = "_cfmt") -> DataFrame:
    """Append the (ok, fmt_code, bits) container struct — ONE Arrow
    stage, header-chain parse only (no payload decode)."""
    def _udf(bs: pd.Series) -> pd.DataFrame:
        return _container_series(bs)
    return df.withColumn(out_col,
                         pandas_udf(_udf, CONTAINER_TYPE)(F.col(bytes_col)))


def codec_consistency_rule(
    codec_col: str = "codec", bytes_col: str = "bytes",
    fmt_col: str = "_cfmt",
    formats: Dict[str, Set[Tuple[int, int]]] = CODEC_FORMATS,
) -> ObjectRule:
    """Declared codec must admit the container's actual (format code,
    bits) pair (CONSISTENT). Judged only when the codec value is in
    ``formats`` (others are the membership/REF checks' findings) AND
    the container header parses (else DECODE's). The membership test
    compiles to a JVM map lookup + array_contains — no second UDF."""
    pairs = []
    for codec, allowed in formats.items():
        pairs += [F.lit(codec),
                  F.array(*[F.lit(f * 1000 + b) for f, b in
                            sorted(allowed)])]
    lookup = F.create_map(*pairs)

    def pred(get):
        norm = F.lower(F.trim(get(codec_col)))
        allowed = F.element_at(lookup, norm)
        enc = (get(fmt_col)["fmt_code"].cast("int") * 1000
               + get(fmt_col)["bits"].cast("int"))
        judged = (allowed.isNotNull()
                  & F.coalesce(get(fmt_col)["ok"], F.lit(False)))
        return (~judged) | F.array_contains(allowed, enc)

    return ObjectRule(
        rule_id=Code.CONSISTENT,
        predicate=pred,
        message="container format does not match the declared codec",
        field_path=f"/{codec_col}",
        actual=lambda get: F.concat(
            F.lower(F.trim(get(codec_col))), F.lit(" vs fmt="),
            get(fmt_col)["fmt_code"].cast("string"), F.lit("/bits="),
            get(fmt_col)["bits"].cast("string")),
    )
