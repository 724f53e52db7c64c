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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..errors import Code
from ..rules.object import ObjectRule
from .wav import decode_bytes

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


def _decode_series(bs: pd.Series, want_pcm: bool) -> pd.DataFrame:
    # columnar accumulation (dict-of-lists): no per-row dict objects
    ok, sr, ns, dm, rms, pcm = [], [], [], [], [], []
    for b in bs:
        d = decode_bytes(b if b is None else bytes(b), "wav", want_pcm)
        ok.append(d.ok); sr.append(d.sr); ns.append(d.n_samples)
        dm.append(d.dur_ms); rms.append(d.rms)
        if want_pcm:
            pcm.append(d.pcm)
    cols = {"ok": ok, "sr": sr, "n_samples": ns, "dur_ms": dm, "rms": rms}
    if want_pcm:
        cols["pcm"] = pcm
    return pd.DataFrame(cols)


def _make_udf(include_pcm: bool):
    rt = DECODED_PCM_TYPE if include_pcm else DECODED_TYPE

    def decode_wav_udf(bs: pd.Series) -> pd.DataFrame:
        return _decode_series(bs, want_pcm=include_pcm)

    return pandas_udf(decode_wav_udf, rt)


def with_decoded(df: DataFrame, bytes_col: str = "bytes",
                 out_col: str = "_decoded", include_pcm: bool = False) -> DataFrame:
    """Append the decoded struct column (single Arrow-batched stage)."""
    return df.withColumn(out_col, _make_udf(include_pcm)(F.col(bytes_col)))


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
