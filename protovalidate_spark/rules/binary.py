"""Binary rule set — engine extension for opaque payload columns
(audio/image/video bytes). The reference has no []byte rule set; the
nearest analog is ``Interface[T]().WithCast(fn)``
(/root/reference/pkg/rules/inerface.go:25-29,69-74): a stacked decode
function validates/converts opaque input. Here ``decodable()`` marks the
column for the Arrow-batched audio decode stage (protovalidate_spark.audio)
— the compiler wires the decoded struct in; no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from ..errors import Code
from .base import Rule, RuleSet


@dataclass(frozen=True)
class BinaryRuleSet(RuleSet):
    decodable_codec: str = ""  # "" = not requested; "wav" = RIFF/PCM check

    SPARK_TYPE: str = "binary"

    def min_len(self, n: int) -> "BinaryRuleSet":
        return self._with_rule(Rule(
            Code.MIN_LEN, lambda c: F.octet_length(c) >= n,
            f"payload must be at least {n} bytes", conflict_key="min_len",
            params={"n": n}))

    def max_len(self, n: int) -> "BinaryRuleSet":
        return self._with_rule(Rule(
            Code.MAX_LEN, lambda c: F.octet_length(c) <= n,
            f"payload must be at most {n} bytes", conflict_key="max_len",
            params={"n": n}))

    def decodable(self, codec: str = "wav") -> "BinaryRuleSet":
        """Require the payload to decode (Arrow batch UDF stage; DECODE
        violations). Analogous to a WithCast decode that must not return nil
        (reference inerface.go:131-144)."""
        return self._clone(decodable_codec=codec)

    def magic(self, prefix: bytes) -> "BinaryRuleSet":
        """Cheap JVM-side container check: payload starts with magic bytes
        (e.g. b'RIFF'). Runs without Python."""
        hexs = prefix.hex()
        return self._with_rule(Rule(
            Code.ENCODING,
            lambda c: F.hex(F.substring(c, 1, len(prefix))) == hexs.upper(),
            f"payload must start with magic {prefix!r}",
            params={"magic": hexs}))


def Binary() -> BinaryRuleSet:
    return BinaryRuleSet()
