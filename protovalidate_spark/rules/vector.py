"""Vector/embedding rule set — numeric-array constraints for embedding
columns (engine extension; no reference analog — the reference has no
vector type, but BASELINE.json's table family carries ``array<float>``
embedding columns and a validator needs first-class shape/health checks).

Everything compiles to JVM higher-order functions (``exists`` /
``aggregate``) — map-only, zero UDF, whole-stage-codegen friendly. The
L2 norm is a sequential left fold (``F.aggregate``) with every element
cast to double BEFORE the multiply, so the result is bit-identical to
any engine folding the same order in double precision (the DuckDB
oracle mirrors the cast).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import Code
from .array_ import ArrayRuleSet
from .base import Rule


def l2_norm(c: Column) -> Column:
    """Sequential-fold L2 norm in double precision."""
    return F.sqrt(F.aggregate(
        c, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))


def _finite_ok(c: Column) -> Column:
    inf = F.lit(float("inf"))
    return ~F.exists(
        c, lambda x: x.isNull() | F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == inf))


@dataclass(frozen=True)
class VectorRuleSet(ArrayRuleSet):
    """Array rule set plus vector semantics: fixed dimensionality,
    finiteness (no NULL / NaN / ±Inf element), and L2-norm bounds.
    Inherits min_len/max_len/item rules from :class:`ArrayRuleSet`."""

    def dim(self, n: int) -> "VectorRuleSet":
        """Exactly-n dimensionality — a shape mismatch is a TYPE error
        (the vector is the wrong type for the model, not out of range)."""
        return self._with_rule(Rule(
            Code.TYPE, lambda c: F.size(c) == n,
            f"vector must have exactly {n} dimensions",
            conflict_key="dim", params={"n": n}))

    def finite(self) -> "VectorRuleSet":
        """No NULL, NaN, or ±Inf element anywhere in the vector."""
        return self._with_rule(Rule(
            Code.RANGE, _finite_ok,
            "vector elements must be finite (no null/NaN/Inf)",
            conflict_key="finite"))

    def norm_min(self, x: float) -> "VectorRuleSet":
        """L2 norm floor — ``norm_min(eps)`` also rejects zero vectors
        (cosine against a zero vector is undefined)."""
        return self._with_rule(Rule(
            Code.MIN, lambda c: l2_norm(c) >= float(x),
            f"vector L2 norm must be >= {x}", conflict_key="norm_min",
            params={"x": x}))

    def norm_max(self, x: float) -> "VectorRuleSet":
        return self._with_rule(Rule(
            Code.MAX, lambda c: l2_norm(c) <= float(x),
            f"vector L2 norm must be <= {x}", conflict_key="norm_max",
            params={"x": x}))

    def unit(self, tol: float = 1e-3) -> "VectorRuleSet":
        """Unit-normalized within ``tol`` (|norm − 1| ≤ tol) — the
        contract every cosine-similarity consumer assumes."""
        return self.norm_min(1.0 - float(tol)).norm_max(1.0 + float(tol))


def Vector() -> VectorRuleSet:
    return VectorRuleSet()
