"""Integer / float rule sets.

Reference: /root/reference/pkg/rules/int.go (463 LoC, 10 int widths,
int.go:101-148), float.go (61-69), number_rule_{min,max,minexclusive,
maxexclusive,values}.go, rounding.go, and the lossless-checked coercion in
number_coerce.go:17-283.

Spark mapping (SURVEY.md §1.2): integers are carried as BIGINT with
explicit width-bound companion predicates (Spark cast silently wraps, the
reference reports CodeRange on overflow — number_coerce.go:17-24,
range_error.go:7-17). float→int requires the value be within 1e-9 of a
whole number unless a rounding mode is set (number_coerce.go:14,27-58).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import Code, CompileError
from .base import ComparableMixin, MembershipMixin, Rule, RuleSet

INT_BOUNDS = {
    "int8": (-(2**7), 2**7 - 1),
    "int16": (-(2**15), 2**15 - 1),
    "int32": (-(2**31), 2**31 - 1),
    "int64": (-(2**63), 2**63 - 1),
    "uint8": (0, 2**8 - 1),
    "uint16": (0, 2**16 - 1),
    "uint32": (0, 2**32 - 1),
    "uint64": (0, 2**63 - 1),  # clamped to Spark BIGINT range
    "int": (-(2**63), 2**63 - 1),
    "uint": (0, 2**63 - 1),
}

_NUMERIC_INPUTS = {"tinyint", "smallint", "int", "bigint", "float", "double",
                   "decimal", "boolean"}

#: reference number_coerce.go:14 — float→int whole-number tolerance
FLOAT_INT_TOLERANCE = 1e-9

ROUND_FUNCS = {
    "down": F.floor,
    "up": F.ceil,
    "half_up": lambda c: F.round(c, 0),
    "half_even": lambda c: F.bround(c, 0),
}


@dataclass(frozen=True)
class IntRuleSet(RuleSet, ComparableMixin, MembershipMixin):
    """``rules.Int()/Int8()...Uint64()`` (int.go:101-148)."""

    width: str = "int64"
    rounding: Optional[str] = None  # float→int mode (rounding.go:41-49)
    base: int = 10                  # string parse base (int.go:205-209)

    SPARK_TYPE: str = "bigint"

    def with_rounding(self, mode: str) -> "IntRuleSet":
        if mode not in ROUND_FUNCS:
            raise CompileError(f"unknown rounding mode {mode!r}")
        return self._clone(rounding=mode)

    def with_base(self, n: int) -> "IntRuleSet":
        return self._clone(base=n)

    def coerce(self, col: Column, input_type: str):
        lo, hi = INT_BOUNDS[self.width]
        in_width = lambda v: (v >= F.lit(lo)) & (v <= F.lit(hi))  # noqa: E731

        base_t = input_type.split("(")[0]
        if base_t in ("tinyint", "smallint", "int", "bigint"):
            value = col.cast("bigint")
            # cross-width round-trip check ⇒ RANGE (number_coerce.go:17-24)
            return value, in_width(value), Code.RANGE
        if self.strict:
            raise CompileError(
                f"strict Int{self.width} rule set applied to {input_type} column")
        if base_t in ("float", "double", "decimal"):
            if self.rounding:
                rounded = ROUND_FUNCS[self.rounding](col).cast("bigint")
                return rounded, in_width(rounded), Code.RANGE
            # default: must be within 1e-9 of whole (number_coerce.go:27-58)
            value = F.round(col, 0).cast("bigint")
            ok = (F.abs(col - F.round(col, 0)) <= FLOAT_INT_TOLERANCE) & in_width(value)
            return value, ok, Code.TYPE
        if base_t == "boolean":
            # bool→num 1/0 (number_coerce.go:151-160)
            value = col.cast("bigint")
            return value, F.lit(True), Code.TYPE
        if base_t == "string":
            if self.base != 10:
                # F.conv parses in base n; invalid digits → wraps/0, guard with regex
                digits = "0123456789abcdefghijklmnopqrstuvwxyz"[: self.base]
                pat = f"^-?[{digits}{digits.upper()}]+$"
                value = F.conv(col, self.base, 10).cast("bigint")
                return value, col.rlike(pat) & value.isNotNull() & in_width(value), Code.TYPE
            value = col.try_cast("bigint")
            return value, value.isNotNull() & in_width(value), Code.TYPE
        raise CompileError(f"cannot coerce {input_type} to {self.width}")


@dataclass(frozen=True)
class FloatRuleSet(RuleSet, ComparableMixin, MembershipMixin):
    """``rules.Float32()/Float64()`` (float.go:61-69)."""

    width: str = "float64"
    rounding: Optional[str] = None
    precision: int = 0
    fixed_output: Optional[int] = None

    SPARK_TYPE: str = "double"

    def with_rounding(self, mode: str, precision: int = 0) -> "FloatRuleSet":
        if mode not in ROUND_FUNCS and mode != "none":
            raise CompileError(f"unknown rounding mode {mode!r}")
        return self._clone(rounding=mode, precision=precision)

    def with_fixed_output(self, precision: int) -> "FloatRuleSet":
        """Fixed-precision string output on assignment (reference
        WithFixedOutput, rounding.go:71-78; format number_coerce.go:89-127)."""
        return self._clone(fixed_output=precision)

    def output(self, value: Column) -> Column:
        if self.fixed_output is not None:
            return F.format_number(value, self.fixed_output)
        return value

    def coerce(self, col: Column, input_type: str):
        base_t = input_type.split("(")[0]
        if base_t in ("float", "double", "decimal"):
            value = col.cast("double")
        elif self.strict:
            raise CompileError(
                f"strict Float rule set applied to {input_type} column")
        elif base_t in ("tinyint", "smallint", "int", "bigint"):
            value = col.cast("double")
            if self.width == "float32":
                # int→float exact only below 2^24 (number_coerce.go:256-283)
                ok = F.abs(col) <= F.lit(2**24)
                return value, ok, Code.RANGE
            ok = F.abs(col) <= F.lit(2**53)
            return value, ok, Code.RANGE
        elif base_t == "boolean":
            value = col.cast("double")
        elif base_t == "string":
            value = col.try_cast("double")
            return value, value.isNotNull(), Code.TYPE
        else:
            raise CompileError(f"cannot coerce {input_type} to float")
        if self.rounding and self.rounding != "none":
            if self.rounding == "half_even":
                value = F.bround(value, self.precision)
            elif self.rounding == "half_up":
                value = F.round(value, self.precision)
            elif self.rounding == "down":
                p = 10 ** self.precision
                value = F.floor(value * p) / p
            elif self.rounding == "up":
                p = 10 ** self.precision
                value = F.ceil(value * p) / p
        return value, F.lit(True), Code.TYPE


def Int(width: str = "int64") -> IntRuleSet:
    return IntRuleSet(width=width)


def Int8() -> IntRuleSet:
    return IntRuleSet(width="int8")


def Int16() -> IntRuleSet:
    return IntRuleSet(width="int16")


def Int32() -> IntRuleSet:
    return IntRuleSet(width="int32")


def Int64() -> IntRuleSet:
    return IntRuleSet(width="int64")


def Uint8() -> IntRuleSet:
    return IntRuleSet(width="uint8")


def Uint16() -> IntRuleSet:
    return IntRuleSet(width="uint16")


def Uint32() -> IntRuleSet:
    return IntRuleSet(width="uint32")


def Uint64() -> IntRuleSet:
    return IntRuleSet(width="uint64")


def Float32() -> FloatRuleSet:
    return FloatRuleSet(width="float32")


def Float64() -> FloatRuleSet:
    return FloatRuleSet(width="float64")
