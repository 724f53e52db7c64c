"""Bool rule set (reference /root/reference/pkg/rules/bool.go, 391 LoC;
constructor bool.go:46-49; coercion from num/string bool.go:330-380)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import Code, CompileError
from .base import MembershipMixin, Rule, RuleSet


@dataclass(frozen=True)
class BoolRuleSet(RuleSet, MembershipMixin):
    SPARK_TYPE: str = "boolean"

    def true(self) -> "BoolRuleSet":
        return self._with_rule(Rule(
            Code.NOTALLOWED, lambda c: c, "value must be true",
            conflict_key="const_bool"))

    def false(self) -> "BoolRuleSet":
        return self._with_rule(Rule(
            Code.NOTALLOWED, lambda c: ~c, "value must be false",
            conflict_key="const_bool"))

    def coerce(self, col: Column, input_type: str):
        base_t = input_type.split("(")[0]
        if base_t == "boolean":
            return col, F.lit(True), Code.TYPE
        if self.strict:
            raise CompileError(f"strict Bool rule set applied to {input_type}")
        if base_t in ("tinyint", "smallint", "int", "bigint"):
            # only 0/1 coerce (reference bool.go:330-380)
            return col == 1, col.isin(0, 1), Code.TYPE
        if base_t == "string":
            lowered = F.lower(col)
            value = F.when(lowered.isin("true", "t", "1", "yes", "y"), F.lit(True)) \
                     .when(lowered.isin("false", "f", "0", "no", "n"), F.lit(False))
            return value, value.isNotNull(), Code.TYPE
        raise CompileError(f"cannot coerce {input_type} to bool")


def Bool() -> BoolRuleSet:
    return BoolRuleSet()
