"""Slice/array rule set (reference /root/reference/pkg/rules/slice.go,
679 LoC; constructor 59-65; per-item loop 311-344; min/max len 151-161,
300-309).

Spark mapping (SURVEY.md §2.6): higher-order functions on ArrayType —
``F.filter`` finds failing items, ``F.transform`` builds per-item
violations with the item INDEX in the field path (reference paths are
``/field/0``). The reference's channel-streaming mode maps to Spark's
partition-iterator execution; nothing to schedule by hand.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import ACTUAL_TRUNCATE, Code
from .base import Rule, RuleSet, typed_empty_array, violation_struct


@dataclass(frozen=True)
class ArrayRuleSet(RuleSet):
    item_rule_set: Optional[RuleSet] = None
    item_type: str = "string"

    SPARK_TYPE: str = "array"

    def with_item_rule_set(self, rs: RuleSet) -> "ArrayRuleSet":
        """Last call wins (reference slice.go:128-137)."""
        return self._clone(item_rule_set=rs, item_type=rs.SPARK_TYPE)

    def min_len(self, n: int) -> "ArrayRuleSet":
        return self._with_rule(Rule(
            Code.MIN_LEN, lambda c: F.size(c) >= n,
            f"array must have at least {n} items", conflict_key="min_len",
            params={"n": n}))

    def max_len(self, n: int) -> "ArrayRuleSet":
        # The reference early-stops item validation past max (anti-DoS,
        # slice.go:300-309). size() is O(1) on materialized arrays; for
        # expensive item rules we gate them behind the size check below.
        return self._with_rule(Rule(
            Code.MAX_LEN, lambda c: F.size(c) <= n,
            f"array must have at most {n} items", conflict_key="max_len",
            params={"n": n}))

    def coerce(self, col: Column, input_type: str):
        if input_type.startswith("array"):
            return col, F.lit(True), Code.TYPE
        return super().coerce(col, input_type)

    def compile_violations(self, col, field_path, input_type=None, presence=None):
        base = super().compile_violations(col, field_path, input_type, presence)
        if self.item_rule_set is None:
            return base
        irs = self.item_rule_set

        # Per-item: one violation per failing item, path `<field>/<index>`
        # (reference item loop slice.go:311-344, per-index paths 321-327).
        def item_viol(x: Column, i: Column) -> Column:
            ok = F.coalesce(
                F.lit(True) if not irs.rules else
                _all_pass(irs, x), F.lit(False))
            null_bad = x.isNull() & F.lit(not (irs.allow_nil and not irs.required))
            fail = null_bad | (~x.isNull() & ~ok)
            return F.when(fail, violation_struct(
                F.concat(F.lit(field_path + "/"), i.cast("string")),
                F.when(x.isNull(),
                       F.lit(Code.REQUIRED if irs.required else Code.NULL))
                 .otherwise(F.lit(_first_fail_code(irs))),
                "item failed item rule set",
                F.substring(x.cast("string"), 1, ACTUAL_TRUNCATE),
            ))

        def _all_pass(rs: RuleSet, x: Column) -> Column:
            acc = F.lit(True)
            for r in rs.rules:
                acc = acc & F.coalesce(r.predicate(x), F.lit(False))
            return acc

        def _first_fail_code(rs: RuleSet) -> str:
            return rs.rules[0].rule_id if rs.rules else Code.UNKNOWN

        max_rules = [r for r in self.rules if r.conflict_key == "max_len"]
        items = F.array_compact(
            F.zip_with(
                col,
                F.sequence(F.lit(0), F.greatest(F.size(col) - 1, F.lit(0))),
                item_viol,
            )
        )
        if max_rules:
            # gate expensive item validation when the array exceeds max_len
            # (mirrors the reference's proactive early stop)
            n = max_rules[0].params["n"]
            items = F.when(F.size(col) <= n, items).otherwise(typed_empty_array())
        items = F.when(col.isNull() | (F.size(col) == 0),
                       typed_empty_array()).otherwise(items)
        return F.concat(base, items)


def Slice() -> ArrayRuleSet:
    return ArrayRuleSet()
