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

        # Per-item ACCUMULATE-ALL: one violation per failing rule per item
        # (reference item loop slice.go:311-344 appends every rule's error;
        # per-index paths 321-327). Each item yields an array of violation
        # structs which the outer flatten collapses.
        def item_viols(x: Column, i: Column) -> Column:
            path = F.concat(F.lit(field_path + "/"), i.cast("string"))
            actual = F.substring(x.cast("string"), 1, ACTUAL_TRUNCATE)
            null_bad = x.isNull() & F.lit(not (irs.allow_nil and not irs.required))
            entries = [F.when(null_bad, violation_struct(
                path,
                F.lit(Code.REQUIRED if irs.required else Code.NULL),
                "item is required" if irs.required
                else "item may not be null",
                actual))]
            for r in irs.rules:
                fail = ~x.isNull() & ~F.coalesce(r.predicate(x), F.lit(False))
                entries.append(F.when(fail, violation_struct(
                    path, F.lit(irs.err_code or r.rule_id),
                    irs.err_message or r.message, actual)))
            return F.array_compact(F.array(*entries))

        max_rules = [r for r in self.rules if r.conflict_key == "max_len"]
        items = F.flatten(
            F.zip_with(
                col,
                F.sequence(F.lit(0), F.greatest(F.size(col) - 1, F.lit(0))),
                item_viols,
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
