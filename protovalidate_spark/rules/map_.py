"""Map rule set — validation over MapType columns.

Reference: ``Map[K,V]()`` / ``StringMap[T]()`` (object.go:112-128) with
``WithKey`` (200-209), ``WithDynamicKey`` (211-235; key-rule matching →
here a regex over entry keys), ``WithUnknown`` (160-173; unknown keys ⇒
UNEXPECTED, knownKeys.go:44-77).

Unlike :class:`ObjectRuleSet` (whose "object" is the DataFrame row and
whose keys are columns), this validates a single ``map<string,V>``
COLUMN: fixed keys via ``element_at`` + ``map_contains_key`` (missing +
required ⇒ REQUIRED, exactly like object.go:493-500), dynamic keys and
unknown-key detection via higher-order functions over ``map_entries`` —
all JVM-side, no shuffle, whole-stage-codegen'd.

Violation paths are ``<field>/<entry key>`` (dynamic — the path is a
Column; ``violation_struct`` accepts Columns).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import Code
from .base import RuleSet, typed_empty_array, violation_struct


@dataclass(frozen=True)
class MapKeySpec:
    name: str
    rule_set: RuleSet
    pattern: Optional[str] = None   # dynamic key regex


@dataclass(frozen=True)
class MapBucketSpec:
    """Dynamic-bucket routing rule (reference WithDynamicBucket /
    WithConditionalDynamicBucket, object.go:237-279): entries whose key
    matches ``pattern`` (and pass ``condition``, if any) are routed into
    the output bucket map named ``bucket``."""
    pattern: str
    bucket: str
    condition: Optional[Callable[[Column], Column]] = None


def _value_type(input_type: str) -> str:
    """``map<string,int>`` → ``int`` (top-level comma split)."""
    if not input_type.startswith("map<"):
        return "string"
    body = input_type[4:-1]
    depth = 0
    for i, ch in enumerate(body):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            return body[i + 1:].strip()
    return "string"


@dataclass(frozen=True)
class MapRuleSet(RuleSet):
    map_keys: tuple = ()
    allow_unknown: bool = False
    bucket_specs: tuple = ()

    SPARK_TYPE: str = "map"

    def with_key(self, name: str, rs: RuleSet) -> "MapRuleSet":
        return self._clone(map_keys=self.map_keys + (MapKeySpec(name, rs),))

    def with_dynamic_key(self, pattern: str, rs: RuleSet) -> "MapRuleSet":
        """Apply ``rs`` to every entry whose key matches ``pattern``
        (reference WithDynamicKey, object.go:211-235)."""
        return self._clone(map_keys=self.map_keys + (
            MapKeySpec(f"~{pattern}", rs, pattern=pattern),))

    def with_dynamic_bucket(self, pattern: str, bucket: str) -> "MapRuleSet":
        """Route entries whose key matches ``pattern`` into the output
        bucket map ``bucket`` (reference WithDynamicBucket,
        object.go:237-264). Matching keys are no longer "unknown"; keys
        with explicit ``with_key`` rules are never bucketed; a key
        matching several buckets lands in all of them. Retrieve the
        routed maps with :meth:`bucket_output`."""
        return self._clone(bucket_specs=self.bucket_specs + (
            MapBucketSpec(pattern, bucket),))

    def with_conditional_dynamic_bucket(
            self, pattern: str, condition: Callable[[Column], Column],
            bucket: str) -> "MapRuleSet":
        """Like :meth:`with_dynamic_bucket` but routes only when
        ``condition(map_col)`` holds (reference
        WithConditionalDynamicBucket, object.go:266-279). When no
        condition matches, the key stays "unknown" and trips UNEXPECTED
        (unless :meth:`with_unknown`)."""
        return self._clone(bucket_specs=self.bucket_specs + (
            MapBucketSpec(pattern, bucket, condition),))

    def with_unknown(self) -> "MapRuleSet":
        return self._clone(allow_unknown=True)

    def key_rules(self):
        return {k.name: k.rule_set for k in self.map_keys}

    def bucket_output(self, col: Column) -> Column:
        """The routed buckets for a map column, as
        ``map<bucket_name, map<key, value>>`` — computed with
        ``map_filter`` per bucket, all JVM-side. Mirrors the reference's
        setter semantics (setter.go SetBucket): a bucket key exists only
        once at least one entry matched."""
        fixed = [s.name for s in self.map_keys if s.pattern is None]

        def matcher(spec):
            def fn(k, v):
                m = k.rlike(spec.pattern)
                for name in fixed:
                    m = m & (k != F.lit(name))
                if spec.condition is not None:
                    m = m & F.coalesce(spec.condition(col), F.lit(False))
                return m
            return fn

        entries = [
            F.struct(F.lit(spec.bucket).alias("key"),
                     F.map_filter(col, matcher(spec)).alias("value"))
            for spec in self.bucket_specs
        ]
        if not entries:
            return F.map_from_entries(F.array().cast(
                "array<struct<key:string,value:map<string,string>>>"))
        arr = F.filter(F.array(*entries), lambda e: F.size(e["value"]) > 0)
        return F.map_from_entries(arr)

    def coerce(self, col: Column, input_type: str):
        if input_type.startswith("map"):
            return col, F.lit(True), Code.TYPE
        return super().coerce(col, input_type)

    # ------------------------------------------------------------------

    def compile_violations(self, col, field_path, input_type=None,
                           presence=None):
        base = super().compile_violations(col, field_path, input_type,
                                          presence)
        input_type = input_type or "map<string,string>"
        vt = _value_type(input_type)
        parts = []

        fixed = [k for k in self.map_keys if k.pattern is None]
        dynamic = [k for k in self.map_keys if k.pattern is not None]

        for spec in fixed:
            value = F.element_at(col, spec.name)
            inner = spec.rule_set.compile_violations(
                value, f"{field_path}/{spec.name}", vt)
            has = F.map_contains_key(col, spec.name)
            missing = (
                F.array(violation_struct(
                    f"{field_path}/{spec.name}", Code.REQUIRED,
                    "required key missing", F.lit(None)))
                if spec.rule_set.required else typed_empty_array())
            parts.append(F.when(has, inner).otherwise(missing))

        # NB: Spark higher-order lambdas must have EXACTLY the lambda-var
        # arity — default args count as parameters and break _create_lambda
        # — so captures go through closure factories, never defaults.
        def _key_matcher(pattern):
            return lambda e: e["key"].rlike(pattern)

        def _entry_viol(rs):
            def fn(e):
                v = e["value"]
                null_bad = v.isNull() & F.lit(
                    not (rs.allow_nil and not rs.required))
                rule_bad = v.isNotNull() & ~F.coalesce(
                    _all_pass(rs, v), F.lit(False))
                code = F.when(
                    v.isNull(),
                    F.lit(Code.REQUIRED if rs.required else Code.NULL)
                ).otherwise(F.lit(_first_code(rs)))
                return F.when(null_bad | rule_bad, violation_struct(
                    F.concat(F.lit(field_path + "/"), e["key"]),
                    code, "map entry failed its rule set", v))
            return fn

        for spec in dynamic:
            entries = F.filter(F.map_entries(col),
                               _key_matcher(spec.pattern))
            # one entry per failing map entry; path carries the entry key
            parts.append(F.array_compact(
                F.transform(entries, _entry_viol(spec.rule_set))))

        if not self.allow_unknown:
            known = [s.name for s in fixed]
            def is_unknown(e):
                cond = F.lit(True)
                for k in known:
                    cond = cond & (e["key"] != F.lit(k))
                for spec in dynamic:
                    cond = cond & ~e["key"].rlike(spec.pattern)
                # bucket-routed keys are not unknown (object.go:246-249);
                # a conditional bucket only claims the key when its
                # condition holds (object.go:277-279)
                for bspec in self.bucket_specs:
                    m = e["key"].rlike(bspec.pattern)
                    if bspec.condition is not None:
                        m = m & F.coalesce(bspec.condition(col), F.lit(False))
                    cond = cond & ~m
                return cond
            unexpected = F.transform(
                F.filter(F.map_entries(col), is_unknown),
                lambda e: violation_struct(
                    F.concat(F.lit(field_path + "/"), e["key"]),
                    F.lit(Code.UNEXPECTED), "unexpected key", e["value"]))
            parts.append(unexpected)

        if not parts:
            return base
        entries_arr = F.concat(*parts) if len(parts) > 1 else parts[0]
        entries_arr = F.when(col.isNull(), typed_empty_array()) \
                       .otherwise(entries_arr)
        return F.concat(base, entries_arr)


def _all_pass(rs: RuleSet, v: Column) -> Column:
    acc = F.lit(True)
    for r in rs.rules:
        acc = acc & F.coalesce(r.predicate(v), F.lit(False))
    return acc


def _first_code(rs: RuleSet) -> str:
    return rs.rules[0].rule_id if rs.rules else Code.UNKNOWN


def Map() -> MapRuleSet:
    """``rules.Map[K,V]()`` — unknown keys are UNEXPECTED by default."""
    return MapRuleSet()


def MapOfStrings() -> MapRuleSet:
    """``rules.StringMap[T]()`` analog for MapType columns: unknown keys
    pass through (reference StringMap semantics with WithUnknown)."""
    return MapRuleSet(allow_unknown=True)
