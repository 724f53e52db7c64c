"""Object rule set — the row validator.

Reference: /root/reference/pkg/rules/object.go (981 LoC):
- Struct()/StringMap()/Map() constructors: object.go:44-128
- WithKey: object.go:200-209; WithConditionalKey: object.go:306-359
  (dependency tracking object.go:370-382; circular deps panic at build
  time via DFS, reftracker.go:8-78)
- WithDynamicKey: object.go:211-235; WithUnknown: object.go:160-173
  (unknown keys ⇒ UNEXPECTED, knownKeys.go:44-77, object.go:647-656)
- WithJson: object.go:818-846,889-897
- whole-object rules after key rules: object.go:899-911,662-693
- per-key goroutine parallelism + counters: object.go:589-625,
  counter.go:10-117 — SUPERSEDED here by Spark's columnar data
  parallelism; conditional ordering becomes `when()` expression nesting
  (SURVEY.md §3 entry point B).

Compilation: ONE projection over the input DataFrame computes every
field's violations array plus whole-object rule violations, concatenated
into a single ``violations`` array<struct> column — a single Catalyst
stage, whole-stage-codegen'd, no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import Code, CompileError
from .base import RuleSet, typed_empty_array, violation_struct

ColumnsFn = Callable[[Callable[[str], Column]], Column]


@dataclass(frozen=True)
class ObjectRule:
    """Whole-object (cross-column) rule. ``predicate`` receives a column
    resolver ``get(name) -> Column`` and returns True when the row passes
    (reference WithRule on object, object.go:899-911)."""

    rule_id: str
    predicate: ColumnsFn
    message: str
    field_path: str = "/"
    actual: Optional[ColumnsFn] = None


@dataclass(frozen=True)
class KeySpec:
    name: str
    rule_set: RuleSet
    condition: Optional[ColumnsFn] = None     # conditional key
    condition_deps: tuple = ()                # names the condition reads
    dynamic_pattern: Optional[str] = None     # regex over column names


@dataclass(frozen=True)
class ObjectRuleSet(RuleSet):
    keys: tuple = ()
    object_rules: tuple = ()
    allow_unknown: bool = False
    from_json: bool = False
    json_source: str = ""
    bucket_specs: tuple = ()

    SPARK_TYPE: str = "struct"

    # -- builders ------------------------------------------------------------

    def with_key(self, name: str, rs: RuleSet) -> "ObjectRuleSet":
        """Multiple rules per key allowed (reference object.go:200-209)."""
        return self._clone(keys=self.keys + (KeySpec(name, rs),))

    def with_conditional_key(
        self, name: str, condition: ColumnsFn, rs: RuleSet, deps: tuple = ()
    ) -> "ObjectRuleSet":
        """Key rules run only when ``condition`` over the whole row passes
        (reference object.go:306-359). Dependencies are checked for cycles at
        build time like reftracker.go:8-78."""
        out = self._clone(keys=self.keys + (KeySpec(
            name, rs, condition=condition, condition_deps=tuple(deps)),))
        out._check_cycles()
        return out

    def with_dynamic_key(self, pattern: str, rs: RuleSet) -> "ObjectRuleSet":
        """Apply ``rs`` to every column whose name matches ``pattern``
        (reference WithDynamicKey over map keys, object.go:211-235 — for a
        fixed schema, keys are column names matched at compile time)."""
        return self._clone(keys=self.keys + (KeySpec(
            f"~{pattern}", rs, dynamic_pattern=pattern),))

    def with_unknown(self) -> "ObjectRuleSet":
        return self._clone(allow_unknown=True)

    def with_dynamic_bucket(self, pattern: str, bucket: str) -> "ObjectRuleSet":
        """Struct-side dynamic buckets (reference WithDynamicBucket over
        struct output, object.go:237-264 + setter.go:30-52): undeclared
        columns whose name matches ``pattern`` are routed into the
        ``map<string,string>`` bucket named ``bucket`` instead of
        tripping UNEXPECTED. Columns with explicit key rules are never
        bucketed; a column matching several buckets lands in all of
        them. Retrieve the routed maps with :meth:`bucket_output`;
        :meth:`apply` drops routed columns from the top level and
        appends one map column per bucket."""
        from .map_ import MapBucketSpec
        return self._clone(bucket_specs=self.bucket_specs + (
            MapBucketSpec(pattern, bucket),))

    def with_conditional_dynamic_bucket(
            self, pattern: str, condition: ColumnsFn,
            bucket: str) -> "ObjectRuleSet":
        """Like :meth:`with_dynamic_bucket` but routes a row's value only
        when ``condition(get)`` holds for that row (reference
        WithConditionalDynamicBucket, object.go:266-279). The SCHEMA is
        fixed, so when the condition fails the column still exists at
        top level and trips UNEXPECTED for that row (unless
        :meth:`with_unknown`) — the per-row analog of the reference's
        unconsumed-key behavior."""
        from .map_ import MapBucketSpec
        return self._clone(bucket_specs=self.bucket_specs + (
            MapBucketSpec(pattern, bucket, condition),))

    def with_json(self, source_col: str) -> "ObjectRuleSet":
        """Parse a JSON string column into the declared keys first
        (reference WithJson, object.go:818-846) — compiled to
        ``from_json`` with a schema derived from the declared key types."""
        return self._clone(from_json=True, json_source=source_col)

    def with_rule(self, rule: ObjectRule) -> "ObjectRuleSet":  # type: ignore[override]
        return self._clone(object_rules=self.object_rules + (rule,))

    def with_rule_func(self, fn: ColumnsFn, rule_id: str = Code.UNKNOWN,
                       message: str = "", field_path: str = "/") -> "ObjectRuleSet":  # type: ignore[override]
        return self.with_rule(ObjectRule(rule_id, fn, message or f"object rule {rule_id}",
                                         field_path))

    def key_rules(self):
        """Introspection (reference KeyRules(), object.go:289-304)."""
        return {k.name: k.rule_set for k in self.keys}

    # -- build-time validation ------------------------------------------------

    def _check_cycles(self):
        """DFS cycle check over conditional-key dependencies (the reference
        panics at build time, reftracker.go:40-50)."""
        deps = {k.name: set(k.condition_deps) for k in self.keys if k.condition}
        WHITE, GREY, BLACK = 0, 1, 2
        color = {n: WHITE for n in deps}

        def dfs(n):
            color[n] = GREY
            for m in deps.get(n, ()):
                if color.get(m, BLACK) == GREY:
                    raise CompileError(
                        f"circular conditional-key dependency involving {n!r}")
                if color.get(m) == WHITE:
                    dfs(m)
            color[n] = BLACK

        for n in list(deps):
            if color[n] == WHITE:
                dfs(n)

    # -- compilation -----------------------------------------------------------

    def _resolve_keys(self, df_columns, df_types) -> list:
        import re
        specs = []
        for k in self.keys:
            if k.dynamic_pattern:
                pat = re.compile(k.dynamic_pattern)
                for c in df_columns:
                    if pat.fullmatch(c):
                        specs.append(replace(k, name=c, dynamic_pattern=None))
            else:
                specs.append(k)
        return specs

    def compile_violations_column(
        self, df: DataFrame, decoded: Optional[dict] = None
    ) -> Column:
        """Build the single ``violations`` array column for ``df``.

        ``decoded`` optionally maps field name -> decoded-struct Column
        (from the audio Arrow stage) so consistency rules can reference it.
        """
        dtypes = dict(df.dtypes)
        get = lambda name: F.col(name)  # noqa: E731
        parts = []

        specs = self._resolve_keys(df.columns, dtypes)
        declared = {s.name for s in specs}
        if self.from_json:
            # build a struct schema from declared key types and parse once
            ddl = ", ".join(f"{s.name} {s.rule_set.SPARK_TYPE}" for s in specs
                            if s.rule_set.SPARK_TYPE not in ("struct", "any", "array"))
            parsed = F.from_json(F.col(self.json_source), ddl)
            get = lambda name: parsed[name]  # noqa: E731
            dtypes = {s.name: s.rule_set.SPARK_TYPE for s in specs}

        for s in specs:
            if not self.from_json and s.name not in dtypes:
                if s.rule_set.required:
                    # missing key + required ⇒ REQUIRED (object.go:493-500)
                    parts.append(F.array(violation_struct(
                        f"/{s.name}", Code.REQUIRED,
                        "required field missing from schema", F.lit(None))))
                    continue
                raise CompileError(f"column {s.name!r} not in DataFrame "
                                   f"({sorted(dtypes)})")
            presence = None
            if s.condition is not None:
                presence = s.condition(get)
            parts.append(s.rule_set.compile_violations(
                get(s.name), f"/{s.name}",
                dtypes.get(s.name, s.rule_set.SPARK_TYPE), presence=presence))

        # unknown columns ⇒ UNEXPECTED unless with_unknown or routed to a
        # dynamic bucket (object.go:647-656; buckets object.go:237-279)
        if not self.allow_unknown and not self.from_json:
            import re
            for c in df.columns:
                if c not in declared and not c.startswith("_"):
                    matched = [s for s in self.bucket_specs
                               if re.search(s.pattern, c)]
                    if any(s.condition is None for s in matched):
                        continue  # unconditionally routed — never unknown
                    unexpected = F.array(violation_struct(
                        f"/{c}", Code.UNEXPECTED,
                        "unexpected field", F.lit(None)))
                    if matched:
                        # conditional buckets: unknown only on rows where
                        # NO routing condition holds
                        routed = matched[0].condition(get)
                        for s in matched[1:]:
                            routed = routed | s.condition(get)
                        unexpected = F.when(
                            ~F.coalesce(routed, F.lit(False)),
                            unexpected).otherwise(typed_empty_array())
                    parts.append(unexpected)

        # whole-object rules run after key rules (object.go:662-693)
        for r in self.object_rules:
            actual = r.actual(get) if r.actual else F.lit(None)
            parts.append(F.when(
                ~F.coalesce(r.predicate(get), F.lit(False)),
                F.array(violation_struct(r.field_path, r.rule_id, r.message, actual)),
            ).otherwise(typed_empty_array()))

        if not parts:
            return typed_empty_array()
        return F.concat(*parts)

    def validate(self, df: DataFrame, violations_col: str = "violations") -> DataFrame:
        """Entry point B (reference ObjectRuleSet.Apply, object.go:711-876):
        one projection appending the violations array."""
        return df.withColumn(violations_col, self.compile_violations_column(df))

    def _bucket_columns(self, df: DataFrame):
        """Per bucket spec: the undeclared columns it routes."""
        import re
        declared = {s.name for s in self._resolve_keys(df.columns,
                                                       dict(df.dtypes))}
        out = []
        for spec in self.bucket_specs:
            out.append((spec, [c for c in df.columns
                               if c not in declared
                               and not c.startswith("_")
                               and re.search(spec.pattern, c)]))
        return out

    def bucket_output(self, df: DataFrame) -> Column:
        """The routed buckets for a struct row, as
        ``map<bucket_name, map<column, value-as-string>>`` — the struct
        analog of :meth:`MapRuleSet.bucket_output` (setter.go SetBucket:
        a bucket key exists only when at least one column routed).
        Values stringify because a fixed-schema bucket map must pick one
        value type; the reference's ``map[string]any`` has no Spark
        equivalent."""
        get = lambda name: F.col(name)  # noqa: E731
        entries = []
        for spec, cols in self._bucket_columns(df):
            if not cols:
                continue
            m = F.map_from_arrays(
                F.array(*[F.lit(c) for c in cols]),
                F.array(*[F.col(c).cast("string") for c in cols]))
            if spec.condition is not None:
                m = F.when(F.coalesce(spec.condition(get), F.lit(False)),
                           m).otherwise(
                    F.map_from_entries(F.array().cast(
                        "array<struct<key:string,value:string>>")))
            entries.append(F.struct(F.lit(spec.bucket).alias("key"),
                                    m.alias("value")))
        if not entries:
            return F.map_from_entries(F.array().cast(
                "array<struct<key:string,value:map<string,string>>>"))
        arr = F.filter(F.array(*entries), lambda e: F.size(e["value"]) > 0)
        return F.map_from_entries(arr)

    def apply(self, df: DataFrame, violations_col: str = "violations") -> DataFrame:
        """Full Apply semantics (reference object.go:711-876): coerce →
        evaluate → ASSIGN. Declared key columns are replaced by their
        coerced, typed, output-formatted values (NULL where the lossless
        coercion check failed — the reference never assigns on coercion
        failure, string.go:149-174); undeclared columns pass through;
        the violations array (computed on the ORIGINAL values) is
        appended. One projection, same scan."""
        dtypes = dict(df.dtypes)
        violations = self.compile_violations_column(df)
        specs = {s.name: s for s in self._resolve_keys(df.columns, dtypes)
                 if s.name in dtypes}
        # columns consumed by an UNconditional bucket leave the top level
        # (setter.go:30-52: routed keys are set on the bucket field, not
        # the struct); conditionally routed columns keep their top-level
        # slot — the schema cannot vary per row
        consumed = set()
        for spec, bcols in self._bucket_columns(df):
            if spec.condition is None:
                consumed.update(bcols)
        cols = []
        for c in df.columns:
            if c in consumed:
                continue
            s = specs.get(c)
            if s is not None and s.rule_set.SPARK_TYPE not in ("struct", "any"):
                cols.append(s.rule_set.coerced(F.col(c), dtypes[c]).alias(c))
            else:
                cols.append(F.col(c))
        if self.bucket_specs:
            buckets = self.bucket_output(df)
            # one map<string,string> column per distinct bucket name;
            # NULL where nothing routed (the map analog omits the key)
            for bname in dict.fromkeys(s.bucket for s in self.bucket_specs):
                cols.append(F.element_at(buckets, F.lit(bname)).alias(bname))
        if self.from_json:
            # parsed keys appended as typed top-level columns
            ddl = ", ".join(
                f"{s.name} {s.rule_set.SPARK_TYPE}"
                for s in self._resolve_keys(df.columns, dtypes)
                if s.rule_set.SPARK_TYPE not in ("struct", "any", "array"))
            parsed = F.from_json(F.col(self.json_source), ddl)
            for s in self._resolve_keys(df.columns, dtypes):
                if s.rule_set.SPARK_TYPE not in ("struct", "any", "array"):
                    cols.append(parsed[s.name].alias(s.name))
        return df.select(*cols, violations.alias(violations_col))

    def violations(self, df: DataFrame, row_key_cols=(), extra_cols=()) -> DataFrame:
        """Exploded violation rows: (row keys..., field_path, rule_id,
        message, actual) — the reference's ValidationErrorCollection
        (errors/collection.go:7-141) as a DataFrame."""
        v = self.validate(df)
        keep = [F.col(c) for c in (*row_key_cols, *extra_cols)]
        # explode_outer + isNotNull — NOT plain explode: Catalyst's
        # InferFiltersFromGenerate adds `size(violations) > 0` below a
        # non-outer Generate, and after alias substitution that duplicates
        # the whole violations expression (including the Arrow decode UDF)
        # into a Filter ⇒ every rule and decode ran TWICE per row. The
        # outer variant is exempt from that rule; filtering on the
        # generated attribute cannot be pushed below the Generate.
        return (
            v.select(*keep, F.explode_outer("violations").alias("_v"))
             .filter(F.col("_v").isNotNull())
             .select(*keep, "_v.field_path", "_v.rule_id", "_v.message", "_v.actual")
        )


def Object() -> ObjectRuleSet:
    """Constructor mirroring ``rules.Struct[T]()`` (object.go:44-108); in
    Spark the "struct" is the DataFrame row and keys are columns."""
    return ObjectRuleSet(allow_unknown=False)


def StringMap() -> ObjectRuleSet:
    return ObjectRuleSet(allow_unknown=True)
