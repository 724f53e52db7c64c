"""Rule-set serialization: fluent DSL ⇄ JSON-able dicts.

The reference keeps rule sets as in-process Go values and offers only a
debug ``String()`` form (/root/reference/pkg/rules/rule.go:34-40,
internal/util/util.go:24-58). At dataset scale the standard companion
(a Deequ VerificationSuite persisted to code, a Great Expectations
suite persisted to JSON) is a DECLARATIVE artifact: author or suggest
rules once, version them beside the table contract, load them in any
job. This module closes that loop for the engine's declarative
builders:

    doc = ruleset_to_dict(rules)          # JSON-able
    rules2 = ruleset_from_dict(doc)       # same violations output
    save_ruleset(rules, path) / load_ruleset(path)

Every rule in the engine carries (rule_id, conflict_key, params)
metadata precisely so the predicate lambda never needs pickling: the
loader REBUILDS each rule through the same public builder that created
it, so a round-tripped rule set is behaviorally identical by
construction (pinned in tests/test_serde.py by comparing compiled
violations row-for-row).

Coverage: the scalar core (string/int/float/bool/time/duration/binary/
any/constant — bounds, membership, lengths, pattern family, magic,
required/nil/strict, error customization, width/base/rounding/layout
fields) plus ObjectRuleSet nesting (with_key, with_dynamic_key,
with_unknown, with_json). Rules built from ARBITRARY CODE — WithRule /
WithRuleFunc lambdas, conditional keys (row-level lambda conditions),
struct bucket specs, the net family's composite rule sets — raise
``SerdeError`` with the offending piece named: a serialized artifact
must never silently drop a constraint.
"""

from __future__ import annotations

import datetime as _dt
import json
from dataclasses import MISSING as _MISSING
from dataclasses import fields as _dc_fields
from typing import Any

from .base import Rule, RuleSet


class SerdeError(ValueError):
    pass


def _kinds():
    # late imports: serde sits beside the rule modules
    from .array_ import ArrayRuleSet
    from .binary import BinaryRuleSet
    from .boolean import BoolRuleSet
    from .misc import AnyRuleSet, ConstantRuleSet
    from .numeric import FloatRuleSet, IntRuleSet
    from .object import ObjectRuleSet
    from .string import StringRuleSet
    from .temporal import DurationRuleSet, TimeRuleSet
    return {
        "string": StringRuleSet, "int": IntRuleSet, "float": FloatRuleSet,
        "bool": BoolRuleSet, "time": TimeRuleSet,
        "duration": DurationRuleSet, "binary": BinaryRuleSet,
        "any": AnyRuleSet, "constant": ConstantRuleSet,
        "array": ArrayRuleSet, "object": ObjectRuleSet,
    }


# -- value encoding ---------------------------------------------------------

def _enc(v: Any):
    if isinstance(v, _dt.datetime):
        return {"$dt": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"$date": v.isoformat()}
    if isinstance(v, _dt.timedelta):
        return {"$td": v.total_seconds()}
    if isinstance(v, bytes):
        return {"$hex": v.hex()}
    if isinstance(v, (tuple, list)):
        return [_enc(x) for x in v]
    if isinstance(v, dict):
        return {k: _enc(x) for k, x in v.items()}
    if v is None or isinstance(v, (str, int, float, bool)):
        return v
    raise SerdeError(f"cannot serialize param value {v!r}")


def _dec(v: Any):
    if isinstance(v, dict):
        if "$dt" in v:
            return _dt.datetime.fromisoformat(v["$dt"])
        if "$date" in v:
            return _dt.date.fromisoformat(v["$date"])
        if "$td" in v:
            return _dt.timedelta(seconds=v["$td"])
        if "$hex" in v:
            return bytes.fromhex(v["$hex"])
        return {k: _dec(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_dec(x) for x in v]
    return v


# -- serialize --------------------------------------------------------------

_SKIP_FIELDS = {"rules", "keys", "object_rules", "bucket_specs",
                "item_rule_set", "item_type"}


def ruleset_to_dict(rs: RuleSet) -> dict:
    kinds = _kinds()
    kind = next((k for k, cls in kinds.items() if type(rs) is cls), None)
    if kind is None:
        raise SerdeError(
            f"{type(rs).__name__} has no serde kind (the net family and "
            f"map/vector rule sets are not serializable yet)")

    out: dict = {"kind": kind}
    for f in _dc_fields(rs):
        if f.name in _SKIP_FIELDS:
            continue
        v = getattr(rs, f.name)
        if f.default is not _MISSING and v == f.default:
            continue
        if f.default is _MISSING and f.default_factory is not _MISSING \
                and v == f.default_factory():
            continue
        out[f.name] = _enc(v)

    if kind == "constant":
        # interned equality set: the value field is the whole story
        out.pop("rules", None)
        return out

    if kind == "array" and rs.item_rule_set is not None:
        out["item_rule_set"] = ruleset_to_dict(rs.item_rule_set)
        out.pop("item_type", None)  # derived by with_item_rule_set

    if kind == "object":
        if rs.object_rules:
            raise SerdeError(
                "object-level with_rule lambdas are not serializable")
        if rs.bucket_specs:
            raise SerdeError("dynamic bucket specs are not serializable")
        keys = []
        for ks in rs.keys:
            if ks.condition is not None:
                raise SerdeError(
                    f"conditional key {ks.name!r} carries a row-level "
                    f"lambda condition and is not serializable")
            entry = {"name": ks.name,
                     "rule_set": ruleset_to_dict(ks.rule_set)}
            if ks.dynamic_pattern:
                entry["dynamic_pattern"] = ks.dynamic_pattern
            keys.append(entry)
        out["keys"] = keys

    rules = []
    for r in rs.rules:
        if _match_builder(r.rule_id, r.conflict_key, r.params,
                          r.message) is None:
            raise SerdeError(
                f"rule {r.rule_id}/{r.conflict_key} was built from a "
                f"custom predicate (with_rule/with_rule_func) and "
                f"cannot be serialized — a JSON artifact must never "
                f"silently drop a constraint")
        rules.append({
            "rule_id": r.rule_id,
            "conflict_key": r.conflict_key,
            "message": r.message,
            "params": _enc(r.params),
        })
    if rules:
        out["rules"] = rules
    return out


# -- rebuild ----------------------------------------------------------------

def _match_builder(rule_id: str, key, params: dict, message: str):
    """Return the rebuild callable for a rule's metadata, or None when
    no registered public builder produces this shape (custom
    with_rule/with_rule_func entries). Used by BOTH directions:
    serialization refuses eagerly, load re-invokes."""
    if key == "min" and "min" in params:
        return lambda rs: rs.min(params["min"])
    if key == "min" and "min_exclusive" in params:
        return lambda rs: rs.min_exclusive(params["min_exclusive"])
    if key == "max" and "max" in params:
        return lambda rs: rs.max(params["max"])
    if key == "max" and "max_exclusive" in params:
        return lambda rs: rs.max_exclusive(params["max_exclusive"])
    # Duration bounds store the SCALED ms value; feed it back as a
    # timedelta so the rebuild is unit-independent (temporal.py _to_ms)
    if key == "min" and "min_ms" in params:
        return lambda rs: rs.min(_dt.timedelta(milliseconds=params["min_ms"]))
    if key == "min" and "min_ms_exclusive" in params:
        return lambda rs: rs.min_exclusive(
            _dt.timedelta(milliseconds=params["min_ms_exclusive"]))
    if key == "max" and "max_ms" in params:
        return lambda rs: rs.max(_dt.timedelta(milliseconds=params["max_ms"]))
    if key == "max" and "max_ms_exclusive" in params:
        return lambda rs: rs.max_exclusive(
            _dt.timedelta(milliseconds=params["max_ms_exclusive"]))
    if key == "allowed":
        return lambda rs: rs.allowed_values(*params["values"])
    if key == "rejected":
        return lambda rs: rs.rejected_values(*params["values"])
    if key == "min_len":
        if params.get("chars"):
            return lambda rs: rs.min_len_chars(params["n"])
        return lambda rs: rs.min_len(params["n"])
    if key == "max_len":
        return lambda rs: rs.max_len(params["n"])
    if key == "forbidden":
        return lambda rs: rs.forbidden()
    if rule_id == "PATTERN":
        if "pattern" in params:
            return lambda rs: rs.regex(params["pattern"], message)
        if "substr" in params:
            return lambda rs: rs.contains(params["substr"])
        if "prefix" in params:
            return lambda rs: rs.starts_with(params["prefix"])
        if "suffix" in params:
            return lambda rs: rs.ends_with(params["suffix"])
    if rule_id == "ENCODING" and "magic" in params:
        return lambda rs: rs.magic(bytes.fromhex(params["magic"]))
    return None


def _rebuild_rule(rs: RuleSet, rule_id: str, key, params: dict,
                  message: str) -> RuleSet:
    fn = _match_builder(rule_id, key, params, message)
    if fn is None:
        raise SerdeError(
            f"no builder registered for rule {rule_id}/{key} with params "
            f"{sorted(params)} — custom with_rule/with_rule_func entries "
            f"cannot round-trip through JSON")
    return fn(rs)


def ruleset_from_dict(doc: dict) -> RuleSet:
    kinds = _kinds()
    kind = doc.get("kind")
    if kind not in kinds:
        raise SerdeError(f"unknown rule-set kind {kind!r}")

    if kind == "constant":
        from .misc import Constant
        return Constant(_dec(doc.get("value")))

    field_kw = {k: _dec(v) for k, v in doc.items()
                if k not in ("kind", "rules", "keys", "item_rule_set")}
    # tuples serialized as lists — restore tuple-typed fields
    for tk in ("layouts", "condition_deps"):
        if tk in field_kw and isinstance(field_kw[tk], list):
            field_kw[tk] = tuple(field_kw[tk])
    rs = kinds[kind](**field_kw)

    if kind == "array" and "item_rule_set" in doc:
        rs = rs.with_item_rule_set(ruleset_from_dict(doc["item_rule_set"]))

    if kind == "object":
        for entry in doc.get("keys", ()):
            child = ruleset_from_dict(entry["rule_set"])
            if entry.get("dynamic_pattern"):
                rs = rs.with_dynamic_key(entry["dynamic_pattern"], child)
            else:
                rs = rs.with_key(entry["name"], child)

    for r in doc.get("rules", ()):
        rs = _rebuild_rule(rs, r["rule_id"], r.get("conflict_key"),
                           _dec(r.get("params", {})), r.get("message", ""))
    return rs


# -- file convenience -------------------------------------------------------

def save_ruleset(rs: RuleSet, path: str) -> None:
    with open(path, "w") as f:
        json.dump(ruleset_to_dict(rs), f, indent=2, sort_keys=True)


def load_ruleset(path: str) -> RuleSet:
    with open(path) as f:
        return ruleset_from_dict(json.load(f))
