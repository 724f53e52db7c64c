"""Fluent rule-builder DSL (reference /root/reference/pkg/rules)."""

from .base import Rule, RuleSet, violation_struct, typed_empty_array  # noqa: F401
from .serde import (  # noqa: F401
    SerdeError, load_ruleset, ruleset_from_dict, ruleset_to_dict,
    save_ruleset,
)
from .string import String, StringRuleSet  # noqa: F401
from .numeric import (  # noqa: F401
    Float32, Float64, FloatRuleSet, Int, Int8, Int16, Int32, Int64,
    IntRuleSet, Uint8, Uint16, Uint32, Uint64,
)
from .boolean import Bool, BoolRuleSet  # noqa: F401
from .temporal import Duration, DurationRuleSet, Time, TimeRuleSet  # noqa: F401
from .binary import Binary, BinaryRuleSet  # noqa: F401
from .array_ import ArrayRuleSet, Slice  # noqa: F401
from .vector import Vector, VectorRuleSet, l2_norm  # noqa: F401
from .map_ import Map, MapOfStrings, MapRuleSet  # noqa: F401
from .misc import Any, AnyRuleSet, Constant, ConstantRuleSet, Interface  # noqa: F401
from .net import (  # noqa: F401
    IP, URI, Domain, DomainRuleSet, Email, EmailRuleSet, IPRuleSet,
    Query, QueryRuleSet, URIRuleSet,
)
from .object import Object, ObjectRule, ObjectRuleSet, StringMap  # noqa: F401
