"""protovalidate_spark — a PySpark-native schema + constraint validation
engine reimplementing the semantics of proto-studio/protovalidate
(reference at /root/reference, read-only) as a declarative DSL compiled to
Catalyst DataFrame predicates and Arrow-vectorized UDFs, extended with
dataset-level checks (stats, uniqueness, referential integrity,
distribution drift, audio decode) per SURVEY.md / BASELINE.json.
"""

from .errors import (  # noqa: F401
    Code, CompileError, cap_exemplars, collection_status, error_type,
    violation_summary, violations_for, violations_for_as,
    with_error_type,
)
from .rules import (  # noqa: F401
    IP, URI, Any, Binary, Bool, Constant, Domain, Duration, Email,
    Float32, Float64, Int, Int8, Int16, Int32, Int64, Interface, Map,
    MapOfStrings, Object, ObjectRule, Query, Slice, String, Time, Uint8,
    Uint16, Uint32, Uint64, Vector,
)
from .rules import (  # noqa: F401
    SerdeError, load_ruleset, ruleset_from_dict, ruleset_to_dict,
    save_ruleset,
)
from .suite_serde import (  # noqa: F401
    load_suite, save_suite, suite_from_dict, suite_to_dict,
)

__version__ = "0.1.0"
