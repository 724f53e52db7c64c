"""Error model: codes, violation row shape, field-path serializers.

Mirrors the reference error model:
- codes: /root/reference/pkg/errors/codes.go:9-30
- ValidationError shape (code + path + message + actual):
  /root/reference/pkg/errors/validation_error.go:11-40
- path serializers (default, dot, JSON Pointer RFC 6901, JSONPath):
  /root/reference/pkg/errors/path_serializer_default.go:11-49
  /root/reference/pkg/errors/path_serializer_dot.go:13-41
  /root/reference/pkg/errors/path_serializer_json_pointer.go:9-35
  /root/reference/pkg/errors/path_serializer_jsonpath.go:13-50
- actual-value truncation to 50 chars: /root/reference/internal/util/util.go:14-20

Engine extensions (dataset-level checks the reference cannot express, per
SURVEY.md §2.9): UNIQUE, REF, DRIFT, DECODE, CONSISTENT.
"""

from __future__ import annotations


class Code:
    """Stable rule ids (string codes, reference codes.go:9-30)."""

    UNKNOWN = "UNKNOWN"
    INTERNAL = "INTERNAL"
    TIMEOUT = "TIMEOUT"
    CANCELED = "CANCELED"
    TYPE = "TYPE"
    RANGE = "RANGE"
    REQUIRED = "REQUIRED"
    UNEXPECTED = "UNEXPECTED"
    MIN = "MIN"
    MAX = "MAX"
    MIN_EXCLUSIVE = "MIN_EXCLUSIVE"
    MAX_EXCLUSIVE = "MAX_EXCLUSIVE"
    MIN_LEN = "MIN_LEN"
    MAX_LEN = "MAX_LEN"
    PATTERN = "PATTERN"
    EXPIRED = "EXPIRED"
    DENIED = "DENIED"
    NOTALLOWED = "NOTALLOWED"
    ENCODING = "ENCODING"
    NULL = "NULL"
    # --- engine extensions (dataset-level; SURVEY.md §2.9) ---
    UNIQUE = "UNIQUE"
    REF = "REF"
    DRIFT = "DRIFT"
    DECODE = "DECODE"
    CONSISTENT = "CONSISTENT"


#: DDL of one violation row / array element. Every rule in the engine emits
#: this exact shape so arrays from different fields concat cleanly.
VIOLATION_STRUCT_DDL = (
    "struct<field_path:string,rule_id:string,message:string,actual:string>"
)
VIOLATION_ARRAY_DDL = f"array<{VIOLATION_STRUCT_DDL}>"

#: Max chars of the offending value kept in a violation row
#: (reference internal/util/util.go:14-20 truncates to 50).
ACTUAL_TRUNCATE = 50


class CompileError(Exception):
    """Raised at DSL-compile time (strict type mismatch, dependency cycle,
    unknown column) — the analog of the reference's build-time panics
    (e.g. circular conditional-key deps, reftracker.go:40-50)."""


# ---------------------------------------------------------------------------
# Path serializers. Segments are strings (keys) or ints (array indices).
# ---------------------------------------------------------------------------

def path_default(segments) -> str:
    """``/a/b/0`` — reference path_serializer_default.go:11-49."""
    return "/" + "/".join(str(s) for s in segments)


def path_dot(segments) -> str:
    """``a.b[0]`` — reference path_serializer_dot.go:13-41."""
    out = []
    for s in segments:
        if isinstance(s, int):
            out.append(f"[{s}]")
        else:
            out.append(("." if out else "") + str(s))
    return "".join(out)


def path_json_pointer(segments) -> str:
    """RFC 6901 — reference path_serializer_json_pointer.go:9-35."""
    def esc(s):
        return str(s).replace("~", "~0").replace("/", "~1")
    return "/" + "/".join(esc(s) for s in segments)


def path_jsonpath(segments) -> str:
    """``$.a.b[0]`` — reference path_serializer_jsonpath.go:13-50."""
    out = ["$"]
    for s in segments:
        if isinstance(s, int):
            out.append(f"[{s}]")
        else:
            out.append(f".{s}")
    return "".join(out)


SERIALIZERS = {
    "default": path_default,
    "dot": path_dot,
    "json_pointer": path_json_pointer,
    "jsonpath": path_jsonpath,
}
