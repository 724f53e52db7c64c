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
    RECONCILE = "RECONCILE"
    MONOTONIC = "MONOTONIC"
    OUTLIER = "OUTLIER"


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


# ---------------------------------------------------------------------------
# Collection helpers (reference pkg/errors/collection.go:7-141 +
# dict.go:115-216 classification). A violations DataFrame IS the
# collection; these are the For(path) / Internal / Permission /
# Validation counterparts as DataFrame filters and aggregates.
# ---------------------------------------------------------------------------

ERROR_TYPE_VALIDATION = "validation"
ERROR_TYPE_PERMISSION = "permission"
ERROR_TYPE_INTERNAL = "internal"

#: code → classification (reference dict.go defaultEntries; unknown codes
#: fall back to internal, mirroring errorDict.Entry's default entry).
CODE_TYPES = {
    Code.UNKNOWN: ERROR_TYPE_INTERNAL,
    Code.INTERNAL: ERROR_TYPE_INTERNAL,
    Code.TIMEOUT: ERROR_TYPE_INTERNAL,
    Code.CANCELED: ERROR_TYPE_INTERNAL,
    Code.DENIED: ERROR_TYPE_PERMISSION,      # CodeForbidden
    Code.NOTALLOWED: ERROR_TYPE_PERMISSION,  # CodeNotAllowed
}


def error_type(code: str) -> str:
    """Classification of a rule id (validation | permission | internal)."""
    return CODE_TYPES.get(code, ERROR_TYPE_VALIDATION) \
        if code in _KNOWN_CODES else ERROR_TYPE_INTERNAL


_KNOWN_CODES = {v for k, v in vars(Code).items() if not k.startswith("_")}


def _parse_default_path(path: str, serializer: str = "default") -> list:
    """Segments of a path written in any supported serializer (the
    inverse of the serializer, driver-side — used to normalize a user's
    query path to the stored default form)."""
    import re
    if serializer in ("default", "json_pointer"):
        segs = [s for s in path.split("/") if s != ""]
        if serializer == "json_pointer":
            segs = [s.replace("~1", "/").replace("~0", "~") for s in segs]
    elif serializer in ("dot", "jsonpath"):
        body = path[2:] if serializer == "jsonpath" and path.startswith("$.") \
            else path.lstrip("$")
        segs = []
        for part in body.split("."):
            m = re.match(r"([^\[\]]*)((\[\d+\])*)$", part)
            if m and m.group(1):
                segs.append(m.group(1))
            for idx in re.findall(r"\[(\d+)\]", part):
                segs.append(int(idx))
    else:
        raise ValueError(f"unknown serializer {serializer!r}")
    return [int(s) if isinstance(s, str) and s.isdigit() else s
            for s in segs]


def violations_for(df, path: str, serializer: str = "default",
                   path_col: str = "field_path"):
    """Collection.For(path) / ForPathAs(path, serializer): the violation
    rows whose field path equals ``path``. The query path may be written
    in any supported serializer; it is normalized driver-side to the
    stored default form, so the filter is a plain pushable equality."""
    from pyspark.sql import functions as F
    canonical = path_default(_parse_default_path(path, serializer))
    return df.filter(F.col(path_col) == canonical)


def violations_for_as(df, path: str, serializer: str,
                      dtype: "str | None" = None,
                      path_col: str = "field_path",
                      actual_col: str = "actual",
                      out_col: str = "actual_typed"):
    """Collection.ForPathAs(path, serializer) (collection.go:85-102):
    identical filter to :func:`violations_for`, with the serializer
    REQUIRED — the reference compares ``err.PathAs(serializer) == path``;
    since every serializer is a bijection on path segments, normalizing
    the query to the stored default form is the same comparison, kept as
    a pushable equality instead of re-serializing every row.

    ``dtype`` is the typed-accessor half: the reference's Go caller gets
    ``ValidationError`` values back with their original Go type, whereas
    the violation frame stores ``actual`` stringified (util.go:14-20).
    When given, a ``try_cast(actual, dtype)`` column (``out_col``) is
    appended — NULL where the stored string does not parse as ``dtype``
    (e.g. a NOTALLOWED violation on a text field queried as double),
    mirroring Go's failed type assertion. Plain projection, no UDF."""
    from pyspark.sql import functions as F
    out = violations_for(df, path, serializer, path_col)
    if dtype is not None:
        out = out.withColumn(
            out_col, F.expr(f"try_cast(`{actual_col}` as {dtype})"))
    return out


def with_error_type(df, code_col: str = "rule_id",
                    out_col: str = "error_type"):
    """Append the classification column (validation | permission |
    internal) — one JVM map lookup, no UDF."""
    from pyspark.sql import functions as F
    pairs = []
    for code in sorted(_KNOWN_CODES):
        pairs += [F.lit(code), F.lit(error_type(code))]
    lookup = F.element_at(F.create_map(*pairs), F.col(code_col))
    return df.withColumn(
        out_col, F.coalesce(lookup, F.lit(ERROR_TYPE_INTERNAL)))


def collection_status(df, by=None, code_col: str = "rule_id"):
    """Per-group Internal()/Permission()/Validation() verdicts with the
    reference's precedence (collection.go:104-141): internal if ANY
    internal error; permission if any permission error and none
    internal; validation iff non-empty and neither. ``by=None`` treats
    the whole frame as one collection (single row); otherwise one row
    per group — a single aggregation either way."""
    from pyspark.sql import functions as F
    typed = with_error_type(df, code_col, "__etype")
    # coalesce: F.max over ZERO rows is NULL — an empty collection must
    # report internal=permission=False (collection.go), not None
    any_int = F.coalesce(
        F.max((F.col("__etype") == ERROR_TYPE_INTERNAL).cast("int")),
        F.lit(0)) == 1
    any_perm = F.coalesce(
        F.max((F.col("__etype") == ERROR_TYPE_PERMISSION).cast("int")),
        F.lit(0)) == 1
    n = F.count(F.lit(1))
    aggs = [
        any_int.alias("internal"),
        (~any_int & any_perm).alias("permission"),
        ((n > 0) & ~any_int & ~any_perm).alias("validation"),
        n.alias("n_errors"),
    ]
    if by:
        by = [by] if isinstance(by, str) else list(by)
        return typed.groupBy(*by).agg(*aggs)
    return typed.agg(*aggs)


def violation_summary(df, rule_cols=("field_path", "rule_id")):
    """Exact per-rule violation counts: one partial-aggregated groupBy,
    safe at any violation volume (output cardinality = distinct rules).
    The counting half of the cap-exemplars contract — counts always come
    from the full stream, exemplar ROWS may be capped."""
    from pyspark.sql import functions as F
    return df.groupBy(*rule_cols).agg(F.count(F.lit(1)).alias("violations"))


def cap_exemplars(df, order_cols, k: int,
                  rule_cols=("field_path", "rule_id")):
    """At most ``k`` exemplar rows per (field_path, rule_id) —
    deterministically the k smallest by ``order_cols`` (ascending, NULLs
    last; pass row-unique keys for a stable result).

    Skew story — why a plain rank window is safe here: Spark rewrites a
    ``row_number() <= k`` filter into a PARTIAL ``WindowGroupLimit``
    BEFORE the exchange (SPARK-37099, pinned in test_plans), so each map
    partition ships at most k rows per rule. A pervasive rule's shuffle
    volume is therefore P·k (P = map partitions), never its raw
    violation count — the reduce side of the hottest rule receives a
    bounded frame, identical to a hand-rolled two-phase
    partition-local/global top-k but with one less shuffle. Take counts
    BEFORE capping (``violation_summary`` or an ``Observation`` on the
    pre-cap plan) — verdicts stay exact while the materialized rows
    stay bounded."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    if not order_cols:
        raise ValueError(
            "cap_exemplars needs order_cols (row keys) — the kept "
            "exemplars must be deterministic")
    w = Window.partitionBy(*rule_cols).orderBy(
        *[F.asc_nulls_last(c) for c in order_cols])
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= k)
              .drop("__rn"))
