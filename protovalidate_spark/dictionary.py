"""Error dictionaries / i18n (SURVEY.md §2.8).

The reference renders messages through per-locale dictionaries
(/root/reference/pkg/errors/dict.go:41-56,222-240) with a printer pulled
from context (rulecontext/context.go:31-50; example _examples/i18n/
app.go:20-28). The Spark-native shape: a tiny (rule_id → template)
dictionary per locale, broadcast-joined onto the violations DataFrame at
REPORT time — rule evaluation stays message-free in the hot path, and a
10^12-row violations table localizes with a zero-shuffle broadcast join.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default (en) templates by rule id; ``{actual}``/``{path}`` interpolate.
DEFAULT_DICT: Dict[str, str] = {
    "REQUIRED": "field {path} is required",
    "NULL": "field {path} may not be null",
    "TYPE": "field {path} has the wrong type (got {actual})",
    "RANGE": "field {path} is out of range for its type (got {actual})",
    "MIN": "field {path} is below the minimum (got {actual})",
    "MAX": "field {path} is above the maximum (got {actual})",
    "MIN_EXCLUSIVE": "field {path} must be greater than the bound (got {actual})",
    "MAX_EXCLUSIVE": "field {path} must be less than the bound (got {actual})",
    "MIN_LEN": "field {path} is too short (got {actual})",
    "MAX_LEN": "field {path} is too long (got {actual})",
    "PATTERN": "field {path} does not match the expected pattern (got {actual})",
    "NOTALLOWED": "field {path} has a value outside the allow-list (got {actual})",
    "DENIED": "field {path} has a forbidden value (got {actual})",
    "ENCODING": "field {path} is not encoded correctly",
    "EXPIRED": "field {path} has expired",
    "UNEXPECTED": "unexpected field {path}",
    "UNIQUE": "field {path} must be unique (got {actual})",
    "REF": "field {path} not found in the reference dimension (got {actual})",
    "DRIFT": "distribution drift detected on {path}",
    "DECODE": "field {path} payload is not decodable",
    "CONSISTENT": "field {path} is inconsistent with the decoded payload",
    "RECONCILE": "aggregate of {path} does not reconcile with the "
                 "recorded value (got {actual})",
    "MONOTONIC": "field {path} breaks the expected ordering "
                 "(got {actual})",
    "OUTLIER": "field {path} is a robust-statistical outlier "
               "(got {actual})",
    "TIMEOUT": "validation of {path} exceeded its wall-clock budget",
    "CANCELED": "validation of {path} was canceled before it ran",
}


def dict_df(spark, templates: Dict[str, str], locale: str = "en") -> DataFrame:
    return spark.createDataFrame(
        [(locale, k, v) for k, v in templates.items()],
        "locale string, rule_id string, template string")


def localize(violations: DataFrame,
             templates: Optional[Dict[str, str]] = None,
             locale: str = "en",
             out_col: str = "localized_message") -> DataFrame:
    """Append a localized message column: broadcast-join the (tiny)
    dictionary on rule_id and interpolate {path}/{actual}. Unknown rule
    ids keep the engine's built-in message (dict fallback,
    reference dict.go:90-112)."""
    spark = violations.sparkSession
    d = dict_df(spark, templates or DEFAULT_DICT, locale) \
        .select("rule_id", "template")
    joined = violations.join(F.broadcast(d), on="rule_id", how="left")
    rendered = F.replace(
        F.replace(F.col("template"), F.lit("{path}"), F.col("field_path")),
        F.lit("{actual}"), F.coalesce(F.col("actual"), F.lit("null")))
    return joined.withColumn(
        out_col, F.coalesce(rendered, F.col("message"))
    ).drop("template")
