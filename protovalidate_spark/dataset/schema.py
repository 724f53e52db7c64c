"""Declared-schema contract check (engine extension; SURVEY.md §2.9).

``stats_drift_violations`` compares a table against a SNAPSHOT of its
own past; this is the other half — a table against a DECLARED contract
(the "producer promised these columns at these types" check that runs
before any rule compiles). Pure metadata: reads ``df.dtypes`` only,
zero scans, zero Spark jobs beyond the tiny local result frame — safe
to run first in any pipeline at any table size.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame

from ..errors import Code


def schema_violations(df: DataFrame, spec: Dict[str, str],
                      allow_extra: bool = False) -> DataFrame:
    """One violation per contract breach:

    - ``REQUIRED``   /col — declared column absent from the table
    - ``TYPE``       /col — column present at a different type
      (normalized: case-insensitive, ``decimal(p,s)`` spaces stripped)
    - ``UNEXPECTED`` /col — undeclared column present
      (suppressed by ``allow_extra=True``)

    Output: (field_path, rule_id, message, actual) — the engine's
    violation shape, unionable with every other check.
    """
    def norm(t: str) -> str:
        return t.lower().replace(" ", "")

    dtypes = {c: norm(t) for c, t in df.dtypes}
    rows = []
    for c, want in spec.items():
        if c not in dtypes:
            rows.append((f"/{c}", Code.REQUIRED,
                         f"declared column {c!r} ({want}) missing from "
                         f"the table", None))
        elif dtypes[c] != norm(want):
            rows.append((f"/{c}", Code.TYPE,
                         f"declared {norm(want)}, table has {dtypes[c]}",
                         dtypes[c]))
    if not allow_extra:
        for c in dtypes:
            if c not in spec:
                rows.append((f"/{c}", Code.UNEXPECTED,
                             "column not in the declared contract",
                             dtypes[c]))
    return df.sparkSession.createDataFrame(
        rows, "field_path string, rule_id string, message string, "
              "actual string")
