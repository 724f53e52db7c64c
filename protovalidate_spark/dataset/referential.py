"""Referential-integrity check via ANTI JOIN (SURVEY.md §2.9).

Scale design: dimension tables (codec lists, speaker registries) are small
⇒ ``broadcast()`` the dim side so the anti-join is a map-side hash probe
with ZERO shuffle of the 10^12-row fact side. For large dims pass
``broadcast_dim=False`` → Catalyst plans a sort-merge anti join and AQE
handles skewed fact keys (spark.sql.adaptive.skewJoin)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import Code
from ..rules.base import violation_struct


def ref_violations(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str,
    row_key_cols: Sequence[str] = (), extra_cols: Sequence[str] = (),
    broadcast_dim: bool = True,
) -> DataFrame:
    """Rows whose ``col`` value does not exist in ``dim.dim_col``.
    NULL fact keys are skipped (reported by the NULL/REQUIRED field rule)."""
    d = dim.select(F.col(dim_col).alias("__ref_key")).distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    missing = (
        df.filter(F.col(col).isNotNull())
          .join(d, on=F.col(col) == F.col("__ref_key"), how="left_anti")
    )
    v = violation_struct(
        f"/{col}", Code.REF,
        f"value of {col!r} not found in reference dimension",
        F.col(col),
    )
    keep = [F.col(c) for c in (*row_key_cols, *extra_cols)]
    return missing.select(*keep, v.alias("_v")).select(
        *keep, "_v.field_path", "_v.rule_id", "_v.message", "_v.actual")
