"""Uniqueness check (SURVEY.md §2.9; BASELINE.json north_star: "uniqueness
on clip_id via salted repartition + hash-based dedup detection").

Scale design (10^12 rows):
- Phase 1 is a ``groupBy(key).count()`` — Catalyst's partial aggregation
  (map-side combine) means each executor ships at most one (key, count)
  pair per local distinct key, so a hot key never concentrates *rows*,
  only pre-combined counts. For pathological wide-row keys we additionally
  expose ``salt_buckets``: a two-level agg ``groupBy(key, salt) →
  groupBy(key)`` that bounds any single reducer's group size.
- Phase 2 joins duplicate keys back to fetch violating rows. Duplicate-key
  sets are tiny relative to input in healthy data ⇒ broadcast the dup-key
  side (hint; AQE converts to broadcast at runtime when under threshold).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import Code
from ..rules.base import violation_struct


def duplicate_keys(df: DataFrame, cols: Sequence[str],
                   salt_buckets: int = 0) -> DataFrame:
    """Keys appearing more than once → (cols..., dup_count).
    NULL keys are not duplicates (SQL semantics: NULL ≠ NULL)."""
    nn = df
    for c in cols:
        nn = nn.filter(F.col(c).isNotNull())
    if salt_buckets and salt_buckets > 1:
        # explicit two-level salted aggregation for extreme skew
        salted = nn.withColumn(
            "__salt", F.pmod(F.crc32(F.concat_ws("\x1f", *[
                F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols
            ])) + F.spark_partition_id(), F.lit(salt_buckets)))
        partial = salted.groupBy(*cols, "__salt").count()
        counts = partial.groupBy(*cols).agg(F.sum("count").alias("dup_count"))
    else:
        counts = nn.groupBy(*cols).agg(F.count(F.lit(1)).alias("dup_count"))
    return counts.filter(F.col("dup_count") > 1)


def unique_violations(
    df: DataFrame, cols: Sequence[str],
    row_key_cols: Sequence[str] = (), extra_cols: Sequence[str] = (),
    salt_buckets: int = 0, broadcast_dups: bool = True,
) -> DataFrame:
    """One violation row per row participating in a duplicate group.
    Shape: (row keys..., extras..., field_path, rule_id, message, actual).
    """
    col = cols[0] if len(cols) == 1 else None
    dups = duplicate_keys(df, cols, salt_buckets)
    right = F.broadcast(dups) if broadcast_dups else dups
    joined = df.join(right, on=list(cols), how="inner")
    path = "/" + (col or ",".join(cols))
    v = violation_struct(
        path, Code.UNIQUE,
        f"value of {list(cols)} must be unique",
        F.concat_ws(",", *[F.col(c).cast("string") for c in cols]),
    )
    keep = [F.col(c) for c in (*row_key_cols, *extra_cols)]
    return joined.select(*keep, v.alias("_v")).select(
        *keep, "_v.field_path", "_v.rule_id", "_v.message", "_v.actual")
