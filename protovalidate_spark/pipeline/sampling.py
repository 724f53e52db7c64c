"""Deterministic dataset splitting + sampling for training pipelines.

A 10^12-row training corpus needs splits that are (a) reproducible
across runs and engines, (b) stable under repartitioning and appends
(a row's split NEVER depends on which partition it sat in or what
other rows exist), and (c) pure map-side — no shuffle, no sampling
state. Hash-based assignment gives all three: split(row) = f(md5(id))
is a pure column expression, and md5 is bit-identical everywhere
(Spark, DuckDB, Python hashlib), so the contract oracle can recompute
assignments exactly in SQL.

``sample_fraction`` / ``stratified_sample`` use the same md5 device
instead of ``df.sample()``: Spark's native sampler is seed-stable only
for a FIXED partitioning (Bernoulli draw per partition+seed), which
breaks (b) — the hash form survives repartitioning and is
cross-engine checkable.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 → first 15 hex digits → int64 (60 bits, always non-negative,
# conv() is exact up to 16 hex digits) → uniform bucket in [0, 1e6)
_BUCKETS = 1_000_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % _BUCKETS


def with_split(df: DataFrame, id_col: str, weights: Dict[str, float],
               salt: str = "", out_col: str = "split") -> DataFrame:
    """Assign each row a split label ("train"/"val"/"test"/...) from the
    md5 of its id. Weights must sum to 1 (±1e-9). Deterministic,
    partition-independent, append-stable; a different ``salt`` yields an
    independent re-split. Map-only — no shuffle at any scale.

    NULL ids get a NULL split — never silently concentrated into one
    label (route them through a REQUIRED rule instead; a malformed-id
    row must not contaminate the held-out split). ``sample_fraction``
    and ``stratified_sample`` likewise always DROP NULL-id rows."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _hash_bucket(F.col(id_col), salt)
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    expr = F.when(F.col(id_col).isNull(),
                  F.lit(None).cast("string")).otherwise(expr)
    return df.withColumn(out_col, expr)


def split_sql(id_col: str, weights: Dict[str, float], salt: str = "") -> str:
    """The DuckDB-parity SQL expression for with_split's label — the
    contract oracle is generated from the SAME weights/salt constants."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = (f"(('0x' || substring(md5(CAST({id_col} AS VARCHAR) || "
              f"'{salt}'), 1, 15))::BIGINT % {_BUCKETS})")
    items = list(weights.items())
    parts = [f"WHEN {id_col} IS NULL THEN NULL"]
    cum = 0.0
    for name, w in items[:-1]:
        cum += w
        parts.append(f"WHEN {bucket} < {int(round(cum * _BUCKETS))} "
                     f"THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{items[-1][0]}' END"


def sample_fraction(df: DataFrame, id_col: str, fraction: float,
                    salt: str = "") -> DataFrame:
    """Deterministic ``fraction`` sample by id hash. Unlike
    ``df.sample()``, membership is a property of the ROW (id, salt,
    fraction), not of the partitioning — rerunning after a repartition
    or an append keeps every previously-sampled row."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(
        _hash_bucket(F.col(id_col), salt) < int(round(fraction * _BUCKETS)))


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions: Dict[str, float], salt: str = "",
                      default_fraction: float = 0.0,
                      null_fraction: float = None) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample the dominant
    codec, keep 100% of rare ones). ``fractions`` maps stratum value →
    keep fraction; unlisted strata keep ``default_fraction``. Rows whose
    stratum value is NULL keep ``null_fraction`` (default: same as
    ``default_fraction`` — so at the 0.0 default a NULL stratum DROPS
    the row; pass ``null_fraction=1.0`` to always keep them). Pure
    map-side filter: threshold = CASE over the stratum column, compared
    to the id-hash bucket — no shuffle, no sampleBy partition
    sensitivity."""
    if null_fraction is None:
        null_fraction = default_fraction
    for k, v in list(fractions.items()) + [("default", default_fraction),
                                           ("null", null_fraction)]:
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    thr = F.when(F.col(strata_col).isNull(),
                 F.lit(int(round(null_fraction * _BUCKETS))))
    for k, v in fractions.items():
        thr = thr.when(F.col(strata_col) == k,
                       F.lit(int(round(v * _BUCKETS))))
    thr = thr.otherwise(int(round(default_fraction * _BUCKETS)))
    return df.filter(_hash_bucket(F.col(id_col), salt) < thr)
