"""Distribution-drift checks: PSI and KS statistic against a baseline
snapshot (SURVEY.md §2.9; BASELINE.json north_star).

Scale design: drift is computed on HISTOGRAMS, never raw rows. One
aggregation pass builds 32-bucket equi-width histograms for numeric
columns (``width_bucket``) and value-frequency tables for categoricals
(bounded by ``max_categories``) — the shuffle payload is O(buckets), the
PSI/KS arithmetic runs driver-side on tiny arrays. Skewed categorical
columns (hot ``codec`` values) are irrelevant here because counts are
partially aggregated map-side.
"""

from __future__ import annotations

import json
import math
from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import Code

N_BUCKETS = 32
_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def histogram(df: DataFrame, col: str, lo: Optional[float] = None,
              hi: Optional[float] = None, n_buckets: int = N_BUCKETS,
              max_categories: int = 1000) -> Dict[str, float]:
    """Relative-frequency histogram: bucket-label -> fraction.

    Numeric: ``width_bucket`` over [lo, hi] (bounds from the baseline so the
    two histograms share buckets). Categorical: value -> fraction, top
    ``max_categories`` by count, remainder pooled into ``__other__``.
    """
    dtype = dict(df.dtypes)[col].split("(")[0]
    if dtype in _NUMERIC:
        if lo is None or hi is None:
            b = df.agg(F.min(F.col(col).cast("double")),
                       F.max(F.col(col).cast("double"))).collect()[0]
            lo = lo if lo is not None else b[0]
            hi = hi if hi is not None else b[1]
        if lo is None or hi is None or not math.isfinite(lo) or lo >= hi:
            hi = (lo or 0.0) + 1.0
            lo = lo or 0.0
        rows = (
            df.filter(F.col(col).isNotNull())
              .groupBy(F.width_bucket(F.col(col).cast("double"),
                                      F.lit(float(lo)), F.lit(float(hi)),
                                      F.lit(n_buckets)).alias("b"))
              .count().collect()
        )
        total = sum(r["count"] for r in rows) or 1
        return {f"b{int(r['b'])}": r["count"] / total for r in rows}
    rows = (
        df.filter(F.col(col).isNotNull())
          .groupBy(F.col(col).cast("string").alias("v"))
          .count().orderBy(F.desc("count")).limit(max_categories).collect()
    )
    total_all = df.filter(F.col(col).isNotNull()).count() or 1
    out = {r["v"]: r["count"] / total_all for r in rows}
    rest = 1.0 - sum(out.values())
    if rest > 1e-12:
        out["__other__"] = rest
    return out


def histogram_counts(df: DataFrame, col: str, lo: float, hi: float,
                     n_buckets: int = N_BUCKETS) -> DataFrame:
    """Distributed equi-width histogram as a DataFrame (bucket, cnt) —
    the shuffle-light building block behind drift checks (bucket 0 =
    below lo, n_buckets+1 = at/above hi, PostgreSQL width_bucket
    semantics)."""
    return (df.filter(F.col(col).isNotNull())
            .groupBy(F.width_bucket(F.col(col).cast("double"),
                                    F.lit(float(lo)), F.lit(float(hi)),
                                    F.lit(n_buckets)).cast("bigint")
                     .alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def numeric_bounds(df: DataFrame, cols: Sequence[str]) -> Dict[str, Tuple[float, float]]:
    dtypes = dict(df.dtypes)
    num = [c for c in cols if dtypes[c].split("(")[0] in _NUMERIC]
    if not num:
        return {}
    aggs = []
    for c in num:
        aggs += [F.min(F.col(c).cast("double")).alias(f"{c}__lo"),
                 F.max(F.col(c).cast("double")).alias(f"{c}__hi")]
    r = df.agg(*aggs).collect()[0]
    return {c: (r[f"{c}__lo"], r[f"{c}__hi"]) for c in num}


def psi(expected: Dict[str, float], actual: Dict[str, float],
        eps: float = 1e-6) -> float:
    """Population Stability Index: sum((a-e) * ln(a/e)) over shared bucket
    space; missing buckets floored at eps."""
    keys = set(expected) | set(actual)
    s = 0.0
    for k in keys:
        e = max(expected.get(k, 0.0), eps)
        a = max(actual.get(k, 0.0), eps)
        s += (a - e) * math.log(a / e)
    return s


def ks_stat(expected: Dict[str, float], actual: Dict[str, float]) -> float:
    """Kolmogorov–Smirnov statistic on the bucketed CDFs (buckets ordered by
    label; exact enough for drift-gating on shared equi-width buckets)."""
    def key_order(k: str):
        if k.startswith("b") and k[1:].isdigit():
            return (0, int(k[1:]), "")
        return (1, 0, k)
    keys = sorted(set(expected) | set(actual), key=key_order)
    ce = ca = 0.0
    d = 0.0
    for k in keys:
        ce += expected.get(k, 0.0)
        ca += actual.get(k, 0.0)
        d = max(d, abs(ce - ca))
    return d


def snapshot(df: DataFrame, cols: Sequence[str]) -> Dict[str, dict]:
    """Baseline snapshot: per-column histogram + numeric bounds (the bounds
    freeze the bucket space for later comparisons). JSON-serializable."""
    bounds = numeric_bounds(df, cols)
    out = {}
    for c in cols:
        lo, hi = bounds.get(c, (None, None))
        out[c] = {"lo": lo, "hi": hi, "hist": histogram(df, c, lo, hi)}
    return out


def save_snapshot(snap: Dict[str, dict], path: str) -> None:
    with open(path, "w") as f:
        json.dump(snap, f)


def load_snapshot(path: str) -> Dict[str, dict]:
    with open(path) as f:
        return json.load(f)


def drift_violations(
    df: DataFrame, baseline: Dict[str, dict],
    psi_threshold: float = 0.2, ks_threshold: float = 0.1,
) -> DataFrame:
    """Dataset-level violation rows (one per drifted column): field_path,
    rule_id=DRIFT, message, actual='psi=..,ks=..'. Not attributable to a
    single row — row keys are NULL."""
    spark = df.sparkSession
    rows = []
    for c, snap in baseline.items():
        cur = histogram(df, c, snap.get("lo"), snap.get("hi"))
        p = psi(snap["hist"], cur)
        k = ks_stat(snap["hist"], cur)
        if p > psi_threshold or k > ks_threshold:
            rows.append((f"/{c}", Code.DRIFT,
                         f"distribution drift exceeds thresholds "
                         f"(psi>{psi_threshold} or ks>{ks_threshold})",
                         f"psi={p:.4f},ks={k:.4f}"))
    return spark.createDataFrame(
        rows, "field_path string, rule_id string, message string, actual string")
