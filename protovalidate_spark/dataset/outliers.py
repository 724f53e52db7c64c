"""Robust per-column outlier detection (Tukey IQR fences and
median/MAD modified z-score).

The stats/drift family judges DISTRIBUTIONS (a whole column moved);
this module judges ROWS — the individual records whose numeric value
sits implausibly far outside the column's robust bulk. Min/max rules
need a human-chosen threshold; the outlier gates derive the threshold
from the data itself with estimators that 10^12-scale dirty data
cannot drag (mean/stddev z-scores break down exactly when outliers are
present — the outliers inflate the stddev that is supposed to expose
them; median and quartiles have a 25-50% breakdown point).

Two detectors, both standard in data-validation practice:

- **Tukey IQR fences**: flag x outside [q1 - k*(q3-q1), q3 + k*(q3-q1)];
  k=1.5 is Tukey's "outlier", 3.0 his "far out".
- **Modified z-score** (Iglewicz-Hoaglin): flag |0.6745*(x - median)/MAD|
  > k, default k=3.5. A degenerate column (MAD == 0: >50% of values
  identical) is SKIPPED — every deviation would be infinitely many MADs
  out; the distinct-ratio / stats gates own that shape.

Scale design (10^12 rows):
- Parameter pass(es) are single ``df.agg()`` scans — map-side-combined
  GK sketches (``percentile_approx``, the default) or exact interpolated
  ``percentile`` (oracle mode / bounded cardinality); MAD needs one
  extra scan for median(|x - median|) since the inner median must be
  known first. Bytes shuffled: a sketch per column per partition,
  independent of row count.
- The flag pass is ONE projection + filter over the original scan with
  the fences inlined as literals — no join, no shuffle, predicate
  fully pushable; ALL requested columns are judged in the same pass
  (per-row array of conditional violation structs, explode non-null).

Reference analog: value-at-a-time rules (pkg/rules) have no
dataset-derived thresholds; these reuse the reference error model only
(violation row shape, errors/validation_error.go:11-40).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import Code
from ..rules.base import violation_struct

#: Iglewicz-Hoaglin consistency constant: for a normal distribution
#: MAD ≈ 0.6745 σ, so 0.6745*(x-med)/MAD reads in σ-equivalents.
MAD_Z_CONST = 0.6745


def _quantile_expr(c: str, qs, exact: bool, accuracy: int):
    if exact:
        return F.percentile(F.col(c).cast("double"),
                            F.array(*[F.lit(float(q)) for q in qs]))
    return F.percentile_approx(F.col(c).cast("double"), list(qs), accuracy)


def iqr_fences(df: DataFrame, cols: Sequence[str], k: float = 1.5,
               exact: bool = False, accuracy: int = 2500,
               ) -> Dict[str, Tuple[float, float, float, float]]:
    """One agg scan → {col: (lo, hi, q1, q3)}. Columns that are
    all-NULL (no quantiles) are omitted."""
    aggs = [_quantile_expr(c, [0.25, 0.75], exact, accuracy).alias(c)
            for c in cols]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        q = row[c]
        if q is None or q[0] is None or q[1] is None:
            continue
        q1, q3 = float(q[0]), float(q[1])
        iqr = q3 - q1
        out[c] = (q1 - k * iqr, q3 + k * iqr, q1, q3)
    return out


def mad_params(df: DataFrame, cols: Sequence[str], exact: bool = False,
               accuracy: int = 2500) -> Dict[str, Tuple[float, float]]:
    """Two agg scans → {col: (median, mad)}. All-NULL columns omitted."""
    med_row = df.agg(*[
        _quantile_expr(c, [0.5], exact, accuracy)[0].alias(c)
        for c in cols]).collect()[0]
    med = {c: med_row[c] for c in cols if med_row[c] is not None}
    if not med:
        return {}
    mad_row = df.agg(*[
        (F.percentile(F.abs(F.col(c).cast("double") - F.lit(med[c])),
                      F.lit(0.5)) if exact else
         F.percentile_approx(
             F.abs(F.col(c).cast("double") - F.lit(med[c])),
             0.5, accuracy)).alias(c)
        for c in med]).collect()[0]
    return {c: (float(med[c]), float(mad_row[c])) for c in med
            if mad_row[c] is not None}


def _flag_scan(df: DataFrame, row_key_cols: Sequence[str],
               per_col_conds) -> DataFrame:
    """ONE projection over the scan: array of conditional violation
    structs (NULL when the row passes that column), explode non-null.
    per_col_conds: iterable of (violating_cond, violation_struct_col)."""
    arr = F.array(*[F.when(cond, v) for cond, v in per_col_conds])
    keep = [F.col(c) for c in row_key_cols]
    exploded = df.select(
        *keep,
        F.explode(F.filter(arr, lambda x: x.isNotNull())).alias("_v"))
    return exploded.select(*[F.col(c) for c in row_key_cols],
                           "_v.field_path", "_v.rule_id", "_v.message",
                           "_v.actual")


def iqr_outlier_violations(
    df: DataFrame, cols: Sequence[str],
    row_key_cols: Sequence[str] = (), k: float = 1.5,
    exact: bool = False, accuracy: int = 2500,
    fences: Optional[Dict[str, Tuple[float, float, float, float]]] = None,
) -> DataFrame:
    """One violation row per (row, column) outside the Tukey fences.
    Shape: (row keys..., field_path, rule_id=OUTLIER, message, actual).
    NULL values never flag (null_rate is the stats gate's finding).
    Pass precomputed ``fences`` (e.g. from a BASELINE snapshot — fences
    frozen at snapshot time, exactly like drift baselines) to skip the
    parameter scan entirely."""
    fences = fences if fences is not None else iqr_fences(
        df, cols, k=k, exact=exact, accuracy=accuracy)
    conds = []
    for c, (lo, hi, _q1, _q3) in fences.items():
        x = F.col(c).cast("double")
        conds.append((
            x.isNotNull() & ((x < F.lit(lo)) | (x > F.lit(hi))),
            violation_struct(
                f"/{c}", Code.OUTLIER,
                f"value outside Tukey fences [{lo:.6g}, {hi:.6g}] (k={k})",
                F.col(c)),
        ))
    if not conds:
        return _empty_violations(df, row_key_cols)
    return _flag_scan(df, row_key_cols, conds)


def _empty_violations(df: DataFrame, row_key_cols: Sequence[str]):
    """Zero-row result with the exact output schema (key dtypes kept)."""
    out = df.select(*row_key_cols).limit(0)
    for c in ("field_path", "rule_id", "message", "actual"):
        out = out.withColumn(c, F.lit(None).cast("string"))
    return out


def mad_outlier_violations(
    df: DataFrame, cols: Sequence[str],
    row_key_cols: Sequence[str] = (), k: float = 3.5,
    exact: bool = False, accuracy: int = 2500,
    params: Optional[Dict[str, Tuple[float, float]]] = None,
) -> DataFrame:
    """One violation row per (row, column) with modified z-score
    |0.6745*(x-median)/MAD| > k. Columns with MAD == 0 are skipped
    (degenerate distribution — the distinct-ratio gate's shape)."""
    params = params if params is not None else mad_params(
        df, cols, exact=exact, accuracy=accuracy)
    conds = []
    for c, (med, mad) in params.items():
        if mad <= 0.0:
            continue
        x = F.col(c).cast("double")
        z = F.abs(x - F.lit(med)) * F.lit(MAD_Z_CONST / mad)
        conds.append((
            x.isNotNull() & (z > F.lit(k)),
            violation_struct(
                f"/{c}", Code.OUTLIER,
                f"modified z-score exceeds {k} "
                f"(median={med:.6g}, mad={mad:.6g})",
                F.col(c)),
        ))
    if not conds:
        return _empty_violations(df, row_key_cols)
    return _flag_scan(df, row_key_cols, conds)
