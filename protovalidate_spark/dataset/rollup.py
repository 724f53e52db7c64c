"""Salted rollup: skew-safe grouped aggregation (north_rule: "explicit
skew-salting on hot codec partitions").

The clips table's ``codec`` distribution is hot (≈70% ``wav``), so a
naive ``groupBy(codec)`` sends 70% of pre-aggregated traffic to one
reducer. For algebraic aggregates (count/sum/min/max — and avg as
sum/count) a TWO-LEVEL aggregation bounds any single reducer's input:

    groupBy(keys, salt) -> partial aggs     (salt spreads the hot key)
    groupBy(keys)       -> merge partials   (at most ``salt_buckets``
                                             rows per key)

Spark's map-side partial aggregation already pre-combines per task; the
explicit salt additionally caps the REDUCE-side group size for the hot
key, which matters when upstream partition counts (and thus partial
rows per key) are huge. ``salt_buckets=0`` compiles to the plain
single-level agg for comparison.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metric name -> (partial agg over raw col, merge agg over partial col)
_ALGEBRAIC = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "count_nonnull": (F.count, F.sum),   # avg's denominator (null-aware)
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_rollup(df: DataFrame, keys: Sequence[str],
                  metrics: Sequence[tuple], salt_buckets: int = 0) -> DataFrame:
    """Grouped rollup of algebraic metrics, optionally salted.

    ``metrics``: (metric, col, alias) tuples, e.g.
    ``[("count", None, "n"), ("sum", "dur_ms", "dur_total"),
    ("avg", "dur_ms", "dur_avg")]``. ``avg`` decomposes to sum+count so
    it stays algebraic across the two levels.
    """
    expanded = []          # (metric, col, out_alias, public_alias|None)
    finals = {}            # public alias -> expression over merged cols
    for metric, col, alias in metrics:
        if metric == "avg":
            expanded.append(("sum", col, f"__{alias}_s"))
            expanded.append(("count_nonnull", col, f"__{alias}_c"))
            finals[alias] = (F.col(f"__{alias}_s") / F.col(f"__{alias}_c"))
        elif metric in _ALGEBRAIC:
            expanded.append((metric, col, alias))
            finals[alias] = F.col(alias)
        else:
            raise ValueError(f"non-algebraic metric {metric!r} — use the "
                             f"sketch aggregates in dataset/stats.py")

    if salt_buckets and salt_buckets > 1:
        salted = df.withColumn(
            "__salt", F.pmod(F.spark_partition_id()
                             + F.crc32(F.concat_ws("\x1f", *[
                                 F.coalesce(F.col(k).cast("string"), F.lit(""))
                                 for k in keys])),
                             F.lit(salt_buckets)))
        partial = salted.groupBy(*keys, "__salt").agg(*[
            _ALGEBRAIC[m][0](F.col(c) if c else None).alias(a)
            for m, c, a in expanded])
        merged = partial.groupBy(*keys).agg(*[
            _ALGEBRAIC[m][1](F.col(a)).alias(a) for m, c, a in expanded])
    else:
        merged = df.groupBy(*keys).agg(*[
            _ALGEBRAIC[m][0](F.col(c) if c else None).alias(a)
            for m, c, a in expanded])

    return merged.select(*keys, *[expr.alias(a) for a, expr in finals.items()])
