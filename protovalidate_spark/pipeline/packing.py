"""Sequence packing: GPT-style concat-and-chunk token-offset assignment.

Training pipelines concatenate the corpus in a deterministic document
order and slice it into fixed-size token windows; each document needs
its global token offset, the window it starts in, and the window it
ends in (documents crossing a boundary are split across examples).

The offset is a global prefix sum under a total order — the naive
Spark expression is ``sum(n_tok) over (order by id)``, whose physical
plan is an Exchange SinglePartition: every row funnels through ONE
reducer, which is exactly the shape that dies at 100 TB. This module
implements the classic two-level distributed prefix sum instead:

  1. ONE range shuffle puts the corpus in id order across P partitions
     (``repartitionByRange`` — partition i holds strictly smaller ids
     than partition i+1), sorted within each partition.
  2. A map-side-aggregated subtotal job collects P rows (one per
     partition) to the driver, which prefix-sums them into per-
     partition base offsets — O(P) driver work, not O(rows).
  3. A shuffle-free Arrow ``mapInPandas`` pass adds each partition's
     base to a vectorized within-partition running sum.

Total: one full-data shuffle + one O(P) collect, with every per-row
step vectorized. The output is invariant to the partition count and
to the input partitioning — offsets depend only on (id order, token
counts) — which is what lets a plain windowed SQL oracle verify it.

Reference parity: no Go counterpart (protovalidate validates rows; it
has no corpus assembly) — this is the training-pipeline extension
family, same as pipeline/dedup.py.
"""

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

from .text import token_count

__all__ = ["pack_offsets"]


def _out_schema(id_field: T.StructField) -> T.StructType:
    return T.StructType([
        id_field,
        T.StructField("n_tokens", T.LongType()),
        T.StructField("offset", T.LongType()),
    ])


def pack_offsets(df: DataFrame, id_col: str,
                 text_col: Optional[str] = None,
                 token_count_col: Optional[str] = None,
                 window_tokens: int = 2048,
                 partitions: Optional[int] = None,
                 eager: bool = True) -> DataFrame:
    """Per-document packing assignment over the corpus ordered by
    ``id_col``: ``(id, n_tokens, offset, chunk_id, chunk_end)`` where
    ``offset`` is the document's global token offset, ``chunk_id`` =
    ``offset // window_tokens`` (the training example the document
    starts in) and ``chunk_end`` the example it ends in (> chunk_id
    means the document is split across a window boundary; empty
    documents consume nothing, so chunk_end == chunk_id).

    Token counts come from ``token_count_col`` if given, else from
    whitespace ``token_count(text_col)`` (pipeline/text.py — the same
    expression the token_count_documents contract query pins).

    ``id_col`` must be a UNIQUE, NON-NULL total order (a doc id, a
    row index): with duplicate keys the order among the tied rows is
    engine-dependent, so their individual offsets are nondeterministic
    even though every downstream sum still agrees — and NULL keys sort
    first in Spark but last in most SQL engines (DuckDB), so a NULL id
    shifts every offset differently per engine.

    ``eager=True`` (default) materializes via localCheckpoint so the
    internal cache can be released here; ``eager=False`` returns the
    lazy frame for plan inspection and LEAKS the range-partitioned
    cache for the session lifetime (there is no safe point to release
    it inside a lazy lineage) — tests only, never production.
    """
    if (text_col is None) == (token_count_col is None):
        raise ValueError("pass exactly one of text_col / token_count_col")
    n_tok: Column = (F.col(token_count_col) if token_count_col
                     else token_count(F.col(text_col)))
    if window_tokens <= 0:
        raise ValueError(f"window_tokens must be positive: {window_tokens}")
    spark = df.sparkSession
    if partitions:
        p = int(partitions)
    else:
        try:  # AQE coalescing may set this to the literal "auto"
            p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        except ValueError:
            p = spark.sparkContext.defaultParallelism
    p = max(1, p)

    # NULL text -> size(split(NULL)) = -1; a NULL/negative count must
    # consume nothing, not walk the global offset backwards
    base = df.select(F.col(id_col),
                     F.greatest(F.coalesce(n_tok.cast("long"), F.lit(0)),
                                F.lit(0)).alias("n_tokens"))
    ranged = (base.repartitionByRange(p, id_col)
                  .sortWithinPartitions(id_col)
                  .withColumn("_pid", F.spark_partition_id())
                  .persist())
    try:
        # per-partition subtotals: map-side partial agg, P rows collected
        sub = {r["_pid"]: r["tot"] for r in
               ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("tot"))
                     .collect()}
        bases, run = {}, 0
        for pid in range(p):          # empty partitions are absent from sub
            bases[pid] = run
            run += int(sub.get(pid) or 0)

        id_field = ranged.schema[id_col]
        schema = _out_schema(id_field)

        def cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            running = None            # resolved from the first batch's pid
            for b in batches:
                if len(b) == 0:
                    continue
                if running is None:
                    running = bases[int(b["_pid"].iloc[0])]
                toks = b["n_tokens"].to_numpy()
                ends = toks.cumsum()
                yield pd.DataFrame({
                    id_col: b[id_col],
                    "n_tokens": toks,
                    "offset": running + ends - toks,
                })
                running += int(ends[-1])

        w = int(window_tokens)
        out = (ranged.mapInPandas(cumsum, schema)
                     .withColumn("chunk_id",
                                 F.floor(F.col("offset") / w))
                     .withColumn(
                         "chunk_end",
                         F.floor((F.col("offset")
                                  + F.greatest(F.col("n_tokens") - 1,
                                               F.lit(0))) / w)))
        if eager:
            return out.localCheckpoint(eager=True)
        return out
    finally:
        if eager:
            ranged.unpersist()
