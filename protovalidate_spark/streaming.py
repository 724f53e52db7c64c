"""Structured Streaming validation (SURVEY.md §2.6, §3 entry point C).

The reference validates streams item-at-a-time through channels
(/root/reference/pkg/rules/slice.go:419-516: producer goroutine →
unbuffered chan → per-item Apply → output chan). Spark's analog is a
micro-batched stream: the SAME compiled rule plan (one projection; the
rules are stateless) applied via ``readStream`` → transformations →
``writeStream``. Nothing about the compilation changes — a compiled
violations column is a streaming-compatible stateless expression, decode
UDF included.

Dataset-level checks need state and are therefore *windowed* on the
stream (global exact uniqueness over an unbounded stream is unbounded
state by definition):
- :func:`windowed_unique_violations` — duplicates within an event-time
  window, watermarked so state is bounded and late data is handled.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .errors import Code
from .rules.base import violation_struct
from .rules.object import ObjectRuleSet


def stream_violations(stream_df: DataFrame, rules: ObjectRuleSet,
                      row_key_cols: Sequence[str] = ()) -> DataFrame:
    """Row-level violations on a streaming DataFrame — identical plan to
    the batch path (stateless projection + explode), append-mode safe."""
    return rules.violations(stream_df, row_key_cols=row_key_cols)


def stream_suite_violations(stream_df: DataFrame, suite) -> DataFrame:
    """A ValidationSuite's ROW-LEVEL pass (rules + Arrow decode stage +
    consistency rules) over a stream. The decode pandas UDF is stateless,
    so the exact batch plan runs per micro-batch; dataset-level checks
    need state → use :func:`windowed_unique_violations` or the batch
    runner over closed partitions."""
    return suite.row_violations(stream_df)


def windowed_unique_violations(
    stream_df: DataFrame, key_col: str, ts_col: str,
    window: str = "10 minutes", watermark: str = "10 minutes",
) -> DataFrame:
    """Keys seen more than once within an event-time window.

    Emits (window_start, window_end, key, dup_count, field_path, rule_id,
    message, actual). State is bounded by the watermark; at 10^12-row
    scale this is the correct streaming relaxation of the global
    uniqueness check (the batch path gives the exact answer)."""
    agg = (stream_df
           .withWatermark(ts_col, watermark)
           .groupBy(F.window(F.col(ts_col), window).alias("w"),
                    F.col(key_col))
           .agg(F.count(F.lit(1)).alias("dup_count"))
           .filter(F.col("dup_count") > 1))
    v = violation_struct(
        f"/{key_col}", Code.UNIQUE,
        f"value of {key_col!r} duplicated within {window}",
        F.col(key_col))
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col(key_col), "dup_count",
        v.alias("_v"),
    ).select("window_start", "window_end", key_col, "dup_count",
             "_v.field_path", "_v.rule_id", "_v.message", "_v.actual")


def stateful_unique_violations(
    stream_df: DataFrame, key_col: str,
    state_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """EXACT cross-batch duplicate detection via keyed state
    (``applyInPandasWithState`` — the brief's custom-stateful-operator
    path). Unlike the windowed relaxation, a key is flagged whenever it
    was EVER seen while its state lives: state is one counter per key,
    expired by a processing-time timeout so it stays bounded (the
    streaming trade-off: duplicates further apart than the TTL are the
    batch runner's job).

    Emits one row per micro-batch per key that gained duplicates:
    (key, dup_count_batch, total_seen, field_path, rule_id, message,
    actual)."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout)

    out_schema = (f"{key_col} string, dup_count_batch long, "
                  "total_seen long, field_path string, rule_id string, "
                  "message string, actual string")
    state_schema = "seen long"

    def flag_dups(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n = sum(len(p) for p in pdfs)
        seen = state.get[0] if state.exists else 0
        dups = n if seen > 0 else n - 1
        total = seen + n
        state.update((total,))
        state.setTimeoutDuration(state_timeout_ms)
        if dups > 0:
            yield pd.DataFrame({
                key_col: [key[0]], "dup_count_batch": [dups],
                "total_seen": [total],
                "field_path": [f"/{key_col}"],
                "rule_id": [Code.UNIQUE],
                "message": [f"value of {key_col!r} duplicated "
                            f"(stateful exact check)"],
                "actual": [str(key[0])],
            })

    return (stream_df
            .filter(F.col(key_col).isNotNull())
            .groupBy(key_col)
            .applyInPandasWithState(
                flag_dups, out_schema, state_schema, "append",
                GroupStateTimeout.ProcessingTimeTimeout))


def write_violations_stream(
    violations: DataFrame, path: str, checkpoint: str,
    output_mode: str = "append", trigger_available_now: bool = True,
    fmt: str = "parquet",
):
    """writeStream with checkpointing — the streaming analog of the
    batch runner's violation sink. ``availableNow`` drains the backlog
    and stops (batch-like semantics for tests and backfills)."""
    w = (violations.writeStream.format(fmt)
         .option("path", path)
         .option("checkpointLocation", checkpoint)
         .outputMode(output_mode))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
