"""Structured Streaming validation (SURVEY.md §3 entry point C): the
compiled rule plan applied over readStream micro-batches must produce
the same violations as the batch path; windowed uniqueness is the
streaming relaxation of the global check."""

import os

import pytest
from pyspark.sql import functions as F

from protovalidate_spark import Int32, Object, String
from protovalidate_spark.streaming import (
    stream_violations,
    windowed_unique_violations,
    write_violations_stream,
)


def _rules():
    return (Object().with_unknown()
            .with_key("clip_id", String().with_required()
                      .regex(r"^clip-[0-9]{10}$"))
            .with_key("sr_hz", Int32().min(8000).max(192000)))


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_src"))
    rows = [
        (0, "clip-0000000001", 16000, "2026-01-01 00:00:01"),
        (1, "clip-0000000002", 4000, "2026-01-01 00:00:02"),   # sr MIN
        (2, "bad-id", 16000, "2026-01-01 00:00:03"),           # PATTERN
        (3, "clip-0000000001", 22050, "2026-01-01 00:00:04"),  # dup in window
        (4, "clip-0000000009", 44100, "2026-01-01 02:00:00"),  # later window
    ]
    df = spark.createDataFrame(
        rows, "row_idx long, clip_id string, sr_hz int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path, df


def test_stream_matches_batch(spark, stream_src, tmp_path):
    path, batch_df = stream_src
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    v = stream_violations(stream, _rules(), row_key_cols=["row_idx"])

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = write_violations_stream(v, out, ckpt)
    q.awaitTermination(120)

    got = {(r["row_idx"], r["field_path"], r["rule_id"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["row_idx"], r["field_path"], r["rule_id"])
            for r in stream_violations(batch_df, _rules(),
                                       row_key_cols=["row_idx"]).collect()}
    assert got == want and len(want) == 2


def test_stream_resume_is_incremental(spark, stream_src, tmp_path):
    """checkpointLocation makes re-runs skip already-processed files —
    the streaming analog of the batch runner's manifest resume."""
    path, batch_df = stream_src
    out, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    v = stream_violations(stream, _rules(), row_key_cols=["row_idx"])
    write_violations_stream(v, out, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # second run with same checkpoint: no new input ⇒ no new rows
    stream2 = spark.readStream.schema(batch_df.schema).parquet(path)
    v2 = stream_violations(stream2, _rules(), row_key_cols=["row_idx"])
    write_violations_stream(v2, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_windowed_unique(spark, stream_src, tmp_path):
    path, batch_df = stream_src
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    dups = windowed_unique_violations(stream, "clip_id", "ts",
                                      window="1 hour", watermark="1 hour")
    out, ckpt = str(tmp_path / "o3"), str(tmp_path / "c3")
    # append mode emits only after watermark closes a window; availableNow
    # + final watermark advance flushes the first window here
    q = (dups.writeStream.format("memory").queryName("dups")
         .outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select clip_id, dup_count, rule_id from dups").collect()
    assert len(got) == 1
    assert got[0]["clip_id"] == "clip-0000000001"
    assert got[0]["dup_count"] == 2
    assert got[0]["rule_id"] == "UNIQUE"


def test_stream_suite_row_pass_with_decode(spark, tmp_path):
    """The full row-level suite pass (incl. the Arrow decode stage and
    consistency rules) over a stream matches the batch pass."""
    from protovalidate_spark.clips import clips_suite
    from protovalidate_spark.fixtures import TINY, clips_df
    from protovalidate_spark.streaming import stream_suite_violations

    import shutil

    from protovalidate_spark.fixtures import Profile

    for active in spark.streams.active:   # no cross-test stream leakage
        active.stop()

    src = str(tmp_path / "clips_src")
    # 600 rows still hits every injection modulus (smallest hit at
    # i=485) while keeping Arrow batches small — the full-size TINY
    # payloads flaked python workers under whole-suite memory pressure
    batch = clips_df(spark, Profile(n_rows=600, dur_range_ms=400))
    batch.write.mode("overwrite").parquet(src)
    suite = clips_suite(spark)

    # one retry: the Arrow decode stage inside a streaming micro-batch
    # can hit a transient python-worker EOF under full-suite load
    for attempt in range(2):
        out, ckpt = str(tmp_path / f"o4_{attempt}"), str(tmp_path / f"c4_{attempt}")
        try:
            stream = spark.readStream.schema(batch.schema).parquet(src)
            v = stream_suite_violations(stream, suite)
            q = (v.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            if not q.awaitTermination(180):
                q.stop()
            break
        except Exception:
            if attempt:
                raise
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

    got = {(r["row_idx"], r["field_path"], r["rule_id"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["row_idx"], r["field_path"], r["rule_id"])
            for r in suite.row_violations(batch).collect()}
    assert got == want and len(want) > 0


def test_stateful_unique_across_batches(spark, stream_src, tmp_path):
    """applyInPandasWithState exact dedup: duplicates are caught even
    when the two arrivals land in DIFFERENT micro-batches (file drops),
    which the windowed check cannot guarantee across window boundaries."""
    from protovalidate_spark.streaming import stateful_unique_violations
    path, batch_df = stream_src
    src = str(tmp_path / "src2")
    out, ckpt = str(tmp_path / "o3"), str(tmp_path / "c3")
    # drop 1: unique keys only
    batch_df.filter(F.col("row_idx") <= 2).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch_df.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    v = stateful_unique_violations(stream, "clip_id")
    write_violations_stream(v, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() == 0
    # drop 2: re-sends clip-0000000001 (dup of drop 1) + a fresh key
    batch_df.filter(F.col("row_idx") >= 3).coalesce(1) \
        .write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(batch_df.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    v2 = stateful_unique_violations(stream2, "clip_id")
    write_violations_stream(v2, out, ckpt).awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    got = {(r["clip_id"], r["dup_count_batch"], r["total_seen"],
            r["rule_id"]) for r in rows}
    assert got == {("clip-0000000001", 1, 2, "UNIQUE")}
