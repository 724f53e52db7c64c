"""Checkpoint/resume: kill after 7/16 partitions, rerun, assert only the
remaining 9 are re-scanned and final outputs equal a cold full run
(FIXTURES.md §5)."""

import os

from protovalidate_spark.clips import clips_suite
from protovalidate_spark.fixtures import TINY, clips_df, expected_violations, write_clips
from protovalidate_spark.runner import (
    read_manifest, run_checkpointed, verdicts_from_outputs,
)


def test_resume_from_manifest(spark, tmp_path_factory):
    table = str(tmp_path_factory.mktemp("clips_table"))
    out = str(tmp_path_factory.mktemp("run_out"))
    write_clips(spark, table, TINY)
    suite = clips_suite(spark)

    # first run dies after 7 partitions
    r1 = run_checkpointed(spark, suite, table, out, max_partitions=7)
    assert len(r1.partitions_run) == 7 and not r1.partitions_skipped
    m1 = read_manifest(os.path.join(out, "_manifest"))
    assert len(m1) == 7  # no global phase yet

    # resume: skips the 7, runs the 9, then the global phase
    r2 = run_checkpointed(spark, suite, table, out)
    assert sorted(r2.partitions_skipped) == sorted(r1.partitions_run)
    assert len(r2.partitions_run) == 9
    m2 = read_manifest(os.path.join(out, "_manifest"))
    assert len(m2) == 17  # 16 partitions + __global__
    for rec in m2.values():
        assert rec["snapshot_id"] and "completed_at" in rec

    # final outputs identical to a cold in-memory full run
    viol = spark.read.parquet(os.path.join(out, "violations"))
    gv = spark.read.parquet(os.path.join(out, "global_violations"))
    got = {(r["row_idx"], r["field_path"], r["rule_id"])
           for r in viol.collect()} | \
          {(r["row_idx"], r["field_path"], r["rule_id"])
           for r in gv.collect()}
    assert got == expected_violations(TINY)

    verdicts = verdicts_from_outputs(spark, out)
    vmap = {r["part_date"]: r for r in verdicts.collect()}
    assert len(vmap) == 16
    assert sum(r["rows_scanned"] for r in vmap.values()) == TINY.n_rows
    # cross-check against the one-shot suite verdicts
    cold = clips_suite(spark).run(clips_df(spark, TINY))
    cold_v = {str(r["part_date"]): (r["pass"], r["rows_scanned"], r["violations"])
              for r in cold.verdicts.collect()}
    for pd_, r in vmap.items():
        assert cold_v[pd_] == (r["pass"], r["rows_scanned"], r["violations"])
