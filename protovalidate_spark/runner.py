"""Checkpointed partition runner: per-partition validation with a resume
manifest (FIXTURES.md §5; BASELINE.json north_rule "resumable from
checkpoint with per-partition lineage + metrics").

Iceberg-style layout: the input is a ``part_date=...`` directory-partitioned
Parquet table (a real Iceberg catalog slots in by replacing
``list_partitions``/``read_partition`` with snapshot + manifest reads).

Manifest: one JSON line per completed partition —
(part_date, snapshot_id, file_list, rows_scanned, violations, wall_ms,
completed_at). A rerun skips partitions already present (resume), then
re-runs the cheap GLOBAL phase (uniqueness/ref/drift span partitions) and
records it under the ``__global__`` key.

Scale notes: each partition job reads ONLY its directory (partition
pruning); violations stream to a partitioned Parquet sink; the manifest is
O(partitions). Skew: a hot partition (70% ``wav``) still parallelizes
internally across its files/row-groups; dataset-level aggs use map-side
partial aggregation + optional salting (see dataset/uniqueness.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .sources import read_partition, read_table, table_partitions, table_snapshot_id
from .suite import ValidationSuite

MANIFEST_NAME = "manifest.jsonl"
GLOBAL_KEY = "__global__"


def list_partitions(table_path: str, partition_col: str) -> List[str]:
    vals = []
    for name in sorted(os.listdir(table_path)):
        if name.startswith(f"{partition_col}="):
            vals.append(name.split("=", 1)[1])
    return vals


def partition_files(table_path: str, partition_col: str, value: str) -> List[str]:
    d = os.path.join(table_path, f"{partition_col}={value}")
    return sorted(
        os.path.join(d, f) for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def read_manifest(manifest_dir: str) -> dict:
    path = os.path.join(manifest_dir, MANIFEST_NAME)
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["part"]] = rec
    return done


def append_manifest(manifest_dir: str, rec: dict) -> None:
    os.makedirs(manifest_dir, exist_ok=True)
    with open(os.path.join(manifest_dir, MANIFEST_NAME), "a") as f:
        f.write(json.dumps(rec) + "\n")


@dataclass
class RunReport:
    partitions_run: List[str]
    partitions_skipped: List[str]
    total_rows: int
    total_violations: int


def run_checkpointed(
    spark: SparkSession,
    suite: ValidationSuite,
    table_path: str,
    output_dir: str,
    snapshot_id: str = "",
    fail_fast: bool = False,
    max_partitions: Optional[int] = None,
) -> RunReport:
    """Validate partition-by-partition with resume.

    Row-level checks run per partition (resumable unit). Dataset-level
    checks (uniqueness/referential/drift are cross-partition by nature) run
    in a final global phase over the full table — recorded separately so a
    resumed run redoes only un-checkpointed partitions + the global phase.
    """
    pc = suite.partition_col or "part_date"
    manifest_dir = os.path.join(output_dir, "_manifest")
    viol_dir = os.path.join(output_dir, "violations")
    done = read_manifest(manifest_dir)
    # source seam: Iceberg catalog table (partitions/snapshots from
    # metadata tables) or directory-partitioned Parquet (fixtures)
    parts = table_partitions(spark, table_path, pc)
    snapshot_id = snapshot_id or table_snapshot_id(spark, table_path)

    ran, skipped = [], []
    total_rows = total_viol = 0
    n_run = 0
    for pv in parts:
        if pv in done:
            skipped.append(pv)
            continue
        if max_partitions is not None and n_run >= max_partitions:
            break
        t0 = time.time()
        files = (partition_files(table_path, pc, pv)
                 if os.path.isdir(table_path) else [])
        pdf = read_partition(spark, table_path, pc, pv)
        if pdf is None:
            # partition vanished between the listing and the read
            # (compaction/expiry race) — record an empty completion so the
            # run continues and a resume doesn't retry it forever
            append_manifest(manifest_dir, {
                "part": pv, "snapshot_id": snapshot_id, "file_list": [],
                "rows_scanned": 0, "violations": 0, "wall_ms": 0,
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime()),
            })
            ran.append(pv)
            n_run += 1
            continue
        rows = pdf.count()
        rv = suite.row_violations(pdf)
        # Observation rides the write action — no second job / re-read
        # of the written files just to count them
        obs = Observation()
        (rv.observe(obs, F.count(F.lit(1)).alias("n"))
           .write.mode("overwrite")
           .parquet(os.path.join(viol_dir, f"{pc}={pv}")))
        nv = obs.get["n"]
        wall_ms = int((time.time() - t0) * 1000)
        append_manifest(manifest_dir, {
            "part": pv, "snapshot_id": snapshot_id, "file_list": files,
            "rows_scanned": rows, "violations": nv, "wall_ms": wall_ms,
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        })
        ran.append(pv)
        total_rows += rows
        total_viol += nv
        n_run += 1
        if fail_fast and nv:
            break

    # global phase: dataset-level checks over the whole table — only once
    # every partition is checkpointed (a truncated run resumes later)
    if len(skipped) + len(ran) == len(parts):
        t0 = time.time()
        full = read_table(spark, table_path)
        gparts = suite.dataset_violations(full)
        if gparts:
            g = gparts[0]
            for p in gparts[1:]:
                g = g.unionByName(p.select(*g.columns))
            g.write.mode("overwrite").parquet(os.path.join(output_dir, "global_violations"))
            gn = spark.read.parquet(os.path.join(output_dir, "global_violations")).count()
        else:
            gn = 0
        append_manifest(manifest_dir, {
            "part": GLOBAL_KEY, "snapshot_id": snapshot_id, "file_list": [],
            "rows_scanned": 0, "violations": gn,
            "wall_ms": int((time.time() - t0) * 1000),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        })
        total_viol += gn

    return RunReport(ran, skipped, total_rows, total_viol)


def verdicts_from_outputs(spark: SparkSession, output_dir: str,
                          partition_col: str = "part_date") -> DataFrame:
    """Reconstruct per-partition verdicts from the manifest + violation
    sink (pass ⇔ zero violations in partition, FIXTURES.md §5). Global
    violations with a non-null partition key count against that partition."""
    done = read_manifest(os.path.join(output_dir, "_manifest"))
    rows = []
    gv_path = os.path.join(output_dir, "global_violations")
    gv = None
    if os.path.exists(gv_path):
        gv = (spark.read.parquet(gv_path)
              .filter(F.col(partition_col).isNotNull())
              .groupBy(partition_col).count())
        gv = {str(r[partition_col]): r["count"] for r in gv.collect()}
    for pv, rec in done.items():
        if pv == GLOBAL_KEY:
            continue
        extra = (gv or {}).get(pv, 0)
        n = rec["violations"] + extra
        rows.append((pv, n == 0, rec["rows_scanned"], n, rec["wall_ms"]))
    return spark.createDataFrame(
        rows, "part_date string, pass boolean, rows_scanned long, "
              "violations long, wall_ms long")
