"""Bench harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Also times the flagship clips full-pass (WAV decode + all checks) on a
cached deterministic clips table and reports clips/sec. The two-level
scaling-efficiency evidence (local[8] vs local[32]) lives in
``bench/scaling.py`` → BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "validate_lineitem",
    "cross_column_lineitem",
    "stats_lineitem",
    "unique_orders_custkey",
    "ref_customer_nation",
    "hist_quantity",
    "dedup_exact_documents",
    "fingerprint_documents",
    "quality_documents",
    "langid_documents",
    "ann_topk_embeddings",
    "neardup_embeddings",
    "minhash_neardup_documents",
    "simhash_documents",
]

_FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_fixtures")

DRIFT_COLS = ("sr_hz", "dur_ms", "codec")
STATS_COLS = ("clip_id", "sr_hz", "dur_ms", "codec", "transcript")


def ensure_clips_bench(spark, n_rows: int):
    """Deterministic clips table, one directory per size (sizes coexist —
    bench and the scaling harness use different row counts)."""
    from protovalidate_spark.fixtures import Profile, write_clips
    path = os.path.join(_FIXTURES, "clips_bench_N%d" % n_rows)
    marker = os.path.join(path, "_BENCH_READY")
    if not os.path.exists(marker):
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        write_clips(spark, path, Profile(n_rows=n_rows, dur_range_ms=800))
        open(marker, "w").close()
    return path


def ensure_drift_baseline(spark, path: str):
    """Baseline snapshot for the drift check, computed once beside the
    fixture (in production this comes from a previous run's snapshot)."""
    from protovalidate_spark.dataset.drift import load_snapshot, save_snapshot, snapshot
    bpath = path.rstrip("/") + "_drift_baseline.json"
    if not os.path.exists(bpath):
        snap = snapshot(spark.read.parquet(path), list(DRIFT_COLS))
        save_snapshot(snap, bpath)
    return load_snapshot(bpath)


def run_clips_pass(spark, path: str, baseline=None) -> tuple:
    """The FULL metric pass — stats + uniqueness + referential + drift +
    audio decode check (BASELINE.json .metric) — returns
    (rows, violations, seconds)."""
    from protovalidate_spark.clips import clips_suite
    df = spark.read.parquet(path)
    baseline = baseline or ensure_drift_baseline(spark, path)
    t0 = time.time()
    res = clips_suite(spark, drift_baseline=baseline).run(
        df, with_stats=True, persist=True)
    nv = res.violations.count()
    res.stats.write.format("noop").mode("overwrite").save()
    n = df.count()
    dt = time.time() - t0
    res.violations.unpersist()
    return n, nv, dt


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    clips_rows = int(os.environ.get("SPARK_GRAFT_CLIPS_ROWS", "50000"))

    import __spark_entry__ as entrymod

    from protovalidate_spark.conf import local_session
    spark = local_session(cores=int(cpus), app="protovalidate-bench")

    qs = entrymod.queries()
    timings = {}
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    path = ensure_clips_bench(spark, clips_rows)
    baseline = ensure_drift_baseline(spark, path)
    # one untimed warm-up pass (page cache, Python workers, JIT), then the
    # measured steady-state pass — a production validation job is
    # long-running, so steady-state throughput is the honest headline
    n, nv, dt_cold = run_clips_pass(spark, path, baseline)
    n, nv, dt = run_clips_pass(spark, path, baseline)
    timings["clips_full_pass"] = round(dt, 3)
    total += dt_cold + dt

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    print(json.dumps({
        "metric": "suite_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "clips_rows": n,
        "clips_violations": nv,
        "clips_per_sec": round(n / dt, 1),
        "clips_per_sec_cold": round(n / dt_cold, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
