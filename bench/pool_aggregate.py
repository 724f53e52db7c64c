"""Aggregate k scaling.py runs into the pooled BENCH.md evidence table.

Each ``python bench/scaling.py`` run prints one JSON line; collect them
(one per line) into a file and run

    python bench/pool_aggregate.py /tmp/scaling_pool_r3.jsonl

Prints the pooled estimators (pooled-pass median per level, pooled
efficiency, median-of-run-efficiencies) and a ready-to-paste markdown
table.  Pooling across runs is the protocol on this box: single runs
swing up to +/-50% (BENCH.md), so the noise-robust pooled estimators —
not any one run — are the headline.
"""

from __future__ import annotations

import json
import statistics
import sys


def main(path: str) -> int:
    runs = []
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            runs.append(json.loads(line))
    if not runs:
        print("no runs in", path)
        return 1

    rows = runs[0]["rows"]
    n, n4 = runs[0]["n_cores"], runs[0]["n4_cores"]
    lo_all = sorted(x for r in runs for x in r["passes_sec_n"])
    hi_all = sorted(x for r in runs for x in r["passes_sec_4n"])
    med_lo = statistics.median(lo_all)
    med_hi = statistics.median(hi_all)
    pooled_eff = (rows / med_hi) / (4.0 * (rows / med_lo))
    best_eff = (rows / min(hi_all)) / (4.0 * (rows / min(lo_all)))
    run_effs = sorted(r["scaling_efficiency"] for r in runs)
    med_run_eff = statistics.median(run_effs)

    print(json.dumps({
        "runs": len(runs), "rows": rows, "n": n, "n4": n4,
        "pooled_median_sec_n": round(med_lo, 1),
        "pooled_median_sec_4n": round(med_hi, 1),
        "pooled_clips_per_sec_n": round(rows / med_lo, 1),
        "pooled_clips_per_sec_4n": round(rows / med_hi, 1),
        "pooled_efficiency": round(pooled_eff, 3),
        "pooled_best_pass_efficiency": round(best_eff, 3),
        "median_of_run_efficiencies": round(med_run_eff, 3),
        "per_run_efficiencies": run_effs,
    }))

    # Probe-stratified pooled estimate: keep only passes whose recorded
    # CPU-steal is under the threshold (steal = cycles the shared HOST
    # took; see scaling_worker.steal_ticks). Runs predating the probe
    # have no per-pass steal and are excluded from this stratum.
    STEAL_MAX = 2.0  # cpu-seconds per pass
    lo_clean = [x for r in runs
                for x, st in zip(r["passes_sec_n"],
                                 r.get("steal_cpu_sec_n") or [])
                if st is not None and st <= STEAL_MAX]
    hi_clean = [x for r in runs
                for x, st in zip(r["passes_sec_4n"],
                                 r.get("steal_cpu_sec_4n") or [])
                if st is not None and st <= STEAL_MAX]
    if lo_clean and hi_clean:
        ml, mh = statistics.median(lo_clean), statistics.median(hi_clean)
        print(json.dumps({
            "steal_clean_stratum": {
                "steal_max_cpu_sec": STEAL_MAX,
                "passes_n": len(lo_clean), "passes_4n": len(hi_clean),
                "median_sec_n": round(ml, 1), "median_sec_4n": round(mh, 1),
                "efficiency": round((rows / mh) / (4.0 * (rows / ml)), 3),
            }}))

    print()
    print("| run | local[%d] passes (s) | local[%d] passes (s) | "
          "clips/s @%d | clips/s @%d | efficiency |" % (n, n4, n, n4))
    print("|---|---|---|---|---|---|")
    for i, r in enumerate(runs, 1):
        lo = statistics.median(r["passes_sec_n"])
        hi = statistics.median(r["passes_sec_4n"])
        eff = r["scaling_efficiency"]
        mark = "**%.3f**" % eff if eff >= 0.8 else "%.3f" % eff
        print("| %d | %s | %s | %s | %s | %s |" % (
            i,
            ", ".join("%.1f" % x for x in r["passes_sec_n"]),
            ", ".join("%.1f" % x for x in r["passes_sec_4n"]),
            "{:,.0f}".format(rows / lo), "{:,.0f}".format(rows / hi), mark))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  "/tmp/scaling_pool_r3.jsonl"))
