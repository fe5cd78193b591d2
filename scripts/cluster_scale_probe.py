"""Executor-count scaling evidence (north rule: N and 4N EXECUTORS).

bench.py's scaling pairs measure thread scaling inside one JVM
(local[2] -> local[8]); this probe runs the SAME CPU-bound engine stage
(bench.geom_scan_job — 64 cone half-space tests/row, whole-stage
codegen, no Python) on Spark local-cluster mode: real separate executor
JVMs, package shipped via spark.submit.pyFiles, at 1 executor and 4
executors of 2 cores each — the truest N -> 4N executor analog a single
box can host. Every scaling artifact on this VM shares the documented
host caveat: a 2-thread leg turbo-boosts clocks a wider run cannot, so
single-box efficiency UNDER-reports what added-hardware executors give.

Protocol mirrors bench.py's guarded pairs: isolated sessions, untimed
warm pass + median-of-3, post-pair control re-read on the small leg
(drift <= 10% or the pair is rejected), clean-window classification on
both legs, report = median over clean pairs, every attempt recorded.

Writes bench_artifacts/cluster_scaling.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import (EQ_TOTAL, equalization_available, geom_scan_job,  # noqa: E402
                   package_load)

# 192M rows, matching bench.py's r4 recalibration: the fixed per-job
# cost (worker spin-up, task schedules, agg collect) grows with executor
# count and diluted the 4N leg ~37% at 64M rows — see BENCH.md
# "fourth pass". Executor JVMs pay MORE fixed cost than threads (RPC
# task launch, result serialization), so the dilution hit this probe's
# 4-executor leg hardest; 192M amortizes it identically in both legs.
N_ROWS = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "192000000"))
BUDGET = float(os.environ.get("SPARK_GRAFT_CLUSTER_BUDGET", "1200"))
PAIR_TARGET = int(os.environ.get("SPARK_GRAFT_CLUSTER_PAIRS", "3"))
MAX_ATTEMPTS = 10
# clean-window bands (rows/s), env-overridable like bench.py's: executor
# JVMs carry slightly more per-task overhead than in-process threads, so
# the bands sit a notch under the local[2]/local[8] ones.
CLEAN_1E = float(os.environ.get("SPARK_GRAFT_CLEAN_1EXEC", "3.3e6"))
# 4-exec band recalibrated for the 192M-row legs (fixed-cost dilution
# gone, the leg reads materially higher than at 64M)
CLEAN_4E = float(os.environ.get("SPARK_GRAFT_CLEAN_4EXEC", "1.2e7"))


def _zip_pkg() -> str:
    path = "/tmp/spatialindex_spark_probe.zip"
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(REPO, "spatialindex_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith((".py", ".c")):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return path


def _session(n_exec: int, zip_path: str):
    from pyspark.sql import SparkSession

    s = (SparkSession.builder
         .master(f"local-cluster[{n_exec},2,3072]")
         .config("spark.ui.enabled", "false")
         .config("spark.executor.memory", "2g")
         .config("spark.submit.pyFiles", zip_path)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.shuffle.partitions", str(8 * n_exec))
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    return s


def _median_thr(s, n_exec: int, reps: int = 3):
    cores = 2 * n_exec
    geom_scan_job(s, max(N_ROWS // 16, 1_000_000), cores)  # warm JIT
    thrs = []
    for _ in range(reps):
        t0 = time.time()
        geom_scan_job(s, N_ROWS, cores)
        thrs.append(N_ROWS / (time.time() - t0))
    spread = max(thrs) / min(thrs) - 1.0 if len(thrs) > 1 else 0.0
    return statistics.median(thrs), spread


def _isolated(n_exec: int, zip_path: str, reps: int = 3, spinners: int = 0):
    # spinners > 0: equal-package-load legs (see bench.py package_load —
    # a real N vs 4N executor fleet runs fully loaded machines in both
    # legs, so the shared box's idle-package clock boost on the small leg
    # is a measurement artifact; SCHED_IDLE spinners pin the package at
    # the same total load for both legs)
    with package_load(spinners):
        s = _session(n_exec, zip_path)
        try:
            return _median_thr(s, n_exec, reps=reps)
        finally:
            s.stop()


def main() -> int:
    zip_path = _zip_pkg()
    eq_on = equalization_available()
    t_start = time.time()
    attempts = []
    pairs = []
    for i in range(MAX_ATTEMPTS):
        if time.time() - t_start > BUDGET and pairs:
            break
        thr1, sp1 = _isolated(1, zip_path)
        thr4, sp4 = _isolated(4, zip_path)
        ctrl1, _ = _isolated(1, zip_path, reps=1)
        drift = abs(ctrl1 - thr1) / thr1
        clean = thr1 >= CLEAN_1E and thr4 >= CLEAN_4E
        eff = thr4 / (4 * thr1)
        rec = {"attempt": i, "thr_1exec": round(thr1, 1),
               "thr_4exec": round(thr4, 1), "spread_1": round(sp1, 3),
               "spread_4": round(sp4, 3), "control_drift": round(drift, 3),
               "host_state": "clean" if clean else "degraded",
               "efficiency": round(eff, 3),
               "accepted": drift <= 0.10 and sp4 <= 0.20}
        if eq_on:
            # equal-package-load legs in the same attempt window (1 exec
            # = 2 busy cores, 4 execs = 8), own control re-read
            thr1e, _ = _isolated(1, zip_path, reps=2,
                                 spinners=EQ_TOTAL - 2)
            thr4e, sp4e = _isolated(4, zip_path, reps=2,
                                    spinners=EQ_TOTAL - 8)
            ctrl1e, _ = _isolated(1, zip_path, reps=1,
                                  spinners=EQ_TOTAL - 2)
            drift_e = abs(ctrl1e - thr1e) / thr1e
            rec.update({"thr_1exec_eq": round(thr1e, 1),
                        "thr_4exec_eq": round(thr4e, 1),
                        "control_drift_eq": round(drift_e, 3),
                        "efficiency_eq": round(thr4e / (4 * thr1e), 3)})
            rec["accepted"] = (rec["accepted"] and drift_e <= 0.10
                               and sp4e <= 0.20)
        else:
            rec["efficiency_eq"] = rec["efficiency"]
        attempts.append(rec)
        print(json.dumps(rec), flush=True)
        if rec["accepted"] and clean:
            pairs.append(rec)
        if len(pairs) >= PAIR_TARGET:
            break
    out = {
        "job": "exact-geometry region scan (64 cones/row, JVM codegen)",
        "mode": "local-cluster (separate executor JVMs, "
                "spark.submit.pyFiles zip)",
        "rows": N_ROWS,
        "execs_lo": 1, "execs_hi": 4, "cores_per_executor": 2,
        "attempts": attempts,
        "clean_pairs": len(pairs),
    }
    out["equalized"] = eq_on
    if pairs:
        # headline = equal-package-load pair (efficiency_eq aliases the
        # raw number when equalization is unavailable)
        med = statistics.median(p["efficiency_eq"] for p in pairs)
        out["efficiency_execs_1_to_4"] = round(med, 3)
        out["efficiency_execs_1_to_4_idle_package"] = round(
            statistics.median(p["efficiency"] for p in pairs), 3)
        out["thr_rows_per_sec"] = {
            "1exec": statistics.median(p["thr_1exec"] for p in pairs),
            "4exec": statistics.median(p["thr_4exec"] for p in pairs),
        }
    os.makedirs(os.path.join(REPO, "bench_artifacts"), exist_ok=True)
    with open(os.path.join(REPO, "bench_artifacts",
                           "cluster_scaling.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "attempts"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
