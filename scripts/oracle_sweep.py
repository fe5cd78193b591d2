"""Full oracle sweep: every queries() entry value-checked against its
DuckDB oracle at BOTH sf0.01 (the driver's gate scale) and sf0.1 (10x),
as one command.

The 10x leg is the scale regression gate: running the identical battery
at sf0.1 in round 3 caught two real bugs the sf0.01 gate could not see
(ANSI overflow on S2 face-3 ids near 2^63; an LSH recall tail that only
shows once enough near-dup twins exist). Run this before every round's
final commit.

Usage:
    python scripts/oracle_sweep.py            # both scales, all queries
    python scripts/oracle_sweep.py sf0.01     # one scale
    python scripts/oracle_sweep.py sf0.1 knn crossmatch   # subset

Exit code 0 iff every checked query matches rows+schema+values.
Writes a machine-readable summary to bench_artifacts/oracle_sweep.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_scale(sf_dir: str, names: list[str]) -> dict:
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "oracle_check.py"),
         sf_dir, *names],
        capture_output=True, text=True, cwd=REPO)
    secs = time.perf_counter() - t0
    tail = proc.stdout.strip().splitlines()
    failures = [ln for ln in tail if "FAIL" in ln or "mismatch" in ln]
    ok = proc.returncode == 0
    return {"sf_dir": sf_dir, "ok": ok, "secs": round(secs, 1),
            "failures": failures,
            "last_lines": tail[-3:],
            "stderr_tail": proc.stderr.strip().splitlines()[-2:]
            if not ok else []}


def main() -> int:
    args = sys.argv[1:]
    scales = []
    names = []
    for a in args:
        if a.startswith("sf") or "/" in a:
            scales.append(a if "/" in a else f"/root/testdata/{a}")
        else:
            names.append(a)
    if not scales:
        scales = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    results = []
    all_ok = True
    for sf_dir in scales:
        print(f"=== sweep {sf_dir} ===", flush=True)
        res = run_scale(sf_dir, names)
        results.append(res)
        for ln in res["last_lines"]:
            print(" ", ln)
        if not res["ok"]:
            all_ok = False
            print(f"  FAILED ({sf_dir})")
            for ln in res["failures"] or res["stderr_tail"]:
                print("   ", ln)

    art = os.path.join(REPO, "bench_artifacts")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "oracle_sweep.json"), "w") as f:
        json.dump({"ok": all_ok, "scales": results,
                   "subset": names or "all"}, f, indent=1)
    print("SWEEP", "PASS" if all_ok else "FAIL")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
