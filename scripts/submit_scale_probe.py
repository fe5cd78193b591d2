"""The north rule verbatim: ``spark-submit --py-files`` at N and 4N
executors, throughput at both, scaling efficiency between them.

Invokes the REAL spark-submit binary (not a python-created session) on
submit_scale_job.py twice — local-cluster[1,2,*] and local-cluster[4,2,*]
(1 vs 4 executor JVMs, 2 cores each) — with the package shipped via
--py-files. Complements scripts/cluster_scale_probe.py (same topology,
guarded multi-pair protocol, in-process sessions): this probe exists to
exercise the literal submission mechanism end-to-end; the guarded probe
owns the statistics.

Writes bench_artifacts/spark_submit_scaling.json.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def _zip_pkg() -> str:
    path = "/tmp/spatialindex_spark_submit.zip"
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(REPO, "spatialindex_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith((".py", ".c")):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
        # the job script imports bench for the shared job definitions
        z.write(os.path.join(REPO, "bench.py"), "bench.py")
    return path


def _run_leg(n_exec: int, zip_path: str) -> dict:
    cores = 2 * n_exec
    env = dict(os.environ,
               SUBMIT_TOTAL_CORES=str(cores),
               SUBMIT_SCALE_ROWS=os.environ.get(
                   "SPARK_GRAFT_SCALE_ROWS", "192000000"))
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local-cluster[{n_exec},2,3072]",
        "--py-files", zip_path,
        "--conf", "spark.executor.memory=2g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", f"spark.sql.shuffle.partitions={8 * n_exec}",
        os.path.join(REPO, "scripts", "submit_scale_job.py"),
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                       env=env,
                       cwd="/tmp")  # neutral cwd: no repo on executor path
    m = re.search(r"SUBMIT_SCALE_RESULT (\{.*\})", r.stdout)
    if not m:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:] + "\n")
        raise RuntimeError(f"leg {n_exec} executors: no result line")
    return json.loads(m.group(1))


def main() -> None:
    zip_path = _zip_pkg()
    legs = {}
    for n_exec in (1, 4):
        legs[n_exec] = _run_leg(n_exec, zip_path)
        print(json.dumps(legs[n_exec]), flush=True)
    eff = (legs[4]["geom_thr_rows_per_sec"]
           / legs[1]["geom_thr_rows_per_sec"]) / 4
    out = {
        "mechanism": "spark-submit --py-files (real binary, neutral cwd; "
                     "executors import the package from the zip only)",
        "job": "exact-geometry region scan (64 cones/row, JVM codegen) "
               "+ ingest pipeline",
        "legs": legs,
        "efficiency_execs_1_to_4": round(eff, 3),
        "note": "single run per leg — the submission-mechanism witness; "
                "scripts/cluster_scale_probe.py owns the guarded "
                "multi-pair statistics on the same topology",
    }
    art = os.path.join(REPO, "bench_artifacts", "spark_submit_scaling.json")
    os.makedirs(os.path.dirname(art), exist_ok=True)
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("efficiency_execs_1_to_4",)}),
          flush=True)


if __name__ == "__main__":
    main()
