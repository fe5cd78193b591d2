"""Real multi-executor evidence: the package shipped as a --py-files zip
to SEPARATE executor JVMs (Spark local-cluster mode) produces the same
answers as thread-local mode.

local[*] threads share the driver's process, so they can never catch
driver-local-state bugs: a Python worker that silently imports the repo
from the driver's cwd, a ctypes .so that can't load from a zip, a
broadcast that only works because the "executor" IS the driver. This
test runs crossmatch + minhash dedup on local-cluster[2,2,*] — two real
executor processes whose Python workers have NO repo on their path and
must import spatialindex_spark from the shipped zip (the native kernel
falls back to numpy there: a .so inside a zip cannot be dlopen'd, and
the import-try guard is exactly what this exercises).

The subprocess is scrubbed of PYTHONPATH and runs from a neutral cwd, so
the only route to the package on executors is spark.submit.pyFiles —
the exact mechanism of spark-submit --py-files
(scripts/submit_example.sh).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, sys, zipfile
repo = sys.argv[1]
tmp = sys.argv[2]
zip_path = os.path.join(tmp, "spatialindex_spark.zip")
with zipfile.ZipFile(zip_path, "w") as z:
    pkg = os.path.join(repo, "spatialindex_spark")
    for root, _, files in os.walk(pkg):
        for f in files:
            if f.endswith((".py", ".c")):
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, repo))

# driver-side import comes from the repo; executors must use the zip
sys.path.insert(0, repo)
from pyspark.sql import SparkSession, functions as F


def run(master):
    b = (SparkSession.builder.master(master)
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8"))
    if master.startswith("local-cluster"):
        b = (b.config("spark.executor.memory", "1g")
             .config("spark.submit.pyFiles", zip_path))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if master.startswith("local-cluster"):
        spark.sparkContext.addPyFile(zip_path)
    from spatialindex_spark.operators.joins import crossmatch
    from spatialindex_spark.operators.dedup import minhash_lsh_dedup

    sky = (spark.range(0, 4000)
           .withColumn("ra", (F.col("id") * F.lit(0.618034)) % 360)
           .withColumn("dec", F.degrees(F.asin(
               2 * ((F.col("id") * F.lit(0.381966)) % 1) - 1))))
    a = sky.select(F.col("id").alias("a_id"), "ra", "dec")
    bb = sky.select((F.col("id") + 10_000).alias("b_id"),
                    ((F.col("ra") + 0.3) % 360).alias("ra"), "dec")
    cm = crossmatch(a, bb, radius_deg=0.5)
    xm = (cm.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("a_id_l") * F.col("b_id_r")).alias("chk"))
          .collect()[0])

    docs = (spark.range(0, 300)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("the quick brown fox jumps over doc "),
                             (F.col("id") % 50).cast("string"),
                             F.lit(" and keeps running onward"))
                    .alias("text")))
    kept = minhash_lsh_dedup(docs, threshold=0.9)
    dd = kept.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("doc_id").alias("chk")).collect()[0]
    spark.stop()
    return (xm["n"], xm["chk"], dd["n"], dd["chk"])


cluster = run("local-cluster[2,2,1536]")
local = run("local[4]")
assert cluster == local, (cluster, local)
print("CLUSTER_OK", cluster)
"""


def test_local_cluster_pyfiles_parity(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, REPO, str(tmp_path)],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CLUSTER_OK" in proc.stdout, proc.stdout[-1000:]
