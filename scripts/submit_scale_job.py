"""Job script for the literal north-rule mechanism: executed via
``spark-submit --py-files`` (see submit_scale_probe.py), NOT imported.

Runs the same CPU-bound engine stage the scaling pairs measure
(bench.geom_scan_job: 64 cone half-space tests/row, whole-stage codegen)
plus one ingest+region-join pass (Arrow UDF cell assignment), and prints
a single JSON line with throughputs. Executors import spatialindex_spark
solely from the --py-files zip; only the driver sees the repo checkout.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # driver-side imports; executors use --py-files


def main() -> None:
    from pyspark.sql import SparkSession

    from bench import geom_scan_job, scaling_job

    n_rows = int(os.environ.get("SUBMIT_SCALE_ROWS", "192000000"))
    # 64M-row legs + median-of-3: 16M single-run readings sat at the
    # 0.8 bar with the same fixed-cost dilution the geometry legs had
    n_ing = int(os.environ.get("SUBMIT_INGEST_ROWS", "64000000"))
    cores = int(os.environ.get("SUBMIT_TOTAL_CORES", "2"))
    reps = int(os.environ.get("SUBMIT_REPS", "3"))

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    geom_scan_job(spark, max(n_rows // 16, 1_000_000), cores)  # warm
    thrs = []
    for _ in range(reps):
        t0 = time.time()
        geom_scan_job(spark, n_rows, cores)
        thrs.append(n_rows / (time.time() - t0))
    thrs.sort()
    geom_thr = thrs[len(thrs) // 2]

    scaling_job(spark, max(n_ing // 8, 500_000), cores)  # warm
    ithrs = []
    for _ in range(reps):
        t0 = time.time()
        scaling_job(spark, n_ing, cores)
        ithrs.append(n_ing / (time.time() - t0))
    ithrs.sort()
    ing_thr = ithrs[len(ithrs) // 2]

    rec = {
        "master": spark.sparkContext.master,
        "executors": len([e for e in spark.sparkContext._jsc.sc()
                          .statusTracker().getExecutorInfos()]) - 1,
        "total_cores": cores,
        "geom_rows": n_rows,
        "geom_thr_rows_per_sec": round(geom_thr, 1),
        "geom_thr_all": [round(t, 1) for t in thrs],
        "ingest_rows": n_ing,
        "ingest_thr_rows_per_sec": round(ing_thr, 1),
        "ingest_thr_all": [round(t, 1) for t in ithrs],
    }
    print("SUBMIT_SCALE_RESULT " + json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
