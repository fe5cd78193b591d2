"""Isolated crossmatch-at-sf1 probe (round-5 VERDICT item 5).

Round 4's driver capture read crossmatch sf1 at 3.19 s vs round 3's
2.13-2.22 s band. Two suspects were named: (a) session debt in the
full-bench ordering (crossmatch sf1 runs after ~20 queries have filled
the shared session with shuffle files, broadcast refs and JVM garbage),
(b) the round-4 `_ring1_map_df` caching change in operators/joins.py.

This probe separates them: a FRESH session per config, the exact bench
job (2% deterministic sample x 1M images, r=0.05 deg, hpx7 keys), one
warm pass + min of N timed passes — the same steady-state rule bench.py
uses. If the isolated number sits back in the r3 band, the regression is
session debt in the bench ordering, not the operator.

Usage: python scripts/crossmatch_sf1_probe.py [passes]
Writes bench_artifacts/crossmatch_sf1_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from bench import build_image_table, get_session
    from spatialindex_spark.operators.joins import crossmatch

    p1 = "/tmp/spark_graft_bench_images_sf1.0"
    spark = get_session(32)
    if not os.path.exists(p1):
        build_image_table(spark, 1_000_000, p1)
    img = spark.read.parquet(p1)
    n1 = img.count()

    def xmatch():
        sample = (img.select("image_id", "ra", "dec", "hpx7")
                  .filter(F.abs(F.xxhash64("image_id")) % 50 == 0))
        return crossmatch(sample,
                          img.select("image_id", "ra", "dec", "hpx7"),
                          0.05, cell_col="hpx7", cell_level=7).count()

    rows = xmatch()          # warm: JIT + Python workers + shuffle dirs
    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        xmatch()
        times.append(round(time.perf_counter() - t0, 3))
    spark.stop()

    rec = {
        "n_images": n1,
        "match_rows": rows,
        "passes": times,
        "best": min(times),
        "median": sorted(times)[len(times) // 2],
        "r3_band": [2.13, 2.22],
        "r4_driver_capture": 3.19,
        "measurement": ("fresh isolated session, warm pass + "
                        f"min/median of {passes} timed passes — the exact "
                        "bench.py sf1 crossmatch job"),
    }
    out = os.path.join(REPO, "bench_artifacts", "crossmatch_sf1_probe.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print("CROSSMATCH_SF1_PROBE " + json.dumps(rec))


if __name__ == "__main__":
    main()
