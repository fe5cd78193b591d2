"""Zone-vs-cell crossmatch A/B: the two physical strategies for the same
pair semantics (operators/zones.py vs operators/joins.py crossmatch),
timed head-to-head on a synthetic catalog pair, uniform AND clumped sky.

Three configurations per sky, isolated sessions:

  zones          — Gray/Szalay dec-band equi-join; all-JVM, needs no
                   ingest-time column and no covering math.
  cell_udf       — ring-keyed HEALPix crossmatch computing cells in the
                   plan (the pandas-UDF path a table without an
                   ingest-time index pays).
  cell_ingestcol — ring-keyed crossmatch over a pre-ingested hpx cell
                   column (the production path; ingest cost EXCLUDED —
                   a maintained table amortizes it). Zero Python in-plan.

Pair-count equality across all three is asserted (they implement the
same predicate), so this probe is also a 3-way correctness witness at
millions of rows.

Writes bench_artifacts/zone_vs_cell.json. Run ISOLATED (BENCH.md
methodology: single-box co-tenancy swings shuffle timings 2x).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

N = int(os.environ.get("ZVC_ROWS", "4000000"))
RADIUS = 0.01          # deg; ~60k expected pairs at 4M x 4M uniform
CLUMP_FRAC = 10        # 1/10 of rows into a 2-deg clump (skewed sky)


def get_session(tag: str):
    from spatialindex_spark.plans.session import get_session as gs

    spark = gs(app=f"zvc-{tag}", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def sky(spark, seed: int, clumped: bool):
    """Deterministic hash-derived sky; optionally 10% piled into a
    2-deg-wide clump at (180, 0) — the galactic-plane-style stressor."""
    df = (spark.range(0, N, 1, 128)
          .withColumn("h", F.xxhash64(F.col("id") + F.lit(seed)))
          .withColumn("u1", (F.pmod(F.col("h"), F.lit(360000000))
                             / F.lit(1000000.0)))
          .withColumn("u2", (F.pmod(F.shiftright("h", 13),
                                    F.lit(2000001)) - F.lit(1000000))
                      / F.lit(1000000.0))
          .withColumn("ra0", F.col("u1"))
          .withColumn("dec0", F.degrees(F.asin("u2"))))
    if clumped:
        clump = F.col("id") % CLUMP_FRAC == 0
        df = (df.withColumn("ra", F.when(
                  clump, 180.0 + (F.col("u1") / 180.0 - 1.0))
                  .otherwise(F.col("ra0")))
                .withColumn("dec", F.when(
                  clump, F.col("u2")).otherwise(F.col("dec0"))))
    else:
        df = (df.withColumn("ra", F.col("ra0"))
                .withColumn("dec", F.col("dec0")))
    return df.select("id", "ra", "dec")


def run(tag: str, strategy: str, clumped: bool):
    spark = get_session(tag)
    try:
        left = sky(spark, 1, clumped)
        right = sky(spark, 2, clumped)
        if strategy == "zones":
            from spatialindex_spark.operators.zones import zone_crossmatch

            def go():
                return zone_crossmatch(left, right, RADIUS)
        elif strategy == "cell_udf":
            from spatialindex_spark.operators.joins import crossmatch

            def go():
                return crossmatch(left, right, RADIUS)
        else:  # cell_ingestcol
            from spatialindex_spark.functions.udfs import with_spatial_columns
            from spatialindex_spark.operators.joins import crossmatch

            lvl = 10
            li = with_spatial_columns(left, level=lvl, systems=("hpx",),
                                      spt_ind=None).select(
                "id", "ra", "dec", f"hpx{lvl}").localCheckpoint()
            ri = with_spatial_columns(right, level=lvl, systems=("hpx",),
                                      spt_ind=None).select(
                "id", "ra", "dec", f"hpx{lvl}").localCheckpoint()

            def go():
                return crossmatch(li, ri, RADIUS, cell_col=f"hpx{lvl}",
                                  cell_level=lvl)

        go().agg(F.count(F.lit(1))).collect()          # warm
        t0 = time.perf_counter()
        n = go().agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
        secs = time.perf_counter() - t0
        return {"strategy": strategy, "clumped": clumped,
                "secs": round(secs, 2), "pairs": int(n),
                "rows_per_sec": int(2 * N / secs)}
    finally:
        spark.stop()


def main():
    out = {"rows_each_side": N, "radius_deg": RADIUS, "results": []}
    for clumped in (False, True):
        per = [run(f"{s}-{clumped}", s, clumped)
               for s in ("zones", "cell_udf", "cell_ingestcol")]
        pairs = {p["pairs"] for p in per}
        assert len(pairs) == 1, f"strategy disagreement: {per}"
        out["results"].extend(per)
    os.makedirs("/root/repo/bench_artifacts", exist_ok=True)
    with open("/root/repo/bench_artifacts/zone_vs_cell.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
