"""knn_join skew probe: fixed global probe ladder vs density-adaptive
auto_levels on a clump+field sky — the self-kNN shape a real survey has.

Synthetic sky: N_FIELD rows uniform over the sphere band plus N_CLUMP
rows inside one CLUMP_R-deg box (a dense-cluster hot spot). Self-kNN
(k nearest neighbors for EVERY row, exclude_self). The fixed ladder must
start at a level coarse enough for the sparse field, which turns the
clump into one enormous shuffle key (clump^2 candidate pairs ranked in
one window partition); auto_levels starts each row at the finest level
its local density supports, so the clump probes fine cells and the field
coarse ones.

Measured in isolated sessions (one per config); result equality is
asserted via a full checksum. Writes bench_artifacts/knn_skew_probe.json.
Run ISOLATED (single-box co-tenancy swings shuffle timings 2x).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

N_FIELD = int(os.environ.get("KNN_PROBE_FIELD", "500000"))
N_CLUMP = int(os.environ.get("KNN_PROBE_CLUMP", "10000"))
# residual-extreme-key fixture: N_RESID rows inside ~1 arcsec — one
# level-16 (max_fine_level) cell. The drill-down cannot split it, so the
# candidate join holds one N_RESID^2-pair key REGARDLESS of probe level;
# auto salting splits that single task into ceil(count/SALT_TARGET)
# salt tasks (right rows hashed, left rows replicated) — the regime
# the salt_residual auto-enable targets.
N_RESID = int(os.environ.get("KNN_PROBE_RESID", "12000"))
RESID_R = 1e-5       # deg half-width (~0.04 arcsec: no cell straddle)
# 0.05-deg half-width: the whole clump fits in ~one level-7 cell, so a
# fixed ladder's candidate join enumerates ~clump^2 pairs inside a
# single task — the genuinely-hot regime (a 0.2-deg box spreads over
# ~3 cells at level 7 and never leaves the window-sort-bound regime,
# where the fixed ladder is competitive)
CLUMP_R = 0.05       # deg half-width of the clump box
K = 5
FIXED_LEVELS = (7, 5, 3, 0)   # what the sparse field alone would want


def get_session(tag: str):
    from spatialindex_spark.plans.session import get_session as gs

    spark = gs(app=f"knnskew-{tag}", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def sky(spark):
    u1 = (F.pmod(F.xxhash64(F.col("id") * 3 + 1), F.lit(10 ** 9))
          .cast("double") / 1e9)
    u2 = (F.pmod(F.xxhash64(F.col("id") * 3 + 2), F.lit(10 ** 9))
          .cast("double") / 1e9)
    field = (spark.range(0, N_FIELD, 1, 64)
             .select(F.col("id").alias("pid"),
                     (u1 * 360.0).alias("ra"),
                     (F.degrees(F.asin(u2 * 1.6 - 0.8))).alias("dec")))
    clump = (spark.range(N_FIELD, N_FIELD + N_CLUMP, 1, 8)
             .select(F.col("id").alias("pid"),
                     (40.0 + (u1 * 2 - 1) * CLUMP_R).alias("ra"),
                     (10.0 + (u2 * 2 - 1) * CLUMP_R).alias("dec")))
    return field.unionByName(clump).localCheckpoint(eager=True)


def resid_sky(spark):
    u1 = (F.pmod(F.xxhash64(F.col("id") * 3 + 1), F.lit(10 ** 9))
          .cast("double") / 1e9)
    u2 = (F.pmod(F.xxhash64(F.col("id") * 3 + 2), F.lit(10 ** 9))
          .cast("double") / 1e9)
    field = (spark.range(0, N_FIELD, 1, 64)
             .select(F.col("id").alias("pid"),
                     (u1 * 360.0).alias("ra"),
                     (F.degrees(F.asin(u2 * 1.6 - 0.8))).alias("dec")))
    resid = (spark.range(N_FIELD, N_FIELD + N_RESID, 1, 8)
             .select(F.col("id").alias("pid"),
                     (40.0 + (u1 * 2 - 1) * RESID_R).alias("ra"),
                     (10.0 + (u2 * 2 - 1) * RESID_R).alias("dec")))
    return field.unionByName(resid).localCheckpoint(eager=True)


def run(tag: str, sky_fn=None, **kw):
    from spatialindex_spark.operators import knn as knn_mod
    from spatialindex_spark.operators.knn import knn_join

    spark = get_session(tag)
    pts = (sky_fn or sky)(spark)
    t0 = time.perf_counter()
    out = knn_join(pts, pts, k=K, left_id="pid", right_id="pid",
                   exclude_self=True, on_starved="exact", **kw)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(F.col("pid_l"), F.col("pid_r"),
                                F.col("knn_rank")),
                     F.lit(10 ** 9))).alias("chk")).collect()[0]
    secs = time.perf_counter() - t0
    spark.stop()
    return {"config": tag, "secs": round(secs, 2),
            "rows": agg["n"], "checksum": int(agg["chk"]),
            "salted_cells": knn_mod._DECISIONS.get("salted_cells")}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_artifacts")
    os.makedirs(art, exist_ok=True)
    path = os.path.join(art, "knn_skew_probe.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)

    if mode in ("all", "clump"):
        results = [
            run("auto_levels", level=8, auto_levels=True),
            run("fixed_ladder", level=FIXED_LEVELS[0], levels=FIXED_LEVELS),
            # the opt-in per-cell partial top-k: caps the hot cell's
            # contribution to the global rank at k rows per (lid, cell) —
            # the mitigation available when a fixed ladder must face a
            # clump (auto_levels makes it unnecessary by probing finer)
            run("fixed_ladder_partial_topk", level=FIXED_LEVELS[0],
                levels=FIXED_LEVELS, partial_topk=True),
        ]
        assert all(r["rows"] == K * (N_FIELD + N_CLUMP) for r in results)
        assert len({r["checksum"] for r in results}) == 1, \
            "configs disagree on the result"
        out.update({
            "n_field": N_FIELD, "n_clump": N_CLUMP,
            "clump_halfwidth_deg": CLUMP_R,
            "k": K, "fixed_levels": list(FIXED_LEVELS),
            "measurement": "isolated session per config, single timed run",
            "results": results,
            "speedup_auto_over_fixed": round(
                results[1]["secs"] / results[0]["secs"], 2),
        })

    if mode in ("all", "resid", "resid_big"):
        # PAST the drill-down caps: the clump fits one max_fine_level
        # cell, so no probe level can split its join key. A/B the auto
        # residual salting (should self-enable) against it forced off,
        # plus the rejected alternative (partial_topk on the unsalted
        # plan — its zero-Exchange groupBy serializes INSIDE the hot
        # join task, measured 150 s vs 98 s unsalted on this fixture).
        resid = [
            run("resid_salted_auto", sky_fn=resid_sky, level=8,
                auto_levels=True),
            run("resid_unsalted", sky_fn=resid_sky, level=8,
                auto_levels=True, salt_residual=False),
        ]
        # the rejected alternative is expensive at large N_RESID (its
        # collect_list serializes inside the one hot task) — opt out
        # with KNN_PROBE_RESID_PARTIAL=0
        if os.environ.get("KNN_PROBE_RESID_PARTIAL", "1") != "0":
            resid.append(
                run("resid_unsalted_partial_topk", sky_fn=resid_sky,
                    level=8, auto_levels=True, salt_residual=False,
                    partial_topk=True))
        assert all(r["rows"] == K * (N_FIELD + N_RESID) for r in resid)
        assert len({r["checksum"] for r in resid}) == 1, \
            "residual configs disagree on the result"
        assert resid[0]["salted_cells"] >= 1, \
            "auto failed to detect the residual extreme key"
        assert all(r["salted_cells"] == 0 for r in resid[1:])
        key = "resid_results" if mode != "resid_big" else "resid_big_results"
        pfx = "resid" if mode != "resid_big" else "resid_big"
        for stale in ("n_resid", "resid_halfwidth_deg",
                      "resid_speedup_partial"):
            out.pop(stale, None)
        out.update({
            f"{pfx}_n_field": N_FIELD,
            f"{pfx}_n": N_RESID, f"{pfx}_halfwidth_deg": RESID_R,
            key: resid,
            f"{pfx}_speedup_salted": round(
                resid[1]["secs"] / resid[0]["secs"], 2),
        })

    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
