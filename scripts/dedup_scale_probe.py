"""Dedup scale-up probe: minhash-LSH + exact dedup at 50k/500k/5M docs,
with the isolated per-stage split (signatures+banding, verify, total).
Synthesizes deterministic documents (10% near-dup rate) — no external data.

Writes bench_artifacts/dedup_probe.json; bench.py embeds it (the probe is
run ISOLATED — never concurrent with other jobs — because single-box
end-to-end timings swing 2x under co-tenancy; see BENCH.md methodology).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from spatialindex_spark.plans.session import get_session

spark = get_session(cores=32)
spark.sparkContext.setLogLevel("ERROR")

WORDS = ("the data pipeline ingests documents and filters near duplicates "
         "with banded minhash signatures over shingled byte windows while "
         "quality scores gate low content rows before packing sequences "
         "into fixed context windows for training shards").split()


def synth_docs(n):
    # deterministic pseudo-text: ~60 words per doc, 10% near-dup pairs
    base = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array([
            F.element_at(F.lit(WORDS),
                         ((F.xxhash64(F.col("id") * 131 + k) % len(WORDS)
                           + len(WORDS)) % len(WORDS) + 1).cast("int"))
            for k in range(60)])).alias("text")))
    prev = base.select((F.col("doc_id") + 1).alias("doc_id"),
                       F.col("text").alias("_pt"))
    return (base.join(prev, "doc_id", "left")
            .select("doc_id",
                    F.when((F.col("doc_id") % 10 == 0) & F.col("_pt").isNotNull(),
                           F.concat(F.col("_pt"), F.lit(" tail tweak")))
                    .otherwise(F.col("text")).alias("text")))


from spatialindex_spark.operators.dedup import (  # noqa: E402
    _band_pairs, _minhash_frame, exact_dedup, minhash_lsh_dedup,
    minhash_verified_pairs, pick_bands)

NUM_PERM, K, THRESHOLD = 64, 5, 0.9
results = []
for n in (50_000, 500_000, 5_000_000):
    docs = synth_docs(n).persist()
    docs.count()
    rec = {"n_docs": n}

    t0 = time.perf_counter()
    rec["exact_kept"] = exact_dedup(docs).count()
    rec["exact_sec"] = round(time.perf_counter() - t0, 2)

    # isolated per-stage split (each localCheckpoint is eager, so the
    # timer brackets exactly that stage's jobs)
    bands = pick_bands(NUM_PERM, THRESHOLD)
    t0 = time.perf_counter()
    pairs = _band_pairs(_minhash_frame(docs, "text", "doc_id", NUM_PERM, K),
                        "doc_id", NUM_PERM, bands,
                        distinct=False).localCheckpoint(eager=True)
    rec["stage_sig_band_sec"] = round(time.perf_counter() - t0, 2)
    rec["candidate_pairs"] = pairs.count()

    t0 = time.perf_counter()
    verified = minhash_verified_pairs(docs, pairs, "text", "doc_id", K,
                                      THRESHOLD).localCheckpoint(eager=True)
    rec["stage_verify_sec"] = round(time.perf_counter() - t0, 2)
    rec["verified_pairs"] = verified.count()

    t0 = time.perf_counter()
    losers = verified.select(F.col("id_b").alias("doc_id")).distinct()
    rec["minhash_kept"] = docs.join(losers, "doc_id", "left_anti").count()
    rec["stage_anti_join_sec"] = round(time.perf_counter() - t0, 2)

    # end-to-end (warm) for the headline per-doc number
    minhash_lsh_dedup(docs, threshold=THRESHOLD).count()  # warm
    t0 = time.perf_counter()
    minhash_lsh_dedup(docs, threshold=THRESHOLD).count()
    rec["minhash_total_sec"] = round(time.perf_counter() - t0, 2)
    rec["per_doc_ms"] = round(rec["minhash_total_sec"] / n * 1e3, 4)

    # simhash end-to-end (native kernel path), warm
    from spatialindex_spark.operators.dedup import simhash_dedup

    simhash_dedup(docs).count()  # warm
    t0 = time.perf_counter()
    rec["simhash_kept"] = simhash_dedup(docs).count()
    rec["simhash_total_sec"] = round(time.perf_counter() - t0, 2)
    results.append(rec)
    print(json.dumps(rec), flush=True)
    docs.unpersist()

out = {"measurement": "isolated session, warm end-to-end + per-stage "
                      "eager-checkpoint brackets, local[32]",
       "num_perm": NUM_PERM, "k": K, "threshold": THRESHOLD,
       "rows": results}
os.makedirs("/root/repo/bench_artifacts", exist_ok=True)
with open("/root/repo/bench_artifacts/dedup_probe.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote bench_artifacts/dedup_probe.json")
spark.stop()
