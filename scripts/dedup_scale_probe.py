"""Dedup scale-up probe: minhash-LSH + exact dedup at 5k/50k/500k docs.
Synthesizes deterministic documents (10% near-dup rate) — no external data."""
import sys, time
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
    w = spark.createDataFrame([(x,) for x in WORDS], "w string")
    base = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array([
            F.element_at(F.lit(WORDS),
                         ((F.xxhash64(F.col("id") * 131 + k) % len(WORDS)
                           + len(WORDS)) % len(WORDS) + 1).cast("int"))
            for k in range(60)])).alias("text")))
    # 10%: near-dup of doc_id-1 (same text + small tail tweak)
    prev = base.select((F.col("doc_id") + 1).alias("doc_id"),
                       F.col("text").alias("_pt"))
    return (base.join(prev, "doc_id", "left")
            .select("doc_id",
                    F.when((F.col("doc_id") % 10 == 0) & F.col("_pt").isNotNull(),
                           F.concat(F.col("_pt"), F.lit(" tail tweak")))
                    .otherwise(F.col("text")).alias("text")))

from spatialindex_spark.operators.dedup import exact_dedup, minhash_lsh_dedup

for n in (5_000, 50_000, 500_000):
    docs = synth_docs(n).persist()
    docs.count()
    for name, fn in (("exact", lambda d: exact_dedup(d).count()),
                     ("minhash", lambda d: minhash_lsh_dedup(d, threshold=0.9).count())):
        fn(docs)  # warm
        t0 = time.perf_counter(); kept = fn(docs); dt = time.perf_counter() - t0
        print(f"n={n} {name}: {dt:.2f}s kept={kept} thr={n/dt/1e3:.0f}k docs/s", flush=True)
    docs.unpersist()
spark.stop()
