"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Dot products run JVM-side via zip_with/aggregate (no Python in the loop);
  ranking via Window.
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path. Each
  vector gets a b-bit signature; candidates share a bucket (or a neighbor
  bucket within Hamming 1 for recall); exact cosine re-rank afterwards.
  Shuffle volume drops from O(Q x N) to O(Q x N / 2^b) per bucket.
- ``ivf_topk``: IVF-style coarse quantizer — k-means-lite centroids sampled
  deterministically, vectors assigned to nearest centroid (pandas UDF,
  one pass), queries probe ``nprobe`` nearest centroids.
- ``embedding_cosine_dedup``: near-duplicate vectors (cosine >= threshold)
  removed via LSH buckets + exact verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf


def _cosine_col(a: str, b: str):
    """JVM-side cosine between two array<float/double> columns."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(queries: DataFrame, data: DataFrame, k: int,
                     q_id: str = "query_id", q_vec: str = "embedding",
                     d_id: str = "vec_id", d_vec: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast (small set);
    the big side streams through one JVM-side projection — no shuffle until
    the final per-query window over k-bounded groups."""
    q = queries.select(F.col(q_id), F.col(q_vec).alias("_qv"))
    d = data.select(F.col(d_id), F.col(d_vec).alias("_dv"))
    scored = d.join(F.broadcast(q)).withColumn("cosine", _cosine_col("_qv", "_dv"))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(d_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, d_id, "cosine", "rank"))


def _hyperplanes(dim: int, bits: int) -> np.ndarray:
    rng = np.random.default_rng(987)
    return rng.standard_normal((bits, dim))


def signature_udf(dim: int, bits: int = 12):
    H = _hyperplanes(dim, bits)

    @pandas_udf("long")
    def _udf(vec: pd.Series) -> pd.Series:
        M = np.stack(vec.values)  # (n, dim)
        proj = M @ H.T > 0  # (n, bits)
        sig = np.zeros(len(vec), dtype=np.int64)
        for j in range(bits):
            sig |= proj[:, j].astype(np.int64) << j
        return pd.Series(sig)

    return _udf


def lsh_topk(queries: DataFrame, data: DataFrame, k: int, dim: int,
             bits: int = 10, hamming_probe: int = 1,
             q_id: str = "query_id", q_vec: str = "embedding",
             d_id: str = "vec_id", d_vec: str = "embedding") -> DataFrame:
    """Approximate cosine top-k: random-hyperplane buckets, queries probe all
    buckets within ``hamming_probe`` bit flips, exact cosine re-rank."""
    sig = signature_udf(dim, bits)
    d = data.select(F.col(d_id), F.col(d_vec).alias("_dv"),
                    sig(F.col(d_vec)).alias("_bkt"))

    # every XOR mask with <= hamming_probe bits set (C(bits, d) probes per
    # distance d — the documented knob really widens the search)
    from itertools import combinations

    masks = [0]
    for d_ in range(1, hamming_probe + 1):
        masks += [sum(1 << j for j in c) for c in combinations(range(bits), d_)]
    probes = [F.col("_sig").bitwiseXOR(F.lit(m)) for m in masks]
    q = (queries.select(F.col(q_id), F.col(q_vec).alias("_qv"),
                        sig(F.col(q_vec)).alias("_sig"))
         .withColumn("_bkt", F.explode(F.array(*probes)))
         .drop("_sig"))

    scored = d.join(F.broadcast(q), "_bkt").withColumn("cosine", _cosine_col("_qv", "_dv"))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(d_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, d_id, "cosine", "rank"))


def ivf_topk(queries: DataFrame, data: DataFrame, k: int, dim: int,
             ncentroids: int = 16, nprobe: int = 4,
             q_id: str = "query_id", q_vec: str = "embedding",
             d_id: str = "vec_id", d_vec: str = "embedding") -> DataFrame:
    """IVF-style ANN: deterministic sampled centroids; data assigned to the
    nearest centroid once; queries probe the ``nprobe`` nearest lists."""
    sample = np.stack([r[0] for r in
                       data.select(d_vec).limit(ncentroids * 20).collect()])
    rng = np.random.default_rng(55)
    cent = sample[rng.choice(len(sample), ncentroids, replace=False)]
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    @pandas_udf("int")
    def assign(vec: pd.Series) -> pd.Series:
        M = np.stack(vec.values)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ cent.T, axis=1).astype(np.int32))

    @pandas_udf("array<int>")
    def probe(vec: pd.Series) -> pd.Series:
        M = np.stack(vec.values)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        top = np.argsort(-(M @ cent.T), axis=1)[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in top])

    d = data.select(F.col(d_id), F.col(d_vec).alias("_dv"), assign(F.col(d_vec)).alias("_list"))
    q = (queries.select(F.col(q_id), F.col(q_vec).alias("_qv"),
                        F.explode(probe(F.col(q_vec))).alias("_list")))
    scored = d.join(F.broadcast(q), "_list").withColumn("cosine", _cosine_col("_qv", "_dv"))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(d_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, d_id, "cosine", "rank"))


def embedding_cosine_dedup(df: DataFrame, dim: int, threshold: float = 0.98,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           bits: int = 10) -> DataFrame:
    """Drop near-duplicate vectors (cosine >= threshold), keeping min id.
    Same-bucket candidate pairs only — the standard LSH dedup shuffle shape."""
    sig = signature_udf(dim, bits)
    s = df.select(F.col(id_col), F.col(vec_col).alias("_v"), sig(F.col(vec_col)).alias("_bkt"))
    a = s.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), "_bkt")
    b = s.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), "_bkt")
    pairs = (a.join(b, "_bkt").filter(F.col("id_a") < F.col("id_b"))
             .withColumn("cosine", _cosine_col("_va", "_vb"))
             .filter(F.col("cosine") >= threshold))
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
