"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Dot products run JVM-side via zip_with/aggregate (no Python in the loop);
  ranking via Window.
- ``lsh_topk``: sign-random-projection LSH bucketing — the scale path. Each
  vector gets a b-bit signature; candidates share a bucket (or a neighbor
  bucket within ``hamming_probe`` bit flips for recall); exact cosine
  re-rank afterwards. Shuffle volume drops from O(Q x N) to
  O(Q x N x probes / 2^b).
- ``ivf_topk``: IVF-style coarse quantizer — centroids drawn by a
  deterministic multiplicative id-hash (spans the whole id space, unlike a
  head-rows ``limit()`` which is one shard's distribution at scale),
  vectors assigned to nearest centroid (pandas UDF, one pass), queries
  probe ``nprobe`` nearest lists.
- ``embedding_cosine_dedup``: near-duplicate vectors (cosine >= threshold)
  removed via banded LSH candidate buckets + exact verify (same band
  recall structure as MinHash-LSH: miss prob = (1-(1-p)^band_bits)^nbands).

Signatures default to **integer-quantized ternary projections**: vectors
are quantized to floor(v * 1024) (power-of-two scale — the float64
multiply and floor are exact) and projected onto seeded Achlioptas sparse
hyperplanes with entries in {-1, 0, +1} (Achlioptas 2003, database-friendly
random projections). The projection is then pure int64 arithmetic —
order-independent and bit-reproducible in ANSI SQL, which is what lets the
driver's DuckDB oracle replicate the *entire* ANN/dedup pipeline (bucket
assignment included) and machine-check recall@k. Dense float hyperplanes
(``signature_udf``) remain available but are not SQL-reproducible.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf

#: power of two => float64 multiply + floor are exact, so numpy and any
#: ANSI-SQL engine quantize to identical integers.
QUANT_SCALE = 1024

#: default seed for hyperplane draws (shared with the SQL oracle builder).
PLANE_SEED = 987


def _cosine_col(a: str, b: str):
    """JVM-side cosine between two array<float/double> columns.

    The norm product is floored at 1e-24 (norms below 1e-12 — far under
    any real embedding): an all-zeros vector used to produce 0.0/0.0 =
    NaN, and Spark orders NaN ABOVE every double, so the zero vector
    ranked first in every top-k it touched and NaN >= threshold held in
    the dedup filters. With the floor it scores 0.0 — below any positive
    similarity, never past a positive threshold. (The DuckDB oracle's
    ``list_cosine_similarity`` has its own zero-vector convention; the
    gate tables contain none, so the oracles pin the nonzero path.)"""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / F.greatest(na * nb, F.lit(1e-24))


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


def ternary_planes(dim: int, bits: int, seed: int = PLANE_SEED) -> np.ndarray:
    """Achlioptas sparse random projection matrix: entries -1/0/+1 with
    probability 1/6, 2/3, 1/6 (sqrt(3) scale factor dropped — signs are
    scale-invariant). Integer entries make the projection exact int64
    arithmetic, reproducible in SQL."""
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 6, size=(bits, dim))
    return (np.where(u == 0, -1, 0) + np.where(u == 5, 1, 0)).astype(np.int64)


def quantized_signature_udf(dim: int, bits: int = 12, seed: int = PLANE_SEED):
    """b-bit LSH signature of floor(vec * QUANT_SCALE) · ternary planes.

    Bit j of the result is 1 iff the (exact, integer) projection onto plane
    j is > 0. Bit-identical between numpy and any engine with 64-bit
    integer arithmetic — the DuckDB CORRECTNESS oracle replicates it.
    """
    P = ternary_planes(dim, bits, seed)
    W = (np.int64(1) << np.arange(bits, dtype=np.int64))

    @pandas_udf("long")
    def _udf(vec: pd.Series) -> pd.Series:
        M = np.stack(vec.values).astype(np.float64)
        Q = np.floor(M * QUANT_SCALE).astype(np.int64)
        proj = Q @ P.T  # exact: |Q| <= 2^20, |P| <= 1, dim <= 2^12 << 2^63
        return pd.Series(((proj > 0).astype(np.int64) * W).sum(axis=1))

    return _udf


def _hyperplanes(dim: int, bits: int) -> np.ndarray:
    rng = np.random.default_rng(PLANE_SEED)
    return rng.standard_normal((bits, dim))


def signature_udf(dim: int, bits: int = 12):
    """Dense Gaussian hyperplane signature (float path; NOT SQL-reproducible
    — kept for comparison, the quantized ternary path is the default)."""
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


def probe_masks(bits: int, hamming_probe: int) -> list[int]:
    """Every XOR mask with <= hamming_probe bits set — C(bits, d) probes per
    Hamming distance d. Shared with the SQL oracle builder."""
    masks = [0]
    for d_ in range(1, hamming_probe + 1):
        masks += [sum(1 << j for j in c) for c in combinations(range(bits), d_)]
    return masks


def lsh_topk(queries: DataFrame, data: DataFrame, k: int, dim: int,
             bits: int = 10, hamming_probe: int = 1,
             q_id: str = "query_id", q_vec: str = "embedding",
             d_id: str = "vec_id", d_vec: str = "embedding",
             quantized: bool = True, seed: int = PLANE_SEED) -> DataFrame:
    """Approximate cosine top-k: sign-random-projection buckets, queries
    probe all buckets within ``hamming_probe`` bit flips, exact cosine
    re-rank. ``quantized=True`` (default) uses the SQL-reproducible
    integer ternary signature."""
    sig = (quantized_signature_udf(dim, bits, seed) if quantized
           else signature_udf(dim, bits))
    d = data.select(F.col(d_id), F.col(d_vec).alias("_dv"),
                    sig(F.col(d_vec)).alias("_bkt"))

    masks = probe_masks(bits, hamming_probe)
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


def centroid_hash_col(id_col: str):
    """Deterministic multiplicative hash over a numeric id column —
    reproducible in ANSI SQL (no xxhash64 on the oracle side) and spread
    across the whole id space, so the centroid sample is not biased toward
    whatever partition happens to be read first. Kept within int64:
    (id % 1000003) * 2654435761 <= ~2.7e15 << 2^63."""
    return ((F.col(id_col).cast("long") % F.lit(1000003))
            * F.lit(2654435761)) % F.lit(999999937)


def ivf_topk(queries: DataFrame, data: DataFrame, k: int, dim: int,
             ncentroids: int = 16, nprobe: int = 4,
             q_id: str = "query_id", q_vec: str = "embedding",
             d_id: str = "vec_id", d_vec: str = "embedding") -> DataFrame:
    """IVF-style ANN: centroids are the ``ncentroids`` rows with the
    smallest deterministic id-hash (a TakeOrdered over a 2-column
    projection — scales, unlike limit() head rows); data assigned to the
    nearest centroid once; queries probe the ``nprobe`` nearest lists.
    Ties in centroid ranking break by centroid index (stable argsort) so
    the SQL oracle can reproduce the assignment exactly."""
    cent_rows = (data.select(F.col(d_id).alias("_cid"), F.col(d_vec).alias("_cv"))
                 .withColumn("_h", centroid_hash_col("_cid"))
                 .orderBy("_h", "_cid")
                 .limit(ncentroids)
                 .collect())
    cent = np.stack([np.asarray(r["_cv"], dtype=np.float64) for r in cent_rows])
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)

    @pandas_udf("int")
    def assign(vec: pd.Series) -> pd.Series:
        M = np.stack(vec.values).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        # argmax == first max => ties break toward the lower centroid index
        return pd.Series(np.argmax(M @ cent.T, axis=1).astype(np.int32))

    @pandas_udf("array<int>")
    def probe(vec: pd.Series) -> pd.Series:
        M = np.stack(vec.values).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        top = np.argsort(-(M @ cent.T), axis=1, kind="stable")[:, :nprobe]
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
                           band_bits: int = 6, nbands: int = 4,
                           seed: int = PLANE_SEED) -> DataFrame:
    """Drop near-duplicate vectors (cosine >= threshold), keeping min id.

    Banded LSH candidates (same recall structure as MinHash-LSH): the
    signature has nbands*band_bits ternary-projection bits; two vectors are
    candidates iff at least one band of ``band_bits`` bits matches. For a
    pair at angle theta the per-bit flip probability is ~theta/pi, so the
    miss probability is (1 - (1-p)^band_bits)^nbands — e.g. at cosine 0.99
    (p ~ 0.045), 4 bands of 6 bits miss ~3e-3 of true pairs. Candidate
    pairs are verified with the exact JVM cosine. Shuffle volume is
    O(rows x nbands), never all-pairs."""
    total_bits = band_bits * nbands
    sig = quantized_signature_udf(dim, total_bits, seed)
    mask = (1 << band_bits) - 1
    s = df.select(F.col(id_col), F.col(vec_col).alias("_v"),
                  sig(F.col(vec_col)).alias("_sig"))
    bands = F.array(*[
        F.struct(F.lit(b).alias("b"),
                 F.shiftright("_sig", b * band_bits).bitwiseAND(F.lit(mask)).alias("h"))
        for b in range(nbands)])
    s = s.withColumn("_band", F.explode(bands)).drop("_sig")
    stacked = s.select(F.col(id_col), F.col("_v"),
                       F.col("_band.b").alias("band"),
                       F.col("_band.h").alias("bh"))
    # candidate pairs via dedup's shared one-pass bucket enumerator: the
    # old band self-join referenced the signature-UDF subtree once per
    # side AND funneled a degenerate bucket's N^2 pairs into one task —
    # _bucket_pairs computes signatures once and block-splits hot
    # buckets (HOT_BUCKET_CAP). A pair matching in m <= nbands bands
    # still gets its (cheap, JVM) cosine evaluated m times; losers are
    # distinct'd on the bare id, so that costs no extra shuffle.
    from .dedup import _bucket_pairs

    pairs = (_bucket_pairs(stacked, ["band", "bh"], id_col, payload=["_v"])
             .withColumn("cosine", _cosine_col("_a._v", "_b._v"))
             .filter(F.col("cosine") >= threshold))
    losers = pairs.select(F.col("_b._id").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def quantize_int8_col(vec_col):
    """Int8 scalar quantization as a pure JVM Column expression:
    clamp(floor(x * 127), -127, 127). floor of a float64 is exact and
    deterministic, so any engine with IEEE doubles reproduces the codes
    bit-identically (same trick as the QUANT_SCALE LSH signatures). 4x
    smaller than float32 storage; ranking on integer dot products is
    exact (no float comparisons at all)."""
    return F.transform(
        vec_col,
        lambda x: F.greatest(F.least(F.floor(x * 127), F.lit(127)),
                             F.lit(-127)).cast("long"))


def int8_topk(queries: DataFrame, data: DataFrame, k: int,
              q_id: str = "query_id", q_vec: str = "embedding",
              d_id: str = "vec_id", d_vec: str = "embedding") -> DataFrame:
    """Top-k by INT8-quantized dot product — the compressed-store ANN
    path: embeddings live as int8 codes (4x smaller), candidates rank by
    the integer dot (max |dot| = dim * 127^2, far inside int64; ties by
    data id). Same plan shape as brute_force_topk: broadcast queries, one
    JVM projection over the big side, k-bounded window."""
    q = queries.select(F.col(q_id), quantize_int8_col(F.col(q_vec)).alias("_qq"))
    d = data.select(F.col(d_id), quantize_int8_col(F.col(d_vec)).alias("_dq"))
    dot = F.aggregate(F.zip_with("_qq", "_dq", lambda a, b: a * b),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = d.join(F.broadcast(q)).withColumn("qdot", dot)
    w = Window.partitionBy(q_id).orderBy(F.col("qdot").desc(), F.col(d_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, d_id, "qdot", "rank"))


def pq_topk(queries: DataFrame, data: DataFrame, k: int, dim: int,
            m: int = 8, ncentroids: int = 16,
            q_id: str = "query_id", q_vec: str = "embedding",
            d_id: str = "vec_id", d_vec: str = "embedding") -> DataFrame:
    """Product-quantization ANN with asymmetric distance (ADC) — the
    compressed-store scale path beyond int8: each data vector stores only
    ``m`` sub-space centroid codes (m bytes vs 4*dim float32 — 32x
    smaller at dim=64, m=8), and queries rank rows by the sum of
    per-subspace query-to-centroid distances (one table lookup per code).

    Everything after quantization is INTEGER arithmetic so an external
    SQL oracle replays codes and distances bit-exactly: vectors quantize
    as floor(x*1024) (power-of-two scale — exact in float64), the
    codebook is the ``ncentroids`` smallest-id-hash rows (same
    deterministic TakeOrdered as ivf_topk — no head-rows bias), sub-space
    assignment is integer-L2 argmin with ties to the lower centroid
    index, and the ADC score is a pure-JVM aggregate over the broadcast
    distance table (no Python in the scoring pass over the big side)."""
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    sub = dim // m
    cent_rows = (data.select(F.col(d_id).alias("_cid"),
                             F.col(d_vec).alias("_cv"))
                 .withColumn("_h", centroid_hash_col("_cid"))
                 .orderBy("_h", "_cid")
                 .limit(ncentroids)
                 .collect())
    C = np.floor(np.stack([np.asarray(r["_cv"], dtype=np.float64)
                           for r in cent_rows]) * 1024.0).astype(np.int64)
    nc = len(cent_rows)

    @pandas_udf("array<int>")
    def encode(vec: pd.Series) -> pd.Series:
        M = np.floor(np.stack(vec.values).astype(np.float64)
                     * 1024.0).astype(np.int64)
        out = np.empty((len(M), m), dtype=np.int32)
        for s in range(m):
            ds = M[:, None, s * sub:(s + 1) * sub] \
                - C[None, :, s * sub:(s + 1) * sub]
            # np.argmin returns the FIRST minimum => lower centroid index
            out[:, s] = np.argmin((ds * ds).sum(axis=2), axis=1)
        return pd.Series([row.tolist() for row in out])

    @pandas_udf("array<long>")
    def dist_table(vec: pd.Series) -> pd.Series:
        M = np.floor(np.stack(vec.values).astype(np.float64)
                     * 1024.0).astype(np.int64)
        tabs = np.empty((len(M), m * nc), dtype=np.int64)
        for s in range(m):
            ds = M[:, None, s * sub:(s + 1) * sub] \
                - C[None, :, s * sub:(s + 1) * sub]
            tabs[:, s * nc:(s + 1) * nc] = (ds * ds).sum(axis=2)
        return pd.Series([row.tolist() for row in tabs])

    d = data.select(F.col(d_id), encode(F.col(d_vec)).alias("_codes"))
    q = queries.select(F.col(q_id), dist_table(F.col(q_vec)).alias("_tab"))
    adist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.element_at(
            "_tab", (s * nc + F.element_at("_codes", s + 1) + 1).cast("int")))
    scored = (d.crossJoin(F.broadcast(q))
              .withColumn("adist", adist))
    w = Window.partitionBy(q_id).orderBy(F.col("adist").asc(),
                                         F.col(d_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, d_id, "adist", "rank"))
