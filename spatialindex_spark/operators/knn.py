"""k-nearest-neighbors via iterative cell-ring expansion (SURVEY.md J4).

The reference's selection kernels (htm_select/htm_min, select.c) solve the
single-node top-k problem by pruning a tree search that widens until
satisfied (htm.c:1582-1700 prunes, never full-scans). The distributed
analogue:

1. every query point gets its HPX cell + its ring-``rings`` neighbor disc
   (ring-r cells via exact nested adjacency, bounded by the per-order SAFE
   ring-1 radius — cf. sptQueryLib.c:1363-1382's dr[o] table);
2. candidates = data rows in any disc cell, joined on the cell key
   (broadcast hash join — the query side is small);
3. exact angular distance + Window.partitionBy(query).orderBy(dist)
   rank <= k;
4. queries that do NOT hold k candidates within the *verified* radius
   (sparse regions, k above local density) iteratively widen: each round
   doubles the ring radius and probes ONLY the starved queries' NEW shell
   cells (disc(2r) minus disc(r)) through the same broadcast hash
   equi-join. The terminal state (disc covers the sphere) degenerates to
   an equi-join against every cell id — still a hash join, NEVER a
   full-table CartesianProduct/BroadcastNestedLoopJoin (test_plans
   asserts this even with a starved query in the fixture).

The ring radius guarantees correctness: ring r covers every point within
r * safe_ring1_rad, so a query stops expanding once it holds k candidates
within the verified radius. For the common bounded-k use the default
start_ring already suffices and the plan is a single broadcast join + one
window.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..functions.geometry import RAD_PER_DEG
from ..functions.healpix import hpx_id, safe_ring1_rad
from .joins import _hpx_neighbors, hpx_cell_key


def _disc_cells(lvl: int, pix: int, r: int) -> np.ndarray:
    """Closure of ring-r adjacency around one pixel (sorted unique ids).
    Caps at the full sphere once the disc would cover most of it."""
    total = 12 << (2 * lvl)
    if r > 0 and (2 * r + 1) ** 2 >= total:
        return np.arange(total, dtype=np.int64)
    cells = np.atleast_1d(np.int64(pix))
    for _ in range(r):
        cells = np.unique(_hpx_neighbors(lvl, cells))
        cells = cells[cells >= 0]
    return cells


def _shell_cells_udf(lvl: int, r_lo: int, r_hi: int):
    """Cells in disc(r_hi) \\ disc(r_lo) per query row (r_lo=0 => the whole
    disc including the center cell). Shells are disjoint across widening
    rounds, so accumulated candidate pairs never duplicate."""

    @pandas_udf("array<long>")
    def _udf(ra: pd.Series, dec: pd.Series) -> pd.Series:
        pix = hpx_id(lvl, ra.values, dec.values)
        out = []
        for p in pix:
            hi = _disc_cells(lvl, p, r_hi)
            if r_lo > 0:
                hi = np.setdiff1d(hi, _disc_cells(lvl, p, r_lo))
            out.append(hi.tolist())
        return pd.Series(out)

    return _udf


def knn(queries: DataFrame, data: DataFrame, k: int,
        level: int | None = None, rings: int = 1,
        query_id: str = "query_id",
        q_cols=("ra", "dec"), d_cols=("ra", "dec"),
        max_radius_deg: float | None = None,
        tiebreak: str | None = None,
        cell_col: str | None = None,
        cell_level: int | None = None,
        max_rounds: int = 8) -> DataFrame:
    """k nearest data rows per query point.

    queries: small-ish DataFrame with ``query_id`` + ra/dec.
    data:    large DataFrame with ra/dec (+ any payload columns).

    Guarantee: every neighbor within ``verified_radius(level, r)`` of a
    query is found, where r is that query's final ring radius; the widening
    loop grows r (x2 per round, starved queries only) until the query holds
    k verified candidates or the disc covers the sphere, so results are
    exact for every query (not just dense ones). Choose ``max_radius_deg``
    to pick the level automatically and bound the search.

    When ``data`` carries an ingest-time nested-HPX cell column
    (``cell_col`` at ``cell_level``), the match key is a shiftright of it —
    the big side stays JVM-only (no Arrow roundtrip of 100 TB through
    Python), with an in-plan assert_true range guard (every row validated
    inside whole-stage codegen; no sampling job). The search level is
    capped at ``cell_level``.
    """
    if level is None:
        if max_radius_deg is not None:
            r = max_radius_deg * RAD_PER_DEG
            level = 0
            while level < 13 and safe_ring1_rad(level + 1) >= r:
                level += 1
        else:
            level = 5
    use_cell = cell_col is not None and cell_level is not None
    if use_cell:
        level = min(level, cell_level)

    lvl = level
    qr, qd = q_cols
    dr, dd = d_cols

    if use_cell:
        dk = data.withColumn("_mc", hpx_cell_key(cell_col, cell_level, lvl))
    else:
        @pandas_udf("long")
        def cell_udf(ra: pd.Series, dec: pd.Series) -> pd.Series:
            return pd.Series(hpx_id(lvl, ra.values, dec.values))

        dk = data.withColumn("_mc", cell_udf(F.col(dr), F.col(dd)))

    rad = F.radians
    dot = (
        F.cos(rad(F.col("_qdec"))) * F.cos(rad(F.col(dd)))
        * F.cos(rad(F.col("_qra")) - rad(F.col(dr)))
        + F.sin(rad(F.col("_qdec"))) * F.sin(rad(F.col(dd)))
    )

    def probe(qdf: DataFrame, r_lo: int, r_hi: int) -> DataFrame:
        qk = qdf.select(
            F.col(query_id), "_qra", "_qdec",
            F.explode(_shell_cells_udf(lvl, r_lo, r_hi)("_qra", "_qdec"))
            .alias("_mc"))
        p = (dk.join(F.broadcast(qk), "_mc").drop("_mc")
             .withColumn("dist_deg", F.degrees(F.acos(
                 F.least(F.greatest(dot, F.lit(-1.0)), F.lit(1.0))))))
        if max_radius_deg is not None:
            p = p.filter(F.col("dist_deg") <= max_radius_deg)
        return p

    qmeta = queries.select(F.col(query_id),
                           F.col(qr).alias("_qra"), F.col(qd).alias("_qdec"))

    # pairs is consumed repeatedly (starved checks + final rank) but is tiny
    # (queries x disc candidates); persisting it means the big data table is
    # scanned once per widening round, not once per consumer. The cache is
    # released before returning — repeated knn() calls must not accumulate
    # CacheManager entries.
    from pyspark import StorageLevel
    pairs = probe(qmeta, 0, rings).persist(StorageLevel.MEMORY_AND_DISK)
    first_cache = pairs

    total_cells = 12 << (2 * lvl)
    # ring radius past which the verified radius covers the whole sphere
    full_r = max(rings, math.ceil(math.pi / safe_ring1_rad(lvl)))

    cur = rings
    for _ in range(max_rounds):
        if cur >= full_r:
            break  # disc covers the sphere: complete by construction
        vr = verified_radius_deg(lvl, cur)
        counts = (pairs.filter(F.col("dist_deg") <= vr)
                  .groupBy(query_id).agg(F.count(F.lit(1)).alias("_n")))
        starved = (qmeta.join(counts, query_id, "left")
                   .filter(F.coalesce(F.col("_n"), F.lit(0)) < k)
                   .drop("_n"))
        if max_radius_deg is not None and vr >= max_radius_deg:
            break  # the bounded search disc is already fully verified
        if starved.limit(1).count() == 0:
            break
        new_r = cur * 2
        # jump straight to the terminal full-sphere probe once the next
        # disc would cover >= 1/4 of all cells — saves adjacency-closure
        # work and a round of jobs
        if (2 * new_r + 1) ** 2 * 4 >= total_cells:
            new_r = full_r
        new_r = min(new_r, full_r)
        delta = probe(starved, cur, new_r)
        # single-chain union, lineage truncated every round (Spark 4.1
        # iterative-loop pathology: see operators/graph.py)
        pairs = (pairs.unionByName(delta.select(*pairs.columns))
                 .localCheckpoint(eager=True))
        cur = new_r

    order = [F.col("dist_deg").asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(query_id).orderBy(*order)

    out = (
        pairs.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .drop("_qra", "_qdec")
    )
    # k x queries rows: cheap to materialize; truncating lineage here lets
    # the pairs cache be dropped immediately instead of leaking per call
    out = out.localCheckpoint(eager=True)
    first_cache.unpersist()
    return out


def verified_radius_deg(level: int, rings: int = 1) -> float:
    """Radius within which knn() results are guaranteed complete. Uses the
    measured SAFE ring-1 radius (healpix.safe_ring1_rad), not max_pix_rad:
    points at 0.66-1.0x max_pix_rad can land in non-adjacent cells, so the
    old bound silently over-promised (candidates could be missed without
    triggering the starved-query widening). Chain argument: any point
    within rings * safe is reachable through `rings` cell adjacencies."""
    return rings * safe_ring1_rad(level) / RAD_PER_DEG
