"""k-nearest-neighbors via cell-ring expansion (SURVEY.md J4).

The reference's selection kernels (htm_select/htm_min, select.c) solve the
single-node top-k problem; the distributed analogue:

1. every query point gets its HPX cell + progressively wider neighbor rings
   (ring-r cells via nested child/parent arithmetic, bounded by the
   per-order max pixel radius table — sptQueryLib.c:1363-1382's dr[o]);
2. candidates = data rows in any ring cell, joined on the cell key
   (broadcast when the query set is small);
3. exact angular distance + Window.partitionBy(query).orderBy(dist)
   rank <= k.

The ring radius guarantees correctness: ring r covers every point within
(r - 1) * min_pixel_extent, so a query stops expanding once it holds k
candidates within the *verified* radius. For the common bounded-k use the
default start_ring already suffices and the plan is a single shuffle-free
broadcast join + one window.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..functions.geometry import RAD_PER_DEG
from ..functions.healpix import hpx_id, max_pix_rad, safe_ring1_rad
from .joins import _hpx_neighbors


def knn(queries: DataFrame, data: DataFrame, k: int,
        level: int | None = None, rings: int = 1,
        query_id: str = "query_id",
        q_cols=("ra", "dec"), d_cols=("ra", "dec"),
        max_radius_deg: float | None = None,
        tiebreak: str | None = None,
        cell_col: str | None = None,
        cell_level: int | None = None) -> DataFrame:
    """k nearest data rows per query point.

    queries: small-ish DataFrame with ``query_id`` + ra/dec.
    data:    large DataFrame with ra/dec (+ any payload columns).

    Guarantee: with ``rings`` neighbor rings at ``level``, every neighbor
    within ``verified_radius(level, rings)`` is found; rows beyond that are
    only returned when nearer candidates exist in the searched cells. Choose
    a deeper level / more rings for tighter k-radii, or set max_radius_deg
    to pick the level automatically.

    When ``data`` carries an ingest-time nested-HPX cell column
    (``cell_col`` at ``cell_level``), the match key is a shiftright of it —
    the big side stays JVM-only (no Arrow roundtrip of 100 TB through
    Python). The search level is capped at ``cell_level``.
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
        from .joins import check_hpx_cell_col

        check_hpx_cell_col(data, cell_col, cell_level)

    lvl, rg = level, rings

    @pandas_udf("array<long>")
    def ring_cells_udf(ra: pd.Series, dec: pd.Series) -> pd.Series:
        pix = hpx_id(lvl, ra.values, dec.values)
        cells = [np.atleast_1d(p) for p in pix]
        for _ in range(rg):
            cells = [np.unique(_hpx_neighbors(lvl, row)) for row in cells]
        return pd.Series([row[row >= 0].tolist() for row in cells])

    @pandas_udf("long")
    def cell_udf(ra: pd.Series, dec: pd.Series) -> pd.Series:
        return pd.Series(hpx_id(lvl, ra.values, dec.values))

    qr, qd = q_cols
    dr, dd = d_cols

    qk = queries.select(
        F.col(query_id),
        F.col(qr).alias("_qra"),
        F.col(qd).alias("_qdec"),
        F.explode(ring_cells_udf(F.col(qr), F.col(qd))).alias("_mc"),
    )
    if use_cell:
        dk = data.withColumn(
            "_mc", F.shiftright(F.col(cell_col), 2 * (cell_level - lvl)))
    else:
        dk = data.withColumn("_mc", cell_udf(F.col(dr), F.col(dd)))

    pairs = dk.join(F.broadcast(qk), "_mc").drop("_mc")

    rad = F.radians
    dot = (
        F.cos(rad(F.col("_qdec"))) * F.cos(rad(F.col(dd)))
        * F.cos(rad(F.col("_qra")) - rad(F.col(dr)))
        + F.sin(rad(F.col("_qdec"))) * F.sin(rad(F.col(dd)))
    )
    pairs = pairs.withColumn(
        "dist_deg", F.degrees(F.acos(F.least(F.greatest(dot, F.lit(-1.0)), F.lit(1.0))))
    )
    if max_radius_deg is not None:
        pairs = pairs.filter(F.col("dist_deg") <= max_radius_deg)

    order = [F.col("dist_deg").asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(query_id).orderBy(*order)

    # Exactness guard: ring-based top-k is provably complete only for
    # queries holding >= k candidates within the verified radius. Starved
    # queries (sparse data, or all mass far from the query) fall back to an
    # exact scan — they are few, so the cross join is tiny.
    #
    # pairs is consumed twice (starved check + final rank) but is tiny
    # (queries x ring candidates); persisting it means the big data table is
    # scanned once, not once per consumer. The operator is already eager
    # (the starved check runs a job), so the result is materialized with
    # localCheckpoint and the cache released before returning — repeated
    # knn() calls must not accumulate CacheManager entries.
    from pyspark import StorageLevel
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    vr = verified_radius_deg(level, rings)
    counts = (pairs.filter(F.col("dist_deg") <= vr)
              .groupBy(query_id).agg(F.count(F.lit(1)).alias("_n")))
    qmeta = queries.select(F.col(query_id),
                           F.col(qr).alias("_qra"), F.col(qd).alias("_qdec"))
    starved = (qmeta.join(counts, query_id, "left")
               .filter(F.coalesce(F.col("_n"), F.lit(0)) < k)
               .drop("_n"))
    cached = pairs
    if starved.limit(1).count() > 0:
        brute = data.crossJoin(F.broadcast(starved))
        bdot = (
            F.cos(rad(F.col("_qdec"))) * F.cos(rad(F.col(dd)))
            * F.cos(rad(F.col("_qra")) - rad(F.col(dr)))
            + F.sin(rad(F.col("_qdec"))) * F.sin(rad(F.col(dd)))
        )
        brute = brute.withColumn(
            "dist_deg",
            F.degrees(F.acos(F.least(F.greatest(bdot, F.lit(-1.0)), F.lit(1.0)))))
        if max_radius_deg is not None:
            brute = brute.filter(F.col("dist_deg") <= max_radius_deg)
        starved_ids = [r[0] for r in starved.select(query_id).collect()]
        pairs = pairs.filter(~F.col(query_id).isin(starved_ids)) \
            .unionByName(brute.select(*pairs.columns))

    out = (
        pairs.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .drop("_qra", "_qdec")
    )
    # k x queries rows: cheap to materialize; truncating lineage here lets
    # the pairs cache be dropped immediately instead of leaking per call
    out = out.localCheckpoint(eager=True)
    cached.unpersist()
    return out


def verified_radius_deg(level: int, rings: int = 1) -> float:
    """Radius within which knn() results are guaranteed complete. Uses the
    measured SAFE ring-1 radius (healpix.safe_ring1_rad), not max_pix_rad:
    points at 0.66-1.0x max_pix_rad can land in non-adjacent cells, so the
    old bound silently over-promised (candidates could be missed without
    triggering the starved-query exact fallback). Chain argument: any point
    within rings * safe is reachable through `rings` cell adjacencies."""
    return rings * safe_ring1_rad(level) / RAD_PER_DEG
