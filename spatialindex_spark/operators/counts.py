"""Cell-aggregate counting — the distributed analogue of the reference's
mmap'ed count tree (SURVEY.md A1/A4/A5).

The reference builds an out-of-core tree whose nodes carry point counts so
region counts can be answered without touching points (tree_gen.c:80-94,
htm.c:1943-2292). Here the "tree" is a per-cell counts DataFrame plus
parent rollups (shiftright by 2 bits per level); persisted alongside the
table it summarizes, it answers:

- ``region_count_exact``: indexed filter + exact geometry (A1).
- ``region_count_bounds``: [lower, upper] from counts alone, zero point
  reads (A4): lower = cells fully inside the region's *uncompressed*
  covering interior; upper = + boundary cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.constraints import SpatialIndex


def cell_count_tree(df: DataFrame, cell_col: str = "spt_ind",
                    level: int = 7, min_level: int = 0) -> DataFrame:
    """Counts at every level from ``level`` up to ``min_level``:
    (level, cell, cnt). One shuffle for the leaf level; rollups reuse it."""
    leaf = (df.groupBy(F.col(cell_col).alias("cell"))
              .agg(F.count(F.lit(1)).alias("cnt"))
              .withColumn("level", F.lit(level)))
    out = leaf
    cur = leaf
    for lv in range(level - 1, min_level - 1, -1):
        cur = (cur.groupBy(F.shiftright("cell", 2).alias("cell"))
                  .agg(F.sum("cnt").alias("cnt"))
                  .withColumn("level", F.lit(lv)))
        out = out.unionByName(cur)
    return out.select("level", "cell", "cnt")


def region_count_bounds(counts: DataFrame, ra: float, dec: float,
                        radius: float, level: int = 7,
                        mode: int = SpatialIndex.HTM) -> DataFrame:
    """[lower, upper] cone-count bounds from the counts table alone.

    The covering's INSIDE ranges (uncompressed) are fully inside the cone,
    so their counts are certain; INTERSECT boundary cells may or may not
    contribute. Mirrors htm_tree_s2circle_range semantics (htm.c:1943-2057)
    at cell granularity."""
    si = SpatialIndex()
    loose = si.cone_search(ra, dec, radius, mode=mode, level=level,
                           encoding=0, colname="cell", compress=False,
                           as_constraints=True)
    # inner covering: cells whose entire trixel/pixel is inside = covering
    # of the cone shrunk by the max cell radius at this level
    from ..functions.healpix import max_pix_rad
    from ..functions.geometry import RAD_PER_DEG
    import math

    if mode == SpatialIndex.HPX:
        cell_rad = max_pix_rad(level) / RAD_PER_DEG
    else:
        # HTM L0 triangle bounding radius is ~90 deg; halves per level
        cell_rad = 90.0 / (1 << level)
    # fully-inside needs shrink by the cell DIAMETER (any cell touching the
    # shrunk cone then lies wholly inside the original); 2.2x bounding
    # radius is a conservative diameter bound for HTM's irregular trixels
    inner_radius = radius - 2.2 * cell_rad
    inner_ranges = []
    if inner_radius > 0:
        if mode == SpatialIndex.HPX:
            # exact_ends: the reference covering's one-past-end quirk cell
            # belongs to the next Z-order sibling and can sit entirely
            # OUTSIDE the cone — including it would inflate the "certain"
            # lower bound above the true count
            from ..functions.cover import hpx_cone_ranges

            inner_ranges = hpx_cone_ranges(level, ra, dec, inner_radius,
                                           exact_ends=True)
        else:
            inner = si.cone_search(ra, dec, inner_radius, mode=mode,
                                   level=level, encoding=0, colname="cell",
                                   compress=False, as_constraints=True)
            if not inner.status:
                inner_ranges = inner.ranges

    lvl_counts = counts.filter(F.col("level") == level)

    from ..functions.cover import ranges_predicate

    def pred(ranges):
        return ranges_predicate(F.col("cell"), ranges)

    upper = lvl_counts.filter(pred(loose.ranges)).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("upper"))
    lower = lvl_counts.filter(pred(inner_ranges)).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("lower"))
    return lower.crossJoin(upper)


def region_count_fast_frame(df: DataFrame, counts: DataFrame, ra: float,
                            dec: float, radius: float, level: int = 7,
                            cell_col: str = "spt_ind") -> DataFrame:
    """Exact cone count with the reference's INSIDE fast path
    (htm.c:1666-1669), as ONE lazy single-row DataFrame (column ``n``):
    cells wholly inside the cone are summed from the per-cell counts table
    with ZERO row reads; only boundary cells run the exact geometric
    predicate. At 100 TB this turns a count over a 10-degree region from a
    scan of every covered row into a metadata lookup plus a thin shell
    scan."""
    import math

    from ..functions.cover import htm_circle_ranges_split, ranges_predicate
    from ..functions.geometry import RAD_PER_DEG, sc_to_v3

    inside, boundary = htm_circle_ranges_split(ra, dec, radius, level)

    interior = (counts.filter(F.col("level") == level)
                .filter(ranges_predicate(F.col("cell"), inside))
                .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("_interior")))
    c = sc_to_v3(ra, dec)
    geom = (F.col("x") * c.x + F.col("y") * c.y + F.col("z") * c.z
            >= math.cos(radius * RAD_PER_DEG))
    shell = (df.filter(ranges_predicate(F.col(cell_col), boundary))
             .filter(geom)
             .agg(F.count(F.lit(1)).alias("_shell")))
    return interior.crossJoin(shell).select(
        (F.col("_interior") + F.col("_shell")).alias("n"))


def region_count_fast(df: DataFrame, counts: DataFrame, ra: float, dec: float,
                      radius: float, level: int = 7,
                      cell_col: str = "spt_ind") -> int:
    """Eager convenience wrapper over region_count_fast_frame."""
    return int(region_count_fast_frame(df, counts, ra, dec, radius, level,
                                       cell_col).collect()[0]["n"])
