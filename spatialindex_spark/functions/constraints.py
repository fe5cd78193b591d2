"""Constraint generation: region -> (index predicate, exact geometric predicate).

Mirrors the reference's two-phase filtering contract (README.md:25-52): the
*index* predicate is a coarse superset over an integer cell-ID column (union
of ``=`` / ``BETWEEN`` ranges, gap-compressed under a 30% false-positive
budget); the *geometric* predicate is exact (dot-product half-space tests).

API parity: ``SpatialIndex.cone_search`` / ``polygon_search`` reproduce the
reference Python binding (/root/reference/spatial_index.pyx:25-189) including
the default resolution rules (no colname + no encoding -> BASE4 + 'spt_ind';
encoding given -> colname 'htm<L>'/'hpx<L>') and byte-identical constraint
strings (rendering format of /root/reference/lib/src/sptQueryLib.c:256-345,
580, 1195-1231).

Spark-side: ``index_column()`` / ``geom_column()`` turn the same constraints
into Catalyst Column expressions so filters push down to parquet scans
(partition + row-group pruning on the cell-ID clustering key).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .cover import (
    compress_gaps,
    hpx_cone_ranges,
    hpx_polygon_ranges,
    htm_circle_ranges,
    htm_polygon_ranges,
    polygon_normals,
)
from .geometry import RAD_PER_DEG, SphericalPolygon, sc_to_v3, v_normalize, V3
from .htm import htm_idtodec

# mode / encoding constants (sptQuery.h:13-17, spatial_index.pyx:41-42)
HTM = 0
HPX = 1
S2 = 2     # engine extension: true-S2 Hilbert cell columns (s2h<L>)
H3 = 3     # engine extension: hex-H3 cell columns (h3<R>, equality covering)
DECIMAL = 0  # raw bit-encoded cell id ("BASE10")
BASE4 = 1    # base-10 digit string of the base-4 path (legacy spt_ind)

MAX_LEVEL = 20  # sptQueryLib.c:50-57


def _fmt_float12(v: float) -> str:
    return f"{v:.12f}"


def _render_index_constraint(ranges: list[list[int]], indname: str, encoding: int,
                             hpx_poly_quirk: bool = False) -> str:
    """OR-chain rendering (sptQueryLib.c:256-345).

    ``hpx_poly_quirk`` reproduces the HPX-polygon emit path's literal
    whitespace (sptQueryLib.c:1147-1167): single-cell fragments are padded
    '      (col = v)' / '   OR (col = v)' while BETWEEN fragments use the
    normal '(...)' / ' OR (...)' forms.
    """
    out = []
    for i, (lo, hi) in enumerate(ranges):
        if encoding == BASE4:
            lo = int(htm_idtodec(np.array([lo], dtype=np.int64))[0])
            hi = int(htm_idtodec(np.array([hi], dtype=np.int64))[0])
        if lo == hi:
            if hpx_poly_quirk:
                out.append(f"      ({indname} = {lo})" if i == 0
                           else f"   OR ({indname} = {lo})")
            else:
                out.append(f"({indname} = {lo})" if i == 0
                           else f" OR ({indname} = {lo})")
        else:
            out.append(f"({indname} BETWEEN {lo} AND {hi})" if i == 0
                       else f" OR ({indname} BETWEEN {lo} AND {hi})")
    return "".join(out)


@dataclass
class Constraints:
    """Result of a search: predicates in three equivalent forms."""

    status: int
    index_constraint: str = ""
    geom_constraint: str = ""
    error_message: str = ""
    ranges: list = field(default_factory=list)   # [[lo, hi]] raw cell ids
    geom: dict = field(default_factory=dict)     # {'cone': (x,y,z,cosrad)} or {'poly_normals': [...]}
    colname: str = ""
    mode: int = HTM
    level: int = 7
    encoding: int = DECIMAL
    xcol: str = "x"
    ycol: str = "y"
    zcol: str = "z"

    def as_dict(self) -> dict:
        """Reference Python-binding return shape (spatial_index.pyx:106-117)."""
        if self.status:
            return {"status": self.status, "error_message": self.error_message}
        return {
            "status": self.status,
            "index_constraint": self.index_constraint,
            "geom_constraint": self.geom_constraint,
        }

    # ---- Spark Column builders -------------------------------------------
    def index_column(self):
        """Cell-range predicate as a Catalyst Column (pushes to parquet)."""
        from pyspark.sql import functions as F
        col = F.col(self.colname)
        pred = None
        for lo, hi in self.ranges:
            if self.encoding == BASE4 and self.mode == HTM:
                # the column holds legacy spt_ind digits; idtodec is
                # monotone for same-level ids so range bounds map directly
                lo = int(htm_idtodec(np.array([lo], dtype=np.int64))[0])
                hi = int(htm_idtodec(np.array([hi], dtype=np.int64))[0])
            p = (col == lo) if lo == hi else col.between(lo, hi)
            pred = p if pred is None else (pred | p)
        if pred is None:
            return F.lit(False)
        return pred

    def geom_column(self):
        """Exact geometric predicate as a Catalyst Column (JVM-evaluated)."""
        from pyspark.sql import functions as F
        x, y, z = F.col(self.xcol), F.col(self.ycol), F.col(self.zcol)
        if "cone" in self.geom:
            cx, cy, cz, cosrad = self.geom["cone"]
            return (x * cx + y * cy + z * cz) >= cosrad
        pred = None
        for n in self.geom["poly_normals"]:
            p = (x * n[0] + y * n[1] + z * n[2]) >= 0.0
            pred = p if pred is None else (pred & p)
        return pred

    def filter(self, df):
        """Two-phase filter: coarse index predicate then exact geometry."""
        return df.filter(self.index_column()).filter(self.geom_column())


class SpatialIndex:
    """Reference-compatible constraint builder (spatial_index.pyx:25-189).

    >>> si = SpatialIndex()
    >>> si.cone_search(129.4, 43.7, 0.5, mode=SpatialIndex.HTM, level=7,
    ...                encoding=SpatialIndex.DECIMAL, colname='htmind')
    {'status': 0, 'index_constraint': '(htmind = 245093) OR ...', ...}
    """

    HTM = HTM
    HPX = HPX
    S2 = S2
    H3 = H3
    DECIMAL = DECIMAL
    BASE4 = BASE4

    def _resolve(self, mode: int, level: int, colname, encoding):
        """Default resolution (spatial_index.pyx:89-104, 161-174)."""
        if mode not in (HTM, HPX):
            # S2 queries run through s2_cap_ranges / region_join(mode=S2);
            # the reference-parity constraint-string API is HTM/HPX only.
            # Without this guard mode=S2 silently fell into the HPX branch
            # and matched HPX decimal ids against Hilbert cell columns.
            raise ValueError(
                "cone_search/polygon_search support mode=HTM or HPX only; "
                "use region_join(mode=SpatialIndex.S2) or "
                "h3s2.s2_cap_ranges/s2_polygon_ranges for S2 cell columns")
        if colname is None and encoding is None:
            encoding = BASE4
            colname = "spt_ind"
        elif colname is None:
            colname = f"htm{level}" if mode == HTM else f"hpx{level}"
        if encoding is None:
            encoding = DECIMAL
        return colname, encoding

    def cone_search(self, ra, dec, radius, mode=HTM, level=7,
                    xcol="x", ycol="y", zcol="z",
                    colname=None, encoding=None, compress=True,
                    as_constraints=False):
        """sptConeSearch (sptQueryLib.c:14-586)."""
        colname, encoding = self._resolve(mode, level, colname, encoding)
        c = Constraints(status=0, colname=colname, mode=mode, level=level,
                        encoding=encoding, xcol=xcol, ycol=ycol, zcol=zcol)
        if level > MAX_LEVEL:
            c.status = 1
            c.error_message = ("Indexing level cannot be greater than 20 "
                               "(which is already sub-arcsecond).")
            return c if as_constraints else c.as_dict()

        cosrad = math.cos(radius * RAD_PER_DEG)
        vec = sc_to_v3(ra, dec)

        if mode == HTM:
            ranges = htm_circle_ranges(ra, dec, radius, level)
        else:
            ranges = hpx_cone_ranges(level, ra, dec, radius)
        if not ranges:
            c.status = 1
            c.error_message = "No ranges found."
            return c if as_constraints else c.as_dict()
        if compress:
            ranges = compress_gaps(ranges)
        c.ranges = ranges
        c.index_constraint = _render_index_constraint(
            ranges, colname, encoding if mode == HTM else DECIMAL)
        c.geom_constraint = (
            f"({_fmt_float12(vec.x)}*{xcol})+({_fmt_float12(vec.y)}*{ycol})"
            f"+({_fmt_float12(vec.z)}*{zcol})>={cosrad:.12e}"
        )
        c.geom = {"cone": (vec.x, vec.y, vec.z, cosrad)}
        return c if as_constraints else c.as_dict()

    def polygon_search(self, ra, dec, mode=HTM, level=7,
                       xcol="x", ycol="y", zcol="z",
                       colname=None, encoding=None, compress=True,
                       as_constraints=False):
        """sptPolygonSearch (sptQueryLib.c:590-1236). ra/dec are equal-length
        vertex lists (>= 3 vertices, convex)."""
        colname, encoding = self._resolve(mode, level, colname, encoding)
        c = Constraints(status=0, colname=colname, mode=mode, level=level,
                        encoding=encoding, xcol=xcol, ycol=ycol, zcol=zcol)
        if level > MAX_LEVEL:
            c.status = 1
            c.error_message = ("Indexing level cannot be greater than 20 "
                               "(which is already sub-arcsecond).")
            return c if as_constraints else c.as_dict()
        ra = list(ra)
        dec = list(dec)
        try:
            normals = polygon_normals(ra, dec)
        except ValueError as e:
            c.status = 1
            c.error_message = str(e)
            return c if as_constraints else c.as_dict()

        if mode == HTM:
            verts = [sc_to_v3(ra[i], dec[i]) for i in range(len(ra))]
            poly = SphericalPolygon(verts)
            ranges = htm_polygon_ranges(poly, level)
            exec_ranges = ranges
        else:
            # string parity keeps the reference's (buggy for large polygons)
            # bounding circle; the engine's executable predicate uses the
            # corrected superset covering (see hpx_polygon_ranges docstring)
            ranges = hpx_polygon_ranges(level, ra, dec)
            exec_ranges = hpx_polygon_ranges(level, ra, dec, exact_circle=True)
        if not ranges:
            c.status = 1
            c.error_message = "No ranges found."
            return c if as_constraints else c.as_dict()
        if compress:
            ranges = compress_gaps(ranges)
            exec_ranges = compress_gaps(exec_ranges)
        c.ranges = exec_ranges
        c.index_constraint = _render_index_constraint(
            ranges, colname, encoding if mode == HTM else DECIMAL,
            hpx_poly_quirk=(mode == HPX))
        parts = []
        for i, n in enumerate(normals):
            frag = (f"({_fmt_float12(n.x)}*{xcol})+({_fmt_float12(n.y)}*{ycol})"
                    f"+({_fmt_float12(n.z)}*{zcol})>=0.")
            parts.append(frag if i == 0 else f" AND {frag}")
        c.geom_constraint = "".join(parts)
        c.geom = {"poly_normals": [(n.x, n.y, n.z) for n in normals]}
        return c if as_constraints else c.as_dict()
