"""Unit-sphere vector geometry (numpy-vectorized + scalar helpers).

Semantics follow the reference library's float64 discipline so that cell IDs
and constraint coefficients are bit-identical:

- ``radec_to_xyz``: /root/reference/src/sptIndx.c:196-204 (cos/sin then
  re-normalize; dtr = atan(1)/45).
- ``rcross``: robust "twice the cross product" form,
  /root/reference/lib/include/tinyhtm/geometry.h:203-216.
- ``normalize``: divide-by-norm, geometry.h:184-190.
- ``edgedist2``: Taylor-stabilized min secant distance to a great-circle edge,
  /root/reference/lib/src/tinyhtm/src/geometry.c:231-262.
- ``SphericalPolygon``: htm_s2cpoly_init, geometry.c:369-426 (CCW
  canonicalization via vsum sign test).

Everything here is driver-side math or feeds Arrow-vectorized pandas UDFs;
no per-row Python ever touches a Spark executor.
"""

from __future__ import annotations

import math

import numpy as np

# dtr used by the row-indexing path (sptIndx.c:84). NOT the same literal as
# the constraint path's HTM_RAD_PER_DEG; both are kept exact.
DTR_INDEX = math.atan(1.0) / 45.0
# HTM_RAD_PER_DEG / DTR used by the constraint builders
# (common.h:128, sptQuery.h:24).
RAD_PER_DEG = 0.0174532925199432957692369076849

INF = math.inf
NEG_INF = -math.inf


# ---------------------------------------------------------------------------
# numpy-vectorized ops over (..., 3) arrays or (x, y, z) column tuples
# ---------------------------------------------------------------------------

def radec_to_xyz(ra: np.ndarray, dec: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ra/dec degrees -> normalized unit 3-vector columns (sptIndx.c:196-204)."""
    ra = np.asarray(ra, dtype=np.float64)
    dec = np.asarray(dec, dtype=np.float64)
    cos_dec = np.cos(dec * DTR_INDEX)
    x = np.cos(ra * DTR_INDEX) * cos_dec
    y = np.sin(ra * DTR_INDEX) * cos_dec
    z = np.sin(dec * DTR_INDEX)
    norm = np.sqrt(x * x + y * y + z * z)
    return x / norm, y / norm, z / norm


def xyz_to_radec(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of radec_to_xyz (geometry.c:152-178): lon in [0,360), lat clamped."""
    lon = np.degrees(np.arctan2(y, x))
    lon = np.where(lon < 0.0, lon + 360.0, lon)
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(np.clip(z / norm, -1.0, 1.0)))
    return lon, lat


def dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def norm3(x, y, z):
    return np.sqrt(x * x + y * y + z * z)


def normalize3(x, y, z):
    n = norm3(x, y, z)
    return x / n, y / n, z / n


def rcross3(ax, ay, az, bx, by, bz):
    """Twice the cross product of a and b, robust form (geometry.h:203-216)."""
    x1 = bx + ax
    x2 = bx - ax
    y1 = by + ay
    y2 = by - ay
    z1 = bz + az
    z2 = bz - az
    return y1 * z2 - z1 * y2, z1 * x2 - x1 * z2, x1 * y2 - y1 * x2


def cross3(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def angsep_deg(x1, y1, z1, x2, y2, z2):
    """Angular separation in degrees via atan2(|cross|, dot) (geometry.c:207-228)."""
    cx, cy, cz = cross3(x1, y1, z1, x2, y2, z2)
    ss = norm3(cx, cy, cz)
    cs = dot3(x1, y1, z1, x2, y2, z2)
    return np.degrees(np.arctan2(ss, cs))


# ---------------------------------------------------------------------------
# scalar helpers for the driver-side covering kernels
# ---------------------------------------------------------------------------

class V3:
    """Scalar float64 3-vector used by driver-side covering DFS only."""

    __slots__ = ("x", "y", "z")

    def __init__(self, x: float, y: float, z: float):
        self.x = x
        self.y = y
        self.z = z

    def __repr__(self):  # pragma: no cover
        return f"V3({self.x!r}, {self.y!r}, {self.z!r})"


def v_dot(a: V3, b: V3) -> float:
    return a.x * b.x + a.y * b.y + a.z * b.z


def v_norm(a: V3) -> float:
    return math.sqrt(a.x * a.x + a.y * a.y + a.z * a.z)


def v_normalize(a: V3) -> V3:
    n = v_norm(a)
    if n == 0.0:
        # C division 0/0 -> NaN (flows through the handedness tests exactly
        # like the reference; the *next* corner's tiny dot product raises
        # "Degenerate polygon corner.")
        nan = float("nan")
        return V3(nan, nan, nan)
    return V3(a.x / n, a.y / n, a.z / n)


def v_add(a: V3, b: V3) -> V3:
    return V3(a.x + b.x, a.y + b.y, a.z + b.z)


def v_sub(a: V3, b: V3) -> V3:
    return V3(a.x - b.x, a.y - b.y, a.z - b.z)


def v_neg(a: V3) -> V3:
    return V3(-a.x, -a.y, -a.z)


def v_cross(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x)


def v_rcross(a: V3, b: V3) -> V3:
    """geometry.h:203-216 exact operation order."""
    x1 = b.x + a.x
    x2 = b.x - a.x
    y1 = b.y + a.y
    y2 = b.y - a.y
    z1 = b.z + a.z
    z2 = b.z - a.z
    return V3(y1 * z2 - z1 * y2, z1 * x2 - x1 * z2, x1 * y2 - y1 * x2)


def v_dist2(a: V3, b: V3) -> float:
    dx = a.x - b.x
    dy = a.y - b.y
    dz = a.z - b.z
    return dx * dx + dy * dy + dz * dz


def v_midpoint(a: V3, b: V3) -> V3:
    """vMidpoint (sptQueryLib.c vec utils): normalized average."""
    return v_normalize(V3((a.x + b.x) / 2.0, (a.y + b.y) / 2.0, (a.z + b.z) / 2.0))


def sc_to_v3(ra_deg: float, dec_deg: float, dtr: float = RAD_PER_DEG) -> V3:
    """Scalar ra/dec -> unit vector with the constraint builders' op order
    (sptQueryLib.c:66-73): cos/sin products, then htm_v3_normalize."""
    cos_dec = math.cos(dec_deg * dtr)
    v = V3(math.cos(ra_deg * dtr) * cos_dec,
           math.sin(ra_deg * dtr) * cos_dec,
           math.sin(dec_deg * dtr))
    return v_normalize(v)


def edgedist2(v: V3, v1: V3, v2: V3, e: V3) -> float:
    """Min square secant distance from v to edge (v1,v2) with plane normal e
    (geometry.c:231-262, incl. the small-x Taylor branch)."""
    c = v_cross(v, e)
    if v_dot(c, v1) > 0.0 and v_dot(c, v2) < 0.0:
        d = v_dot(v, e)
        x = d * d / (e.x * e.x + e.y * e.y + e.z * e.z)
        if x > 1.0:
            return 2.0
        elif x < 1.0e-7:
            y = x * x
            return x + (0.25 * y + 0.125 * x * y)
        y = 1.0 - math.sqrt(1.0 - x)
        if y == 1.0:
            # C computes 0/0 = NaN here; NaN <= dist2 is false in both
            # languages, so the edge reads as "far" either way
            return float("nan")
        return (x - y * y) / (1 - y)
    else:
        d1 = v_dist2(v, v1)
        d2 = v_dist2(v, v2)
        return d1 if d1 < d2 else d2


class SphericalPolygon:
    """Spherical convex polygon: vertices + edge plane normals, CCW-canonical
    (htm_s2cpoly_init, geometry.c:369-426)."""

    __slots__ = ("n", "verts", "edges", "vsum")

    def __init__(self, verts: list[V3]):
        n = len(verts)
        if n < 3:
            raise ValueError("polygon needs >= 3 vertices")
        self.n = n
        edges = [None] * n
        vsum = V3(verts[n - 1].x, verts[n - 1].y, verts[n - 1].z)
        for i in range(n - 1):
            edges[i] = v_rcross(verts[i], verts[i + 1])
            vsum = v_add(vsum, verts[i])
        edges[n - 1] = v_rcross(verts[n - 1], verts[0])
        if v_dot(vsum, edges[0]) < 0.0:
            # clockwise input: reorder and invert edge plane normals
            for i in range(n // 2):
                tmp = edges[i]
                edges[i] = v_neg(edges[n - i - 2])
                edges[n - i - 2] = v_neg(tmp)
            edges[n - 1] = v_neg(edges[n - 1])
            verts = list(reversed(verts))
        self.verts = verts
        self.edges = edges
        self.vsum = vsum

    def contains(self, v: V3) -> bool:
        """htm_s2cpoly_cv3 (geometry.c:593-603)."""
        for e in self.edges:
            if v_dot(v, e) < 0.0:
                return False
        return True


# ICRS(J2000) equatorial -> galactic rotation (rows of the standard
# Hipparcos/ESA SP-1200 matrix; same constants as astropy's
# ICRS->Galactic frame). Exact decimal literals: both engines parse
# them to the identical double.
GAL_ROT = (
    (-0.0548755604162154, -0.8734370902348850, -0.4838350155487132),
    (+0.4941094278755837, -0.4448296299600112, +0.7469822444972189),
    (-0.8676661490190047, -0.1980763734312015, +0.4559837761750669),
)


def equ_to_gal_cols(ra_col, dec_col):
    """Column-level ICRS -> galactic transform: returns (glon, glat)
    Columns in degrees, glon wrapped to [0, 360). Pure JVM trig +
    the GAL_ROT literal matrix — map-only, codegen'd, no shuffle,
    replayable in ANSI SQL with the same literals (the oracle
    requirement; the only cross-engine risk is <=1-ulp libm rounding,
    absorbed by the caller's output rounding).
    """
    from pyspark.sql import functions as F

    rar, decr = F.radians(ra_col), F.radians(dec_col)
    x = F.cos(decr) * F.cos(rar)
    y = F.cos(decr) * F.sin(rar)
    z = F.sin(decr)
    (r0, r1, r2) = GAL_ROT
    xg = F.lit(r0[0]) * x + F.lit(r0[1]) * y + F.lit(r0[2]) * z
    yg = F.lit(r1[0]) * x + F.lit(r1[1]) * y + F.lit(r1[2]) * z
    zg = F.lit(r2[0]) * x + F.lit(r2[1]) * y + F.lit(r2[2]) * z
    glon = F.degrees(F.atan2(yg, xg))
    glon = ((glon % 360.0) + 360.0) % 360.0
    glat = F.degrees(F.asin(F.least(F.lit(1.0),
                                    F.greatest(F.lit(-1.0), zg))))
    return glon, glat
