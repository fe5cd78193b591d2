"""Extended region geometry: spherical ellipses, polygon constructors
(box / ngon / line corridor), buffering (pad), area, hull, convexity.

Reference parity (all /root/reference/lib/src/tinyhtm/src unless noted):
- ellipse quadratic form + containment: geometry.c:267-365, geometry.h:364-418
- ellipse/edge intersection + covering: htm.c:520-636, 1295-1414
- box / ngon / line constructors: geometry.c:429-590
- area (Girard): geometry.c:606-625
- pad (buffer): geometry.c:645-702 + tanrot geometry.c:54-82
- N/E basis + Rodrigues rotation: geometry.c:24-49, 85-112
- convex hull: geometry.c:1293-1440 (angle-sorted chain)
- convexity/orientation test: geometry.c:1188-1291 (simplified: via
  polygon_normals' handedness walk)
"""

from __future__ import annotations

import math

import numpy as np

from .cover import DISJOINT, INTERSECT, CONTAINS, INSIDE, _htm_cover, _ranges_add
from .geometry import (
    RAD_PER_DEG,
    V3,
    SphericalPolygon,
    v_add,
    v_cross,
    v_dot,
    v_neg,
    v_norm,
    v_normalize,
    v_rcross,
    v_sub,
)

DEG_PER_RAD = 1.0 / RAD_PER_DEG
RMAX = 90.0 - 0.001 / 3600.0


def v3_ne(v: V3) -> tuple[V3, V3]:
    """North/East basis at v (geometry.c:24-49)."""
    nx, ny, nz = -v.x * v.z, -v.y * v.z, v.x * v.x + v.y * v.y
    if nx == 0.0 and ny == 0.0 and nz == 0.0:
        return V3(-1.0, 0.0, 0.0), V3(0.0, 1.0, 0.0)
    north = v_normalize(V3(nx, ny, nz))
    east = v_normalize(v_rcross(north, v))
    return north, east


def v3_rot(v: V3, k: V3, angle_deg: float) -> V3:
    """Rodrigues rotation of v around axis k (geometry.c:85-112)."""
    nk = v_norm(k)
    sina = math.sin(angle_deg * RAD_PER_DEG)
    cosa = math.cos(angle_deg * RAD_PER_DEG)
    kdotv = v_dot(k, v) / nk
    kxv = v_rcross(k, v)
    s = 0.5 * sina / nk
    out = V3(kxv.x * s + v.x * cosa, kxv.y * s + v.y * cosa, kxv.z * s + v.z * cosa)
    t = kdotv * (1.0 - cosa)
    return V3(out.x + k.x * t, out.y + k.y * t, out.z + k.z * t)


def angsep(v1: V3, v2: V3) -> float:
    c = v_cross(v1, v2)
    return math.degrees(math.atan2(v_norm(c), v_dot(v1, v2)))


def v3_tanrot(v1: V3, v2: V3, r: float) -> float:
    """Tangent-plane rotation angle (geometry.c:54-82)."""
    a = angsep(v1, v2)
    if a == 0.0:
        raise ValueError("degenerate edge")
    if a + 2.0 * r > 2.0 * RMAX:
        raise ValueError("radius too large")
    rr = r * RAD_PER_DEG
    aa = a * RAD_PER_DEG
    s = 2.0 * math.sin(rr) * math.sin(0.5 * aa) / math.sin(aa)
    return 90.0 if s >= 1.0 else math.asin(s) * DEG_PER_RAD


# ---------------------------------------------------------------------------
# spherical ellipse
# ---------------------------------------------------------------------------

class SphericalEllipse:
    """Quadratic-form spherical ellipse (geometry.h:364-399)."""

    __slots__ = ("cen", "xx", "yy", "zz", "xy", "xz", "yz", "a")

    def __init__(self, cen, xx, yy, zz, xy, xz, yz, a):
        self.cen = cen
        self.xx, self.yy, self.zz = xx, yy, zz
        self.xy, self.xz, self.yz = xy, xz, yz
        self.a = a

    @staticmethod
    def from_foci(f1: V3, f2: V3, a: float) -> "SphericalEllipse":
        """geometry.c:267-295."""
        e = 0.5 * angsep(f1, f2)
        if e > 90.0 - 2.777777777777777778e-6 or a <= e or a >= 180.0 - e:
            raise ValueError("invalid ellipse angles")
        cen = v_normalize(v_add(f1, f2))
        ss = math.sin(2.0 * RAD_PER_DEG * a)
        c = math.cos(2.0 * RAD_PER_DEG * a)
        ss *= ss
        return SphericalEllipse(
            cen,
            ss - f1.x * f1.x - f2.x * f2.x + 2.0 * c * f1.x * f2.x,
            ss - f1.y * f1.y - f2.y * f2.y + 2.0 * c * f1.y * f2.y,
            ss - f1.z * f1.z - f2.z * f2.z + 2.0 * c * f1.z * f2.z,
            c * (f1.x * f2.y + f1.y * f2.x) - f1.x * f1.y - f2.x * f2.y,
            c * (f1.x * f2.z + f1.z * f2.x) - f1.x * f1.z - f2.x * f2.z,
            c * (f1.y * f2.z + f1.z * f2.y) - f1.y * f1.z - f2.y * f2.z,
            a,
        )

    @staticmethod
    def from_center(cen: V3, a: float, b: float, angle: float) -> "SphericalEllipse":
        """geometry.c:298-365: center + semi-axes + position angle."""
        if a <= 0.0 or b <= 0.0 or a > RMAX or b > RMAX:
            raise ValueError("invalid axis angles")
        ta = math.tan(RAD_PER_DEG * a)
        tb = math.tan(RAD_PER_DEG * b)
        qa, qb = 1.0 / (ta * ta), 1.0 / (tb * tb)
        N, E = v3_ne(cen)
        s = math.sin(RAD_PER_DEG * angle)
        c = math.cos(RAD_PER_DEG * angle)
        n = V3(c * N.x - s * E.x, c * N.y - s * E.y, c * N.z - s * E.z)
        e = V3(s * N.x + c * E.x, s * N.y + c * E.y, s * N.z + c * E.z)
        return SphericalEllipse(
            cen,
            qa * n.x * n.x + qb * e.x * e.x - cen.x * cen.x,
            qa * n.y * n.y + qb * e.y * e.y - cen.y * cen.y,
            qa * n.z * n.z + qb * e.z * e.z - cen.z * cen.z,
            qa * n.x * n.y + qb * e.x * e.y - cen.x * cen.y,
            qa * n.x * n.z + qb * e.x * e.z - cen.x * cen.z,
            qa * n.y * n.z + qb * e.y * e.z - cen.y * cen.z,
            a,
        )

    def contains(self, v: V3) -> bool:
        """htm_s2ellipse_cv3 (geometry.h:404-418)."""
        qf = (self.xx * v.x * v.x + self.yy * v.y * v.y + self.zz * v.z * v.z
              + 2.0 * self.xy * v.x * v.y + 2.0 * self.xz * v.x * v.z
              + 2.0 * self.yz * v.y * v.z)
        dp = v_dot(self.cen, v)
        if self.a <= 90.0:
            return dp >= 0.0 and qf <= 0.0
        return dp >= 0.0 or qf >= 0.0

    def contains_cols(self, x, y, z):
        """Vectorized containment over numpy columns (sign convention as
        cv3; from_center quadratic form is positive-outside)."""
        qf = (self.xx * x * x + self.yy * y * y + self.zz * z * z
              + 2.0 * self.xy * x * y + 2.0 * self.xz * x * z
              + 2.0 * self.yz * y * z)
        dp = self.cen.x * x + self.cen.y * y + self.cen.z * z
        if self.a <= 90.0:
            return (dp >= 0.0) & (qf <= 0.0)
        return (dp >= 0.0) | (qf >= 0.0)

    def _qf(self, v: V3) -> float:
        return (self.xx * v.x * v.x + self.yy * v.y * v.y + self.zz * v.z * v.z
                + 2.0 * self.xy * v.x * v.y + 2.0 * self.xz * v.x * v.z
                + 2.0 * self.yz * v.y * v.z)


def _ellipse_isect(v1: V3, v2: V3, e: SphericalEllipse) -> bool:
    """Edge/ellipse intersection via the quadratic in the (v1+v2, v2-v1)
    basis (htm.c:484-636 _htm_s2ellipse_isect)."""
    e1 = v_add(v1, v2)
    e2 = v_sub(v2, v1)

    def M(u: V3, w: V3) -> float:
        return (e.xx * u.x * w.x + e.yy * u.y * w.y + e.zz * u.z * w.z
                + e.xy * (u.x * w.y + u.y * w.x)
                + e.xz * (u.x * w.z + u.z * w.x)
                + e.yz * (u.y * w.z + u.z * w.y))

    c11 = M(e1, e1)
    c21 = M(e2, e1)
    c22 = M(e2, e2)

    def in_hemis(b: float) -> bool:
        v = V3(e1.x + b * e2.x, e1.y + b * e2.y, e1.z + b * e2.z)
        return v_dot(v, e.cen) >= 0.0

    if c11 == 0.0:
        # v1 + v2 is itself a boundary solution on the edge (htm.c:548-561)
        if e.a >= 90.0 or v_dot(e1, e.cen) >= 0.0:
            return True
        # the other solution is given by a linear equation
        if c22 == 0.0 or abs(c22) < abs(2.0 * c21):
            return False
        return in_hemis(-2.0 * c21 / c22)
    if c22 == 0.0:
        if c21 == 0.0:
            return False
        if abs(c11) <= abs(2.0 * c21):
            return e.a >= 90.0 or in_hemis(-0.5 * c11 / c21)
        return False
    delta = c21 * c21 - c11 * c22
    if delta < 0.0:
        return False
    delta = math.sqrt(delta)
    if abs(c22) >= abs(delta - c21):
        if e.a >= 90.0 or in_hemis((delta - c21) / c22):
            return True
    if abs(c22) >= abs(delta + c21):
        if e.a >= 90.0 or in_hemis(-(delta + c21) / c22):
            return True
    return False


def _ellipse_cov(t, e: SphericalEllipse) -> int:
    """_htm_s2ellipse_htmcov (htm.c:608-636)."""
    v0, v1, v2 = t.verts
    nin = e.contains(v0) + e.contains(v1) + e.contains(v2)
    if nin == 3:
        return INSIDE
    if nin != 0:
        return INTERSECT
    if (_ellipse_isect(v0, v1, e) or _ellipse_isect(v1, v2, e)
            or _ellipse_isect(v2, v0, e)):
        return INTERSECT
    e0, e1, e2 = t.edges
    if (v_dot(e.cen, e0) >= 0.0 and v_dot(e.cen, e1) >= 0.0
            and v_dot(e.cen, e2) >= 0.0):
        return CONTAINS
    return DISJOINT


def htm_ellipse_ranges(ellipse: SphericalEllipse, level: int,
                       maxranges: int | None = None):
    """htm_s2ellipse_ids (htm.c:1295-1414)."""
    return _htm_cover(lambda t: _ellipse_cov(t, ellipse), level, maxranges)


def htm_ellipse_ranges_split(ellipse: SphericalEllipse, level: int):
    """(inside_ranges, boundary_ranges) for an ellipse covering — the
    ellipse analogue of the reference's count-tree walk
    (htm_tree_s2ellipse_range, htm.c:2059-2113)."""
    from .cover import _htm_cover_split

    return _htm_cover_split(lambda t: _ellipse_cov(t, ellipse), level)


# ---------------------------------------------------------------------------
# polygon constructors
# ---------------------------------------------------------------------------

def poly_box(cen: V3, width: float, height: float, angle: float) -> SphericalPolygon:
    """Lat-lon box via N/E rotations (geometry.c:429-484)."""
    if not (0.0 < width < RMAX and 0.0 < height < RMAX):
        raise ValueError("invalid box dimensions")
    north, east = v3_ne(cen)
    edges = [
        v3_rot(east, north, 0.5 * width),
        v3_rot(north, east, -0.5 * height),
        v3_rot(east, north, -0.5 * width),
        v3_rot(north, east, 0.5 * height),
    ]
    verts = [
        v_normalize(v_rcross(edges[0], edges[1])),
        v_normalize(v_rcross(edges[2], edges[1])),
        v_normalize(v_rcross(edges[2], edges[3])),
        v_normalize(v_rcross(edges[0], edges[3])),
    ]
    if angle != 0.0:
        verts = [v3_rot(v, cen, angle) for v in verts]
    return SphericalPolygon(verts)


def poly_ngon(cen: V3, r: float, n: int) -> SphericalPolygon:
    """Inscribed n-gon (geometry.c:489-550)."""
    if not 0.0 < r < RMAX:
        raise ValueError("invalid radius")
    if n < 3:
        raise ValueError("need >= 3 vertices")
    north, east = v3_ne(cen)
    sr = math.sin(r * RAD_PER_DEG)
    cr = math.cos(r * RAD_PER_DEG)
    verts = []
    for i in range(n):
        ang = (RAD_PER_DEG * 360.0 * i) / n
        sa, ca = math.sin(ang), math.cos(ang)
        v = V3(ca * north.x + sa * east.x,
               ca * north.y + sa * east.y,
               ca * north.z + sa * east.z)
        verts.append(v_normalize(V3(cr * cen.x + sr * v.x,
                                    cr * cen.y + sr * v.y,
                                    cr * cen.z + sr * v.z)))
    return SphericalPolygon(verts)


def poly_line(v1: V3, v2: V3, r: float) -> SphericalPolygon:
    """Line corridor of half-width r (geometry.c:553-590)."""
    a = v3_tanrot(v1, v2, r)
    axis1 = v_sub(v1, v2)
    axis2 = v_rcross(v1, v2)
    edges = [
        v3_rot(axis2, axis1, a),
        v3_rot(v_rcross(v1, axis2), axis2, -r),
        v3_rot(axis2, axis1, -a),
        v3_rot(v_rcross(v2, axis2), axis2, r),
    ]
    verts = [
        v_normalize(v_rcross(edges[0], edges[1])),
        v_normalize(v_rcross(edges[2], edges[1])),
        v_normalize(v_rcross(edges[2], edges[3])),
        v_normalize(v_rcross(edges[0], edges[3])),
    ]
    return SphericalPolygon(verts)


def poly_area(poly: SphericalPolygon) -> float:
    """Girard's theorem (geometry.c:606-625); steradians."""
    asum = 0.0
    n = poly.n
    for i in range(n):
        j = n - 1 if i == 0 else i - 1
        v = v_rcross(poly.edges[j], poly.edges[i])
        sina = 0.5 * v_norm(v)
        cosa = -v_dot(poly.edges[j], poly.edges[i])
        asum += math.atan2(sina, cosa)
    return asum - (n - 2) * math.pi


def poly_pad(poly: SphericalPolygon, r: float) -> SphericalPolygon:
    """Outward buffer: rotate each edge plane by its tangent angle
    (geometry.c:645-702)."""
    if r < 0.0:
        raise ValueError("negative pad radius")
    if r == 0.0:
        return poly
    n = poly.n
    new_edges = [None] * n
    for i in range(n):
        j = n - 1 if i == 0 else i - 1
        ang = v3_tanrot(poly.verts[j], poly.verts[i], r)
        axis = v_sub(poly.verts[i], poly.verts[j])
        new_edges[j] = v3_rot(poly.edges[j], axis, ang)
    verts = [None] * n
    for i in range(n):
        j = n - 1 if i == 0 else i - 1
        v = v_normalize(v_rcross(new_edges[j], new_edges[i]))
        if v_dot(v, poly.verts[i]) < 0.0:
            v = v_neg(v)
        verts[i] = v
    return SphericalPolygon(verts)


# hull degeneracy thresholds (geometry.c:1173-1185)
_RCROSS_N2MIN = 4.0e-16
_SIN_MIN = 1.0e-10
_COS_MAX = 0.999999999999999

# G6: hemispherical test (htm_v3_hemispherical, geometry.c:759-1168).
# Feasibility of { w : p_i . w > 0 for all i }: fix w_z to +-1 and run a
# Megiddo-style 2D LP feasibility test (median-of-intersections pruning of
# the upper/lower constraint envelopes), then fall back to the 1D and 0D
# axis cases.

_DBL_MIN = 2.2250738585072014e-308
_DBL_EPS = 2.220446049250313e-16
_INF = float("inf")


def _envelope(pairs: list[tuple[float, float]], x: float, upper: bool):
    """(value, min slope, max slope) of the max (upper=True) or min envelope
    of lines y = a*x + b at x (_htm_g / _htm_h)."""
    a0, b0 = pairs[0]
    v, amin, amax = a0 * x + b0, a0, a0
    for a, b in pairs[1:]:
        vi = a * x + b
        if vi == v:
            amin, amax = min(amin, a), max(amax, a)
        elif (vi > v) if upper else (vi < v):
            v, amin, amax = vi, a, a
    return v, amin, amax


def _prune(pairs: list[tuple[float, float]], xlo: float, xhi: float,
           keep_larger_b: bool) -> list[float]:
    """Pair up consecutive constraints; drop the one that is dominated over
    (xlo, xhi), or record the intersection abscissa of a crossing pair
    (_htm_prune_g / _htm_prune_h — keep_larger_b selects the g variant).
    Mutates ``pairs`` in place with the reference's swap-with-last scheme."""
    xs: list[float] = []
    i, n = 0, len(pairs) - 1
    while i < n:
        a1, b1 = pairs[i]
        a2, b2 = pairs[i + 1]
        da = a1 - a2
        xx = _INF if abs(da) < _DBL_MIN / _DBL_EPS else (b2 - b1) / da
        if math.isinf(xx) or math.isnan(xx):
            drop = (i + 1) if ((b1 > b2) == keep_larger_b) else i
            pairs[drop] = pairs[n]
            n -= 1
        elif xx <= xlo:
            drop = (i + 1) if ((a1 > a2) == keep_larger_b) else i
            pairs[drop] = pairs[n]
            n -= 1
        elif xx >= xhi:
            drop = i if ((a1 > a2) == keep_larger_b) else (i + 1)
            pairs[drop] = pairs[n]
            n -= 1
        else:
            xs.append(xx)
            i += 2
    del pairs[n + 1:]
    return xs


def _feasible_2d(points: list[V3], z: float) -> bool:
    """Does { (x, y) : px*x + py*y + pz*z > 0 for all p } have a solution?"""
    xlo, xhi = -_INF, _INF
    upper: list[tuple[float, float]] = []  # y > a*x + b
    lower: list[tuple[float, float]] = []  # y < a*x + b
    for p in points:
        if abs(p.y) <= _DBL_MIN:
            if abs(p.x) <= _DBL_MIN:
                if z * p.z <= 0.0:
                    return False
            else:
                xlim = -z * p.z / p.x
                if p.x > 0.0:
                    xlo = max(xlo, xlim)
                else:
                    xhi = min(xhi, xlim)
                if xhi <= xlo:
                    return False
        else:
            coeffs = (-p.x / p.y, -z * p.z / p.y)
            (upper if p.y > 0.0 else lower).append(coeffs)
    if not upper or not lower:
        return True
    while True:
        xs = _prune(upper, xlo, xhi, keep_larger_b=True)
        xs += _prune(lower, xlo, xhi, keep_larger_b=False)
        if not xs:
            (a1, b1), (a2, b2) = upper[0], lower[0]
            try:
                xi = (b2 - b1) / (a1 - a2)
            except ZeroDivisionError:
                return b1 < b2
            if math.isinf(xi) or math.isnan(xi):
                return b1 < b2
            return (xi > xlo or a1 < a2) and (xi < xhi or a1 > a2)
        xs.sort()
        med = xs[len(xs) >> 1]
        g, gmin, gmax = _envelope(upper, med, upper=True)
        h, hmin, hmax = _envelope(lower, med, upper=False)
        if g <= h:
            return True
        if gmin > hmax:
            xhi = med
        elif gmax < hmin:
            xlo = med
        else:
            return False


def _feasible_1d(points: list[V3], y: float) -> bool:
    xlo, xhi = -_INF, _INF
    for p in points:
        if abs(p.x) <= _DBL_MIN:
            if y * p.y <= 0.0:
                return False
        else:
            xlim = -y * p.y / p.x
            if p.x > 0.0:
                xlo = max(xlo, xlim)
            elif xlim < xhi:
                xhi = xlim
            if xhi <= xlo:
                return False
    return True


def hemispherical(points: list[V3]) -> bool:
    """True iff all points fit in an OPEN hemisphere (exists w with
    p . w > 0 for every p) — htm_v3_hemispherical."""
    if not points:
        raise ValueError("need >= 1 point")
    if _feasible_2d(points, 1.0) or _feasible_2d(points, -1.0):
        return True
    if _feasible_1d(points, 1.0) or _feasible_1d(points, -1.0):
        return True
    pos = neg = False
    for p in points:
        if p.x > 0.0:
            pos = True
        elif p.x < 0.0:
            neg = True
        else:
            return False
    return not (pos and neg)


def convex_hull(points: list[V3], mode: str = "exact") -> SphericalPolygon:
    """Hemispherical convex hull — spherical Graham scan with the reference's
    vertex-selection semantics (htm_s2cpoly_hull, geometry.c:1388-1630):
    anchor at the point furthest from the centroid, winding angles measured
    against the centroid→anchor great-circle plane, stable sort, scan with
    edge-plane sign tests at SIN_MIN. Input must span < 1 hemisphere.

    mode="reference" reproduces the reference's closing-edge backtrack
    verbatim — including its edge-slot arithmetic, which re-tests removed
    vertices against a dangling edge and can WRONGLY DROP true hull vertices
    (observed: 2 of 20 inputs excluded by the resulting polygon AND by the
    reference binary's own covering). Fixture parity only. mode="exact"
    (default) backtracks against the edge into the new last vertex, so the
    hull provably contains every input."""
    n = len(points)
    if n < 3:
        raise ValueError("need >= 3 points")
    if not hemispherical(points):
        raise ValueError("hull input is not hemispherical")
    center = v_normalize(V3(sum(p.x for p in points),
                            sum(p.y for p in points),
                            sum(p.z for p in points)))
    # point furthest from the centroid is on the hull
    extremum, maxsep = 0, -1.0
    for i, p in enumerate(points):
        d = v_dot(v_sub(p, center), v_sub(p, center))
        if d > maxsep:
            extremum, maxsep = i, d
    anchor0 = points[extremum]
    refplane = v_rcross(center, anchor0)
    n2 = v_dot(refplane, refplane)
    if n2 < _RCROSS_N2MIN:
        raise ValueError("degenerate hull: vertex too close to centroid")
    refplane = V3(refplane.x / math.sqrt(n2), refplane.y / math.sqrt(n2),
                  refplane.z / math.sqrt(n2))

    # (winding angle, vertex), anchor first at angle 0
    av: list[tuple[float, V3]] = [(0.0, anchor0)]
    for i, p in enumerate(points):
        if i == extremum:
            continue
        plane = v_rcross(center, p)
        pn2 = v_dot(plane, plane)
        if pn2 < _RCROSS_N2MIN:
            continue  # too close to the centroid
        s = math.sqrt(pn2)
        plane = V3(plane.x / s, plane.y / s, plane.z / s)
        pc = v_rcross(refplane, plane)
        sa = v_norm(pc)
        if v_dot(pc, center) < 0.0:
            sa = -sa
        angle = math.atan2(sa, v_dot(refplane, plane))
        if angle < 0.0:
            angle += 2.0 * math.pi
        av.append((angle, p))
    if len(av) < 3:
        raise ValueError("degenerate hull: fewer than 3 distinct directions")
    av.sort(key=lambda t: t[0])  # stable, anchor stays first at angle 0
    verts = [t[1] for t in av]
    nav = len(verts)

    hull: list[V3] = [verts[0]]
    edges: list[V3] = []  # edges[j] = plane from hull[j] to hull[j+1]
    i = 1
    while i < nav:
        v = verts[i]
        anchor = hull[-1]
        p = v_rcross(anchor, v)
        pn2 = v_dot(p, p)
        if v_dot(anchor, v) < _COS_MAX and pn2 >= _RCROSS_N2MIN:
            s = math.sqrt(pn2)
            e = V3(p.x / s, p.y / s, p.z / s)
            if len(hull) == 1:
                edges.append(e)
                hull.append(v)
            else:
                d = v_dot(v, edges[-1])
                if d > _SIN_MIN:
                    edges.append(e)
                    hull.append(v)
                elif d < -_SIN_MIN:
                    # backtrack: last hull vertex is interior
                    hull.pop()
                    edges.pop()
                    continue  # reprocess v
                # |d| <= SIN_MIN: coplanar with edge, skip
        i += 1

    # closing edge, with backtracking (geometry.c:1553-1571). In
    # mode="reference" the FIRST backtrack re-tests against the edge *into
    # the removed vertex* (slot unchanged) and the closing edge overwrites
    # the dangling slot, reproducing the reference bug; mode="exact" pops
    # the removed vertex's incoming edge every time.
    v = verts[0]
    backtracked = False
    while True:
        if len(hull) < 3:
            raise ValueError("degenerate hull: fewer than 3 vertices")
        anchor = hull[-1]
        p = v_rcross(anchor, v)
        pn2 = v_dot(p, p)
        if (v_dot(anchor, v) < _COS_MAX and pn2 >= _RCROSS_N2MIN
                and v_dot(v, edges[-1]) > _SIN_MIN):
            s = math.sqrt(pn2)
            closing = V3(p.x / s, p.y / s, p.z / s)
            if backtracked and mode == "reference":
                edges[-1] = closing
            else:
                edges.append(closing)
            break
        hull.pop()
        if mode != "reference" or backtracked:
            edges.pop()
        backtracked = True

    vsum = V3(sum(p.x for p in hull), sum(p.y for p in hull),
              sum(p.z for p in hull))
    poly = SphericalPolygon.__new__(SphericalPolygon)
    poly.n = len(hull)
    poly.verts = hull
    poly.edges = edges
    poly.vsum = vsum
    return poly


def convex(points: list[V3]) -> int:
    """Orientation test (geometry.c:1188-1291): +1 CCW-convex, -1 CW-convex,
    0 not convex."""
    n = len(points)
    sign = 0
    for i in range(n):
        e = v_rcross(points[i], points[(i + 1) % n])
        d = v_dot(e, points[(i + 2) % n])
        s = 1 if d > 0 else (-1 if d < 0 else 0)
        if s == 0:
            return 0
        if sign == 0:
            sign = s
        elif s != sign:
            return 0
    return sign
