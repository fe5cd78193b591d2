"""Hierarchical Triangular Mesh (HTM) cell math.

Two implementations of the same math:

1. ``htm_id(x, y, z, level)`` — numpy-vectorized 4-way quadtree descend for
   bulk per-row assignment inside Arrow pandas UDFs. Bit-identical to the
   reference's per-point loop (/root/reference/lib/src/tinyhtm/src/htm.c:
   980-1033, root test 814-835) because the float64 operation order
   (normalized-midpoint then rcross then dot) is reproduced exactly and
   every branch is evaluated with the same expressions for every row.

2. Scalar ``Trixel`` machinery for the driver-side covering DFS
   (cover.py); mirrors the node prep/make child-ordering of
   htm.c:186-275 so coverings emit ranges in the same order.

ID layout: root 8..15, two bits appended per level (htm.c:29-74).
"""

from __future__ import annotations

import numpy as np

from .geometry import (
    V3,
    normalize3,
    rcross3,
    v_dot,
    v_normalize,
    v_add,
    v_rcross,
)

HTM_MAX_LEVEL = 24
HTM_DEC_MAX_LEVEL = 18

# The 6 fundamental vertices (htm.c:112-121): Z, X, Y, -X, -Y, -Z
_FUND = np.array(
    [
        [0.0, 0.0, 1.0],   # Z
        [1.0, 0.0, 0.0],   # X
        [0.0, 1.0, 0.0],   # Y
        [-1.0, 0.0, 0.0],  # NX
        [0.0, -1.0, 0.0],  # NY
        [0.0, 0.0, -1.0],  # NZ
    ]
)
_Z, _X, _Y, _NX, _NY, _NZ = range(6)

# Root triangle vertices, rows S0..S3,N0..N3 (htm.c:132-141).
ROOT_VERT = np.array(
    [
        [_X, _NZ, _Y],   # S0 (id 8)
        [_Y, _NZ, _NX],  # S1 (id 9)
        [_NX, _NZ, _NY],  # S2 (id 10)
        [_NY, _NZ, _X],  # S3 (id 11)
        [_X, _Z, _NY],   # N0 (id 12)
        [_NY, _Z, _NX],  # N1 (id 13)
        [_NX, _Z, _Y],   # N2 (id 14)
        [_Y, _Z, _X],    # N3 (id 15)
    ]
)

# Root triangle edge-plane normals (htm.c:145-154).
ROOT_EDGE = np.array(
    [
        [_Y, _X, _NZ],   # S0
        [_NX, _Y, _NZ],  # S1
        [_NY, _NX, _NZ],  # S2
        [_X, _NY, _NZ],  # S3
        [_NY, _X, _Z],   # N0
        [_NX, _NY, _Z],  # N1
        [_Y, _NX, _Z],   # N2
        [_X, _Y, _Z],    # N3
    ]
)


def htm_root(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Vectorized root-triangle selection (sign tests, htm.c:814-835)."""
    south = z < 0.0
    ypos = y > 0.0
    yzero = y == 0.0
    xpos = x > 0.0
    xnonneg = x >= 0.0
    xneg = x < 0.0

    s = np.where(ypos, np.where(xpos, 0, 1),
                 np.where(yzero, np.where(xnonneg, 0, 2),
                          np.where(xneg, 2, 3)))
    n = np.where(ypos, np.where(xpos, 7, 6),
                 np.where(yzero, np.where(xnonneg, 7, 5),
                          np.where(xneg, 5, 4)))
    return np.where(south, s, n).astype(np.int64)


# Cache-blocking size: the per-level working set is ~30 float64 temporaries;
# 2048 rows x 8 B x 30 ~= 0.5 MB stays L2-resident, which measured 2.3x
# faster single-core and ~2x better multicore scaling than whole-array
# passes (the unblocked kernel is memory-bandwidth-bound).
_HTM_CHUNK = 2048


def htm_id(x: np.ndarray, y: np.ndarray, z: np.ndarray, level: int) -> np.ndarray:
    """Vectorized htm_v3_id (htm.c:980-1033): O(level) array passes over
    L2-sized chunks.

    Maintains the three triangle vertices as column arrays; per level computes
    the three normalized edge midpoints and rcross-normals for ALL rows, then
    boolean-selects the child exactly as the reference's sequential dot tests.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    if level < 0 or level > HTM_MAX_LEVEL:
        raise ValueError(f"level must be in [0, {HTM_MAX_LEVEL}]")
    # native batch kernel (bit-identical, ~3.5x faster and CPU-bound rather
    # than bandwidth-bound); numpy blocks below are the portable fallback
    from .native import htm_id_native

    nat = htm_id_native(x, y, z, level)
    if nat is not None:
        return nat
    n = len(x)
    if n > _HTM_CHUNK:
        out = np.empty(n, dtype=np.int64)
        for i in range(0, n, _HTM_CHUNK):
            out[i:i + _HTM_CHUNK] = _htm_id_block(
                x[i:i + _HTM_CHUNK], y[i:i + _HTM_CHUNK], z[i:i + _HTM_CHUNK], level)
        return out
    return _htm_id_block(x, y, z, level)


def _htm_id_block(x, y, z, level: int) -> np.ndarray:

    r = htm_root(x, y, z)
    verts = _FUND[ROOT_VERT[r]]  # (n, 3 verts, 3 coords)
    v0x, v0y, v0z = verts[:, 0, 0], verts[:, 0, 1], verts[:, 0, 2]
    v1x, v1y, v1z = verts[:, 1, 0], verts[:, 1, 1], verts[:, 1, 2]
    v2x, v2y, v2z = verts[:, 2, 0], verts[:, 2, 1], verts[:, 2, 2]

    ids = r + 8

    for _ in range(level):
        # sv1 = mid(v2, v0); sv2 = mid(v0, v1); sv0 = mid(v1, v2)
        sv1x, sv1y, sv1z = normalize3(v2x + v0x, v2y + v0y, v2z + v0z)
        sv2x, sv2y, sv2z = normalize3(v0x + v1x, v0y + v1y, v0z + v1z)
        sv0x, sv0y, sv0z = normalize3(v1x + v2x, v1y + v2y, v1z + v2z)

        e0x, e0y, e0z = rcross3(sv2x, sv2y, sv2z, sv1x, sv1y, sv1z)
        d0 = e0x * x + e0y * y + e0z * z
        c0 = d0 >= 0

        e1x, e1y, e1z = rcross3(sv0x, sv0y, sv0z, sv2x, sv2y, sv2z)
        d1 = e1x * x + e1y * y + e1z * z
        c1 = ~c0 & (d1 >= 0)

        e2x, e2y, e2z = rcross3(sv1x, sv1y, sv1z, sv0x, sv0y, sv0z)
        d2 = e2x * x + e2y * y + e2z * z
        c2 = ~c0 & ~c1 & (d2 >= 0)

        child = np.where(c0, 0, np.where(c1, 1, np.where(c2, 2, 3)))
        ids = (ids << 2) + child

        # child vertex updates (htm.c:1004-1030) as one flat gather per
        # component: candidates stacked child-major, selected by
        # child*n + arange (single pass; nested np.where triples traffic)
        idx = child * x.shape[0] + np.arange(x.shape[0])
        # c0: (v0, sv2, sv1); c1: (v1, sv0, sv2); c2: (v2, sv1, sv0);
        # c3: (sv0, sv1, sv2)
        v0x = np.concatenate((v0x, v1x, v2x, sv0x)).take(idx)
        v0y = np.concatenate((v0y, v1y, v2y, sv0y)).take(idx)
        v0z = np.concatenate((v0z, v1z, v2z, sv0z)).take(idx)
        n1x = np.concatenate((sv2x, sv0x, sv1x, sv1x)).take(idx)
        n1y = np.concatenate((sv2y, sv0y, sv1y, sv1y)).take(idx)
        n1z = np.concatenate((sv2z, sv0z, sv1z, sv1z)).take(idx)
        v2x = np.concatenate((sv1x, sv2x, sv0x, sv2x)).take(idx)
        v2y = np.concatenate((sv1y, sv2y, sv0y, sv2y)).take(idx)
        v2z = np.concatenate((sv1z, sv2z, sv0z, sv2z)).take(idx)
        v1x, v1y, v1z = n1x, n1y, n1z

    return ids


def htm_level(ids: np.ndarray) -> np.ndarray:
    """Vectorized htm_level (htm.c:1064-1084); -1 for invalid ids."""
    ids = np.asarray(ids, dtype=np.int64)
    x = ids.astype(np.uint64).copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    # popcount via bit tricks (common.h:83-93 equivalent)
    v = x
    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + ((v >> np.uint64(2)) & np.uint64(0x3333333333333333))
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    pop = ((v * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
    lvl2 = pop - 4
    bad = (ids < 8) | (lvl2 & 1 != 0) | (lvl2 > HTM_MAX_LEVEL * 2)
    root_ok = ((ids >> np.maximum(lvl2, 0)) & 0x8) != 0
    out = np.where(bad | ~root_ok, -1, lvl2 // 2)
    return out


def htm_idtodec(ids: np.ndarray) -> np.ndarray:
    """Vectorized htm_idtodec (htm.c:1562-1579): base-10 digit string of the
    base-4 path, leading digit 1/2 for S/N hemisphere (legacy spt_ind)."""
    ids = np.asarray(ids, dtype=np.int64)
    levels = htm_level(ids)
    out = np.zeros_like(ids)
    factor = np.ones_like(ids)
    work = ids.copy()
    # level+1 digit-extraction steps, rows deactivate as their level runs out
    remaining = levels + 1
    maxsteps = int(remaining.max(initial=0))
    for _ in range(maxsteps):
        active = remaining > 0
        out = np.where(active, out + factor * (work & 3), out)
        factor = np.where(active, factor * 10, factor)
        work = np.where(active, work >> 2, work)
        remaining = remaining - 1
    out = out + np.where((work & 1) == 1, 2 * factor, factor)
    return np.where(levels < 0, 0, out)


# ---------------------------------------------------------------------------
# scalar trixel machinery for the covering DFS (driver-side only)
# ---------------------------------------------------------------------------

_FUND_V3 = [V3(*row) for row in _FUND.tolist()]


class Trixel:
    """A node of the HTM triangle tree for the covering DFS.

    Vertex/edge bookkeeping mirrors the subdivision scheme of
    htm.c:27-73 and the prep/make child order of htm.c:186-275, so the
    DFS emits ranges in ascending-ID order with identical float64 values.
    """

    __slots__ = ("verts", "edges", "tid", "level")

    def __init__(self, verts, edges, tid: int, level: int):
        self.verts = verts
        self.edges = edges
        self.tid = tid
        self.level = level

    @staticmethod
    def root(r: int) -> "Trixel":
        verts = [_FUND_V3[i] for i in ROOT_VERT[r]]
        edges = [_FUND_V3[i] for i in ROOT_EDGE[r]]
        return Trixel(verts, edges, r + 8, 0)

    def children(self) -> list["Trixel"]:
        v0, v1, v2 = self.verts
        e0, e1, e2 = self.edges
        sv0 = v_normalize(v_add(v1, v2))
        sv1 = v_normalize(v_add(v2, v0))
        sv2 = v_normalize(v_add(v0, v1))
        me0 = v_rcross(sv1, sv0)
        me1 = v_rcross(sv2, sv1)
        me2 = v_rcross(sv0, sv2)
        i4 = self.tid << 2
        lv = self.level + 1
        neg = lambda v: V3(-v.x, -v.y, -v.z)
        return [
            Trixel([v0, sv2, sv1], [e0, me1, e2], i4, lv),
            Trixel([v1, sv0, sv2], [e1, me2, e0], i4 + 1, lv),
            Trixel([v2, sv1, sv0], [e2, me0, e1], i4 + 2, lv),
            Trixel([sv0, sv1, sv2], [neg(me0), neg(me1), neg(me2)], i4 + 3, lv),
        ]


def htm_tri_verts(tid: int) -> list[V3]:
    """Vertices of the trixel with the given id (htm_tri_init, htm.c:1087-1144)."""
    level = int(htm_level(np.array([tid]))[0])
    if level < 0:
        raise ValueError(f"invalid HTM id {tid}")
    shifts = [(tid >> (2 * (level - k))) & 3 for k in range(1, level + 1)]
    r = (tid >> (2 * level)) - 8
    node = Trixel.root(r)
    for c in shifts:
        node = node.children()[c]
    return node.verts
