"""H3-style and S2 cell encodes (north-rule ⊕ P12 — no reference impl).

- ``s2_cell_id``: TRUE S2 cell ids — canonical face/uv charts, quadratic
  st projection, Hilbert-curve position via the published orientation
  lookup tables, library-compatible 64-bit layout (face bits + position
  bits + trailing marker). Parent/range/level/center inverses included.
- ``s2_id``: the original Z-order variant (plain hierarchical int64,
  always positive — convenient as a range-partitioning key), kept as an
  option behind ``s2_udf(level, curve="zorder")``.
- ``h3_id``: H3-style — icosahedral-inspired aperture-4 hierarchy packed
  as ``(res << 56) | (base_cell << 48) | path``; base cells are the 12
  HEALPix faces (a rhombic base grid), per-res 2-bit child digits. True
  H3 is aperture-7 hexagonal; this engine analogue keeps H3's API shape
  (res, base cell, child path) while staying exactly invertible, and is
  documented as an analogue, not an interop claim.

All numpy-vectorized and exposed as pandas UDFs in udfs.py.
"""

from __future__ import annotations

import numpy as np

from .healpix import hpx_id, spread_bits

S2_MAX_LEVEL = 24
H3_MAX_RES = 20


def _xyz_to_face_uv(x, y, z):
    """Cube-face projection: face in 0..5 (+x,-x,+y,-y,+z,-z), uv in [-1,1]."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largest component picks the face
    fx = (ax >= ay) & (ax >= az)
    fy = ~fx & (ay >= az)
    fz = ~fx & ~fy
    face = np.where(fx, np.where(x >= 0, 0, 1),
                    np.where(fy, np.where(y >= 0, 2, 3),
                             np.where(z >= 0, 4, 5)))
    major = np.where(fx, x, np.where(fy, y, z))
    u = np.where(fx, y, np.where(fy, x, x)) / major
    v = np.where(fx, z, np.where(fy, z, y)) / major
    return face.astype(np.int64), u, v


def _uv_to_st(u):
    """S2 quadratic projection: uv [-1,1] -> st [0,1] (equal-area-ish)."""
    # np.where evaluates both branches; clamp the unused one's operand
    return np.where(u >= 0.0,
                    0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
                    1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)))


def s2_id(x, y, z, level: int) -> np.ndarray:
    """S2-style cell id, Z-ORDER variant: (face << 2L) | interleave(i, j),
    i/j from the quadratic-projected st coordinates. int64, hierarchical by
    2-bit suffix. Kept as an option; ``s2_cell_id`` below is the true
    Hilbert-ordered S2 encoding."""
    if not 0 <= level <= S2_MAX_LEVEL:
        raise ValueError(f"level must be in [0, {S2_MAX_LEVEL}]")
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    face, u, v = _xyz_to_face_uv(x, y, z)
    s = _uv_to_st(u)
    t = _uv_to_st(v)
    n = np.int64(1) << level
    i = np.clip((s * n).astype(np.int64), 0, n - 1)
    j = np.clip((t * n).astype(np.int64), 0, n - 1)
    return (face << (2 * level)) + spread_bits(i) + (spread_bits(j) << 1)


# ---------------------------------------------------------------------------
# True S2 cell ids (Hilbert curve) — public algorithm: the S2 geometry
# library design (s2geometry.io docs; s2coords Hilbert tables are published).
# 64-bit layout identical to the reference library: 3 face bits, 2*level
# Hilbert position bits, a trailing 1 marker bit, zero padding. Stored in a
# Spark long; faces 4-5 exceed 2^63 so ids are uint64 bit patterns viewed as
# int64 (compare/shift with unsigned semantics where order matters).
# ---------------------------------------------------------------------------

S2_LEAF = 30

#: Hilbert sub-cell traversal tables per orientation (swap=1, invert=2):
#: position-along-curve <-> ij quadrant, and the orientation delta each
#: sub-cell applies to its children.
_POS_TO_IJ = np.array([[0, 1, 3, 2],
                       [0, 2, 3, 1],
                       [3, 2, 0, 1],
                       [3, 1, 0, 2]], dtype=np.int64)
_IJ_TO_POS = np.array([[0, 1, 3, 2],
                       [0, 3, 1, 2],
                       [2, 3, 1, 0],
                       [2, 1, 3, 0]], dtype=np.int64)
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)  # swap,0,0,invert|swap


def _xyz_to_face_uv_s2(x, y, z):
    """Canonical S2 face/axes (ValidFaceXYZtoUV): face = major axis index
    (+3 when negative), uv from the published per-face axis table."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where((ax >= ay) & (ax >= az), 0, np.where(ay >= az, 1, 2))
    major = np.where(axis == 0, x, np.where(axis == 1, y, z))
    face = np.where(major >= 0, axis, axis + 3)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y], default=-y / z)
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y], default=-x / z)
    return face.astype(np.int64), u, v


def _face_uv_to_xyz_s2(face, u, v):
    """Inverse of _xyz_to_face_uv_s2 (FaceUVtoXYZ), unnormalized."""
    one = np.ones_like(u)
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [one, -u, -u, -one, v], default=v)
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [u, one, -v, -v, -one], default=u)
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [v, v, one, -u, -u], default=-one)
    return x, y, z


def _st_to_uv(s):
    """Inverse quadratic projection: st [0,1] -> uv [-1,1]."""
    return np.where(s >= 0.5,
                    (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def s2_cell_id(x, y, z, level: int) -> np.ndarray:
    """True S2 cell id (Hilbert curve), bit-layout-compatible with the S2
    geometry library: face (3 bits) + 2*S2_LEAF Hilbert position bits built
    by the orientation-table walk, truncated to ``level`` with the trailing
    marker bit. Vectorized: 30 table-lookup passes over the whole array."""
    if not 0 <= level <= S2_LEAF:
        raise ValueError(f"level must be in [0, {S2_LEAF}]")
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    face, u, v = _xyz_to_face_uv_s2(x, y, z)
    n = np.int64(1) << S2_LEAF
    i = np.clip((_uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_uv_to_st(v) * n).astype(np.int64), 0, n - 1)

    pos = np.zeros_like(i, dtype=np.uint64)
    orient = (face & 1).astype(np.int64)  # kSwapMask bit of the face
    for k in range(S2_LEAF - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orient = orient ^ _POS_TO_ORIENT[p]

    leaf = ((face.astype(np.uint64) << np.uint64(2 * S2_LEAF + 1))
            | (pos << np.uint64(1)) | np.uint64(1))
    lsb = np.uint64(1) << np.uint64(2 * (S2_LEAF - level))
    # snap to level: clear everything below lsb, set lsb as the marker
    snapped = (leaf & (~(lsb + lsb - np.uint64(1)) + np.uint64(0))) | lsb
    return snapped.view(np.int64) if snapped.ndim else np.int64(snapped)


def s2_cell_level(ids) -> np.ndarray:
    """Level from the trailing marker bit position."""
    u = np.asarray(ids, dtype=np.int64).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    # marker at bit 2*(LEAF-level)
    k = np.zeros_like(u, dtype=np.int64)
    b = lsb.copy()
    while np.any(b > np.uint64(1)):
        step = b > np.uint64(1)
        k[step] += 1
        b[step] >>= np.uint64(1)
    return S2_LEAF - (k // 2)


def s2_cell_parent(ids, parent_level: int) -> np.ndarray:
    """Ancestor at a coarser level (S2CellId::parent): clear sub-level bits,
    set the coarser marker."""
    u = np.asarray(ids, dtype=np.int64).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (S2_LEAF - parent_level))
    return ((u & (~(lsb + lsb - np.uint64(1)) + np.uint64(0))) | lsb) \
        .view(np.int64)


def s2_cell_range(ids) -> tuple[np.ndarray, np.ndarray]:
    """[range_min, range_max] of leaf ids under each cell (uint64 order) —
    the containment interval used for covering joins."""
    u = np.asarray(ids, dtype=np.int64).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    return ((u - lsb + np.uint64(1)).view(np.int64),
            (u + lsb - np.uint64(1)).view(np.int64))


def s2_cell_center(ids) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unit-vector center of each cell: inverse Hilbert walk to (face,i,j),
    st = center of the level-resolution cell, uv quadratic inverse, face
    chart to xyz, normalize."""
    u64 = np.asarray(ids, dtype=np.int64).view(np.uint64)
    face = (u64 >> np.uint64(2 * S2_LEAF + 1)).astype(np.int64)
    pos = (u64 >> np.uint64(1)) & ((np.uint64(1) << np.uint64(2 * S2_LEAF))
                                   - np.uint64(1))
    level = s2_cell_level(ids)
    i = np.zeros_like(face)
    j = np.zeros_like(face)
    orient = (face & 1).astype(np.int64)
    for k in range(S2_LEAF - 1, -1, -1):
        p = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        ij = _POS_TO_IJ[orient, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = orient ^ _POS_TO_ORIENT[p]
    # center of the level-cell in leaf st units: leaf cells center at
    # i + 0.5; coarser cells center at i0 + 2^(drop-1) EXACTLY (adding the
    # extra half-leaf would bias the center by 2^-31 of the face)
    drop = S2_LEAF - level
    i0 = (i >> drop) << drop
    j0 = (j >> drop) << drop
    half = np.where(drop > 0, (np.int64(1) << np.maximum(drop - 1, 0))
                    .astype(np.float64), 0.5)
    n = float(1 << S2_LEAF)
    s = (i0 + half) / n
    t = (j0 + half) / n
    x, y, z = _face_uv_to_xyz_s2(face, _st_to_uv(s), _st_to_uv(t))
    norm = np.sqrt(x * x + y * y + z * z)
    return x / norm, y / norm, z / norm


def s2_parent(ids: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Ancestor cell at a coarser level (2 bits per level)."""
    return np.asarray(ids, dtype=np.int64) >> (2 * (level - parent_level))


def h3_id(ra, dec, res: int) -> np.ndarray:
    """H3-style id: (res << 56) | (base_cell << 48) | path, where base_cell is
    the HEALPix face (12 rhombic base cells) and path is the 2-bit-per-res
    nested child index — the aperture-4 analogue of H3's child path."""
    if not 0 <= res <= H3_MAX_RES:
        raise ValueError(f"res must be in [0, {H3_MAX_RES}]")
    pix = hpx_id(res, np.asarray(ra, dtype=np.float64), np.asarray(dec, dtype=np.float64))
    base = pix >> (2 * res)
    path = pix & ((np.int64(1) << (2 * res)) - 1)
    return (np.int64(res) << 56) | (base << 48) | path


def h3_to_components(ids) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(res, base_cell, path) from an h3-style id."""
    ids = np.asarray(ids, dtype=np.int64)
    res = ids >> 56
    base = (ids >> 48) & 0xFF
    path = ids & ((np.int64(1) << 48) - 1)
    return res, base, path


def h3_parent(ids, parent_res: int) -> np.ndarray:
    """Ancestor id at a coarser resolution (H3 h3ToParent analogue)."""
    ids = np.asarray(ids, dtype=np.int64)
    res, base, path = h3_to_components(ids)
    shift = 2 * (res - parent_res)
    return (np.int64(parent_res) << 56) | (base << 48) | (path >> shift)
