"""H3-style and S2 cell encodes (north-rule ⊕ P12 — no reference impl).

- ``s2_cell_id``: TRUE S2 cell ids — canonical face/uv charts, quadratic
  st projection, Hilbert-curve position via the published orientation
  lookup tables, library-compatible 64-bit layout (face bits + position
  bits + trailing marker). Parent/range/level/center inverses included.
- ``s2_id``: the original Z-order variant (plain hierarchical int64,
  always positive — convenient as a range-partitioning key), kept as an
  option behind ``s2_udf(level, curve="zorder")``.
- ``h3_hex_id``: TRUE aperture-7 hexagonal hierarchy on the icosahedron
  (the real H3 algorithm shape, from the published H3 design docs):
  gnomonic projection onto the nearest icosahedron face, hexagonal
  lattice with Class II/III orientation alternation (the aperture-7
  rotation asin(sqrt(3/28)) ≈ 19.1°), res-0 unit = tan(face-to-vertex
  angle)/2 (equals H3's published RES0_U_GNOMONIC = 0.3819660112…),
  per-res 3-bit digits derived by the published _upAp7/_upAp7r axial
  rounding, H3's digit numbering (CENTER/K/J/JK/I/IK/IJ), and an
  H3-shaped 64-bit layout. Engine-defined, NOT bit-interoperable with
  libh3: the grid is face-local (cells clip at icosahedron-face Voronoi
  borders instead of stitching via libh3's 122-base-cell tables, so base
  cells are (face, i, j) packed in 10 bits — the 7 base bits plus the 3
  spare mode-dependent bits) and the icosahedron is golden-ratio
  canonical rather than Dymaxion-oriented. All hierarchy/inverse
  operations included: parent, center, res, descendant id range.
- ``h3_id``: the original HEALPix-based aperture-4 analogue, kept as an
  option behind ``h3_udf(res, grid="hpx")``.

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
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
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


def _fij_to_leaf(face, i, j) -> np.ndarray:
    """(face, leaf i, leaf j) -> uint64 leaf cell id (Hilbert walk)."""
    pos = np.zeros_like(np.asarray(i), dtype=np.uint64)
    orient = (face & 1).astype(np.int64)  # kSwapMask bit of the face
    for k in range(S2_LEAF - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orient = orient ^ _POS_TO_ORIENT[p]
    return ((face.astype(np.uint64) << np.uint64(2 * S2_LEAF + 1))
            | (pos << np.uint64(1)) | np.uint64(1))


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
    leaf = _fij_to_leaf(face, i, j)
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


# ---------------------------------------------------------------------------
# True aperture-7 hexagonal grid on the icosahedron ("hex" H3 variant).
# Public algorithm: Uber H3 design docs (h3geo.org) — gnomonic face
# projection, Class II/III aperture-7 substitution, axial up/down rounding.
# Engine-defined ids (face-local grid); see module docstring.
# ---------------------------------------------------------------------------

H3_HEX_MAX_RES = 15
_AP7_ROT = float(np.arcsin(np.sqrt(3.0 / 28.0)))  # Class III rotation
_SQRT7 = float(np.sqrt(7.0))
_SQRT3 = float(np.sqrt(3.0))


def _build_icosa():
    """Golden-ratio icosahedron: 20 face centers + per-face tangent bases.
    Deterministic (sorted vertex construction); computed once at import."""
    phi = (1.0 + 5.0 ** 0.5) / 2.0
    v = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            v += [(0.0, a, b), (a, b, 0.0), (b, 0.0, a)]
    verts = np.array(v, dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1)[:, None]
    dots = verts @ verts.T
    edge_cos = np.sort(dots, axis=1)[:, -2].min()
    faces = []
    for i in range(12):
        for j in range(i + 1, 12):
            for k in range(j + 1, 12):
                if (dots[i, j] > edge_cos - 1e-9 and dots[i, k] > edge_cos - 1e-9
                        and dots[j, k] > edge_cos - 1e-9):
                    faces.append((i, j, k))
    assert len(faces) == 20
    centers = np.array([verts[list(f)].mean(axis=0) for f in faces])
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    e1 = np.empty_like(centers)
    e2 = np.empty_like(centers)
    for fi, f in enumerate(faces):
        w = verts[f[0]] - centers[fi] * (verts[f[0]] @ centers[fi])
        e1[fi] = w / np.linalg.norm(w)
        e2[fi] = np.cross(centers[fi], e1[fi])
    theta_v = float(np.arccos(np.clip(verts[faces[0][0]] @ centers[0], -1, 1)))
    return centers, e1, e2, theta_v


_ICO_C, _ICO_E1, _ICO_E2, _ICO_THETA_V = _build_icosa()
#: res-0 hex unit in gnomonic tangent coords; equals H3's RES0_U_GNOMONIC.
_HEX_U0 = float(np.tan(_ICO_THETA_V)) / 2.0

#: H3 digit numbering: CENTER=0 K=1 J=2 JK=3 I=4 IK=5 IJ=6, as axial
#: (i-k, j-k) unit vectors; 3x3 lookup on (di+1, dj+1), -1 = invalid.
_DIGIT_LUT = -np.ones(9, dtype=np.int64)   # flat (di+1)*3 + (dj+1)
for _d, (_di, _dj) in enumerate(
        [(0, 0), (-1, -1), (0, 1), (-1, 0), (1, 0), (0, -1), (1, 1)]):
    _DIGIT_LUT[(_di + 1) * 3 + (_dj + 1)] = _d
#: inverse: digit -> (di, dj)
_DIGIT_AXIAL = np.array(
    [(0, 0), (-1, -1), (0, 1), (-1, 0), (1, 0), (0, -1), (1, 1)],
    dtype=np.int64)


def _hex_round(a, b):
    """Cube rounding of fractional axial coords.

    The grid basis is e_i = (1, 0), e_j = (-1/2, sqrt3/2) (see
    ``_axial_to_2d`` / ``_DIGIT_AXIAL``: (1, 1) is a unit neighbor), so the
    standard 60°-axial cube round applies under the substitution
    q = a, r = -b — cube triple (a, b - a, -b), NOT (a, b, -a-b), which is
    the completion for a 60° basis and mis-assigns ~33% of points to a
    non-nearest hex (round-3 advice fix; containment property-tested)."""
    x = a
    z = -b
    y = b - a                     # -x - z
    rx, ry, rz = np.round(x), np.round(y), np.round(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)   # else-branch fixes y, which we drop
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), (-rz).astype(np.int64)


def _xyz_to_face_2d(x, y, z):
    """Nearest icosahedron face + gnomonic tangent-plane coords.

    Since the tangent basis is orthogonal to the face center
    (dot(c, e1) = dot(c, e2) = 0), the gnomonic coords reduce to
    dot(p, e_k) / dot(p, c) — no intermediate projection arrays."""
    p = np.stack([x, y, z], axis=1)
    face = np.argmax(p @ _ICO_C.T, axis=1)
    d = (x * _ICO_C[face, 0] + y * _ICO_C[face, 1] + z * _ICO_C[face, 2])
    x2d = (x * _ICO_E1[face, 0] + y * _ICO_E1[face, 1]
           + z * _ICO_E1[face, 2]) / d
    y2d = (x * _ICO_E2[face, 0] + y * _ICO_E2[face, 1]
           + z * _ICO_E2[face, 2]) / d
    return face.astype(np.int64), x2d, y2d


def _grid_axial(x2d, y2d, res):
    """Containing hex cell (axial ints) at res: scale 1/sqrt(7)^res, odd
    res rotated +19.1° (Class III)."""
    ang = _AP7_ROT * (res % 2)
    s = _HEX_U0 / _SQRT7 ** res
    ca, sa = np.cos(ang), np.sin(ang)
    xr = (ca * x2d + sa * y2d) / s    # rotate by -ang, then scale
    yr = (-sa * x2d + ca * y2d) / s
    b = 2.0 * yr / _SQRT3             # 120° axial basis: e_i=(1,0),
    a = xr + 0.5 * b                  # e_j=(-1/2, sqrt3/2)
    return _hex_round(a, b)


def _axial_to_2d(i, j, res):
    """Hex cell center -> gnomonic tangent coords (inverse of _grid_axial)."""
    ang = _AP7_ROT * (res % 2)
    s = _HEX_U0 / _SQRT7 ** res
    xr = (i - 0.5 * j) * s
    yr = (_SQRT3 / 2.0) * j * s
    ca, sa = np.cos(ang), np.sin(ang)
    return ca * xr - sa * yr, sa * xr + ca * yr


def _round_div7(a):
    """round(a/7) for int64 a, exact: ties are impossible (2a+7 is odd, so
    never a multiple of 14) and numpy // is floor division, so
    round(a/7) == floor(a/7 + 1/2) == (2a+7)//14. Pure integer arithmetic
    (~10x the float-divide + np.round path)."""
    return (2 * a + 7) // 14


def _up_ap7(i, j):
    """Aperture-7 parent, ccw variant (child Class III, odd res)."""
    return _round_div7(3 * i - j), _round_div7(i + 2 * j)


def _up_ap7r(i, j):
    """Aperture-7 parent, cw variant (child Class II, even res)."""
    return _round_div7(2 * i + j), _round_div7(3 * j - i)


def _down_ap7(i, j):
    """Parent center in child axial coords, ccw (exact int inverse)."""
    return 2 * i + j, -i + 3 * j


def _down_ap7r(i, j):
    return 3 * i - j, i + 2 * j


# H3-shaped 64-bit layout (engine variant): bit63=0, mode=1 at bits 59-62,
# res at bits 55-58, base cell (face*49 + (i0+3)*7 + (j0+3), < 980) at bits
# 45-54, fifteen 3-bit digits at bits 0-44 (digit for res r at bits
# 3*(15-r)); digits past res are 7 (unused marker), exactly as in H3.
_H3_MODE_SHIFT = 59
_H3_RES_SHIFT = 55
_H3_BASE_SHIFT = 45


def _sevens_below(res):
    """All-7s digit padding below the res digit block (closed form)."""
    return (np.int64(1) << (3 * (H3_HEX_MAX_RES - res))) - 1



def h3_hex_id(ra, dec, res: int) -> np.ndarray:
    """True aperture-7 hexagonal cell id (see module docstring). Always a
    positive int64 (bit 63 = 0) — safe as a range-partitioning key."""
    if not 0 <= res <= H3_HEX_MAX_RES:
        raise ValueError(f"res must be in [0, {H3_HEX_MAX_RES}]")
    ra = np.radians(np.asarray(ra, dtype=np.float64))
    dec = np.radians(np.asarray(dec, dtype=np.float64))
    cd = np.cos(dec)
    face, x2d, y2d = _xyz_to_face_2d(np.cos(ra) * cd, np.sin(ra) * cd,
                                     np.sin(dec))
    i, j = _grid_axial(x2d, y2d, res)
    return _face_axial_to_id(face, i, j, res)


def _face_axial_to_id(face, i, j, res: int, strict: bool = True):
    """Pack (face, res-level axial cell) into an id via the aperture-7 up
    chain. strict=False returns -1 where the up chain leaves the face's
    base-cell band (|i0| or |j0| > 3) instead of raising — used by
    neighbor walks, whose off-face steps are clipped by design."""
    digits = np.zeros(len(i), dtype=np.int64)
    # digits past res are all 7s: every bit below the res digit block
    pad = _sevens_below(np.int64(res))
    for rr in range(res, 0, -1):
        up = _up_ap7 if rr % 2 == 1 else _up_ap7r
        down = _down_ap7 if rr % 2 == 1 else _down_ap7r
        pi, pj = up(i, j)
        ci, cj = down(pi, pj)
        d = _DIGIT_LUT[(i - ci) * 3 + (j - cj) + 4]
        if np.any(d < 0):
            raise AssertionError("aperture-7 digit out of unit range")
        digits |= d << (3 * (H3_HEX_MAX_RES - rr))
        i, j = pi, pj
    off = (np.abs(i) > 3) | (np.abs(j) > 3)
    if np.any(off):
        if strict:
            raise AssertionError("res-0 cell outside face bound")
        i = np.clip(i, -3, 3)
        j = np.clip(j, -3, 3)
    base = face * 49 + (i + 3) * 7 + (j + 3)
    ids = ((np.int64(1) << _H3_MODE_SHIFT)
           | (np.int64(res) << _H3_RES_SHIFT)
           | (base << _H3_BASE_SHIFT) | digits | pad)
    if not strict:
        ids = np.where(off, np.int64(-1), ids)
    return ids


def h3_hex_validate(ids) -> None:
    """Layout sanity guard for a consumed hex-H3 id column.

    The hex layout (mode=1 nibble at bits 59-62, base < 980) is
    INCOMPATIBLE with the legacy HEALPix-analogue layout (``h3_id``,
    res<<56 header): joining ids from the two families produces garbage
    keys with no error. Call this on (a sample of) any externally-supplied
    h3 column before using it as a join/covering key; raises ValueError
    with a layout diagnosis instead of silently mismatching."""
    ids = np.asarray(ids, dtype=np.int64)
    if len(ids) == 0:
        return
    mode = (ids >> _H3_MODE_SHIFT) & 0xF
    bad = (ids < 0) | (mode != 1) | (h3_hex_base(ids) >= 980)
    if np.any(bad):
        k = int(np.argmax(bad))
        raise ValueError(
            f"id {ids[k]:#x} is not a hex-H3 id (mode nibble "
            f"{int(mode[k])}, expected 1) — was this column encoded with "
            "the legacy grid='hpx' layout? Re-encode or pass grid='hpx' "
            "consistently; the two bit layouts cannot be joined.")


def h3_hex_res(ids) -> np.ndarray:
    return (np.asarray(ids, dtype=np.int64) >> _H3_RES_SHIFT) & 0xF


def h3_hex_base(ids) -> np.ndarray:
    return (np.asarray(ids, dtype=np.int64) >> _H3_BASE_SHIFT) & 0x3FF


def h3_hex_parent(ids, parent_res: int) -> np.ndarray:
    """Ancestor id: truncate digits below parent_res to 7, set res field.
    Exact (pure bit arithmetic on the digit path)."""
    ids = np.asarray(ids, dtype=np.int64)
    res = h3_hex_res(ids)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= id res")
    pad = _sevens_below(np.int64(parent_res))
    keep = ~pad
    low45 = (np.int64(1) << 45) - 1
    return ((ids & ~low45 & ~(np.int64(0xF) << _H3_RES_SHIFT))
            | (np.int64(parent_res) << _H3_RES_SHIFT)
            | (ids & low45 & keep) | pad)


def h3_hex_range(ids, child_res: int) -> tuple[np.ndarray, np.ndarray]:
    """[lo, hi] id range of res=child_res descendants (digit-path prefix
    interval) — the covering-join primitive: a child id c at child_res
    descends from id iff lo <= c <= hi."""
    ids = np.asarray(ids, dtype=np.int64)
    res = h3_hex_res(ids)
    if np.any(res > child_res):
        raise ValueError("child_res must be >= id res")
    low45 = (np.int64(1) << 45) - 1
    head = (ids & ~low45 & ~(np.int64(0xF) << _H3_RES_SHIFT)) \
        | (np.int64(child_res) << _H3_RES_SHIFT)
    pad = _sevens_below(np.int64(child_res))      # digits past child_res
    own = _sevens_below(res)                      # bits below the id's res
    sub = own & ~pad        # digit slots between res+1 and child_res
    prefix = ids & low45 & ~own
    return head | prefix | pad, head | prefix | sub | pad


def _id_to_face_axial(ids):
    """(face, axial i, axial j at the id's res, res) — digit walk down
    from the base cell (inverse of _face_axial_to_id)."""
    ids = np.asarray(ids, dtype=np.int64)
    res = h3_hex_res(ids)
    base = h3_hex_base(ids)
    face = base // 49
    i = (base % 49) // 7 - 3
    j = base % 7 - 3
    max_res = int(res.max()) if len(res) else 0
    for rr in range(1, max_res + 1):
        act = rr <= res
        down = _down_ap7 if rr % 2 == 1 else _down_ap7r
        ci, cj = down(i, j)
        d = (ids >> (3 * (H3_HEX_MAX_RES - rr))) & 7
        d = np.where(act, d, 0)
        i = np.where(act, ci + _DIGIT_AXIAL[d, 0], i)
        j = np.where(act, cj + _DIGIT_AXIAL[d, 1], j)
    return face, i, j, res


def h3_hex_center(ids) -> tuple[np.ndarray, np.ndarray]:
    """(ra, dec) degrees of each cell center: digit walk down from the
    base cell, inverse gnomonic on the home face."""
    ids = np.asarray(ids, dtype=np.int64)
    face, i, j, res = _id_to_face_axial(ids)
    # per-res scale differs per row: recompute 2d per distinct res value
    x2d = np.zeros(len(ids), dtype=np.float64)
    y2d = np.zeros(len(ids), dtype=np.float64)
    for r0 in np.unique(res):
        m = res == r0
        x2d[m], y2d[m] = _axial_to_2d(i[m], j[m], int(r0))
    c = _ICO_C[face]
    p = c + x2d[:, None] * _ICO_E1[face] + y2d[:, None] * _ICO_E2[face]
    p /= np.linalg.norm(p, axis=1)[:, None]
    ra = np.degrees(np.arctan2(p[:, 1], p[:, 0])) % 360.0
    dec = np.degrees(np.arcsin(np.clip(p[:, 2], -1.0, 1.0)))
    return ra, dec


#: axial offsets of the 6 hex neighbors (120-degree basis)
_HEX_NEIGHBOR_AXIAL = np.array(
    [(1, 0), (0, 1), (-1, 0), (0, -1), (1, 1), (-1, -1)], dtype=np.int64)


def h3_hex_kring(ids, k: int = 1) -> np.ndarray:
    """ids of all cells within hex-grid distance k of each input cell
    (shape (n, m) with m = 1+3k(k+1), row 0 = the cell itself). All inputs
    must share one res. Face-local: ring members that fall off the home
    face's base-cell band come back as -1 (the grid does not stitch across
    icosahedron faces — callers union the query point's own cell from the
    other face when edge completeness matters, as the kNN operator does
    for HPX)."""
    ids = np.asarray(ids, dtype=np.int64)
    face, i, j, res = _id_to_face_axial(ids)
    r0 = int(res[0]) if len(res) else 0
    if len(res) and not (res == r0).all():
        raise ValueError("h3_hex_kring requires a single res")
    # enumerate axial offsets with hex distance <= k (cube metric)
    offs = [(di, dj) for di in range(-k, k + 1) for dj in range(-k, k + 1)
            if max(abs(di), abs(dj), abs(di - dj)) <= k]
    offs.sort(key=lambda t: (max(abs(t[0]), abs(t[1]), abs(t[0] - t[1])),
                             t))
    out = np.empty((len(ids), len(offs)), dtype=np.int64)
    for c, (di, dj) in enumerate(offs):
        out[:, c] = _face_axial_to_id(face, i + di, j + dj, r0,
                                      strict=False)
    return out


# ---------------------------------------------------------------------------
# S2 cap covering — makes the Hilbert ids a queryable index (cone search on
# an s2h<L> column), same role as htm_circle_ranges / hpx_cone_ranges.
# Level-synchronous BFS over the quadtree with the bounding-cap zone test
# (cell circumradius from its corners): sound superset covering, interior
# cells classified full when center-distance + circumradius <= cap radius.
# ---------------------------------------------------------------------------

def _s2_cells_geom(face, i0, j0, lvl: int):
    """Center unit vector + circumradius (rad) of cells given by their
    lower-corner leaf coords at level lvl."""
    size = np.int64(1) << (S2_LEAF - lvl)
    n = float(1 << S2_LEAF)

    def _xyz(si, sj):
        x, y, z = _face_uv_to_xyz_s2(face, _st_to_uv(si / n),
                                     _st_to_uv(sj / n))
        norm = np.sqrt(x * x + y * y + z * z)
        return x / norm, y / norm, z / norm

    cx, cy, cz = _xyz(i0 + size / 2.0, j0 + size / 2.0)
    circ = np.zeros(len(face), dtype=np.float64)
    for di in (0, 1):
        for dj in (0, 1):
            vx, vy, vz = _xyz((i0 + di * size).astype(np.float64),
                              (j0 + dj * size).astype(np.float64))
            dot = np.clip(cx * vx + cy * vy + cz * vz, -1.0, 1.0)
            circ = np.maximum(circ, np.arccos(dot))
    return cx, cy, cz, circ


def s2_cap_ranges(ra: float, dec: float, radius_deg: float, level: int,
                  split: bool = False):
    """Covering of a spherical cap as sorted (uint64 order) inclusive id
    ranges at ``level`` (ids as int64 bit patterns, same layout as
    s2_cell_id). split=True returns (inside_ranges, boundary_ranges) for
    count-bounds-style consumers."""
    rad = np.radians(radius_deg)
    d = np.radians(dec)
    cap = np.array([np.cos(np.radians(ra)) * np.cos(d),
                    np.sin(np.radians(ra)) * np.cos(d), np.sin(d)])

    def classify(cx, cy, cz, circ, **_):
        sep = np.arccos(np.clip(cx * cap[0] + cy * cap[1] + cz * cap[2],
                                -1.0, 1.0))
        keep = sep <= rad + circ                 # not provably disjoint
        full = keep & (sep + circ <= rad)        # provably interior
        return keep, full

    return _s2_region_ranges(classify, level, split)


def s2_polygon_ranges(ra_list, dec_list, level: int, split: bool = False):
    """Covering of a convex spherical polygon (CCW vertices, same
    convention as the HTM/HPX polygon searches) as level-``level`` id
    ranges. Zone test per cell against every edge plane: outside one plane
    by more than the circumradius => disjoint; inside every plane by more
    than the circumradius => interior. Sound both ways for convex
    regions."""
    from .cover import polygon_normals

    normals = polygon_normals(ra_list, dec_list)

    def classify(cx, cy, cz, circ, **_):
        sc = np.sin(circ)
        keep = np.ones(len(cx), dtype=bool)
        full = np.ones(len(cx), dtype=bool)
        for nrm in normals:
            dot = cx * nrm.x + cy * nrm.y + cz * nrm.z
            keep &= dot >= -sc
            full &= dot >= sc
        return keep, full

    return _s2_region_ranges(classify, level, split)


def s2_ellipse_ranges(ra: float, dec: float, a_deg: float, b_deg: float,
                      angle: float, level: int, split: bool = False):
    """Covering of a spherical ellipse as level-``level`` S2 id ranges,
    with the TRUE quadratic-form classifier (same exact cell test as the
    HTM path's _ellipse_cov, htm.c:608-636) instead of the bounding-cap
    proxy — the cap over-covers by ~a/b on eccentric ellipses.

    S2 cells are spherical quadrilaterals bounded by great circles, so
    the triangle trichotomy applies verbatim: a cell intersects the
    (convex, a < 90°) ellipse iff a corner is inside, an edge crosses the
    boundary, or the ellipse lies entirely inside the cell (center's
    (face, uv) within the cell's st box). All four corners inside a
    convex region => the whole cell is inside (full)."""
    from .geometry import sc_to_v3
    from .regions import SphericalEllipse, _ellipse_isect

    cen = sc_to_v3(ra, dec)
    ell = SphericalEllipse.from_center(cen, a_deg, b_deg, angle)
    a_rad = np.radians(a_deg)
    cap = np.array([cen.x, cen.y, cen.z])
    # ellipse-center leaf coords for the center-in-cell test
    cface, cu, cv = _xyz_to_face_uv_s2(
        np.array([cen.x]), np.array([cen.y]), np.array([cen.z]))
    n_leaf = float(1 << S2_LEAF)
    ci = int(np.clip(_uv_to_st(np.array([cu[0]]))[0] * n_leaf, 0,
                     n_leaf - 1))
    cj = int(np.clip(_uv_to_st(np.array([cv[0]]))[0] * n_leaf, 0,
                     n_leaf - 1))
    cface = int(cface[0])

    def classify(cx, cy, cz, circ, cells):
        face, i0, j0, lvl = cells
        sep = np.arccos(np.clip(cx * cap[0] + cy * cap[1] + cz * cap[2],
                                -1.0, 1.0))
        cand = sep <= a_rad + circ          # cap pre-reject (sound)
        keep = np.zeros(len(cx), dtype=bool)
        full = np.zeros(len(cx), dtype=bool)
        if not np.any(cand):
            return keep, full
        idx = np.nonzero(cand)[0]
        size = np.int64(1) << (S2_LEAF - lvl)
        # corners of the candidate cells (vectorized)
        corners = []
        for di, dj in ((0, 0), (1, 0), (1, 1), (0, 1)):
            si = (i0[idx] + di * size).astype(np.float64)
            sj = (j0[idx] + dj * size).astype(np.float64)
            x, y, z = _face_uv_to_xyz_s2(face[idx], _st_to_uv(si / n_leaf),
                                         _st_to_uv(sj / n_leaf))
            norm = np.sqrt(x * x + y * y + z * z)
            corners.append((x / norm, y / norm, z / norm))
        nin = np.zeros(len(idx), dtype=np.int64)
        for x, y, z in corners:
            nin += ell.contains_cols(x, y, z).astype(np.int64)
        k_loc = nin > 0
        f_loc = nin == 4
        # corners all outside: edge crossing or ellipse-inside-cell
        from .geometry import V3

        for t in np.nonzero(nin == 0)[0]:
            g = idx[t]
            if (face[g] == cface and i0[g] <= ci < i0[g] + size
                    and j0[g] <= cj < j0[g] + size):
                k_loc[t] = True          # ellipse entirely inside the cell
                continue
            vs = [V3(float(c[0][t]), float(c[1][t]), float(c[2][t]))
                  for c in corners]
            for e in range(4):
                if _ellipse_isect(vs[e], vs[(e + 1) % 4], ell):
                    k_loc[t] = True
                    break
        keep[idx] = k_loc
        full[idx] = f_loc
        return keep, full

    return _s2_region_ranges(classify, level, split)


def _s2_region_ranges(classify, level: int, split: bool):
    """Level-synchronous quadtree BFS shared by the S2 region coverings:
    ``classify(cx, cy, cz, circ) -> (keep, full)`` must be sound (never
    claims full for a cell with outside points; never drops a cell that
    intersects)."""
    if not 0 <= level <= S2_LEAF:
        raise ValueError(f"level must be in [0, {S2_LEAF}]")
    face = np.arange(6, dtype=np.int64)
    i0 = np.zeros(6, dtype=np.int64)
    j0 = np.zeros(6, dtype=np.int64)
    full_cells = []   # (face, i0, j0, lvl)
    # frontier can empty BEFORE the target level (e.g. a full-sphere cap
    # classifies every cell full at level 0) — boundary must pre-exist
    boundary = (np.empty(0, np.int64),) * 3 + (level,)
    for lvl in range(level + 1):
        if len(face) == 0:
            break
        cx, cy, cz, circ = _s2_cells_geom(face, i0, j0, lvl)
        keep, full = classify(cx, cy, cz, circ,
                              cells=(face, i0, j0, lvl))
        full = keep & full
        if np.any(full):
            full_cells.append((face[full], i0[full], j0[full], lvl))
        part = keep & ~full
        if lvl == level:
            boundary = (face[part], i0[part], j0[part], lvl)
            break
        face, i0, j0 = face[part], i0[part], j0[part]
        half = np.int64(1) << (S2_LEAF - lvl - 1)
        m = len(face)
        face = np.repeat(face, 4)
        i0 = np.repeat(i0, 4) + np.tile(np.array([0, 1, 0, 1],
                                                 dtype=np.int64), m) * half
        j0 = np.repeat(j0, 4) + np.tile(np.array([0, 0, 1, 1],
                                                 dtype=np.int64), m) * half

    lsb_t = np.uint64(1) << np.uint64(2 * (S2_LEAF - level))

    def _to_ranges(cells_list):
        out = []
        for f, ii, jj, lvl in cells_list:
            if len(f) == 0:
                continue
            leaf = _fij_to_leaf(f, ii, jj)           # lower-corner leaf id
            lsb = np.uint64(1) << np.uint64(2 * (S2_LEAF - lvl))
            cell = (leaf & ~(lsb + lsb - np.uint64(1))) | lsb  # snap to lvl
            lo = cell - lsb + lsb_t                  # first level-t child
            hi = cell + lsb - lsb_t                  # last level-t child
            out.extend(zip(lo.view(np.int64).tolist(),
                           hi.view(np.int64).tolist()))
        # sort in uint64 order and merge adjacent
        out.sort(key=lambda t: t[0] ^ (-1 << 63))
        merged = []
        step = int(lsb_t) * 2                        # id spacing at level
        for lo, hi in out:
            if merged and (lo ^ (-1 << 63)) - (merged[-1][1] ^ (-1 << 63)) == step:
                merged[-1][1] = hi
            else:
                merged.append([lo, hi])
        return [[int(a), int(b)] for a, b in merged]

    inside = _to_ranges(full_cells)
    bound = _to_ranges([boundary])
    if split:
        return inside, bound
    return _to_ranges(full_cells + [boundary])


# ---------------------------------------------------------------------------
# Hex-H3 region coverings — make the hex ids a queryable two-phase index
# (cone/polygon search over an h3<R> column), completing the C-family for
# the hex grid. Reference seed: the level-synchronous covering pattern of
# sptQueryLib.c:1311-1630; hex cells have no geometric subtree nesting
# (aperture-7 children only approximately tile the parent), so the covering
# is an explicit sorted CELL LIST at the query res, joined on equality —
# never an ancestor range. Implementation is a vectorized per-face disk
# enumeration rather than a k-ring frontier BFS: h3_hex_kring clips
# off-face steps to -1, so a BFS could never cross an icosahedron face
# boundary, while enumerating every face whose Voronoi region can touch
# the query region is complete by construction.
# ---------------------------------------------------------------------------

#: cap on enumeration-box cells per face — a query whose (radius/res) pair
#: would scan more than this is asking for a denser covering than any
#: prefilter can pay for; raise res or radius instead of silently burning
#: driver memory
_H3_COVER_BOX_LIMIT = 16_000_000


def _h3_cell_rmax(res: int) -> float:
    """Angular bound (rad) on center-to-member distance of a res cell.

    Lattice spacing in gnomonic tangent units is s = U0/sqrt(7)^res; the
    planar hexagon circumradius is s/sqrt(3), and gnomonic planar length
    always upper-bounds angular length (d_theta = cos^2(theta) * d_planar
    <= d_planar), so s/sqrt(3) bounds the angle too."""
    return (_HEX_U0 / _SQRT7 ** res) / _SQRT3


def _h3_face_disk_cells(face: int, axis, rad_tot: float, res: int):
    """Axial coords (i, j) of `face`-lattice cells whose center lies
    within ``rad_tot`` radians of unit vector ``axis``. May include
    off-band cells (caller packs with strict=False and drops -1) and
    cells owned by a neighboring face (harmless over-coverage for an
    equality prefilter). Empty result when the face cannot intersect."""
    C, E1, E2 = _ICO_C[face], _ICO_E1[face], _ICO_E2[face]
    ax, ay, az = float(axis[0]), float(axis[1]), float(axis[2])
    d = ax * C[0] + ay * C[1] + az * C[2]
    if d <= 0.05:  # axis >87deg from face center: face can't be relevant
        return (np.empty(0, np.int64),) * 2
    s = _HEX_U0 / _SQRT7 ** res
    x0 = (ax * E1[0] + ay * E1[1] + az * E1[2]) / d
    y0 = (ax * E2[0] + ay * E2[1] + az * E2[2]) / d
    # planar radius bound: gnomonic maps geodesics to lines, and a
    # geodesic's polar angle is maximal at an endpoint, so planar length
    # <= angular length * sec^2(theta_max). Cell centers of interest sit
    # within the face band (theta <~ theta_v), the axis at theta_c.
    theta_c = float(np.arccos(np.clip(d, -1.0, 1.0)))
    theta_m = min(max(theta_c, _ICO_THETA_V + 0.1) + rad_tot, 1.45)
    r_p = rad_tot / np.cos(theta_m) ** 2
    # clip the enumeration disk to the face band (cells beyond the base-
    # cell band pack to -1 anyway; this just bounds the box)
    rho_max = np.tan(min(_ICO_THETA_V + 8 * s, 1.45)) + s
    if np.hypot(x0, y0) > rho_max + r_p:
        return (np.empty(0, np.int64),) * 2
    # rotated-frame coords (the res-parity Class III rotation)
    ang = _AP7_ROT * (res % 2)
    ca, sa = np.cos(ang), np.sin(ang)
    xr0 = ca * x0 + sa * y0
    yr0 = -sa * x0 + ca * y0
    # per-row CHORD enumeration, intersected with the face disk at the
    # origin: a square box around the query disk enumerated ~sec^4(theta)
    # more cells than exist (hypothesis-found: 28M box for a 14k-cell
    # covering at radius 15 deg, res 6), while the chord intersection is
    # bounded by the smaller of the two disks' areas.
    row_h = _SQRT3 / 2.0 * s
    j_lo = int(np.floor((max(yr0 - r_p, -rho_max)) / row_h)) - 1
    j_hi = int(np.ceil((min(yr0 + r_p, rho_max)) / row_h)) + 1
    j_vals = np.arange(j_lo, j_hi + 1, dtype=np.int64)
    yr_c = j_vals * row_h
    dyq = r_p * r_p - (yr_c - yr0) ** 2          # query-disk chord
    dyo = rho_max * rho_max - yr_c ** 2          # face-disk chord
    ok = (dyq > 0) & (dyo > 0)
    j_vals, yr_c, dyq, dyo = j_vals[ok], yr_c[ok], dyq[ok], dyo[ok]
    if len(j_vals) == 0:
        return (np.empty(0, np.int64),) * 2
    hq, ho = np.sqrt(dyq), np.sqrt(dyo)
    x_min = np.maximum(xr0 - hq, -ho)
    x_max = np.minimum(xr0 + hq, ho)
    ok = x_min <= x_max
    j_vals, yr_c, x_min, x_max = j_vals[ok], yr_c[ok], x_min[ok], x_max[ok]
    if len(j_vals) == 0:
        return (np.empty(0, np.int64),) * 2
    # axial i = xr/s + j/2 along each row
    i_lo_r = np.floor(x_min / s + 0.5 * j_vals).astype(np.int64) - 1
    i_hi_r = np.ceil(x_max / s + 0.5 * j_vals).astype(np.int64) + 1
    counts = i_hi_r - i_lo_r + 1
    n_cells = int(counts.sum())
    if n_cells > _H3_COVER_BOX_LIMIT:
        raise ValueError(
            f"h3 covering enumeration is {n_cells} cells at res {res}; "
            "use a coarser res for this region size")
    jj = np.repeat(j_vals, counts)
    # vectorized ragged arange: offset within each row + row start
    starts = np.repeat(i_lo_r, counts)
    offs = np.arange(n_cells, dtype=np.int64) \
        - np.repeat(np.cumsum(counts) - counts, counts)
    ii = starts + offs
    x2d, y2d = _axial_to_2d(ii, jj, res)
    near = (x2d - x0) ** 2 + (y2d - y0) ** 2 <= r_p * r_p * 1.0001
    ii, jj, x2d, y2d = ii[near], jj[near], x2d[near], y2d[near]
    # unproject centers and apply the exact angular test
    px = C[0] + x2d * E1[0] + y2d * E2[0]
    py = C[1] + x2d * E1[1] + y2d * E2[1]
    pz = C[2] + x2d * E1[2] + y2d * E2[2]
    norm = np.sqrt(px * px + py * py + pz * pz)
    sep = np.arccos(np.clip((px * ax + py * ay + pz * az) / norm, -1, 1))
    keep = sep <= rad_tot + 1e-12
    return ii[keep], jj[keep]


def _h3_region_cells(axis, rad_tot: float, res: int):
    """(ids, centers xyz) of all hex cells (any face) whose center is
    within rad_tot of axis — the shared enumeration for the coverings."""
    out_ids = []
    out_xyz = []
    for face in range(20):
        fc = _ICO_C[face]
        cosd = float(axis[0] * fc[0] + axis[1] * fc[1] + axis[2] * fc[2])
        # faces whose Voronoi region (circumradius theta_v) can't reach
        # the disk are skipped; small slack for the base-cell band
        if np.arccos(np.clip(cosd, -1, 1)) > _ICO_THETA_V + rad_tot + 0.05:
            continue
        ii, jj = _h3_face_disk_cells(face, axis, rad_tot, res)
        if len(ii) == 0:
            continue
        ids = _face_axial_to_id(
            np.full(len(ii), face, dtype=np.int64), ii.copy(), jj.copy(),
            res, strict=False)
        ok = ids != -1
        if not np.any(ok):
            continue
        x2d, y2d = _axial_to_2d(ii[ok], jj[ok], res)
        C, E1, E2 = _ICO_C[face], _ICO_E1[face], _ICO_E2[face]
        px = C[0] + x2d * E1[0] + y2d * E2[0]
        py = C[1] + x2d * E1[1] + y2d * E2[1]
        pz = C[2] + x2d * E1[2] + y2d * E2[2]
        n = np.sqrt(px * px + py * py + pz * pz)
        px, py, pz = px / n, py / n, pz / n
        # ownership prune: a cell of face f is only ever EMITTED by
        # h3_hex_id for points whose nearest face is f, and those points
        # lie within rmax (angular) of the cell center — so a cell whose
        # center is deeper than 2*rmax inside ANOTHER face's Voronoi
        # region can never be an assigned id. Moving a unit vector by
        # angle a changes any dot product by at most 2*sin(a/2) <= a, so
        # the dot-difference threshold 2*rmax is sound. Without this the
        # near-boundary lattice duplication over-covers ~5x (measured).
        best = np.full(len(px), -2.0)
        for g in range(20):
            if g == face:
                continue
            gc = _ICO_C[g]
            best = np.maximum(best, px * gc[0] + py * gc[1] + pz * gc[2])
        own = (px * C[0] + py * C[1] + pz * C[2]) >= \
            best - 2.0 * _h3_cell_rmax(res) - 1e-12
        if not np.any(own):
            continue
        out_ids.append(ids[ok][own])
        out_xyz.append(np.stack([px[own], py[own], pz[own]], axis=1))
    if not out_ids:
        return np.empty(0, np.int64), np.empty((0, 3))
    ids = np.concatenate(out_ids)
    xyz = np.concatenate(out_xyz)
    u, idx = np.unique(ids, return_index=True)
    return u, xyz[idx]


def h3_cone_cells(ra: float, dec: float, radius_deg: float, res: int,
                  split: bool = False):
    """Sorted hex cells at ``res`` intersecting the cone — complete: every
    point of the cone maps (via h3_hex_id) to a listed cell. split=True
    returns (inside_cells, boundary_cells): inside cells provably contain
    only cone members (center distance + cell rmax <= radius)."""
    if not 0 <= res <= H3_HEX_MAX_RES:
        raise ValueError(f"res must be in [0, {H3_HEX_MAX_RES}]")
    d = np.radians(dec)
    axis = np.array([np.cos(np.radians(ra)) * np.cos(d),
                     np.sin(np.radians(ra)) * np.cos(d), np.sin(d)])
    rad = np.radians(radius_deg)
    rmax = _h3_cell_rmax(res)
    ids, xyz = _h3_region_cells(axis, rad + rmax + 1e-12, res)
    if not split:
        return ids
    sep = np.arccos(np.clip(xyz @ axis, -1, 1))
    inside = sep + rmax <= rad
    return ids[inside], ids[~inside]


def h3_polygon_cells(ra_list, dec_list, res: int, split: bool = False):
    """Sorted hex cells at ``res`` intersecting a convex spherical polygon
    (CCW vertices, same convention as the HTM/HPX polygon searches).
    Complete covering: bounding-cap enumeration + per-edge zone test
    (outside one plane by more than the cell rmax => provably disjoint)."""
    from .cover import polygon_normals

    normals = polygon_normals(ra_list, dec_list)
    ra_r = np.radians(np.asarray(ra_list, dtype=np.float64))
    de_r = np.radians(np.asarray(dec_list, dtype=np.float64))
    vx = np.cos(ra_r) * np.cos(de_r)
    vy = np.sin(ra_r) * np.cos(de_r)
    vz = np.sin(de_r)
    c0 = np.array([vx.mean(), vy.mean(), vz.mean()])
    n0 = np.linalg.norm(c0)
    if n0 < 1e-9:
        raise ValueError(
            "polygon vertices average to the origin (hemisphere-spanning "
            "or degenerate input) — no bounding cap exists; split the "
            "region or use the HTM/HPX covering")
    c0 /= n0
    cap_r = float(np.arccos(np.clip(
        vx * c0[0] + vy * c0[1] + vz * c0[2], -1, 1).min()))
    rmax = _h3_cell_rmax(res)
    ids, xyz = _h3_region_cells(c0, cap_r + rmax + 1e-12, res)
    sr = np.sin(rmax)
    keep = np.ones(len(ids), dtype=bool)
    full = np.ones(len(ids), dtype=bool)
    for nrm in normals:
        dot = xyz[:, 0] * nrm.x + xyz[:, 1] * nrm.y + xyz[:, 2] * nrm.z
        keep &= dot >= -sr
        full &= dot >= sr
    if split:
        return ids[keep & full], ids[keep & ~full]
    return ids[keep]
