"""H3-style and S2-style cell encodes (north-rule ⊕ P12 — no reference impl).

These are from-scratch, documented encodings that follow the same column
pattern as ``htm<L>``/``hpx<L>`` (int64, hierarchical, Z-ordered children)
so every downstream operator (range partitioning, coverings by prefix,
neighbor rings) works identically over them. They are *engine-defined*:

- ``s2_id``: S2-style — project onto the 6 cube faces, quadratic UV
  correction (the S2 "quadratic projection"), then bit-interleave (i, j)
  into a quadtree cell path: ``id = (face << 2L) | interleave(i, j)``.
  Matches S2's cell hierarchy semantics (face + Hilbert-free Z-order; we
  use Z-order rather than the Hilbert curve and document that choice —
  locality is provided downstream by range-partitioning on the id).
- ``h3_id``: H3-style — icosahedral-inspired aperture-4 hierarchy packed
  as ``(res << 56) | (base_cell << 48) | path``; base cells are the 12
  HEALPix faces (a rhombic base grid), per-res 2-bit child digits. True
  H3 is aperture-7 hexagonal; this engine analogue keeps H3's API shape
  (res, base cell, child path) while staying exactly invertible.

Both are numpy-vectorized and exposed as pandas UDFs in udfs.py.
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
    """S2-style cell id: (face << 2L) | interleave(i, j), i/j from the
    quadratic-projected st coordinates. int64, hierarchical by 2-bit suffix."""
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
