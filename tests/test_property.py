"""Hypothesis property-based tests (SURVEY.md §5.2 item 3)."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from spatialindex_spark.functions.constraints import SpatialIndex
from spatialindex_spark.functions.cover import compress_gaps, htm_circle_ranges
from spatialindex_spark.functions.geometry import RAD_PER_DEG, radec_to_xyz, sc_to_v3
from spatialindex_spark.functions.healpix import hpx_id, neighbors
from spatialindex_spark.functions.htm import htm_id, htm_idtodec, htm_level

ra_st = st.floats(min_value=0.0, max_value=359.999999, allow_nan=False)
dec_st = st.floats(min_value=-89.999999, max_value=89.999999, allow_nan=False)
level_st = st.integers(min_value=0, max_value=20)


@settings(max_examples=200, deadline=None)
@given(ra=ra_st, dec=dec_st, level=level_st)
def test_htm_level_inverse(ra, dec, level):
    x, y, z = radec_to_xyz(np.array([ra]), np.array([dec]))
    tid = htm_id(x, y, z, level)
    assert htm_level(tid)[0] == level
    # hierarchical consistency: parent prefix matches a coarser assignment
    if level > 0:
        parent = htm_id(x, y, z, level - 1)
        assert (tid[0] >> 2) == parent[0]


@settings(max_examples=200, deadline=None)
@given(ra=ra_st, dec=dec_st, level=st.integers(min_value=0, max_value=14))
def test_hpx_bounds_and_hierarchy(ra, dec, level):
    pix = hpx_id(level, np.array([ra]), np.array([dec]))[0]
    assert 0 <= pix < 12 * (1 << (2 * level))
    if level > 0:
        parent = hpx_id(level - 1, np.array([ra]), np.array([dec]))[0]
        assert (pix >> 2) == parent


@settings(max_examples=100, deadline=None)
@given(ra=ra_st, dec=dec_st)
def test_idtodec_digits(ra, dec):
    x, y, z = radec_to_xyz(np.array([ra]), np.array([dec]))
    tid = htm_id(x, y, z, 7)
    dec_id = int(htm_idtodec(tid)[0])
    digits = str(dec_id)
    assert digits[0] in "12"
    assert all(c in "0123" for c in digits[1:])
    assert len(digits) == 9  # 1 hemisphere + 1 root + 7 levels


@settings(max_examples=40, deadline=None)
@given(ra=ra_st, dec=dec_st,
       radius=st.floats(min_value=0.01, max_value=30.0),
       level=st.integers(min_value=2, max_value=8))
def test_covering_contains_center_and_member(ra, dec, radius, level):
    """The covering always contains the cone center's own cell, ranges are
    sorted/disjoint, and gap compression only grows coverage."""
    ranges = htm_circle_ranges(ra, dec, radius, level)
    arr = np.array(ranges)
    assert (arr[:, 0] <= arr[:, 1]).all()
    assert (arr[1:, 0] > arr[:-1, 1]).all()
    x, y, z = radec_to_xyz(np.array([ra]), np.array([dec]))
    cell = htm_id(x, y, z, level)[0]
    assert ((arr[:, 0] <= cell) & (cell <= arr[:, 1])).any()
    comp = np.array(compress_gaps(ranges))
    j = 0
    for lo, hi in arr:
        while comp[j, 1] < hi:
            j += 1
        assert comp[j, 0] <= lo and hi <= comp[j, 1]


@settings(max_examples=40, deadline=None)
@given(ra=ra_st, dec=dec_st, level=st.integers(min_value=1, max_value=10))
def test_neighbors_symmetry(ra, dec, level):
    """If b is a neighbor of a, then a is a neighbor of b."""
    pix = hpx_id(level, np.array([ra]), np.array([dec]))
    nb = neighbors(level, pix)[0]
    for b in nb[nb >= 0]:
        back = neighbors(level, np.array([b]))[0]
        assert pix[0] in back


@settings(max_examples=30, deadline=None)
@given(ra=ra_st, dec=dec_st,
       radius=st.floats(min_value=0.05, max_value=10.0))
def test_constraint_superset_property(ra, dec, radius):
    """Any point geometrically inside the cone satisfies the rendered index
    constraint (two-phase contract: index is a superset)."""
    si = SpatialIndex()
    c = si.cone_search(ra, dec, radius, mode=0, level=7, encoding=0,
                       colname="htm7", as_constraints=True)
    if c.status:
        return
    arr = np.array(c.ranges)
    # sample points inside the cone around the center
    rng = np.random.default_rng(1)
    for _ in range(10):
        t = rng.uniform(0, 2 * math.pi)
        r = radius * math.sqrt(rng.uniform(0, 1)) * 0.99
        d2 = dec + r * math.sin(t)
        if abs(d2) > 89.99:
            continue
        r2 = (ra + r * math.cos(t) / max(math.cos(math.radians(d2)), 1e-9)) % 360
        x, y, z = radec_to_xyz(np.array([r2]), np.array([d2]))
        v = sc_to_v3(ra, dec)
        if x[0] * v.x + y[0] * v.y + z[0] * v.z < math.cos(radius * RAD_PER_DEG):
            continue  # numerically outside after wrap — skip
        cell = htm_id(x, y, z, 7)[0]
        assert ((arr[:, 0] <= cell) & (cell <= arr[:, 1])).any()


@settings(max_examples=30, deadline=None)
@given(ra=ra_st, dec=dec_st,
       radius=st.floats(min_value=0.05, max_value=15.0),
       res=st.integers(min_value=1, max_value=6))
def test_h3_cone_cells_properties(ra, dec, radius, res):
    """Hex cone covering (randomized): sorted unique, contains the cone
    center's own cell, and the split partitions the covering."""
    from spatialindex_spark.functions.h3s2 import h3_cone_cells, h3_hex_id

    cells = h3_cone_cells(ra, dec, radius, res)
    assert len(cells) > 0
    assert (np.diff(cells) > 0).all()  # sorted, no duplicates
    own = h3_hex_id(np.array([ra]), np.array([dec]), res)[0]
    assert own in cells
    ins, bnd = h3_cone_cells(ra, dec, radius, res, split=True)
    assert len(ins) + len(bnd) == len(cells)
    assert np.array_equal(np.sort(np.concatenate([ins, bnd])), cells)


@settings(max_examples=30, deadline=None)
@given(ra=ra_st, dec=dec_st,
       radius=st.floats(min_value=0.05, max_value=20.0),
       level=st.integers(min_value=2, max_value=12))
def test_s2_cap_ranges_properties(ra, dec, radius, level):
    """S2 cap covering (randomized): ranges sorted/disjoint in uint64
    order and the cone center's own Hilbert id is covered."""
    from spatialindex_spark.functions.h3s2 import s2_cap_ranges, s2_cell_id

    rr = s2_cap_ranges(ra, dec, radius, level)
    assert rr
    u = np.array(rr, dtype=np.int64).view(np.uint64)
    assert (u[:, 0] <= u[:, 1]).all()
    if len(u) > 1:
        assert (u[1:, 0] > u[:-1, 1]).all()
    x, y, z = radec_to_xyz(np.array([ra]), np.array([dec]))
    own = s2_cell_id(x, y, z, level).view(np.uint64)[0]
    assert ((u[:, 0] <= own) & (own <= u[:, 1])).any()
