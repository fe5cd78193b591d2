"""Constraint-string parity with the compiled reference (SURVEY.md §5.2).

`tests/fixtures/constraints.json` holds 72 (region -> constraint) pairs
captured from the reference `sptQuery` binary: cones and convex quads,
HTM + HPX, levels 4-14. Strings must match byte-for-byte (modulo the CLI's
leading whitespace, stripped at capture time).
"""

import os

import numpy as np
import pytest

from spatialindex_spark.functions.constraints import SpatialIndex
from spatialindex_spark.functions.cover import (
    compress_gaps,
    htm_circle_ranges,
    simplify_ranges,
)

si = SpatialIndex()


def test_readme_example():
    """README.md:40-51 golden output."""
    r = si.cone_search(129.4, 43.7, 0.5, mode=SpatialIndex.HTM, level=7,
                       encoding=SpatialIndex.DECIMAL, colname="htmind")
    assert r["status"] == 0
    assert r["index_constraint"] == (
        "(htmind = 245093) OR (htmind = 245098) OR (htmind = 245100) OR "
        "(htmind = 245105) OR (htmind = 245110) OR (htmind = 245118)"
    )
    assert r["geom_constraint"] == (
        "(-0.458889307552*x)+(0.558660986180*y)+(0.690882411077*z)"
        ">=9.999619230642e-01"
    )


def test_fixture_battery(constraint_fixtures):
    for fx in constraint_fixtures:
        mode = SpatialIndex.HTM if fx["mode"] == "HTM" else SpatialIndex.HPX
        col = "htmind" if fx["mode"] == "HTM" else "hpxind"
        if fx["kind"] == "cone":
            got = si.cone_search(fx["ra"], fx["dec"], fx["r"], mode=mode,
                                 level=fx["level"], encoding=0, colname=col)
        else:
            got = si.polygon_search(fx["ra"], fx["dec"], mode=mode,
                                    level=fx["level"], encoding=0, colname=col)
        assert got["status"] == 0, fx
        assert got["index_constraint"].strip() == fx["index_constraint"], fx
        assert got["geom_constraint"].strip() == fx["geom_constraint"], fx


def test_error_level_too_deep():
    r = si.cone_search(10, 10, 1, level=21)
    assert r["status"] == 1
    assert r["error_message"] == (
        "Indexing level cannot be greater than 20 (which is already "
        "sub-arcsecond)."
    )


def test_error_degenerate_corner():
    # repeated vertex -> |handedness| < 1e-10 (sptQueryLib.c:666-671)
    r = si.polygon_search([10.0, 10.0, 11.0], [10.0, 10.0, 11.0], level=7)
    assert r["status"] == 1
    assert r["error_message"] == "Degenerate polygon corner."


def test_error_nonconvex():
    # bowtie vertex order (sptQueryLib.c:678-685)
    r = si.polygon_search([0.0, 1.0, 0.0, 1.0], [0.0, 1.0, 1.0, 0.0], level=7)
    assert r["status"] == 1
    assert r["error_message"] == "Polygon is not convex;"


def test_base4_default_colname():
    """spatial_index.pyx:89-102 default: no colname+no encoding -> BASE4 spt_ind."""
    r = si.cone_search(129.4, 43.7, 0.5, level=7)
    assert "spt_ind" in r["index_constraint"]
    # BASE4 of 245093 starts with leading hemisphere digit 2 (N)
    assert "223311" in r["index_constraint"]


def test_hpx_14_range_fixture():
    """FIXTURES.md §4.2 — 12-range HPX L14 covering."""
    r = si.cone_search(34.0, 45.0, 0.4, mode=SpatialIndex.HPX, level=14,
                       encoding=SpatialIndex.DECIMAL, colname="hpxind")
    assert r["index_constraint"].startswith(
        "(hpxind BETWEEN 163900155 AND 163901440)")
    assert r["index_constraint"].endswith(
        "(hpxind BETWEEN 164069376 AND 164069386)")
    assert r["index_constraint"].count("OR") == 11


def test_cover_properties():
    """Property checks (SURVEY.md §5.2 item 3)."""
    ranges = htm_circle_ranges(83.6, 22.0, 2.0, 10)
    arr = np.array(ranges)
    assert (arr[:, 0] <= arr[:, 1]).all()
    assert (arr[1:, 0] > arr[:-1, 1]).all()  # sorted, disjoint

    total = int(np.sum(arr[:, 1] - arr[:, 0] + 1))
    comp = np.array(compress_gaps(ranges))
    ctotal = int(np.sum(comp[:, 1] - comp[:, 0] + 1))
    assert ctotal < total * 1.3 + 1  # <=30% false-positive budget
    # compression never drops covered cells
    j = 0
    for lo, hi in arr:
        while comp[j, 1] < hi:
            j += 1
        assert comp[j, 0] <= lo and hi <= comp[j, 1]


def test_simplify_ranges():
    r = simplify_ranges([[16, 17], [20, 23], [64, 66]], 1)
    arr = np.array(r)
    assert (arr[:, 0] % 4 == 0).all()
    assert ((arr[:, 1] + 1) % 4 == 0).all()


def test_covering_contains_member_points(golden_cells):
    """Any point inside the region must land in a covered range."""
    import duckdb  # noqa: F401
    from spatialindex_spark.functions.geometry import radec_to_xyz, sc_to_v3, RAD_PER_DEG
    import math

    ra0, dec0, rad = 200.0, -30.0, 3.0
    c = si.cone_search(ra0, dec0, rad, mode=SpatialIndex.HTM, level=7,
                       encoding=SpatialIndex.DECIMAL, colname="htm7",
                       compress=False, as_constraints=True)
    center = sc_to_v3(ra0, dec0)
    cosrad = math.cos(rad * RAD_PER_DEG)
    x, y, z = radec_to_xyz(golden_cells.ra.values, golden_cells.dec.values)
    inside = (x * center.x + y * center.y + z * center.z) >= cosrad
    cells = golden_cells["htm7"].values[inside]
    arr = np.array(c.ranges)
    for cell in cells:
        assert ((arr[:, 0] <= cell) & (cell <= arr[:, 1])).any()


def test_fresh_random_constraint_parity_vs_reference_binary():
    """Beyond the 72 static golden strings: every run draws NEW random
    cones (both systems, several levels) and compares constraint strings
    byte-for-byte against the compiled reference CLI. Skips when the
    sandbox binary is absent (recipe in FIXTURES.md)."""
    import random
    import subprocess

    import pytest as _pytest

    binpath = "/tmp/refbuild/sptQuery"
    if not os.path.exists(binpath):
        _pytest.skip("reference binary not built in this sandbox")

    from spatialindex_spark import SpatialIndex

    si = SpatialIndex()
    rng = random.Random()  # fresh seed each run — that is the point
    for _ in range(10):
        ra = round(rng.uniform(0, 360), 3)
        dec = round(rng.uniform(-85, 85), 3)
        r = round(rng.uniform(0.05, 3.0), 3)
        lvl = rng.choice([5, 7, 10, 14])
        mode_s = rng.choice(["HTM", "HPX"])
        ref = subprocess.run(
            [binpath, mode_s, str(lvl), "-c", str(ra), str(dec), str(r)],
            capture_output=True, text=True).stdout
        mode = SpatialIndex.HTM if mode_s == "HTM" else SpatialIndex.HPX
        col = "htmind" if mode_s == "HTM" else "hpxind"
        c = si.cone_search(ra, dec, r, mode=mode, level=lvl, encoding=0,
                           colname=col)
        ref_lines = [ln.split(">", 1)[1].strip()
                     for ln in ref.strip().splitlines() if "CONSTRAINT>" in ln]
        mine = [c["index_constraint"].strip(), c["geom_constraint"].strip()]
        assert ref_lines == mine, (mode_s, ra, dec, r, lvl)
