"""Region-count parity vs the reference's scan oracle (A3).

The reference ships htm_tree_s2{circle,ellipse,cpoly}_scan explicitly "for
testing" against indexed counts (tree.h:72-116; tree.c:202-283). Fixtures
here were produced by driving those scans (tree_query driver, recipe in
FIXTURES.md) over 50k seeded points; the engine's exact geometric
predicates — the same Column expressions the two-phase Spark plan executes
after covering pruning — must count the identical row sets.

Circles use the dot >= cos(r) form while the reference scan uses the secant
distance dist2 <= 4 sin^2(r/2); count equality over random points shows the
two forms agree on every point (fp ties are measure-zero by construction).
"""

import json
import math
import os

import numpy as np
import pytest

from spatialindex_spark.functions.geometry import sc_to_v3
from spatialindex_spark.functions.regions import SphericalEllipse, convex_hull

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "scan_counts_golden.json")


@pytest.fixture(scope="module")
def data():
    with open(FIX) as f:
        fx = json.load(f)
    rng = np.random.default_rng(fx["seed"])
    n = fx["n"]
    ra = rng.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    x = np.cos(np.radians(ra)) * np.cos(np.radians(dec))
    y = np.sin(np.radians(ra)) * np.cos(np.radians(dec))
    z = np.sin(np.radians(dec))
    return fx, x, y, z


def test_circle_counts_match_reference_scan(data):
    fx, x, y, z = data
    for case in fx["circle"]:
        c = sc_to_v3(case["ra"], case["dec"])
        mine = int(np.sum(c.x * x + c.y * y + c.z * z
                          >= math.cos(math.radians(case["r"]))))
        assert mine == case["count"], case


def test_ellipse_counts_match_reference_scan(data):
    fx, x, y, z = data
    for case in fx["ellipse"]:
        e = SphericalEllipse.from_center(
            sc_to_v3(case["ra"], case["dec"]), case["a"], case["b"], case["angle"])
        assert int(np.sum(e.contains_cols(x, y, z))) == case["count"], case


def test_hull_counts_match_reference_scan(data):
    fx, x, y, z = data
    for case in fx["hull"]:
        hull = convex_hull([sc_to_v3(ra, dec) for ra, dec in case["points"]],
                           mode="reference")
        mask = np.ones(len(x), bool)
        for ed in hull.edges:
            mask &= (ed.x * x + ed.y * y + ed.z * z >= 0.0)
        assert int(mask.sum()) == case["count"], case["points"]
