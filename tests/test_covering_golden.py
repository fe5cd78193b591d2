"""Golden-fixture parity for ellipse / convex-hull / maxranges coverings.

Fixtures were generated from the compiled reference library (cover_fixture
driver over htm_s2ellipse_ids / htm_s2cpoly_hull+htm_s2cpoly_ids /
htm_s2circle_ids with maxranges coarsening — htm.c:1147-1414, 1249-1258,
geometry.c:1388-1630; generator recipe in FIXTURES.md). Engine output must
be range-for-range identical.
"""

import json
import os

import pytest

from spatialindex_spark.functions.cover import htm_circle_ranges, htm_polygon_ranges
from spatialindex_spark.functions.geometry import sc_to_v3
from spatialindex_spark.functions.regions import (
    SphericalEllipse,
    convex_hull,
    htm_ellipse_ranges,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "covering_golden.json")


@pytest.fixture(scope="module")
def fixtures():
    with open(FIX) as f:
        return json.load(f)


def test_ellipse_coverings_match_reference(fixtures):
    for case in fixtures["ellipse"]:
        e = SphericalEllipse.from_center(
            sc_to_v3(case["ra"], case["dec"]), case["a"], case["b"], case["angle"])
        mine = [[int(lo), int(hi)] for lo, hi in htm_ellipse_ranges(e, case["level"])]
        assert mine == case["ranges"], case


def test_hull_coverings_match_reference(fixtures):
    for case in fixtures["hull"]:
        poly = convex_hull([sc_to_v3(ra, dec) for ra, dec in case["points"]],
                           mode="reference")
        mine = [[int(lo), int(hi)] for lo, hi in htm_polygon_ranges(poly, case["level"])]
        assert mine == case["ranges"], case["points"]


def test_circle_maxranges_match_reference(fixtures):
    for case in fixtures["circle_maxranges"]:
        mine = [[int(lo), int(hi)]
                for lo, hi in htm_circle_ranges(
                    case["ra"], case["dec"], case["r"], case["level"],
                    maxranges=case["maxranges"])]
        assert mine == case["ranges"], case
        assert len(mine) <= case["maxranges"]
