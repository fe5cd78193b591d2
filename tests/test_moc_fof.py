"""MOC coverage algebra + friends-of-friends clustering tests."""

import math
import random

import numpy as np
import pytest

from spatialindex_spark.operators.moc import (flat_to_uniq, moc_area_deg2,
                                              moc_from_pixels,
                                              moc_from_points,
                                              ranges_difference,
                                              ranges_intersect, ranges_union,
                                              uniq_from_pixarray,
                                              uniq_to_flat)


def _as_set(ranges):
    out = set()
    for lo, hi in ranges:
        out.update(range(lo, hi + 1))
    return out


def _rand_ranges(rng, n, span):
    rs = []
    for _ in range(n):
        lo = rng.randrange(span)
        rs.append([lo, lo + rng.randrange(12)])
    return rs


def test_range_algebra_vs_set_reference():
    rng = random.Random(7)
    for _ in range(60):
        a = _rand_ranges(rng, rng.randrange(8), 300)
        b = _rand_ranges(rng, rng.randrange(8), 300)
        sa, sb = _as_set(a), _as_set(b)
        assert _as_set(ranges_union(a, b)) == sa | sb
        assert _as_set(ranges_intersect(a, b)) == sa & sb
        assert _as_set(ranges_difference(a, b)) == sa - sb
        # outputs are normalized: sorted, disjoint, non-adjacent
        for out in (ranges_union(a, b), ranges_intersect(a, b),
                    ranges_difference(a, b)):
            for i in range(1, len(out)):
                assert out[i][0] > out[i - 1][1] + 1


def test_flat_uniq_roundtrip_and_normal_form():
    rng = random.Random(11)
    order = 5
    npix = 12 << (2 * order)
    for _ in range(30):
        rs = _rand_ranges(rng, rng.randrange(1, 10), npix - 64)
        rs = [[lo, min(hi, npix - 1)] for lo, hi in rs]
        cells = flat_to_uniq(rs, order)
        # roundtrip covers the same pixels
        assert _as_set(uniq_to_flat(cells, order)) == _as_set(rs)
        # normal form: no 4 complete siblings at any order
        per = {}
        for o, pix in cells:
            per.setdefault(o, set()).add(pix)
        for o, s in per.items():
            if o == 0:
                continue
            parents = {}
            for p in s:
                parents[p >> 2] = parents.get(p >> 2, 0) + 1
            assert all(v < 4 for v in parents.values())


def test_uniq_from_pixarray_matches_flat_to_uniq():
    # occupancy rollup == decomposition of the same pixel set's ranges
    rng = random.Random(3)
    order = 4
    npix = 12 << (2 * order)
    pix = np.array(sorted(rng.sample(range(npix), 500)), dtype=np.int64)
    got = uniq_from_pixarray(pix, order)
    rs = [[int(p), int(p)] for p in pix]
    assert got == flat_to_uniq(rs, order)


def test_moc_area():
    # one order-0 cell = 4pi/12 sr
    full = [[0, 11]]
    assert math.isclose(moc_area_deg2(full, 0), 4 * math.pi * (180 / math.pi) ** 2,
                        rel_tol=1e-12)
    one = [[5, 5]]
    assert math.isclose(moc_area_deg2(one, 0) * 12,
                        moc_area_deg2(full, 0), rel_tol=1e-12)


def test_moc_from_pixels_distributed_matches_numpy(spark):
    rng = random.Random(19)
    order = 5
    npix = 12 << (2 * order)
    pix = sorted(rng.sample(range(npix), 3000))
    df = spark.createDataFrame([(p,) for p in pix], "pix long")
    got = sorted((r["moc_order"], r["pix"])
                 for r in moc_from_pixels(df, "pix", order).collect())
    want = uniq_from_pixarray(np.array(pix, dtype=np.int64), order)
    assert got == want


def test_moc_from_points_full_sky_collapses(spark):
    # enough uniform points to occupy every order-1 pixel -> MOC is the
    # 12 order-0 roots (merge chain runs to the top)
    n = 6000
    rows = [(i * 0.618034 % 360,
             math.degrees(math.asin(2 * ((i * 0.381966) % 1) - 1)))
            for i in range(1, n)]
    df = spark.createDataFrame(rows, "ra double, dec double")
    got = sorted((r["moc_order"], r["pix"])
                 for r in moc_from_points(df, 1).collect())
    assert got == [(0, p) for p in range(12)]


def test_fof_planted_clusters(spark):
    from spatialindex_spark.operators.fof import fof_cluster, fof_objects

    # three tight clumps + two isolated points
    pts = []
    clumps = [(40.0, 10.0), (80.0, -30.0), (200.0, 55.0)]
    pid = 0
    truth = {}
    for ci, (ra, dec) in enumerate(clumps):
        for j in range(4):
            pts.append((pid, ra + 0.05 * j, dec + 0.04 * j))
            truth[pid] = ci
            pid += 1
    for ra, dec in [(10.0, 70.0), (300.0, -60.0)]:
        pts.append((pid, ra, dec))
        truth[pid] = 100 + pid
        pid += 1
    df = spark.createDataFrame(pts, "id long, ra double, dec double")
    lab = {r["id"]: r["object_id"]
           for r in fof_cluster(df, 1.0, "id").collect()}
    # same truth-cluster -> same object id; object id = min member id
    for ci in range(3):
        members = [p for p, c in truth.items() if c == ci]
        assert len({lab[m] for m in members}) == 1
        assert lab[members[0]] == min(members)
    # singletons keep their own id
    assert lab[12] == 12 and lab[13] == 13
    # cross-cluster ids differ
    assert len({lab[0], lab[4], lab[8], lab[12], lab[13]}) == 5

    objs = {r["object_id"]: r for r in fof_objects(df, 1.0, "id").collect()}
    assert len(objs) == 5
    assert objs[0]["n_members"] == 4 and objs[12]["n_members"] == 1
    # spherical-mean centroid vs numpy on clump 0
    m = [p for p in pts if p[0] in (0, 1, 2, 3)]
    v = np.array([[math.cos(math.radians(d)) * math.cos(math.radians(r)),
                   math.cos(math.radians(d)) * math.sin(math.radians(r)),
                   math.sin(math.radians(d))] for _, r, d in m]).mean(axis=0)
    ra_c = (math.degrees(math.atan2(v[1], v[0])) + 360.0) % 360.0
    dec_c = math.degrees(math.atan2(v[2], math.hypot(v[0], v[1])))
    assert objs[0]["ra_c"] == pytest.approx(ra_c, abs=1e-6)
    assert objs[0]["dec_c"] == pytest.approx(dec_c, abs=1e-6)


def test_moc_filter_superset_soundness(spark):
    """The MOC (covA ∪ covB) − inner(P) must pass every point of
    (A ∪ B) \\ P: compare the coarse filter to exact geometry."""
    from spatialindex_spark.functions.cover import (hpx_cone_ranges,
                                                    polygon_normals)
    from spatialindex_spark.functions.udfs import hpx_udf
    from spatialindex_spark.operators.counts import (SpatialIndex,
                                                     region_split_ranges)
    from spatialindex_spark.operators.moc import (moc_filter,
                                                  ranges_difference,
                                                  ranges_union)

    rows = [(i, i * 0.618034 % 360,
             math.degrees(math.asin(2 * ((i * 0.381966) % 1) - 1)))
            for i in range(1, 4000)]
    df = (spark.createDataFrame(rows, "id long, ra double, dec double")
          .withColumn("pix7", hpx_udf(7)("ra", "dec")))
    a = dict(ra=129.4, dec=43.7, radius=10.0)
    b = dict(ra=140.0, dec=48.0, radius=9.0)
    pra, pdec = [126.0, 136.0, 136.0, 126.0], [40.0, 40.0, 48.0, 48.0]
    cov = ranges_union(
        hpx_cone_ranges(7, a["ra"], a["dec"], a["radius"], exact_ends=True),
        hpx_cone_ranges(7, b["ra"], b["dec"], b["radius"], exact_ends=True))
    inner_p, _ = region_split_ranges(dict(kind="poly", ra=pra, dec=pdec), 7,
                                     SpatialIndex.HPX)
    moc = ranges_difference(cov, inner_p)
    coarse = {r["id"] for r in moc_filter(df, moc, "pix7").collect()}

    def inside(ra, dec):
        def sep_ok(c):
            v = (math.cos(math.radians(dec)) * math.cos(math.radians(ra)),
                 math.cos(math.radians(dec)) * math.sin(math.radians(ra)),
                 math.sin(math.radians(dec)))
            cv = (math.cos(math.radians(c["dec"])) * math.cos(math.radians(c["ra"])),
                  math.cos(math.radians(c["dec"])) * math.sin(math.radians(c["ra"])),
                  math.sin(math.radians(c["dec"])))
            return sum(x * y for x, y in zip(v, cv)) >= math.cos(
                math.radians(c["radius"]))
        in_p = all(
            (math.cos(math.radians(dec)) * math.cos(math.radians(ra)) * n.x
             + math.cos(math.radians(dec)) * math.sin(math.radians(ra)) * n.y
             + math.sin(math.radians(dec)) * n.z) >= 0.0
            for n in polygon_normals(pra, pdec))
        return (sep_ok(a) or sep_ok(b)) and not in_p

    exact = {i for i, ra, dec in rows if inside(ra, dec)}
    assert exact <= coarse  # never drops a true row
    assert exact  # region is non-trivial at this density


def test_density_mom_partition_and_numpy_parity(spark):
    from collections import Counter

    from spatialindex_spark.operators.moc import density_mom

    rng = random.Random(31)
    order, t = 4, 8
    npix = 12 << (2 * order)
    # clumped pixels: a hot patch + uniform background
    pix = [rng.randrange(64) for _ in range(400)] \
        + [rng.randrange(npix) for _ in range(300)]
    df = spark.createDataFrame([(p,) for p in pix], "pix long")
    got = [(r["moc_order"], r["pix"], r["n"])
           for r in density_mom(df, "pix", order, t).collect()]

    # numpy replica: full-sum ladder + highest-fitting-ancestor emission
    cnt = Counter(pix)
    sums = {order: dict(cnt)}
    for o in range(order, 0, -1):
        up = {}
        for p, n in sums[o].items():
            up[p >> 2] = up.get(p >> 2, 0) + n
        sums[o - 1] = up
    want = []
    for o in range(order + 1):
        for p, n in sums[o].items():
            if o == 0:
                if n <= t:
                    want.append((0, p, n))
            elif sums[o - 1][p >> 2] > t and (n <= t or o == order):
                want.append((o, p, n))
    assert sorted(got) == sorted(want)

    # partition properties: total mass preserved, no overlaps
    assert sum(n for _, _, n in got) == len(pix)
    flat = []
    for o, p, _ in got:
        sh = 2 * (order - o)
        flat.append((p << sh, ((p + 1) << sh) - 1))
    flat.sort()
    for i in range(1, len(flat)):
        assert flat[i][0] > flat[i - 1][1]
    # every occupied pixel is covered by exactly one emitted cell
    covered = set()
    for lo, hi in flat:
        covered.update(range(lo, hi + 1))
    assert set(pix) <= covered


def test_moc_ascii_roundtrip_and_format():
    from hypothesis import given, settings, strategies as st

    from spatialindex_spark.operators.moc import (moc_from_ascii,
                                                  moc_to_ascii)

    # hand-checked IVOA examples: runs collapse, orders group, MOCORD
    # always declared
    assert moc_to_ascii([[0, 11]], 0) == "0/0-11"
    assert moc_to_ascii([[0, 4 ** 3 * 12 - 1]], 3) == "0/0-11 3/"
    s = moc_to_ascii([[4, 4], [16, 31]], 2)
    assert s == "0/1 2/4"
    assert moc_from_ascii(s) == ([[4, 4], [16, 31]], 2)
    # bare-order token parses as empty coverage at that order
    assert moc_from_ascii("2/") == ([], 2)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 12 * 4 ** 4 - 1),
                              st.integers(0, 40)),
                    min_size=1, max_size=8),
           st.just(4))
    def rt(spans, order):
        npix = 12 * 4 ** order
        rs = [[lo, min(lo + w, npix - 1)] for lo, w in spans]
        from spatialindex_spark.operators.moc import _normalize
        norm = _normalize(rs)
        back, o = moc_from_ascii(moc_to_ascii(rs, order))
        assert o == order and back == norm

    rt()
