

def test_split_covering_identity():
    """inside ∪ boundary == the full covering, and they are disjoint."""
    from spatialindex_spark.functions.cover import (
        htm_circle_ranges, htm_circle_ranges_split, _ranges_add)

    for (ra, dec, r, lvl) in [(129.4, 43.7, 0.5, 7), (10.0, -80.0, 8.0, 6),
                              (200.0, 0.0, 2.0, 10), (0.1, 0.1, 30.0, 4)]:
        full = [tuple(x) for x in htm_circle_ranges(ra, dec, r, lvl)]
        inside, boundary = htm_circle_ranges_split(ra, dec, r, lvl)
        cells_in = set()
        for lo, hi in inside:
            cells_in.update(range(lo, hi + 1))
        cells_b = set()
        for lo, hi in boundary:
            cells_b.update(range(lo, hi + 1))
        assert not (cells_in & cells_b)
        merged: list[list[int]] = []
        for lo, hi in sorted(list(inside) + list(boundary)):
            _ranges_add(merged, int(lo), int(hi))
        assert [tuple(x) for x in merged] == full, (ra, dec, r, lvl)
