"""Reference CLI result envelopes (spatialindex_spark/cli.py).

The byte formats are pinned against the reference source: IPAC-SVC /
JSON envelopes + escaper at tree_count.c:25-120, id list output forms
at id_list.c:76-90 (neither tool ships a main() in this snapshot, so
the formats themselves are the parity surface — the underlying counts,
bounds and coverings are golden-gated elsewhere)."""

import io

import numpy as np
import pandas as pd
import pytest

from spatialindex_spark.cli import (format_count, format_error,
                                    format_range, id_list_lines,
                                    id_list_main, tree_count_main)


def test_count_envelopes():
    # tree_count.c:92-99 — JSON count is a bare number, SVC quotes it
    assert format_count(42) == '[struct stat="OK", count="42"]'
    assert format_count(42, json_fmt=True) == '{"stat":"OK", "count":42}'


def test_range_envelopes():
    # tree_count.c:101-110
    assert format_range(3, 17) == '[struct stat="OK", min="3", max="17"]'
    assert (format_range(3, 17, json_fmt=True)
            == '{"stat":"OK", "min":3, "max":17}')


def test_error_envelopes_and_escaper():
    # tree_count.c:60-79 err() + :25-58 esc()
    assert (format_error("plain failure")
            == '[struct stat="ERROR", msg="plain failure"]')
    assert (format_error("plain failure", json_fmt=True)
            == '{"stat":"ERROR", "msg":"plain failure"}')
    # the 7 escaped specials
    assert format_error('a"b\\c\nd\te\rf\bg\fh', json_fmt=True) == (
        '{"stat":"ERROR", "msg":"a\\"b\\\\c\\nd\\te\\rf\\bg\\fh"}')
    # bytes outside 0x20-0x7e are DROPPED, not escaped (esc() default arm)
    assert (format_error("café \x01ok", json_fmt=True)
            == '{"stat":"ERROR", "msg":"caf ok"}')
    # NULL message prints unquoted null
    assert format_error(None) == '[struct stat="ERROR", msg=null]'
    assert format_error(None, json_fmt=True) == '{"stat":"ERROR", "msg":null}'


def test_escaper_truncation():
    # esc() truncates at its 8 KiB buffer with ` ..."` (tree_count.c:48-50)
    msg = "x" * 9000
    out = format_error(msg, json_fmt=True)
    body = out[len('{"stat":"ERROR", "msg":'):-1]
    assert body.endswith(' ..."') and len(body) == 8190 + 1
    # an exactly-fitting message is untouched
    fit = "y" * 8000
    assert format_error(fit, json_fmt=True).count("y") == 8000


def test_escaper_truncation_never_splits_an_escape():
    # a 2-char escape sequence straddling the truncation boundary must
    # not be cut in half (a dangling backslash breaks the JSON envelope)
    import json

    for pad in range(8180, 8192):
        out = format_error("x" * pad + "\n" * 20, json_fmt=True)
        parsed = json.loads(out)  # raises on a dangling backslash
        assert parsed["stat"] == "ERROR" and parsed["msg"].endswith(" ...")


def test_tree_count_json_error_envelope_on_parse_failure():
    # --json must be honored even when argument parsing itself fails
    import json

    buf = io.StringIO()
    rc = tree_count_main(["--json", "--level"], out=buf)
    assert rc == 1
    parsed = json.loads(buf.getvalue())
    assert parsed["stat"] == "ERROR" and "needs a value" in parsed["msg"]
    # flag AFTER the failing option still selects JSON
    buf = io.StringIO()
    assert tree_count_main(["--level", "--json"], out=buf) == 1
    assert json.loads(buf.getvalue())["stat"] == "ERROR"


def test_id_list_lines_forms():
    from spatialindex_spark.functions.htm import htm_idtodec

    ranges = [[245, 247], [260, 260]]
    # expanded raw (id_list.c:85-88)
    assert list(id_list_lines(ranges)) == ["245", "246", "247", "260"]
    # --ranges raw (id_list.c:78-84)
    assert list(id_list_lines(ranges, as_ranges=True)) == ["245 247",
                                                           "260 260"]
    # --decimal maps every id through htm_idtodec
    want = [str(int(htm_idtodec(np.asarray([v], dtype=np.int64))[0]))
            for v in (245, 246, 247, 260)]
    assert list(id_list_lines(ranges, decimal=True)) == want
    lo245 = int(htm_idtodec(np.asarray([245], dtype=np.int64))[0])
    hi247 = int(htm_idtodec(np.asarray([247], dtype=np.int64))[0])
    assert list(id_list_lines([[245, 247]], as_ranges=True,
                              decimal=True)) == [f"{lo245} {hi247}"]


def test_id_list_main_matches_covering():
    """CLI output == htm_circle_ranges on the README circle (the same
    covering that is golden-gated against the compiled reference)."""
    from spatialindex_spark.functions.cover import htm_circle_ranges

    buf = io.StringIO()
    rc = id_list_main(["--ranges", "--level", "7",
                       "circle", "129.4", "43.7", "0.5"], out=buf)
    assert rc == 0
    got = buf.getvalue().strip().splitlines()
    want = [f"{lo} {hi}"
            for lo, hi in htm_circle_ranges(129.4, 43.7, 0.5, 7)]
    assert got == want

    # --maxranges coarsens identically to simplify_ranges inside the lib
    buf2 = io.StringIO()
    id_list_main(["--ranges", "--level", "7", "--maxranges", "2",
                  "circle", "129.4", "43.7", "0.5"], out=buf2)
    want2 = [f"{lo} {hi}"
             for lo, hi in htm_circle_ranges(129.4, 43.7, 0.5, 7, 2)]
    assert buf2.getvalue().strip().splitlines() == want2
    assert len(want2) <= 2


def test_id_list_main_error_envelope():
    buf = io.StringIO()
    rc = id_list_main(["circle", "not-a-number", "0", "1"], out=buf)
    assert rc == 1
    assert buf.getvalue().startswith('[struct stat="ERROR", msg="')


@pytest.fixture()
def point_table(spark, tmp_path):
    """1500 seeded sky points as the tree_count TABLE contract:
    spt_ind at level 7 + unit-vector x,y,z."""
    from pyspark.sql import functions as F

    from spatialindex_spark.functions.udfs import htm_udf, with_xyz

    rng = np.random.default_rng(11)
    ra = rng.random(1500) * 360.0
    dec = np.degrees(np.arcsin(rng.random(1500) * 2 - 1))
    df = spark.createDataFrame(pd.DataFrame({"ra": ra, "dec": dec}))
    df = with_xyz(df).withColumn("spt_ind", htm_udf(7)("x", "y", "z"))
    path = str(tmp_path / "pts.parquet")
    df.write.parquet(path)
    return path, ra, dec


def _brute_cone(ra, dec, cra, cdec, r):
    sra, sdec = np.radians(ra), np.radians(dec)
    cx = np.cos(np.radians(cdec)) * np.cos(np.radians(cra))
    cy = np.cos(np.radians(cdec)) * np.sin(np.radians(cra))
    cz = np.sin(np.radians(cdec))
    dot = (np.cos(sdec) * np.cos(sra) * cx
           + np.cos(sdec) * np.sin(sra) * cy + np.sin(sdec) * cz)
    return int((dot >= np.cos(np.radians(r))).sum())


def test_tree_count_main_exact_and_estimate(spark, point_table):
    path, ra, dec = point_table
    want = _brute_cone(ra, dec, 200.0, 10.0, 8.0)

    buf = io.StringIO()
    rc = tree_count_main(["--level", "7", path,
                          "circle", "200.0", "10.0", "8.0"],
                         spark=spark, out=buf)
    assert rc == 0
    assert buf.getvalue().strip() == f'[struct stat="OK", count="{want}"]'

    buf_j = io.StringIO()
    tree_count_main(["--json", "--level", "7", path,
                     "circle", "200.0", "10.0", "8.0"],
                    spark=spark, out=buf_j)
    assert buf_j.getvalue().strip() == '{"stat":"OK", "count":%d}' % want

    # --estimate: [lower, upper] brackets the exact count, zero row reads
    buf_e = io.StringIO()
    rc = tree_count_main(["--estimate", "--level", "7", path,
                          "circle", "200.0", "10.0", "8.0"],
                         spark=spark, out=buf_e)
    assert rc == 0
    line = buf_e.getvalue().strip()
    assert line.startswith('[struct stat="OK", min="')
    import re
    lo, hi = map(int, re.findall(r'"(\d+)"', line)[:2])
    assert lo <= want <= hi


def test_tree_count_main_hull_and_error(spark, point_table):
    path, ra, dec = point_table
    buf = io.StringIO()
    rc = tree_count_main(
        [path, "hull", "100", "-20", "130", "-20", "130", "10", "100", "10"],
        spark=spark, out=buf)
    assert rc == 0
    # cross-check against the exact polygon predicate, brute force
    from spatialindex_spark.functions.geometry import sc_to_v3
    from spatialindex_spark.functions.regions import convex_hull
    hull = convex_hull([sc_to_v3(100, -20), sc_to_v3(130, -20),
                        sc_to_v3(130, 10), sc_to_v3(100, 10)])
    sra, sdec = np.radians(ra), np.radians(dec)
    xyz = np.stack([np.cos(sdec) * np.cos(sra),
                    np.cos(sdec) * np.sin(sra), np.sin(sdec)], axis=1)
    edges = np.array([[e.x, e.y, e.z] for e in hull.edges])
    want = int(((xyz @ edges.T) >= 0).all(axis=1).sum())
    assert buf.getvalue().strip() == f'[struct stat="OK", count="{want}"]'

    # bad table path -> ERROR envelope, nonzero exit
    buf_err = io.StringIO()
    rc = tree_count_main(["/nonexistent/nope.parquet",
                          "circle", "0", "0", "1"], spark=spark, out=buf_err)
    assert rc == 1
    assert buf_err.getvalue().startswith('[struct stat="ERROR", msg="')
