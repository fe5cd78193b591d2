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


# ---------------------------------------------------------------------------
# poly_test (SURVEY §2 S5 — poly_test.c:84-248)
# ---------------------------------------------------------------------------

def _poly_test(text):
    from spatialindex_spark.cli import poly_test_main
    out = io.StringIO()
    rc = poly_test_main(io.StringIO(text), out)
    return rc, out.getvalue()


def test_poly_test_header_example_bytes():
    # The documented session at poly_test.c:16-35: point + vector blocks
    # are pinned byte-for-byte against the comment's own printf output
    # (9-decimal values verbatim); the hull block follows the scan's
    # anchor-first vertex order and the verdict lines the exact printf
    # sequence (incl. the double space in "IS  Convex").
    rc, got = _poly_test("10 10\n20 10\n20 20\n10 20\n\n")
    assert rc == 0
    assert got == (
        "\n"
        "\n # = 04\n"
        "\n  00     10.000000000     10.000000000\n"
        "\n  01     20.000000000     10.000000000\n"
        "\n  02     20.000000000     20.000000000\n"
        "\n  03     10.000000000     20.000000000\n"
        "\n"
        "\n  00      0.969846310      0.171010072      0.173648178"
        "\n  01      0.925416578      0.336824089      0.173648178"
        "\n  02      0.883022222      0.321393805      0.342020143"
        "\n  03      0.925416578      0.163175911      0.342020143\n"
        "\n  00      0.925416578      0.336824089      0.173648178"
        "\n  01      0.883022222      0.321393805      0.342020143"
        "\n  02      0.925416578      0.163175911      0.342020143"
        "\n  03      0.969846310      0.171010072      0.173648178\n"
        "\n Polygon.verts (4) is Convex\n"
        "\n Polygon IS  Convex\n\n")


def test_poly_test_interior_vertex_overprint():
    # (5,4) is interior: the hull keeps 4 of 5 vertices, and
    # report_verts(poly->ve, nn) deterministically prints an EDGE plane
    # in the 5th slot (ve[] = ncv vertices then ncv normalized edges,
    # geometry.c:1573-1586); the raw input ring is non-convex.
    rc, got = _poly_test("0 0\n10 0\n10 10\n5 4\n0 10\n\n")
    assert rc == 0
    lines = got.split("\n")
    assert " # = 05" in lines
    # third block: rows 00-03 are hull vertices (each also appears in the
    # input-vector block), row 04 is an edge plane (z < 0 here — no input
    # vertex has negative z)
    assert "  04      0.173628142      0.015190494     -0.984694124" in lines
    assert " Polygon.verts (5) is NOT Convex" in lines
    assert " Polygon is NOT Convex" in lines


def test_poly_test_error_paths():
    # htm_sc_init failure -> the %lf (6-decimal) message + exit(-1) = 255
    rc, got = _poly_test("10 95\n")
    assert rc == 255
    assert got == ("Did not find acceptable spherical coordinates "
                   "(10.000000,95.000000) -- Latitude angle not in range "
                   "[-90, 90] degrees\n\n")
    # NaN/Inf precedence over the lat-range check (geometry.h:75-78)
    rc, got = _poly_test("nan 95\n")
    assert rc == 255
    assert "Value is NaN or +/-Inf" in got
    # hex-float overflow -> HUGE_VAL -> same ENANINF path ('inf' via %f)
    rc, got = _poly_test("0x1p99999 0\n")
    assert rc == 255
    assert "(inf,0.000000)" in got and "Value is NaN or +/-Inf" in got
    # < 3 vertices -> hull ELEN + exit(-3) = 253, no trailing newline
    rc, got = _poly_test("10 10\n20 10\n\n")
    assert rc == 253
    assert got.endswith("Could not compute convex hull: Too many/too few "
                        "array elements (vertices/points)")
    # antipodal spread -> EHEMIS
    rc, got = _poly_test("0 0\n180 0\n90 0\n0 90\n270 0\n0 -90\n\n")
    assert rc == 253
    assert got.endswith("Could not compute convex hull: Vectors "
                        "(vertices/points) are not hemispherical")


def test_poly_test_input_loop_semantics():
    # sscanf("%lf %lf") != 2 ends input: a lone token, a word, a blank
    # line, or EOF.  Extra tokens after two doubles are ignored.
    rc, got = _poly_test("10 10 junk\n20 10\n20 20\nonly-one\n")
    assert rc == 0
    assert " # = 03" in got
    # NP=16 cap: the 17th pair is never read
    body = "".join(f"{ra} {10 + (i % 3)}\n" for i, ra in
                   enumerate(range(0, 85, 5)))  # 17 pairs
    rc, got = _poly_test(body)
    assert rc == 0
    assert " # = 16" in got


def test_poly_test_c_double_parsing():
    from spatialindex_spark.cli import _sscanf_2lf
    assert _sscanf_2lf("  -1.5e1\t+2") == (-15.0, 2.0)
    assert _sscanf_2lf("0x10 .5") == (16.0, 0.5)
    assert _sscanf_2lf("1e400 0") == (float("inf"), 0.0)  # strtod overflow
    # hex overflow -> HUGE_VAL too (float.fromhex raises where float() clamps)
    assert _sscanf_2lf("0x1p99999 0") == (float("inf"), 0.0)
    assert _sscanf_2lf("-0x1p99999 0") == (float("-inf"), 0.0)
    # incomplete exponent: strtod backtracks to "12.5", the second %lf
    # then fails on the dangling 'e' -> nr=1, ends the input loop
    assert _sscanf_2lf("12.5e 1") is None
    assert _sscanf_2lf("1,2") is None
    assert _sscanf_2lf("") is None
