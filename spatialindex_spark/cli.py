"""Reference CLI result envelopes + engine-backed command mains.

The reference's command-line tools wrap their results in one of two
one-line envelopes — IPAC SVC structs or JSON — with a specific string
escaper (tree_count.c:25-110).  This snapshot of the reference ships
those tools without a ``main()`` (tree_count.c / id_list.c are format +
logic only), so the envelopes are the last cosmetic interop gap: the
underlying counts, bounds and coverings are all green elsewhere
(operators/counts.py, functions/cover.py).  This module reproduces the
envelope byte format exactly and provides engine-backed mains:

- ``format_count`` / ``format_range`` / ``format_error`` — the three
  OK/ERROR envelopes of tree_count.c:92-120 (print_count, print_range)
  and :60-79 (err), in both SVC and JSON modes, including the escaper's
  drop-non-printable + truncate-at-8k behavior.
- ``id_list_lines`` — id_list.c:76-90 (print_ids): one id per line, or
  ``min max`` per line with ``--ranges``, either raw or in the legacy
  decimal (BASE4) encoding with ``--decimal`` (htm_idtodec,
  htm.c:1562-1579 — bit-exact in functions/htm.py).
- ``tree_count_main`` — circle/ellipse/hull counts over a cell-indexed
  parquet point table: exact counts via the INSIDE fast path
  (region_count_fast_region) or ``--estimate`` [min, max] bounds from
  the counts table alone (region_count_bounds_frame), envelope-printed.
- ``id_list_main`` — circle/ellipse/hull HTM coverings at ``--level``
  with ``--maxranges`` simplification, printed per id_list.c.  Pure
  driver-side (no Spark session): coverings are plan-time artifacts.
"""

from __future__ import annotations

import sys

__all__ = [
    "format_count", "format_range", "format_error", "id_list_lines",
    "tree_count_main", "id_list_main", "poly_test_main",
]

# esc() truncates its 8192-byte buffer leaving room for the closing
# quote + NUL; past that it overwrites the tail with ` ..."`
_ESC_MAX = 8190

_ESCAPES = {'"': '\\"', "\\": "\\\\", "\b": "\\b", "\f": "\\f",
            "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _esc(s: str | None) -> str:
    """tree_count.c:25-58 esc(): quote + escape the 7 specials, DROP any
    other byte outside 0x20-0x7e (control chars, non-ASCII), truncate
    with `` ...`` when the escaped form overflows the 8 KiB buffer."""
    if s is None:
        return "null"
    out = ['"']
    n = 1
    for ch in s:
        rep = _ESCAPES.get(ch)
        if rep is None:
            if 0x1F < ord(ch) < 0x7F:
                rep = ch
            else:
                continue
        if n + len(rep) > _ESC_MAX:
            # source semantics: input remained when the buffer filled.
            # Back off in WHOLE escape units (out holds one unit per
            # element) so the ellipsis can never land mid-escape and
            # leave a dangling backslash that breaks the JSON envelope.
            while n > _ESC_MAX - 4:
                n -= len(out.pop())
            return "".join(out) + ' ..."'
        out.append(rep)
        n += len(rep)
    out.append('"')
    return "".join(out)


def format_count(count: int, json_fmt: bool = False) -> str:
    """print_count (tree_count.c:92-99): JSON carries the count as a
    bare number, the SVC struct quotes it."""
    if json_fmt:
        return '{"stat":"OK", "count":%d}' % int(count)
    return '[struct stat="OK", count="%d"]' % int(count)


def format_range(lo: int, hi: int, json_fmt: bool = False) -> str:
    """print_range (tree_count.c:101-110)."""
    if json_fmt:
        return '{"stat":"OK", "min":%d, "max":%d}' % (int(lo), int(hi))
    return '[struct stat="OK", min="%d", max="%d"]' % (int(lo), int(hi))


def format_error(msg: str | None, json_fmt: bool = False) -> str:
    """err (tree_count.c:60-79)."""
    if json_fmt:
        return '{"stat":"ERROR", "msg":%s}' % _esc(msg)
    return '[struct stat="ERROR", msg=%s]' % _esc(msg)


def id_list_lines(ranges, as_ranges: bool = False,
                  decimal: bool = False):
    """print_ids (id_list.c:76-90) as an iterator of output lines:
    ``min max`` per range with ``as_ranges``, else every id expanded one
    per line; ``decimal`` maps ids through the legacy base-10-digit
    BASE4 form (htm_idtodec).  Expansion is lazy — a coarse maxranges
    covering expanded at level 20 is the caller's own foot-gun, exactly
    as in the reference."""
    import numpy as np

    from .functions.htm import htm_idtodec

    def dec(v):
        return int(htm_idtodec(np.asarray([v], dtype=np.int64))[0])

    for lo, hi in ranges:
        lo, hi = int(lo), int(hi)
        if as_ranges:
            if decimal:
                yield f"{dec(lo)} {dec(hi)}"
            else:
                yield f"{lo} {hi}"
        elif decimal:
            # one vectorized htm_idtodec per chunk, not per id — a
            # coarse covering expanded at a fine level yields millions
            # of ids, and per-id 1-element numpy dispatch is ~100x
            # slower; chunked so an absurd range can't allocate
            # unboundedly either
            for clo in range(lo, hi + 1, 65536):
                chi = min(hi, clo + 65535)
                for v in htm_idtodec(
                        np.arange(clo, chi + 1, dtype=np.int64)):
                    yield f"{int(v)}"
        else:
            for j in range(lo, hi + 1):
                yield f"{j}"


def _region_from_args(kind: str, args: list[str]) -> dict:
    if kind == "circle":
        if len(args) != 3:
            raise ValueError("circle takes RA DEC RADIUS")
        return {"kind": "cone", "ra": float(args[0]), "dec": float(args[1]),
                "radius": float(args[2])}
    if kind == "ellipse":
        if len(args) != 5:
            raise ValueError("ellipse takes RA DEC A B ANGLE")
        return {"kind": "ellipse", "ra": float(args[0]),
                "dec": float(args[1]), "a": float(args[2]),
                "b": float(args[3]), "angle": float(args[4])}
    if kind == "hull":
        if len(args) < 6 or len(args) % 2 != 0:
            raise ValueError("hull takes RA1 DEC1 RA2 DEC2 RA3 DEC3 ...")
        pts = [(float(args[i]), float(args[i + 1]))
               for i in range(0, len(args), 2)]
        # the reference hulls its vertices before covering/counting
        # (tree_count.c hull_count -> htm_s2cpoly_hull); default exact
        # mode — mode="reference" exists for bug parity (FIXTURES.md)
        import numpy as np

        from .functions.geometry import sc_to_v3, xyz_to_radec
        from .functions.regions import convex_hull

        hull = convex_hull([sc_to_v3(r, d) for r, d in pts])
        ra, dec = xyz_to_radec(
            np.array([v.x for v in hull.verts]),
            np.array([v.y for v in hull.verts]),
            np.array([v.z for v in hull.verts]))
        return {"kind": "poly", "ra": [float(r) for r in ra],
                "dec": [float(d) for d in dec]}
    raise ValueError(f"unknown region kind `{kind}'")


def _pop_flags(argv: list[str], flags: dict) -> list[str]:
    """Consume ``--flag`` / ``--opt VALUE`` tokens (getopt_long-ish);
    returns the positional remainder."""
    pos = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in flags:
            if flags[a] is True:  # boolean
                flags[a + "!"] = True
                i += 1
            else:                 # takes a value
                if i + 1 >= len(argv):
                    raise ValueError(f"option `{a}' needs a value")
                flags[a + "!"] = argv[i + 1]
                i += 2
        else:
            pos.append(a)
            i += 1
    return pos


def tree_count_main(argv: list[str] | None = None, spark=None,
                    out=None) -> int:
    """``tree_count [--json] [--estimate] [--level L] TABLE
    circle|ellipse|hull ARGS...`` — the reference tool's envelope over
    the engine's counts (tree_count.c circle_count/ellipse_count/
    hull_count, print_count/print_range).  TABLE is a cell-indexed
    parquet point table with columns ``spt_ind`` (HTM cell at
    ``--level``, as written by the ingest sink) and unit-vector
    ``x, y, z``; exact counts take the INSIDE fast path (cell-counts
    tree + boundary-shell scan), ``--estimate`` prints the [min, max]
    bounds from the counts tree with ZERO point reads — the same
    exact/estimate split as htm_tree_s2circle_count vs _range."""
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    flags = {"--json": True, "--estimate": True, "--level": None}
    json_fmt = False
    try:
        pos = _pop_flags(argv, flags)
        json_fmt = "--json!" in flags
        estimate = "--estimate!" in flags
        level = int(flags.get("--level!", 7))
        if len(pos) < 2:
            raise ValueError(
                "usage: tree_count [--json] [--estimate] [--level L] "
                "TABLE circle|ellipse|hull ARGS...")
        table, kind, args = pos[0], pos[1], pos[2:]
        region = _region_from_args(kind, args)

        from .operators.counts import (cell_count_tree,
                                       region_count_bounds_frame,
                                       region_count_fast_region)
        owns = spark is None
        if owns:
            from .plans.session import get_session
            spark = get_session("tree_count")
        try:
            df = spark.read.parquet(table)
            counts = cell_count_tree(df, level=level, min_level=level)
            if estimate:
                row = region_count_bounds_frame(
                    counts, region, level).collect()[0]
                print(format_range(row["lower"], row["upper"], json_fmt),
                      file=out)
            else:
                row = region_count_fast_region(
                    df, counts, region, level).collect()[0]
                print(format_count(row["n"], json_fmt), file=out)
        finally:
            if owns:
                spark.stop()
        return 0
    except Exception as e:  # the reference err()s every failure path
        # honor --json even when parsing died before the flag was read
        json_fmt = json_fmt or "--json!" in flags or "--json" in argv
        print(format_error(str(e), json_fmt), file=out)
        return 1


def id_list_main(argv: list[str] | None = None, out=None) -> int:
    """``id_list [--ranges] [--decimal] [--level L] [--maxranges M]
    circle|ellipse|hull ARGS...`` — HTM covering ids in the reference
    tool's output forms (id_list.c print_ids).  Driver-side only."""
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    flags = {"--ranges": True, "--decimal": True,
             "--level": None, "--maxranges": None}
    try:
        pos = _pop_flags(argv, flags)
        as_ranges = "--ranges!" in flags
        decimal = "--decimal!" in flags
        level = int(flags.get("--level!", 7))
        maxranges = flags.get("--maxranges!")
        maxranges = int(maxranges) if maxranges is not None else None
        if len(pos) < 1:
            raise ValueError(
                "usage: id_list [--ranges] [--decimal] [--level L] "
                "[--maxranges M] circle|ellipse|hull ARGS...")
        kind, args = pos[0], pos[1:]
        region = _region_from_args(kind, args)

        if region["kind"] == "cone":
            from .functions.cover import htm_circle_ranges
            ranges = htm_circle_ranges(region["ra"], region["dec"],
                                       region["radius"], level, maxranges)
        elif region["kind"] == "poly":
            from .functions.cover import htm_polygon_ranges
            from .functions.geometry import sc_to_v3
            from .functions.regions import SphericalPolygon
            poly = SphericalPolygon(
                [sc_to_v3(r, d)
                 for r, d in zip(region["ra"], region["dec"])])
            ranges = htm_polygon_ranges(poly, level, maxranges)
        else:
            from .functions.geometry import sc_to_v3
            from .functions.regions import (SphericalEllipse,
                                            htm_ellipse_ranges)
            ell = SphericalEllipse.from_center(
                sc_to_v3(region["ra"], region["dec"]), region["a"],
                region["b"], region["angle"])
            ranges = htm_ellipse_ranges(ell, level, maxranges)
        for line in id_list_lines(ranges, as_ranges, decimal):
            print(line, file=out)
        return 0
    except Exception as e:
        print(format_error(str(e)), file=out)
        return 1


# ---------------------------------------------------------------------------
# poly_test — interactive stdin polygon checker (SURVEY §2 S5)
# ---------------------------------------------------------------------------

#: poly_test.c:62 ``NP`` — vertex capacity; the input loop stops reading
#: after this many points without consuming the terminating blank line.
_PT_NP = 16

# C sscanf("%lf") token: optional sign, then inf/infinity, nan(chars)?,
# hex float, or decimal with optional exponent (an incomplete exponent
# backtracks to the mantissa, as strtod does).
import re as _re

_C_DOUBLE_RE = _re.compile(
    r"[+-]?(?:"
    r"inf(?:inity)?|"
    r"nan(?:\([0-9A-Za-z_]*\))?|"
    r"0[xX](?:[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?|\.[0-9A-Fa-f]+)"
    r"(?:[pP][+-]?\d+)?|"
    r"(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?"
    r")", _re.IGNORECASE)

_C_SPACE = " \t\n\v\f\r"


def _sscanf_2lf(line: str):
    """``sscanf(line, "%lf %lf")`` — returns (ra, dec) when BOTH convert,
    else None (poly_test.c:157-159 breaks the input loop on ``nr != 2``,
    which covers EOF, blank lines and partial parses alike)."""
    vals, i = [], 0
    for _ in range(2):
        while i < len(line) and line[i] in _C_SPACE:
            i += 1
        m = _C_DOUBLE_RE.match(line, i)
        if m is None:
            return None
        tok = m.group(0)
        low = tok.lower().lstrip("+-")
        if low.startswith("0x"):
            try:
                v = float.fromhex(tok)
            except OverflowError:
                # strtod overflow returns +/-HUGE_VAL; decimal '1e400'
                # already takes this path via float()
                v = float("-inf" if tok[0] == "-" else "inf")
        elif low.startswith("nan"):
            v = float("nan")  # the (char-sequence) payload is dropped
        else:
            v = float(tok)  # decimals and inf/infinity parse directly
        vals.append(v)
        i = m.end()
    return vals[0], vals[1]


def poly_test_main(stdin=None, out=None) -> int:
    """``poly_test`` — the reference's interactive stdin test tool
    (poly_test.c:84-248): reads RA/Dec pairs until EOF / a non-pair line /
    NP points, echoes the points (``%15.9lf``), their unit vectors
    (htm_sc_tov3, geometry.c:136-149 — NO normalization), the convex
    hull's vertex array, and two convexity verdicts (htm_v3_convex on the
    hull array and on the raw input).  Byte format mirrors the C printf
    sequence exactly, including the report_verts(poly->ve, nn) over-print:
    ``ve[]`` holds the hull's ncv vertices followed by its ncv NORMALIZED
    edge planes (htm_s2cpoly_hull, geometry.c:1573-1586), so when the hull
    drops input vertices the reference deterministically prints edge
    planes in the tail slots — reproduced here.  Sole divergence: past
    ``2*ncv`` entries the reference reads beyond its own malloc (heap
    garbage); we stop at the allocation's end.  Exit codes follow the C
    ``exit(-1)``/``exit(-3)`` → 255/253."""
    import math

    from .functions.geometry import RAD_PER_DEG, V3
    from .functions.regions import convex, convex_hull, hemispherical

    stdin = stdin or sys.stdin
    out = out or sys.stdout
    w = out.write

    pts: list[tuple[float, float]] = []
    verts: list[V3] = []
    while True:
        line = stdin.readline()
        if line == "":
            break
        vals = _sscanf_2lf(line)
        if vals is None:
            break
        ra, dec = vals
        # htm_sc_init (geometry.h:71-85): NaN/Inf first, then the lat range
        if math.isnan(ra) or math.isinf(ra) or math.isnan(dec) \
                or math.isinf(dec):
            msg = "Value is NaN or +/-Inf"
        elif dec < -90.0 or dec > 90.0:
            msg = "Latitude angle not in range [-90, 90] degrees"
        else:
            msg = None
        if msg is not None:
            w("Did not find acceptable spherical coordinates (%f,%f) -- "
              "%s\n\n" % (ra, dec, msg))
            return 255  # exit(-1)
        pts.append((ra, dec))
        lon, lat = ra * RAD_PER_DEG, dec * RAD_PER_DEG
        cos_lat = math.cos(lat)
        verts.append(V3(math.cos(lon) * cos_lat, math.sin(lon) * cos_lat,
                        math.sin(lat)))
        if len(verts) >= _PT_NP:
            break

    nn = len(verts)
    w("\n")
    w("\n # = %02d" % nn)
    w("\n")
    for ii, (lo, la) in enumerate(pts):        # report_pts
        w("\n  %02d  %15.9f  %15.9f" % (ii, lo, la))
        w("\n")
    w("\n")
    for ii, v in enumerate(verts):             # report_verts(verts, nn)
        w("\n  %02d  %15.9f  %15.9f  %15.9f" % (ii, v.x, v.y, v.z))
    w("\n")

    # htm_s2cpoly_hull with the reference's error-code precedence
    # (geometry.c:1401-1417): ELEN, then EHEMIS, then EDEGEN from the scan
    err = hull = None
    if nn < 3:
        err = "Too many/too few array elements (vertices/points)"
    elif not hemispherical(verts):
        err = "Vectors (vertices/points) are not hemispherical"
    else:
        try:
            hull = convex_hull(verts, mode="reference")
        except ValueError:
            err = "Vectors (vertices/points) are degenerate"
    if err is not None:
        w("\nCould not compute convex hull: %s" % err)
        return 253  # exit(-3)

    ve = list(hull.verts) + list(hull.edges)   # ve[]: vertices then edges
    shown = min(nn, len(ve))
    for ii in range(shown):                    # report_verts(poly->ve, nn)
        v = ve[ii]
        w("\n  %02d  %15.9f  %15.9f  %15.9f" % (ii, v.x, v.y, v.z))
    w("\n")

    w("\n Polygon.verts (%d) is " % nn)
    if convex(ve[:shown]) == 0:
        w("NOT ")
    w("Convex\n")
    w("\n Polygon ")
    w("IS  " if convex(verts) != 0 else "is NOT ")
    w("Convex\n\n")
    return 0


if __name__ == "__main__":  # pragma: no cover
    tool = sys.argv[1] if len(sys.argv) > 1 else ""
    if tool == "tree_count":
        sys.exit(tree_count_main(sys.argv[2:]))
    if tool == "id_list":
        sys.exit(id_list_main(sys.argv[2:]))
    if tool == "poly_test":
        sys.exit(poly_test_main())
    print(format_error(
        f"unknown tool `{tool}' (tree_count | id_list | poly_test)"))
    sys.exit(1)
