"""Range (interval) join — the temporal analogue of the spatial cell join.

Spark has no native band/interval join; the naive formulation
(``l.start <= r.ts AND r.ts <= l.end``) plans as a BroadcastNestedLoopJoin
(quadratic). Same cure as the sky joins: quantize time into fixed-width
buckets, explode each interval to the buckets it spans, give each point its
single bucket, hash-equi-join on (keys..., bucket), then apply the exact
BETWEEN residual. Each (interval, point) pair meets on exactly one bucket
(the point's), so the output is duplicate-free by construction — one
shuffle, no dedup pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_US = 1_000_000


def interval_point_join(intervals: DataFrame, points: DataFrame,
                        start: str = "start", end: str = "end",
                        ts: str = "ts",
                        by: str | list[str] | None = None,
                        bucket: str = "1 hour",
                        suffixes: tuple = ("_l", "_r")) -> DataFrame:
    """All (interval, point) pairs with point.ts in [start, end] (inclusive)
    and matching ``by`` keys. ``bucket`` sizes the quantization — pick it
    near the typical interval length: too small explodes long intervals,
    too large degrades the equi-join's selectivity (the exact filter stays
    correct either way)."""
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    # bucket width in microseconds (INTERVAL doesn't cast to LONG portably;
    # derive it from a timestamp difference). BOUNDED driver read: one
    # constant row, independent of any table size.
    row = intervals.sparkSession.sql(
        f"SELECT unix_micros(TIMESTAMP '2000-01-01' + INTERVAL {bucket}) - "
        f"unix_micros(TIMESTAMP '2000-01-01') AS w").collect()[0]
    width_us = int(row["w"])

    lsel = [F.col(c).alias(c + suffixes[0]) for c in intervals.columns]
    rsel = [F.col(c).alias(c + suffixes[1]) for c in points.columns]
    bkeys = [(F.col(k + suffixes[0]), F.col(k + suffixes[1])) for k in by]

    li = intervals.select(
        *lsel,
        F.sequence(
            (F.unix_micros(F.col(start).cast("timestamp")) / width_us).cast("long"),
            (F.unix_micros(F.col(end).cast("timestamp")) / width_us).cast("long"),
        ).alias("_bks"))
    li = li.select(*[c + suffixes[0] for c in intervals.columns],
                   F.explode("_bks").alias("_bk"))
    ri = points.select(*rsel,
                       (F.unix_micros(F.col(ts).cast("timestamp")) / width_us)
                       .cast("long").alias("_bk"))

    cond = li["_bk"] == ri["_bk"]
    for lk, rk in bkeys:
        cond = cond & (lk == rk)
    pairs = li.join(ri, cond).drop("_bk")
    sc, ec = start + suffixes[0], end + suffixes[0]
    tc = ts + suffixes[1]
    return pairs.filter(F.col(tc).between(F.col(sc), F.col(ec)))
