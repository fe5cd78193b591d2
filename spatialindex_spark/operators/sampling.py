"""Deterministic sampling / per-source caps for training-data pipelines.

Both operators avoid Spark's ``DataFrame.sample`` entirely: in Spark 4 it
redraws different rows on each reuse of the plan (see graph.py notes), so
selection here is a pure hash function of the row id — reproducible across
retries, stages, and engines (the DuckDB oracle replays the identical
integer arithmetic).

- ``cap_per_source``: keep at most ``n`` rows per source, deterministic
  priority (order column ascending, id tiebreak). One window shuffle on
  the source key; at 100 TB the per-source partitions are bounded by the
  source cardinality — salt upstream if one source dominates.
- ``stratified_sample``: per-source keep fractions via a modular hash
  threshold. Pure Column math, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import centroid_hash_col as det_hash_col  # shared modular
# hash family — ONE definition so the SQL oracles that replay its exact
# integer arithmetic can never diverge between operator families


def cap_per_source(df: DataFrame, n: int, source_col: str = "source",
                   id_col: str = "doc_id",
                   order_col: str | None = None) -> DataFrame:
    """Keep at most ``n`` rows per source: rank by (order_col asc,
    id_col asc) inside each source, drop rank > n."""
    if n <= 0:
        raise ValueError("n must be positive")
    keys = ([F.col(order_col).asc()] if order_col else []) \
        + [F.col(id_col).asc()]
    w = Window.partitionBy(source_col).orderBy(*keys)
    return (df.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= n).drop("_rk"))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      source_col: str = "source", id_col: str = "doc_id",
                      default_fraction: float = 0.0) -> DataFrame:
    """Keep each row iff hash(id) % 10000 < fraction[source] * 10000.
    Sources absent from ``fractions`` use ``default_fraction``. Shuffle-free
    and deterministic."""
    thr = F.lit(int(round(default_fraction * 10000)))
    for s, frac in sorted(fractions.items()):
        thr = F.when(F.col(source_col) == s,
                     F.lit(int(round(frac * 10000)))).otherwise(thr)
    return df.filter((det_hash_col(id_col) % F.lit(10000)) < thr)
