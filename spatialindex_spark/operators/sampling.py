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
    # pmod, not %: Spark % follows the dividend's sign, so a negative id
    # (xxhash64-derived ids are negative ~half the time) made the
    # remainder negative and the `< thr` keep-rule pass at ANY fraction
    return df.filter(F.pmod(det_hash_col(id_col), F.lit(10000)) < thr)


def temperature_mix(df: DataFrame, temperature: float, target_rows: int,
                    source_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Temperature-based source re-balancing — the multilingual /
    data-mixing sampler of XLM-R, mT5 and Gopher: source ``s`` with
    ``n_s`` rows receives a share of the ``target_rows`` budget
    proportional to ``n_s ** temperature``, so ``temperature < 1``
    up-weights low-resource sources relative to their natural share
    (T=1 is proportional sampling, T=0 is uniform-over-sources). Rows
    are then kept by the same deterministic id-hash threshold as
    :func:`stratified_sample` — reproducible across retries, stages,
    and engines.

    Numeric discipline (so the SQL oracle is bit-reproducible): the
    per-source weight is quantized to an INTEGER ``round(n_s**T * 1e6)``
    — for T=0.5 the pow is a correctly-rounded sqrt everywhere, and the
    1e-6 quantization absorbs any last-ulp libm disagreement for other
    T — the weight total is an order-free integer sum, and each keep
    threshold comes from ONE double division of exact integers
    (``round(10000 * target * wq_s / (tot * n_s))`` — the integer
    numerator and denominator stay exact in the double conversion while
    ``10000 * target * wq_s < 2**53``, ample at gate scale — capped at
    10000).

    Scale shape: one map-side-combined groupBy on the source key
    produces the per-source counts — cardinality is the number of
    SOURCES (bounded, like the ``fractions`` dict the cousin operator
    takes), so collecting it is a bounded driver aggregate, not a data
    collect; the sample itself is a shuffle-free Column filter.
    Expected output size is ``min(target share, n_s)`` per source —
    a source too small for its boosted share keeps all its rows (the
    cap; re-run with the residual budget if exact totals matter).
    """
    if temperature < 0:
        raise ValueError("temperature must be >= 0")
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    counts = {r[0]: r[1]
              for r in df.groupBy(source_col).count().collect()}
    if not counts:
        return df
    wq = {s: int(round(n ** temperature * 1e6))
          for s, n in counts.items()}
    tot = sum(wq.values())
    thr = {s: min(10000,
                  int(round(10000 * target_rows * wq[s]
                            / (tot * counts[s]))))
           for s in counts}
    cond = F.lit(0)
    # None sorts via the (is-None, value) key and matches via eqNullSafe:
    # a corpus with one NULL source used to crash the driver sort and
    # would otherwise silently fall to threshold 0
    for s, t in sorted(thr.items(), key=lambda kv: (kv[0] is None, kv[0] or "")):
        cond = F.when(F.col(source_col).eqNullSafe(s), F.lit(t)) \
                .otherwise(cond)
    return df.filter(F.pmod(det_hash_col(id_col), F.lit(10000)) < cond)
