"""Connected components over candidate-pair edges (dedup clustering).

Near-duplicate relations are not transitive, but production dedup pipelines
cluster the candidate-pair graph and keep one representative per component
(anything reachable through a chain of >=threshold pairs is one duplicate
group). Design for scale:

1. a FIXED number of distributed min-label rounds (each one groupBy over the
   edge list + a pointer-jump self-join) — duplicate components are shallow
   near-cliques, so a few rounds collapse almost everything;
2. contract: relabel edges by the current labels and keep the (now tiny)
   residual edges between distinct labels;
3. finish the residual exactly with driver-side union-find and broadcast the
   label->root map back.

The residual after k rounds only contains components of diameter > ~3^k, so
it shrinks geometrically; ``driver_limit`` guards the collect. An unbounded
distributed fixpoint loop was rejected deliberately: Spark 4.1's
localCheckpoint truncates the logical plan but NOT the underlying RDD DAG,
so >~15 chained iterations made scheduler walks (and runtimes) double per
iteration in local mode.

Self-join hygiene: every join below gives BOTH sides fresh column aliases —
referencing a parent attribute that also exists in the other side's lineage
resolves ambiguously and silently corrupts the join condition (observed as
non-monotone label updates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _uf_roots(pairs: list[tuple[int, int]]) -> dict:
    """Driver-side union-find; root = min element of each component."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller id as the root so roots are component minima
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(edges: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", rounds: int = 4,
                         driver_limit: int = 5_000_000) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node id
    reachable in the undirected pair graph. Exact for any graph; raises if
    the post-contraction residual still exceeds ``driver_limit`` edges."""
    spark = edges.sparkSession
    sym = (edges.select(F.col(id_a).alias("_u"), F.col(id_b).alias("_v"))
           .unionByName(edges.select(F.col(id_b).alias("_u"),
                                     F.col(id_a).alias("_v")))
           .distinct()
           .localCheckpoint(eager=True))
    labels = (sym.select(F.col("_u").alias("_id"))
              .distinct()
              .withColumn("_lbl", F.col("_id"))
              .localCheckpoint(eager=True))
    for _ in range(rounds):
        nbr_min = (sym.join(labels, sym["_u"] == labels["_id"])
                   .groupBy("_v").agg(F.min("_lbl").alias("_nl")))
        lab = labels.select(F.col("_id").alias("_l_id"),
                            F.col("_lbl").alias("_l_lbl"))
        labels = (lab.join(nbr_min, F.col("_l_id") == F.col("_v"), "left")
                  .select(F.col("_l_id").alias("_id"),
                          F.least(F.col("_l_lbl"),
                                  F.coalesce(F.col("_nl"), F.col("_l_lbl")))
                          .alias("_lbl"))
                  .localCheckpoint(eager=True))
        # pointer jump: lbl(v) <- lbl(lbl(v))
        jl = labels.select(F.col("_id").alias("_p_id"),
                           F.col("_lbl").alias("_p_lbl"))
        jr = labels.select(F.col("_id").alias("_j_id"),
                           F.col("_lbl").alias("_j_lbl"))
        labels = (jl.join(jr, F.col("_p_lbl") == F.col("_j_id"), "left")
                  .select(F.col("_p_id").alias("_id"),
                          F.coalesce(F.col("_j_lbl"), F.col("_p_lbl"))
                          .alias("_lbl"))
                  .localCheckpoint(eager=True))

    # contract edges by current labels; the residual holds only the
    # long-diameter tail
    lu = labels.select(F.col("_id").alias("_cu"), F.col("_lbl").alias("_lu"))
    lv = labels.select(F.col("_id").alias("_cv"), F.col("_lbl").alias("_lv"))
    residual = (sym.join(lu, sym["_u"] == F.col("_cu"))
                .join(lv, sym["_v"] == F.col("_cv"))
                .select("_lu", "_lv")
                .filter(F.col("_lu") != F.col("_lv"))
                .distinct())
    res = residual.limit(driver_limit + 1).collect()
    if len(res) > driver_limit:
        raise ValueError(
            f"residual component graph exceeds driver_limit={driver_limit}; "
            "raise `rounds` to contract further before the driver finish")
    roots = _uf_roots([(r["_lu"], r["_lv"]) for r in res])
    if not roots:
        return labels.select(F.col("_id").alias("id"),
                             F.col("_lbl").alias("component"))
    # id-type generic: string ids order the same way in Python and Spark
    # (both lexicographic on the code units) so min-label semantics agree
    from pyspark.sql.types import StructField, StructType

    id_type = edges.schema[id_a].dataType
    root_df = spark.createDataFrame(
        list(roots.items()),
        StructType([StructField("_rk", id_type), StructField("_rv", id_type)]))
    return (labels.join(F.broadcast(root_df), labels["_lbl"] == F.col("_rk"),
                        "left")
            .select(F.col("_id").alias("id"),
                    F.coalesce(F.col("_rv"), F.col("_lbl")).alias("component")))


def component_dedup(df: DataFrame, pairs: DataFrame, id_col: str,
                    pair_a: str = "id_a", pair_b: str = "id_b") -> DataFrame:
    """Keep one representative (min id) per connected duplicate component;
    rows in no pair pass through untouched."""
    comp = connected_components(pairs, pair_a, pair_b)
    losers = comp.filter(F.col("id") != F.col("component")) \
                 .select(F.col("id").alias(id_col))
    return df.join(losers, id_col, "left_anti")
