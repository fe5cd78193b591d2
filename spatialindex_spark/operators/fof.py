"""Friends-of-friends sky clustering: multi-epoch object association.

The step every detection pipeline runs right after crossmatch: detections
within ``link_radius_deg`` of each other (transitively) are the same
OBJECT — the percolation clustering astronomy calls friends-of-friends.
The reference stops at per-pair matching (its DBMS host is left to group);
here it composes two already-scale-safe stages:

1. candidate links via the cell-bucketed self-``crossmatch`` (ring-1
   candidate keys, exact dot-product residual — never an all-pairs join);
2. transitive grouping via ``connected_components`` (label-propagation
   rounds with pointer jumping + a guarded driver finish on the contracted
   residual).

At 100 TB the link graph is the crossmatch output keyed by cell — the
only all-to-all cost is the pair-generation shuffle crossmatch already
bounds; the CC loop runs on the (far smaller) edge set.

Reference seed: J3/J4 pair machinery (htm.c:1582-1700 ring logic);
grouping semantics per the classic FoF definition (Huchra & Geller 1982).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import connected_components
from .joins import crossmatch

__all__ = ["fof_cluster", "fof_objects"]


def fof_cluster(df: DataFrame, link_radius_deg: float, id_col: str,
                ra_col: str = "ra", dec_col: str = "dec",
                rounds: int = 4, **xm_kwargs) -> DataFrame:
    """``df`` + ``object_id``: the min member id of each friends-of-friends
    group at linking length ``link_radius_deg`` (singletons keep their own
    id). Extra kwargs (``cell_col``/``cell_level``/``level``) pass through
    to the candidate-pair crossmatch."""
    pts = df.select(F.col(id_col), F.col(ra_col).alias("_fra"),
                    F.col(dec_col).alias("_fdec"))
    pairs = crossmatch(pts, pts, radius_deg=link_radius_deg,
                       left_cols=("_fra", "_fdec"),
                       right_cols=("_fra", "_fdec"), **xm_kwargs)
    ia, ib = f"{id_col}_l", f"{id_col}_r"
    # id_l < id_r keeps each undirected link once (and drops self-links)
    edges = (pairs.filter(F.col(ia) < F.col(ib)).select(ia, ib))
    labels = connected_components(edges, ia, ib, rounds=rounds)
    lab = labels.select(F.col("id").alias("_fid"),
                        F.col("component").alias("_fcomp"))
    return (df.join(lab, df[id_col] == F.col("_fid"), "left")
            .select(*[df[c] for c in df.columns],
                    F.coalesce(F.col("_fcomp"), df[id_col])
                    .alias("object_id")))


def fof_objects(df: DataFrame, link_radius_deg: float, id_col: str,
                ra_col: str = "ra", dec_col: str = "dec",
                rounds: int = 4, **xm_kwargs) -> DataFrame:
    """Per-object catalog: (object_id, n_members, ra_c, dec_c) where the
    centroid is the normalized mean unit vector of the members (the
    correct spherical mean — averaging ra/dec breaks at the 0/360 wrap
    and toward the poles; atan2 of the mean vector does not need the
    norm, so no sqrt of a sum enters the value).

    One groupBy shuffle keyed by object_id on top of ``fof_cluster``.
    """
    labeled = fof_cluster(df, link_radius_deg, id_col, ra_col, dec_col,
                          rounds=rounds, **xm_kwargs)
    rad = F.radians
    x = F.cos(rad(F.col(ra_col))) * F.cos(rad(F.col(dec_col)))
    y = F.sin(rad(F.col(ra_col))) * F.cos(rad(F.col(dec_col)))
    z = F.sin(rad(F.col(dec_col)))
    agg = (labeled
           .withColumn("_x", x).withColumn("_y", y).withColumn("_z", z)
           .groupBy("object_id")
           .agg(F.count("*").alias("n_members"),
                F.avg("_x").alias("_mx"), F.avg("_y").alias("_my"),
                F.avg("_z").alias("_mz")))
    ra_c = (F.degrees(F.atan2(F.col("_my"), F.col("_mx"))) + 360.0) % 360.0
    dec_c = F.degrees(F.atan2(
        F.col("_mz"),
        F.sqrt(F.col("_mx") ** 2 + F.col("_my") ** 2)))
    return agg.select("object_id", "n_members",
                      F.round(ra_c, 6).alias("ra_c"),
                      F.round(dec_c, 6).alias("dec_c"))
