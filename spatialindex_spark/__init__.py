"""spatialindex_spark — a from-scratch PySpark-native spatial-join + tiling
engine with the query capabilities of Caltech-IPAC/SpatialIndex.

Layers:
- ``functions``: pure-numpy cell math (HTM / HEALPix / H3-style / S2-style),
  spherical geometry, region coverings, constraint generation, and the
  Arrow-vectorized pandas UDF registry.
- ``operators``: distributed DataFrame operators — region filter-joins,
  cross-match, kNN, raster<->vector tile mapping, dedup, similarity search.
- ``sources``: image+caption table synthesis (numpy codecs, phash) and an
  Iceberg-style snapshot/manifest table layout with per-partition lineage.
- ``plans``: SparkSession helpers and physical-layout discipline
  (cell-ID range partitioning, AQE/skew settings).
"""

__version__ = "0.1.0"

from .functions.constraints import SpatialIndex  # noqa: F401
