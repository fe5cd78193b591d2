"""Structured Streaming ingest (engine extension; the reference is batch-only
— SURVEY.md §2.9 records no streaming surface).

``stream_cell_counts`` maintains the per-cell counts table (the A5 "tree
counts" analogue) incrementally from an event stream with late-data
tolerance: readStream -> cell assignment UDF -> watermark + windowed
groupBy -> writeStream. Used for continuously-ingested image catalogs where
the hot-cell list (J6 salting input) must stay fresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.udfs import hpx_udf


def stream_cell_counts(stream: DataFrame, level: int = 7,
                       ts_col: str = "ts", ra_col: str = "ra",
                       dec_col: str = "dec",
                       watermark: str = "10 minutes",
                       window: str = "5 minutes") -> DataFrame:
    """events stream (ts, ra, dec, ...) -> windowed per-cell counts.

    Output mode 'update' keeps state bounded by the watermark; the sink
    (parquet/memory) accumulates (window, cell, count) rows that compact
    into the cell-counts table."""
    cells = stream.withColumn("spt_ind", hpx_udf(level)(F.col(ra_col), F.col(dec_col)))
    # parquet TIMESTAMP_NTZ is not a valid event-time type; normalize
    cells = cells.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        cells.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("spt_ind"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def start_to_memory(counts: DataFrame, name: str = "cell_counts_stream"):
    """Debug/test sink."""
    return (counts.writeStream.outputMode("update")
            .format("memory").queryName(name).start())
