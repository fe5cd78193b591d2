"""Sequence packing for LLM pretraining pipelines (concat-and-chunk).

The standard packing used to build fixed-length training examples:
documents are concatenated in a deterministic order within a shard and the
token stream is cut every ``ctx_len`` tokens. Each document's placement is
a pure function of the running token offset, so the whole operator is one
window cumulative sum — no Python, no iteration.

Scale notes: the window is partitioned by ``shard_col``; each shard packs
independently (exactly how multi-file training shards work), so at 100 TB
you shard by a bounded key (file id, date bucket) and every window
partition holds only its shard's rows. A single global window (shard_col
None) is kept for small data / tests but would serialize into one task at
scale — it requires the explicit ``allow_global_window=True`` opt-in and
emits a RuntimeWarning when taken.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(df: DataFrame, tokens_col: str = "ws_tokens",
                   id_col: str = "doc_id", ctx_len: int = 2048,
                   shard_col: str | None = None,
                   allow_global_window: bool = False) -> DataFrame:
    """Assign each document its chunk placement in the concat-and-chunk
    stream: ``pack_offset`` (token offset within the shard stream),
    ``bin_start``/``bin_end`` (first/last ctx-window this doc lands in),
    ``bin_offset`` (token offset inside bin_start). Deterministic order:
    ``id_col`` ascending within each shard."""
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    if shard_col is None:
        if not allow_global_window:
            raise ValueError(
                "shard_col=None builds an UNPARTITIONED window that "
                "serializes the whole stream into one task at scale; pass "
                "a shard column, or allow_global_window=True for small "
                "data / tests")
        warnings.warn(
            "pack_sequences: global (unpartitioned) window — one task; "
            "do not use at scale", RuntimeWarning, stacklevel=2)
    part = [shard_col] if shard_col else []
    w = (Window.partitionBy(*part).orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    n = F.col(tokens_col).cast("long")
    off = F.coalesce(F.sum(n).over(w), F.lit(0).cast("long"))
    return df.withColumns({
        "pack_offset": off,
        "bin_start": F.floor(off / ctx_len).cast("long"),
        "bin_end": F.floor((off + F.greatest(n, F.lit(1).cast("long")) - 1)
                           / ctx_len).cast("long"),
        "bin_offset": off % ctx_len,
    })
