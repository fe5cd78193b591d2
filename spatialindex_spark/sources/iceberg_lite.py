"""Iceberg-style table layout: snapshots, manifests, per-partition lineage,
checkpoint-resume. (No Iceberg runtime jar exists in this environment, so the
layout is implemented in-repo — SURVEY.md env facts.)

Directory layout:

    <table>/
      data/bucket=<k>/*.parquet     # cell-range buckets, Z-order-contiguous
      metadata/
        lineage.jsonl               # WAL: one row per committed bucket
        snapshot-<n>.json           # manifest snapshot (committed buckets)
        current.json                # pointer to the latest snapshot

Buckets are fixed-width slices of the cell-ID space, so each bucket holds a
*contiguous* Z-order cell range — the directory level IS the coarse index
(the B-tree analogue of reference README.md:13-23): a covering's ranges map
straight to bucket dirs, giving partition pruning before parquet row-group
stats even load.

Checkpoint-resume: ``write`` processes buckets in groups; after each group's
data files land, a lineage row (bucket, cell range, row count, checksum,
status) is appended to the WAL. A re-run skips every bucket already recorded
as committed — partially-completed tile assignment jobs resume idempotently
(north-rule requirement). The final snapshot is the compacted WAL.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def _cell_space(system: str, level: int) -> tuple[int, int]:
    """[min, max) of the id space for a cell system at a level."""
    if system == "htm":
        return 8 << (2 * level), 16 << (2 * level)
    if system == "hpx":
        return 0, 12 << (2 * level)
    if system == "s2":
        return 0, 6 << (2 * level)
    raise ValueError(f"unknown system {system!r}")


class IcebergLiteTable:
    def __init__(self, path: str, cell_col: str = "spt_ind",
                 system: str = "htm", level: int = 7, num_buckets: int = 64):
        self.path = path
        self.cell_col = cell_col
        self.system = system
        self.level = level
        self.num_buckets = num_buckets
        self.lo, self.hi = _cell_space(system, level)
        self.meta_dir = os.path.join(path, "metadata")
        self.data_dir = os.path.join(path, "data")
        self.wal_path = os.path.join(self.meta_dir, "lineage.jsonl")

    # -- bucket math --------------------------------------------------------
    def bucket_expr(self):
        """Bucket id, failing LOUDLY on null or out-of-id-space cells: an
        unclamped expression sent nulls to the last bucket (F.least skips
        nulls) and below-range ids to negative buckets no write group ever
        selected — silent row loss in a checksummed, resumable layout."""
        span = self.hi - self.lo
        cell = F.col(self.cell_col)
        raw = ((cell - F.lit(self.lo)) * self.num_buckets / F.lit(span)) \
            .cast("long")
        bad = cell.isNull() | (cell < self.lo) | (cell >= self.hi)
        return F.when(
            bad,
            F.raise_error(F.format_string(
                f"cell id %s outside the {self.system} level-{self.level} "
                f"id space [{self.lo}, {self.hi})", cell.cast("string")))
        ).otherwise(F.least(F.lit(self.num_buckets - 1), raw))

    def bucket_of_cell(self, cell: int) -> int:
        span = self.hi - self.lo
        return min(self.num_buckets - 1, (cell - self.lo) * self.num_buckets // span)

    def buckets_for_ranges(self, ranges: list[list[int]]) -> list[int]:
        """Covering ranges -> bucket ids to read (partition pruning)."""
        out = set()
        for lo, hi in ranges:
            out.update(range(self.bucket_of_cell(lo), self.bucket_of_cell(hi) + 1))
        return sorted(out)

    # -- lineage WAL --------------------------------------------------------
    def committed_buckets(self) -> dict[int, dict]:
        done = {}
        if os.path.exists(self.wal_path):
            with open(self.wal_path) as f:
                for line in f:
                    row = json.loads(line)
                    if row.get("status") == "committed":
                        done[row["bucket"]] = row
        return done

    def _append_lineage(self, rows: list[dict]) -> None:
        os.makedirs(self.meta_dir, exist_ok=True)
        with open(self.wal_path, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.flush()
            os.fsync(f.fileno())

    # -- write with checkpoint-resume --------------------------------------
    def write(self, df: DataFrame, group_size: int = 16,
              fail_after_groups: int | None = None) -> dict:
        """Write/resume the table. Buckets already in the WAL are skipped.

        ``fail_after_groups`` is a test hook simulating a mid-job crash.
        Returns the snapshot dict."""
        done = self.committed_buckets()
        # crash window: data files landed but the WAL append never happened.
        # Delete those uncommitted bucket dirs so the re-write is idempotent.
        if os.path.isdir(self.data_dir):
            import shutil

            for d in os.listdir(self.data_dir):
                if d.startswith("bucket="):
                    b = int(d.split("=", 1)[1])
                    if b not in done:
                        shutil.rmtree(os.path.join(self.data_dir, d))
        todo = [b for b in range(self.num_buckets) if b not in done]
        df = df.withColumn("bucket", self.bucket_expr())

        groups = [todo[i:i + group_size] for i in range(0, len(todo), group_size)]
        for gi, group in enumerate(groups):
            if fail_after_groups is not None and gi >= fail_after_groups:
                raise RuntimeError("simulated crash (fail_after_groups)")
            part = df.filter(F.col("bucket").isin(group))
            (part.repartitionByRange(len(group), "bucket", self.cell_col)
                 .sortWithinPartitions(self.cell_col)
                 .write.mode("append").partitionBy("bucket")
                 .parquet(self.data_dir))
            # lineage metrics per bucket, from what actually landed on disk
            # (a group whose buckets hold no rows writes no files at all)
            has_data = os.path.isdir(self.data_dir) and any(
                d.startswith("bucket=") for d in os.listdir(self.data_dir))
            stats = []
            if has_data:
                stats = (
                    part.sparkSession.read.parquet(self.data_dir)
                    .filter(F.col("bucket").isin(group))
                    .groupBy("bucket")
                    .agg(
                        F.count(F.lit(1)).alias("row_count"),
                        F.min(self.cell_col).alias("cell_min"),
                        F.max(self.cell_col).alias("cell_max"),
                        F.sum(F.crc32(F.col(self.cell_col).cast("string"))).alias("checksum"),
                    )
                    .collect()
                )
            seen = {r["bucket"] for r in stats}
            rows = [
                {
                    "bucket": int(r["bucket"]),
                    "row_count": int(r["row_count"]),
                    "cell_min": int(r["cell_min"]),
                    "cell_max": int(r["cell_max"]),
                    "checksum": int(r["checksum"]),
                    "status": "committed",
                    "ts": time.time(),
                }
                for r in stats
            ] + [
                {"bucket": int(b), "row_count": 0, "cell_min": None,
                 "cell_max": None, "checksum": 0, "status": "committed",
                 "ts": time.time()}
                for b in group if b not in seen
            ]
            self._append_lineage(rows)
        return self.commit_snapshot()

    def commit_snapshot(self) -> dict:
        done = self.committed_buckets()
        snap_n = 0
        cur_path = os.path.join(self.meta_dir, "current.json")
        if os.path.exists(cur_path):
            with open(cur_path) as f:
                snap_n = json.load(f)["snapshot"] + 1
        snapshot = {
            "snapshot": snap_n,
            "table": self.path,
            "cell_col": self.cell_col,
            "system": self.system,
            "level": self.level,
            "num_buckets": self.num_buckets,
            "buckets": sorted(done),
            "total_rows": sum(r["row_count"] for r in done.values()),
            "manifest": [done[b] for b in sorted(done)],
        }
        os.makedirs(self.meta_dir, exist_ok=True)
        with open(os.path.join(self.meta_dir, f"snapshot-{snap_n}.json"), "w") as f:
            json.dump(snapshot, f)
        with open(cur_path, "w") as f:
            json.dump({"snapshot": snap_n}, f)
        return snapshot

    # -- read ----------------------------------------------------------------
    def read(self, spark: SparkSession, ranges: list[list[int]] | None = None,
             snapshot: int | None = None) -> DataFrame:
        """Read the table; with covering ``ranges``, only matching bucket
        dirs load (directory-level pruning), then the cell predicate prunes
        row groups inside them. ``snapshot`` time-travels to an earlier
        commit: buckets are written exactly once and snapshots are
        append-only bucket lists, so snapshot N is the table restricted to
        the buckets its manifest recorded."""
        df = spark.read.option("basePath", self.data_dir).parquet(self.data_dir)
        if snapshot is not None:
            snap_path = os.path.join(self.meta_dir, f"snapshot-{snapshot}.json")
            with open(snap_path) as f:
                snap = json.load(f)
            df = df.filter(F.col("bucket").isin([int(b) for b in snap["buckets"]]))
        if ranges:
            from ..functions.cover import ranges_predicate

            df = df.filter(F.col("bucket").isin(self.stat_pruned_buckets(ranges)))
            df = df.filter(ranges_predicate(F.col(self.cell_col), ranges))
        return df

    def stat_pruned_buckets(self, ranges: list[list[int]]) -> list[int]:
        """Covering buckets refined by the per-bucket lineage stats: a
        committed bucket whose actual [cell_min, cell_max] misses every
        range is skipped even though its nominal cell space overlaps —
        sparse sky regions leave buckets far narrower than their hash
        span. Unknown (not-yet-committed) buckets are kept, so a read
        during a half-finished write never silently narrows."""
        done = self.committed_buckets()
        keep = []
        for b in self.buckets_for_ranges(ranges):
            st = done.get(b)
            if st is None:
                keep.append(b)          # no lineage: cannot prune safely
                continue
            if st["row_count"] == 0 or st["cell_min"] is None:
                continue                # committed empty: nothing to read
            if any(int(lo) <= st["cell_max"] and int(hi) >= st["cell_min"]
                   for lo, hi in ranges):
                keep.append(b)
        return keep
