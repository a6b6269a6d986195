"""Per-iteration checkpointing for resumable iterative algorithms.

The reference is strictly batch — its iteration loop is host-pinned with
device-resident state (cpp/src/link_analysis/pagerank_impl.cuh:194-277) and
has no resume capability. The north rule adds it: every k supersteps we
commit the full vertex-state DataFrame plus convergence metrics so a run can
resume mid-algorithm. Layout (Iceberg-style commit protocol on plain
parquet — data first, tiny JSON manifest last as the atomic commit marker):

    <dir>/iter_00012/data/*.parquet   vertex-state snapshot
    <dir>/iter_00012/meta.json        {"iteration":12,"metrics":{...},
                                       "partitions":N}

A partially-written snapshot (no meta.json) is ignored on resume. Writing
also resets DataFrame lineage, which otherwise grows per superstep (a Spark
failure-recovery concern with no reference analogue — SURVEY.md §7.2).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_ITER_RE = re.compile(r"^iter_(\d{5})$")


class CheckpointManager:
    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _iter_dir(self, iteration: int) -> str:
        return os.path.join(self.dir, f"iter_{iteration:05d}")

    def save(self, df: DataFrame, iteration: int, metrics: dict) -> DataFrame:
        """Commit a snapshot; returns the re-read (lineage-free) DataFrame."""
        d = self._iter_dir(iteration)
        data = os.path.join(d, "data")
        if os.path.exists(d):
            shutil.rmtree(d)
        df.write.mode("overwrite").parquet(data)
        meta = {
            "iteration": iteration,
            "metrics": metrics,
            "partitions": df.rdd.getNumPartitions(),
        }
        tmp = os.path.join(d, ".meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.rename(tmp, os.path.join(d, "meta.json"))  # atomic commit
        return df.sparkSession.read.parquet(data)

    def latest(self, spark: SparkSession) -> tuple[int, DataFrame, dict] | None:
        """Most recent COMMITTED snapshot, or None."""
        best = None
        if not os.path.isdir(self.dir):
            return None
        for name in os.listdir(self.dir):
            m = _ITER_RE.match(name)
            if not m:
                continue
            meta_path = os.path.join(self.dir, name, "meta.json")
            if not os.path.exists(meta_path):
                continue  # uncommitted partial write
            it = int(m.group(1))
            if best is None or it > best:
                best = it
        if best is None:
            return None
        d = self._iter_dir(best)
        with open(os.path.join(d, "meta.json")) as f:
            meta = json.load(f)
        return best, spark.read.parquet(os.path.join(d, "data")), meta["metrics"]

    def truncate_after(self, iteration: int) -> None:
        """Drop snapshots newer than `iteration` (used by resume tests)."""
        for name in os.listdir(self.dir):
            m = _ITER_RE.match(name)
            if m and int(m.group(1)) > iteration:
                shutil.rmtree(os.path.join(self.dir, name))
