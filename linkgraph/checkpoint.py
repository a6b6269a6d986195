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

Manifest IO goes through the Hadoop FileSystem API (resolved from the active
session's hadoopConfiguration), so checkpoint_dir may be any Spark-readable
URI — HDFS, S3A, local — not just driver-local POSIX paths. The rename
commit is atomic on HDFS/local; on S3A it is a copy (the marker-last
protocol still ensures partial snapshots are never resumed). Falls back to
plain POSIX IO when no Spark session is active (e.g. offline truncation in
tests).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_ITER_RE = re.compile(r"^iter_(\d{5})$")


class _PosixIO:
    def mkdirs(self, p):
        os.makedirs(p, exist_ok=True)

    def exists(self, p):
        return os.path.exists(p)

    def delete(self, p):
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)

    def rename(self, a, b):
        os.rename(a, b)

    def listdir(self, p):
        return os.listdir(p) if os.path.isdir(p) else []

    def read_text(self, p):
        with open(p) as f:
            return f.read()

    def write_text(self, p, s):
        with open(p, "w") as f:
            f.write(s)


class _HadoopIO:
    """Hadoop FileSystem-backed IO: works for hdfs://, s3a://, file:// and
    bare local paths alike (resolved against fs.defaultFS)."""

    def __init__(self, spark: SparkSession):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _path(self, p):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p):
        return self._path(p).getFileSystem(self._conf)

    def mkdirs(self, p):
        self._fs(p).mkdirs(self._path(p))

    def exists(self, p):
        return self._fs(p).exists(self._path(p))

    def delete(self, p):
        fs = self._fs(p)
        if fs.exists(self._path(p)):
            fs.delete(self._path(p), True)

    def rename(self, a, b):
        self._fs(a).rename(self._path(a), self._path(b))

    def listdir(self, p):
        fs = self._fs(p)
        if not fs.exists(self._path(p)):
            return []
        return [st.getPath().getName() for st in fs.listStatus(self._path(p))]

    def read_text(self, p):
        stream = self._fs(p).open(self._path(p))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text(self, p, s):
        out = self._fs(p).create(self._path(p), True)
        try:
            out.write(bytearray(s, "utf-8"))
        finally:
            out.close()


def _io():
    spark = SparkSession.getActiveSession()
    return _HadoopIO(spark) if spark is not None else _PosixIO()


class CheckpointManager:
    def __init__(self, directory: str):
        self.dir = directory
        _io().mkdirs(directory)

    def _iter_dir(self, iteration: int) -> str:
        return f"{self.dir}/iter_{iteration:05d}"

    def save(self, df: DataFrame, iteration: int, metrics: dict) -> DataFrame:
        """Commit a snapshot; returns the re-read (lineage-free) DataFrame."""
        io = _io()
        d = self._iter_dir(iteration)
        data = f"{d}/data"
        io.delete(d)
        df.write.mode("overwrite").parquet(data)
        meta = {
            "iteration": iteration,
            "metrics": metrics,
            "partitions": df.rdd.getNumPartitions(),
        }
        tmp = f"{d}/.meta.json.tmp"
        io.write_text(tmp, json.dumps(meta))
        io.rename(tmp, f"{d}/meta.json")  # atomic commit (HDFS/local)
        return df.sparkSession.read.parquet(data)

    def latest(self, spark: SparkSession) -> tuple[int, DataFrame, dict] | None:
        """Most recent COMMITTED snapshot, or None."""
        io = _io()
        best = None
        for name in io.listdir(self.dir):
            m = _ITER_RE.match(name)
            if not m:
                continue
            if not io.exists(f"{self.dir}/{name}/meta.json"):
                continue  # uncommitted partial write
            it = int(m.group(1))
            if best is None or it > best:
                best = it
        if best is None:
            return None
        d = self._iter_dir(best)
        meta = json.loads(io.read_text(f"{d}/meta.json"))
        return best, spark.read.parquet(f"{d}/data"), meta["metrics"]

    def truncate_after(self, iteration: int) -> None:
        """Drop snapshots newer than `iteration` (used by resume tests)."""
        io = _io()
        for name in io.listdir(self.dir):
            m = _ITER_RE.match(name)
            if m and int(m.group(1)) > iteration:
                io.delete(f"{self.dir}/{name}")
