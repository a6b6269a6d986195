"""Reference `cugraph.utils` surface (reference utilities/utils.py).

The portable subset: traversal-path extraction, vertex-pair renumbering,
and the optional-import helpers. The reference's CUDA/device probes
(utils.py:202-246 `is_cuda_version_less_than`, `is_device_version_less_than`,
`get_device_memory_info`) are GPU-runtime introspection with no meaning in
a Spark engine and are deliberately not shimmed — calling code that needs
an execution-capacity probe should ask the SparkSession
(`sc.defaultParallelism`, executor memory conf) instead.
"""

from __future__ import annotations

import importlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def get_traversed_path(df: DataFrame, id) -> DataFrame:  # noqa: A002 - reference name
    """Extract the root→``id`` path rows from a BFS/SSSP result
    (reference utilities/utils.py:66-131).

    The walk follows ``predecessor`` pointers on the driver — one pruned
    lookup per hop, so the job count is the PATH LENGTH (bounded by the
    traversal depth, typically tens on web graphs), never V. The returned
    DataFrame is produced by ONE final ``isin`` filter over ``df`` so the
    result stays a distributed frame with predicate pushdown intact.
    """
    ids = get_traversed_path_list(df, id)
    return df.filter(F.col("vertex").isin(ids))


def get_traversed_path_list(df: DataFrame, id) -> list:  # noqa: A002
    """Path as a Python list of vertex ids, ``id`` first, root last
    (reference utilities/utils.py:134-199). Same driver-walk bound as
    :func:`get_traversed_path`."""
    for col in ("vertex", "distance", "predecessor"):
        if col not in df.columns:
            raise ValueError(
                "DataFrame does not appear to be a BFS or "
                f"SSP result - '{col}' column missing"
            )
    lookup = df.select("vertex", "predecessor")
    row = lookup.filter(F.col("vertex") == id).first()
    if row is None:
        raise ValueError(f"The vertex {id!r} is not in the result set")
    answer = [id]
    pred = row["predecessor"]
    # hop count == path length; each filter is a pruned scan, not a shuffle
    while pred is not None and pred != -1:
        answer.append(pred)
        row = lookup.filter(F.col("vertex") == pred).first()
        if row is None:  # filtered/edited frame — mirror the reference error
            raise ValueError(f"The vertex {pred!r} is not in the result set")
        pred = row["predecessor"]
    return answer


def renumber_vertex_pair(input_graph, vertex_pair: DataFrame) -> DataFrame:
    """External→internal id mapping for a (src, dst) pair frame
    (reference utilities/utils.py:356-374). No-op on unrenumbered graphs."""
    if not input_graph.renumbered:
        return vertex_pair
    cols = list(vertex_pair.columns)
    key_cols = input_graph.nmap.key_cols
    if len(key_cols) == 1:
        out = vertex_pair
        for col in cols:
            out = input_graph.nmap.add_internal_vertex_id(
                out, col, "__rvp__"
            ).withColumnRenamed("__rvp__", col)
        return out.select(*cols)
    n = len(key_cols)
    out = input_graph.nmap.add_internal_vertex_id(vertex_pair, cols[:n], "src")
    return input_graph.nmap.add_internal_vertex_id(out, cols[n:], "dst")


class MissingModule:
    """Raises RuntimeError on any attribute access — returned by
    :func:`import_optional` for absent modules (reference
    utilities/utils.py:384-391)."""

    def __init__(self, mod_name: str):
        self.name = mod_name

    def __getattr__(self, attr):
        raise RuntimeError(f"This feature requires the {self.name} package/module")


def import_optional(mod: str, default_mod_class=MissingModule):
    """Import a module or return a :class:`MissingModule` placeholder
    (reference utilities/utils.py:393-421)."""
    try:
        return importlib.import_module(mod)
    except ModuleNotFoundError:
        return default_mod_class(mod_name=mod)
