"""Katz centrality — the PageRank-shaped pull superstep with a β constant.

Reference: centrality/katz_centrality.py:20-138 (alpha default = 1/(1+max
degree) family — the python wrapper uses 1/degree_max when alpha=None);
impl cpp/src/centrality/katz_centrality_impl.cuh:40-200:
    c_new(v) = alpha * Σ_{u->v} w(u,v) * c_old(u) + beta
init c = 0, beta default 1.0; convergence on L1 |c_new − c_old| < tol;
optional L2 normalization of the result (normalized=True default).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import release_plan
from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


class KatzConvergenceError(RuntimeError):
    pass


def katz_centrality(
    graph: Graph,
    alpha: float | None = None,
    beta: float = 1.0,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    nstart: DataFrame | None = None,
    normalized: bool = True,
    num_partitions: int | None = None,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, katz_centrality].

    ``nstart``: optional DF[vertex, values] initial guess in EXTERNAL ids
    (centrality/katz_centrality.py:80-86,119-126 — the reference renumbers
    it before handing it to the kernel). Vertices absent from ``nstart``
    start at 0.
    """
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    edges = (
        graph.edges.select("src", "dst", w.alias("w"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    V = graph.number_of_vertices()
    bcast = V <= BROADCAST_STATE_MAX_V
    if alpha is None:
        dmax = graph.degree().agg(F.max("degree")).collect()[0][0] or 1
        alpha = 1.0 / float(dmax)

    verts = graph.vertices()
    if nstart is None:
        state = verts.select("vertex", F.lit(0.0).alias("c"))
    else:
        ns = nstart.select("vertex", F.col("values").alias("c0"))
        if graph.renumbered:
            ns = graph.nmap.add_internal_vertex_id(
                ns, "vertex", "__vid__"
            ).withColumnRenamed("__vid__", "vertex")
        state = verts.join(ns, on="vertex", how="left").select(
            "vertex", F.coalesce("c0", F.lit(0.0)).cast("double").alias("c")
        )
    state = state.localCheckpoint(eager=False)
    prev_ck = state  # superseded superstep checkpoint, freed once replaced
    converged = fixed_iterations is not None
    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    with no_aqe(spark, nparts):
        for _ in range(n_iter):
            c_src = state.select(F.col("vertex").alias("src"), "c")
            c_src = F.broadcast(c_src) if bcast else c_src.repartition(nparts, "src")
            msgs = (
                edges.join(c_src, on="src")
                .groupBy("dst")
                .agg(F.sum(F.col("w") * F.col("c")).alias("m"))
                .withColumnRenamed("dst", "vertex")
            )
            if bcast:
                msgs = F.broadcast(msgs)
            new = (
                state.join(msgs, on="vertex", how="left")
                .select(
                    "vertex",
                    (
                        F.lit(alpha) * F.coalesce(F.col("m"), F.lit(0.0)) + F.lit(beta)
                    ).alias("c"),
                    F.col("c").alias("c_old"),
                )
                .localCheckpoint(eager=False)
            )
            delta = new.agg(F.sum(F.abs(F.col("c") - F.col("c_old")))).collect()[0][0]
            release_plan(prev_ck)  # `new` materialized by the delta agg
            prev_ck = new
            state = new.select("vertex", "c")
            if fixed_iterations is None and delta < tol:
                converged = True
                break
    if not converged:
        raise KatzConvergenceError(f"Katz failed to converge in {max_iter} iterations")
    if normalized:
        norm = math.sqrt(
            state.agg(F.sum(F.col("c") * F.col("c"))).collect()[0][0] or 1.0
        )
        state = state.select("vertex", (F.col("c") / F.lit(norm)).alias("c"))
    out = state.select("vertex", F.col("c").alias("katz_centrality"))
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out
