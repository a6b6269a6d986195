"""Eigenvector centrality — shifted power iteration, L2-normalized.

Beyond the 2021 fork's surface (the reference repo at that commit carries
Katz/HITS/PageRank but no eigenvector_centrality; modern cuGraph added it
in 22.x — see the fork's centrality/__init__.py which lists only
betweenness/katz and link_analysis pagerank/hits). Implemented here with
the NetworkX public semantics (networkx.algorithms.centrality.eigenvector,
the de-facto definition users expect):

    x_new(v) = x(v) + Σ_{u->v} w(u,v) * x(u)        (shifted: I + Aᵀ)
    x_new <- x_new / ||x_new||_2
    stop when Σ_v |x_new(v) - x(v)| < V * tol  (or max_iter -> hard fail)

The +x(v) shift (I + Aᵀ has the same eigenvectors as Aᵀ) is what makes the
iteration converge on bipartite/periodic graphs and keeps it from decaying
to zero on DAG-shaped link graphs — exactly NetworkX's recurrence.

Physical plan (the audited Katz/HITS superstep family):
- ONE persisted src-hash-partitioned edge table; every superstep is one
  E-scale job: join state on src + map-side-combined sum per dst.
- V-row state is broadcast-gated (BROADCAST_STATE_MAX_V) else
  hash-partitioned on the join key — the same partitioning every round, so
  the state join never reshuffles the edge side.
- ONE driver action per superstep: the 1-row sum-of-squares aggregate is
  broadcast back over the cached state so the L1 delta can divide by the
  fresh L2 norm inside the same collect (the HITS fused-action pattern).
- Normalization is folded into the NEXT superstep's expressions as a
  literal — the V-row state is never rewritten just to scale it.
At 100 TB nothing on the driver grows with V or E: per-superstep sync is
two scalars.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import release_plan, truncate_plan
from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


class EigenvectorConvergenceError(RuntimeError):
    pass


def eigenvector_centrality(
    graph: Graph,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    nstart: DataFrame | None = None,
    num_partitions: int | None = None,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, eigenvector_centrality] (L2-normalized).

    ``nstart``: optional DF[vertex, values] initial guess in EXTERNAL ids;
    absent vertices start at 0 (the vector is L2-normalized before the
    first superstep, so only the direction matters). ``fixed_iterations``
    runs exactly that many supersteps with no convergence test — the
    deterministic mode the driver oracle unrolls.
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

    def _state(df, key):
        return F.broadcast(df) if bcast else df.repartition(nparts, key)

    if nstart is None:
        init = graph.vertices().select("vertex", F.lit(1.0).alias("c_raw"))
        norm = math.sqrt(float(V))
    else:
        ns = nstart.select("vertex", F.col("values").alias("c0"))
        if graph.renumbered:
            ns = graph.nmap.add_internal_vertex_id(
                ns, "vertex", "__vid__"
            ).withColumnRenamed("__vid__", "vertex")
        init = graph.vertices().join(ns, on="vertex", how="left").select(
            "vertex", F.coalesce("c0", F.lit(0.0)).cast("double").alias("c_raw")
        )
        norm = math.sqrt(
            float(init.agg(F.sum(F.col("c_raw") * F.col("c_raw"))).collect()[0][0] or 0.0)
        )
        if norm == 0.0:
            raise ValueError("nstart must contain at least one non-zero value")

    state = truncate_plan(init, eager=False)
    state_ck = state  # superseded superstep checkpoint, freed once replaced
    converged = fixed_iterations is not None
    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    with no_aqe(spark, nparts):
        for _ in range(n_iter):
            # normalization of the CURRENT vector folded in as the 1/norm
            # literal — x here is c_raw/norm throughout
            c_src = _state(
                state.select(F.col("vertex").alias("src"), "c_raw"), "src"
            )
            msgs = (
                edges.join(c_src, on="src")
                .groupBy(F.col("dst").alias("vertex"))
                .agg((F.sum(F.col("w") * F.col("c_raw")) / F.lit(norm)).alias("m"))
            )
            new = truncate_plan(
                state.join(_state(msgs, "vertex"), on="vertex", how="left").select(
                    "vertex",
                    (F.col("c_raw") / F.lit(norm) + F.coalesce("m", F.lit(0.0))).alias(
                        "c_raw"
                    ),
                    (F.col("c_raw") / F.lit(norm)).alias("c_old"),
                ),
                eager=False,  # single consumer: the fused norm+delta agg
            )
            # ONE fused action: sum of squares (new norm) + L1 delta of the
            # normalized vectors, with the 1-row norm broadcast back over
            # the cached state so the delta divides by the fresh norm.
            ss_row = new.agg(F.sum(F.col("c_raw") * F.col("c_raw")).alias("ss"))
            fused = (
                new.crossJoin(F.broadcast(ss_row))
                .agg(
                    F.first("ss").alias("ss"),
                    F.sum(
                        F.abs(
                            F.col("c_raw") / F.sqrt(F.col("ss")) - F.col("c_old")
                        )
                    ).alias("delta"),
                )
                .collect()[0]
            )
            release_plan(state_ck)  # `new` materialized by the fused agg
            state_ck = new
            state = new.select("vertex", "c_raw")
            ss = float(fused.ss or 0.0)
            if ss == 0.0:
                raise EigenvectorConvergenceError(
                    "eigenvector iteration collapsed to the zero vector"
                )
            norm = math.sqrt(ss)
            if fixed_iterations is None and float(fused.delta) < V * tol:
                converged = True
                break
    edges.unpersist()
    if not converged:
        raise EigenvectorConvergenceError(
            f"eigenvector centrality failed to converge in {max_iter} iterations"
        )
    out = state.select(
        "vertex", (F.col("c_raw") / F.lit(norm)).alias("eigenvector_centrality")
    )
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out
