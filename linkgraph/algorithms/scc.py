"""Strongly connected components — forward-backward reachability.

Reference: components/connectivity.py:198-293
(`strongly_connected_components(G)` → DF[vertex, labels]); legacy GEMM-style
kernel cpp/src/components/scc_matrix.cuh:55-61. Like WCC, the reference's
labels are arbitrary; comparisons canonicalize (min member per component),
so any correct SCC algorithm is output-equivalent.

Algorithm (FW-BW, Fleischer et al. 2000): pick the minimum remaining vertex
as pivot; F = forward-reachable set, B = backward-reachable set (two BFS
frontier loops over the remaining subgraph); SCC = F ∩ B, labeled with its
min member; remove and repeat. Deterministic pivot choice ⇒ deterministic
labels. Rounds = number of components intersected by the pivot chain — fine
for web graphs (one giant SCC + small periphery); a multi-pivot coloring
variant is the known scale-up if round count ever dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from .pagerank import no_aqe, pick_partitions


def _reach(spark, edges, src_col, dst_col, pivot) -> DataFrame:
    """BFS reachable set from pivot along (src_col -> dst_col)."""
    visited = spark.createDataFrame([(pivot,)], "vertex LONG").localCheckpoint(
        eager=False
    )
    frontier = visited
    while True:
        nxt = (
            edges.join(
                F.broadcast(frontier.select(F.col("vertex").alias(src_col))),
                on=src_col,
            )
            .select(F.col(dst_col).alias("vertex"))
            .distinct()
            .join(visited, on="vertex", how="left_anti")
            .localCheckpoint(eager=False)
        )
        if nxt.limit(1).count() == 0:
            return visited
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt


def strongly_connected_components(
    graph: Graph, max_components: int = 10_000, num_partitions: int | None = None
) -> DataFrame:
    """Returns DF[vertex, labels]; label = min vertex id of the SCC
    (canonical, deterministic)."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = (
        graph.edges.select("src", "dst")
        .repartition(nparts, "src")
        .localCheckpoint(eager=False)
    )
    remaining = graph.vertices().localCheckpoint(eager=False)
    results = []
    with no_aqe(spark):
        for _ in range(max_components):
            head = remaining.orderBy("vertex").limit(1).collect()
            if not head:
                break
            pivot = head[0]["vertex"]
            fwd = _reach(spark, edges, "src", "dst", pivot)
            bwd = _reach(spark, edges, "dst", "src", pivot)
            scc = fwd.join(bwd, on="vertex", how="inner").localCheckpoint(eager=False)
            label = scc.agg(F.min("vertex")).collect()[0][0]
            results.append(scc.select("vertex", F.lit(label).cast("long").alias("labels")))
            remaining = remaining.join(scc, on="vertex", how="left_anti").localCheckpoint(
                eager=False
            )
            # shrink the edge set to the remaining subgraph
            edges = (
                edges.join(scc.withColumnRenamed("vertex", "src"), on="src", how="left_anti")
                .join(scc.withColumnRenamed("vertex", "dst"), on="dst", how="left_anti")
                .localCheckpoint(eager=False)
            )
        else:
            raise RuntimeError("max_components exceeded")
    if not results:
        return graph.vertices().select(
            "vertex", F.col("vertex").alias("labels")
        ).limit(0)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out
