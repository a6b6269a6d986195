"""K-core decomposition: core_number and k_core subgraph extraction.

Reference: cores/core_number.py:20-66 (DF[vertex, core_number]),
cores/k_core.py:21-110 (induced subgraph of vertices with core >= k);
kernel cpp/src/cores/core_number.cu (179 LoC peeling).

Distributed peeling: process k = 0, 1, 2, ... ; at each k repeatedly remove
vertices whose remaining degree <= k (their core number is k) until stable,
then increment k. Each inner round is one degree aggregation + one semi-join
— O(max_core) outer rounds, each touching a shrinking edge set. Matches the
sequential peeling fixpoint exactly (core numbers are unique, so any
execution order gives the same result). Self-loops are ignored for degree
purposes (consistent with NetworkX/cuGraph core_number on simple graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges
from .pagerank import no_aqe, pick_partitions


def core_number(graph: Graph, num_partitions: int | None = None) -> DataFrame:
    """Returns DF[vertex, core_number] for every vertex (isolated -> 0)."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = graph.edges.select("src", "dst")
    if graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    edges = (
        edges.filter(F.col("src") != F.col("dst"))
        .repartition(nparts, "src")
        .localCheckpoint(eager=False)
    )
    results = []  # (vertex, k) DataFrames
    spark_v = graph.vertices()
    k = 0
    with no_aqe(spark):
        while True:
            if edges.limit(1).count() == 0:
                break
            # peel all vertices with degree <= k until none remain at this k
            while True:
                deg = edges.groupBy(F.col("src").alias("vertex")).agg(
                    F.count("*").alias("d")
                )
                peel = deg.filter(F.col("d") <= k).select("vertex")
                peel = peel.localCheckpoint(eager=False)
                if peel.limit(1).count() == 0:
                    break
                results.append(
                    peel.select("vertex", F.lit(k).cast("long").alias("core_number"))
                )
                edges = (
                    edges.join(
                        peel.withColumnRenamed("vertex", "src"), on="src", how="left_anti"
                    )
                    .join(
                        peel.withColumnRenamed("vertex", "dst"), on="dst", how="left_anti"
                    )
                    .localCheckpoint(eager=False)
                )
            k += 1
    assigned = None
    for r in results:
        assigned = r if assigned is None else assigned.unionByName(r)
    if assigned is None:
        out = spark_v.select("vertex", F.lit(0).cast("long").alias("core_number"))
    else:
        out = (
            spark_v.join(assigned, on="vertex", how="left")
            .fillna(0, subset=["core_number"])
            .select("vertex", "core_number")
        )
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out


def k_core(graph: Graph, k: int | None = None, core_numbers: DataFrame | None = None) -> Graph:
    """Induced subgraph on vertices with core_number >= k (default k = max
    core, matching cores/k_core.py:21-110's default)."""
    cn = core_numbers
    if cn is None:
        cn = core_number(graph)
        if graph.renumbered:  # core_number unrenumbered; redo in internal ids
            cn = graph.nmap.add_internal_vertex_id(
                cn.withColumnRenamed("vertex", "__ext__"), "__ext__", "vertex"
            ).select("vertex", "core_number")
    if k is None:
        k = cn.agg(F.max("core_number")).collect()[0][0]
    keep = cn.filter(F.col("core_number") >= k).select("vertex")
    return graph.subgraph(keep)
