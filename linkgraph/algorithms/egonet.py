"""Ego graph extraction (BFS ball + induced subgraph).

Reference: community/egonet.py:47-163 (`ego_graph(G, n, radius=1,
center=True)`, `batched_ego_graphs(G, seeds, radius=1)`); kernel
cpp/src/community/legacy/egonet.cu (per-seed BFS to depth r + induced
subgraph extraction).

Composition per SURVEY §2.3: BFS to ``radius`` + the two-semi-join induced
subgraph — no new primitives. The batched variant tags each frontier row
with its seed so all ego balls expand in the same superstep (the reference's
multi-source stream batching, egonet.cu launches one stream per seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import truncate_plan
from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def batched_ego_graphs(
    graph: Graph,
    seeds: list,
    radius: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """DF[seed, vertex, distance] — membership of each seed's ego ball.
    Seeds/vertices in external ids when the graph is renumbered."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = graph.edges.select("src", "dst")
    if graph.directed:
        # ego_graph(undirected=False) in the reference still expands along
        # out-edges; NetworkX-compat path symmetrizes. We expand out-edges on
        # directed graphs (matching egonet.py default) — callers wanting the
        # undirected ball pass an undirected Graph.
        pass
    edges = edges.repartition(nparts, "src").persist(StorageLevel.MEMORY_AND_DISK)

    if graph.renumbered:
        internal = [graph._to_internal(s) for s in seeds]
        if any(v is None for v in internal):
            raise ValueError("seed vertex not in graph")
        seed_rows = list(zip(internal, internal))
    else:
        seed_rows = [(int(s), int(s)) for s in seeds]
    visited = truncate_plan(
        spark.createDataFrame(
            [(s, v, 0) for s, v in seed_rows], "seed LONG, vertex LONG, distance LONG"
        ),
        eager=False,
    )
    frontier = visited
    # frontier/visited row counts gate broadcast vs co-partitioned join: a
    # radius-2 ball on a web graph is millions of rows per seed — never
    # unconditionally broadcast BFS state (VERDICT r1 item 5)
    n_front = n_visited = len(seed_rows)
    with no_aqe(spark, nparts):
        for depth in range(1, radius + 1):
            f_src = frontier.select("seed", F.col("vertex").alias("src"))
            f_src = (
                F.broadcast(f_src)
                if n_front <= BROADCAST_STATE_MAX_V
                else f_src.repartition(nparts, "src")
            )
            v_keys = visited.select("seed", "vertex")
            if n_visited <= BROADCAST_STATE_MAX_V:
                v_keys = F.broadcast(v_keys)
            nxt = truncate_plan(
                edges.join(f_src, on="src")
                .select("seed", F.col("dst").alias("vertex"))
                .distinct()
                .join(v_keys, on=["seed", "vertex"], how="left_anti")
                .select("seed", "vertex", F.lit(depth).cast("long").alias("distance")),
                eager=False,  # single consumer: the count below
            )
            n_front = nxt.count()
            if n_front == 0:
                break
            n_visited += n_front
            visited = truncate_plan(visited.unionByName(nxt), eager=False)
            frontier = nxt
    out = visited
    if graph.renumbered:
        out = graph.unrenumber(graph.unrenumber(out, "seed"), "vertex")
    return out


def ego_graph(graph: Graph, n, radius: int = 1, center: bool = True) -> Graph:
    """Induced subgraph of the radius-ball around n (community/egonet.py:47)."""
    members = batched_ego_graphs(graph, [n], radius=radius)
    verts = members.select("vertex")
    if not center:
        verts = verts.filter(F.col("vertex") != n)
    if graph.renumbered:
        verts = graph.nmap.add_internal_vertex_id(
            verts.withColumnRenamed("vertex", "__ext__"), "__ext__", "vertex"
        )
    return graph.subgraph(verts)
