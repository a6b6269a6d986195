"""BFS and SSSP as frontier-expansion superstep loops.

Reference:
- BFS python API traversal/bfs.py:80-185; impl cpp/src/traversal/
  bfs_impl.cuh:48-230 (frontier push via update_frontier_v_push_if_out_nbr;
  unreached distance = invalid int max :102-108). Returns
  DF[vertex, distance, predecessor]; any-predecessor semantics (we pick
  min(src) deterministically); start vertex predecessor = -1.
- SSSP python API traversal/sssp.py:120-338; impl cpp/src/traversal/
  sssp_impl.cuh:48-276 (near-far delta-stepping buckets). We implement the
  relational equivalent: iterative relaxation with a changed-vertex frontier
  (Bellman-Ford shape) — delta-stepping's bucketing is a GPU work-scheduling
  detail; the fixed point is identical. Requires non-negative weights like
  the reference (sssp_impl.cuh rejects negative weights).

Scale shape: frontier ⋈ edges on src -> min-reduce by dst (one shuffle per
level, map-side combined); frontier shrinks to the active set so late levels
touch little data. Unreachable vertices keep null distance (the relational
rendering of the reference's invalid_distance sentinel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import release_plan
from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def _internal_source(graph: Graph, start):
    if graph.renumbered:
        vid = graph._to_internal(start)
        if vid is None:
            raise ValueError(f"start vertex {start!r} not in graph")
        return vid
    return int(start)


def bfs(
    graph: Graph,
    start,
    depth_limit: int | None = None,
    directed: bool | None = None,
    num_partitions: int | None = None,
    return_sp_counter: bool = False,
) -> DataFrame:
    """DF[vertex, distance, predecessor]; unreachable -> null distance,
    start's predecessor = -1 (internal id space uses -1 like the reference).
    ``return_sp_counter`` adds an ``sp_counter`` column (number of shortest
    paths from start, traversal/bfs.py:144-147 — the reference returns it
    as a third array; the DataFrame-native form is an extra column),
    accumulated exactly like the Brandes forward pass."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = graph.edges.select("src", "dst")
    if directed is False and graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    edges = edges.repartition(nparts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    bcast = graph.number_of_vertices() <= BROADCAST_STATE_MAX_V

    s = _internal_source(graph, start)
    # visited(vertex, distance, predecessor, sp_counter)
    visited = spark.createDataFrame(
        [(s, 0, -1, 1.0)],
        "vertex LONG, distance LONG, predecessor LONG, sp_counter DOUBLE",
    ).localCheckpoint(eager=False)
    frontier = visited.select("vertex", "sp_counter")
    depth = 0
    # two-generation free list: level d's count materializes visited_{d-1}
    # (read via v_keys) and nxt_d, which releases visited_{d-2} and nxt_{d-1}
    pend_visited, pend_nxt = None, None
    with no_aqe(spark, nparts):
        while depth_limit is None or depth < depth_limit:
            depth += 1
            f_src = frontier.select(F.col("vertex").alias("src"), "sp_counter")
            f_src = F.broadcast(f_src) if bcast else f_src.repartition(nparts, "src")
            nxt = (
                edges.join(f_src, on="src")
                .groupBy("dst")
                .agg(
                    F.min("src").alias("predecessor"),
                    F.sum("sp_counter").alias("sp_counter"),
                )
                .withColumnRenamed("dst", "vertex")
            )
            v_keys = visited.select("vertex")
            nxt = nxt.join(
                F.broadcast(v_keys) if bcast else v_keys, on="vertex", how="left_anti"
            ).select(
                "vertex",
                F.lit(depth).cast("long").alias("distance"),
                "predecessor",
                "sp_counter",
            )
            nxt = nxt.localCheckpoint(eager=False)
            n_new = nxt.count()
            release_plan(pend_visited)
            release_plan(pend_nxt)
            pend_nxt = nxt
            if n_new == 0:
                break
            pend_visited = visited
            visited = visited.unionByName(nxt).localCheckpoint(eager=False)
            frontier = nxt.select("vertex", "sp_counter")
    cols = ["vertex", "distance", "predecessor"] + (
        ["sp_counter"] if return_sp_counter else []
    )
    out = (
        graph.vertices()
        .join(visited, on="vertex", how="left")
        .select(*cols)
    )
    if graph.renumbered:
        # reference bfs.py:179-180 unrenumbers BOTH columns; the root's -1
        # sentinel has no external key, so it maps to null (same as the
        # reference's unmatched left-merge)
        out = graph.unrenumber(out, "vertex")
        out = graph.unrenumber(out, "predecessor")
    return out


def sssp(
    graph: Graph,
    source,
    max_iter: int = 10_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """DF[vertex, distance, predecessor] — shortest weighted distances
    (unweighted graphs behave as weight 1.0/edge, matching the reference's
    default edge weight). Deterministic predecessor: min src among optimal."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    edges = (
        graph.edges.select("src", "dst", w.alias("w"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if edges.filter(F.col("w") < 0).limit(1).count() > 0:
        raise ValueError("SSSP requires non-negative weights")
    bcast = graph.number_of_vertices() <= BROADCAST_STATE_MAX_V

    s = _internal_source(graph, source)
    dist = spark.createDataFrame(
        [(s, 0.0, -1)], "vertex LONG, distance DOUBLE, predecessor LONG"
    ).localCheckpoint(eager=False)
    frontier = dist
    prev_ck = None  # superseded superstep checkpoint, freed once replaced
    it = 0
    with no_aqe(spark, nparts):
        while it < max_iter:
            it += 1
            f_src = frontier.select(
                F.col("vertex").alias("src"), F.col("distance").alias("d_src")
            )
            f_src = F.broadcast(f_src) if bcast else f_src.repartition(nparts, "src")
            # relax: min (distance + w) per dst; deterministic min-src tie-break
            cand = (
                edges.join(f_src, on="src")
                .groupBy("dst")
                .agg(
                    F.min(
                        F.struct((F.col("d_src") + F.col("w")).alias("nd"), F.col("src"))
                    ).alias("t")
                )
                .select(
                    F.col("dst").alias("vertex"),
                    F.col("t.nd").alias("nd"),
                    F.col("t.src").alias("npred"),
                )
            )
            if bcast:
                cand = F.broadcast(cand)
            merged = (
                dist.join(cand, on="vertex", how="full_outer")
                .select(
                    "vertex",
                    F.when(
                        F.col("distance").isNull()
                        | (F.col("nd") < F.col("distance")),
                        F.col("nd"),
                    )
                    .otherwise(F.col("distance"))
                    .alias("distance"),
                    F.when(
                        F.col("distance").isNull()
                        | (F.col("nd") < F.col("distance")),
                        F.col("npred"),
                    )
                    .otherwise(F.col("predecessor"))
                    .alias("predecessor"),
                    (
                        F.col("distance").isNull()
                        | (F.col("nd") < F.col("distance"))
                    ).alias("changed"),
                )
                .localCheckpoint(eager=False)
            )
            n_changed = merged.filter(F.col("changed")).count()
            release_plan(prev_ck)  # `merged` materialized by the count
            prev_ck = merged
            dist = merged.select("vertex", "distance", "predecessor")
            frontier = merged.filter(F.col("changed")).select(
                "vertex", "distance", "predecessor"
            )
            if n_changed == 0:
                break
    out = (
        graph.vertices()
        .join(dist, on="vertex", how="left")
        .select("vertex", "distance", "predecessor")
    )
    if graph.renumbered:
        # reference sssp.py:209-210: vertex AND predecessor back to external
        out = graph.unrenumber(out, "vertex")
        out = graph.unrenumber(out, "predecessor")
    return out


def shortest_path(graph: Graph, source, **kw) -> DataFrame:
    """Alias for sssp() — NetworkX-compat name (traversal/sssp.py:246-259)."""
    return sssp(graph, source, **kw)


def shortest_path_length(graph: Graph, source, target=None):
    """traversal/sssp.py:262 convenience: distance from ``source`` to
    ``target`` — or, with ``target=None``, the full DF[vertex, distance]
    (the reference returns distances to all vertices in that case)."""
    res = sssp(graph, source)
    if target is None:
        return res.select("vertex", "distance")
    rows = res.filter(F.col("vertex") == target).collect()
    return None if not rows or rows[0]["distance"] is None else float(rows[0]["distance"])


def filter_unreachable(df: DataFrame) -> DataFrame:
    """traversal/sssp.py:filter_unreachable — drop null-distance rows."""
    return df.filter(F.col("distance").isNotNull())


def multi_source_bfs(
    graph: Graph,
    sources: list,
    depth_limit: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Batched BFS from several roots at once (traversal/ms_bfs.py:110-280's
    capability): DF[seed, vertex, distance] — one BFS ball per source, all
    expanding in the same supersteps (rows tagged by seed)."""
    from .egonet import batched_ego_graphs

    radius = depth_limit if depth_limit is not None else 2**31 - 1
    return batched_ego_graphs(
        graph, sources, radius=min(radius, 10_000), num_partitions=num_partitions
    )


def bfs_edges(graph: Graph, source, reverse: bool = False, depth_limit: int | None = None):
    """NX-compat wrapper (traversal/bfs.py:186-233 `bfs_edges`): BFS result
    DF[vertex, distance, predecessor]; ``reverse`` walks in-edges."""
    if reverse and graph.directed:
        rev = Graph(
            edges=graph.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ),
            directed=True,
            weighted=False,
            renumbered=graph.renumbered,
            nmap=graph.nmap,
            multi=graph.multi,
        )
        return bfs(rev, source, depth_limit=depth_limit)
    return bfs(graph, source, depth_limit=depth_limit)


def concurrent_bfs(graph: Graph, sources: list, depth_limit: int | None = None):
    """NX-compat wrapper (traversal/bfs.py:236-260 `concurrent_bfs`): batched
    BFS from several sources — DF[seed, vertex, distance]."""
    return multi_source_bfs(graph, sources, depth_limit=depth_limit)
