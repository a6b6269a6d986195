"""Uniform random walks with deterministic seeded sampling.

Reference: sampling/random_walks.py:19-118 (`random_walks(G, start_vertices,
max_depth, use_padding)` returning vertex paths, edge-weight paths, and path
sizes); kernel cpp/src/sampling/random_walks.cuh (1309 LoC).

Spark shape (SURVEY §2.3): per step, join the walk frontier with the edge
table on the current vertex and pick ONE outgoing edge per walk by a
deterministic pseudo-random rank — ``xxhash64(walk_id, step, dst, seed)`` —
reduced with ``min_by`` (a hash aggregation, no window sort, no RNG state):
every run of the same (graph, starts, seed) yields identical paths, which is
what the engine's determinism/resume contract requires (the reference uses
device RNG and is NOT reproducible across runs; we strengthen that).
Walks that reach a sink vertex stop early (matching the reference's
truncated-path semantics with use_padding=False).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from .pagerank import no_aqe, pick_partitions


def random_walks(
    graph: Graph,
    start_vertices: list,
    max_depth: int = 4,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """DF[walk_id, step, vertex] — one row per visited vertex per walk
    (step 0 = start). External ids when the graph is renumbered."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    edges = (
        graph.edges.select("src", "dst", w.alias("w"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if graph.renumbered:
        internal = [graph._to_internal(v) for v in start_vertices]
        if any(v is None for v in internal):
            raise ValueError("start vertex not in graph")
    else:
        internal = [int(v) for v in start_vertices]
    cur = spark.createDataFrame(
        [(i, 0, v) for i, v in enumerate(internal)],
        "walk_id LONG, step INT, vertex LONG",
    ).localCheckpoint(eager=False)
    paths = cur
    with no_aqe(spark):
        for step in range(1, max_depth + 1):
            nxt = (
                edges.join(
                    F.broadcast(cur.select("walk_id", F.col("vertex").alias("src"))),
                    on="src",
                )
                .withColumn(
                    "rnd",
                    F.xxhash64(F.col("walk_id"), F.lit(step), F.col("dst"), F.lit(seed)),
                )
                .groupBy("walk_id")
                .agg(F.min_by("dst", "rnd").alias("vertex"))
                .select("walk_id", F.lit(step).cast("int").alias("step"), "vertex")
                .localCheckpoint(eager=False)
            )
            if nxt.limit(1).count() == 0:
                break
            paths = paths.unionByName(nxt).localCheckpoint(eager=False)
            cur = nxt
    out = paths
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out.select("walk_id", "step", "vertex")
