"""Layered uniform neighbor sampling (GraphSAGE-style fanout sampling).

Beyond the 21.x reference (whose sampling surface is random walks only —
sampling/random_walks.py); upstream cuGraph later added
``uniform_neighbor_sample`` with exactly this contract: per hop h, sample
``fanouts[h]`` neighbors (without replacement) of every frontier vertex;
the next frontier is the distinct sampled destinations. The workhorse of
minibatch GNN training-data generation.

Determinism: the per-edge sampling key is a seeded hash of
(src, dst, hop) — the same sample at any partitioning or parallelism.
``rank_mode="lcg"`` uses plain BIGINT arithmetic so the driver's DuckDB
oracle replays every sampled edge (xxhash64 has no SQL twin); lcg mode
assumes vertex ids < ~2^32 (A·id must stay in int64 — true for dense
renumbered ids, the standard flow), xxhash has no such bound.

Distributed shape: per hop, ONE edges-join on the (broadcast-gated)
frontier and one per-src top-k. Selection is a sort-based window
(row_number ≤ fanout): hub vertices sort-spill rather than OOM; fanout-k
output is bounded at k rows per frontier vertex per hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions
from .random_walks import RW_LCG_A, RW_LCG_B, RW_LCG_C, RW_LCG_P


def uniform_neighbor_sample(
    graph: Graph,
    start_vertices: list,
    fanouts: list[int],
    seed: int = 42,
    num_partitions: int | None = None,
    rank_mode: str = "xxhash",
) -> DataFrame:
    """DF[hop, src, dst, edge_weight] — the sampled edge set, one block per
    hop (hop 0 expands the start vertices). External ids if renumbered."""
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
    frontier = spark.createDataFrame(
        [(v,) for v in sorted(set(internal))], "src LONG"
    )
    out = None
    with no_aqe(spark, nparts):
        for hop, k in enumerate(fanouts):
            n_f = frontier.count()
            if n_f == 0:
                break
            f = (
                F.broadcast(frontier)
                if n_f <= BROADCAST_STATE_MAX_V
                else frontier.repartition(nparts, "src")
            )
            cand = edges.join(f, on="src")
            if rank_mode == "lcg":
                u = (
                    F.lit(RW_LCG_A) * F.col("src")
                    + F.lit(RW_LCG_B * (hop + 1))
                    + F.lit(RW_LCG_C) * F.col("dst")
                    + F.lit(seed)
                ) % F.lit(RW_LCG_P)
            else:
                u = F.abs(F.xxhash64("src", F.lit(hop), "dst", F.lit(seed)))
            win = Window.partitionBy("src").orderBy(u.asc(), F.col("dst").asc())
            sampled = (
                cand.withColumn("__rn__", F.row_number().over(win))
                .filter(F.col("__rn__") <= k)
                .select(
                    F.lit(hop).cast("int").alias("hop"),
                    "src",
                    "dst",
                    F.col("w").cast("double").alias("edge_weight"),
                )
                .localCheckpoint(eager=False)
            )
            out = sampled if out is None else out.unionByName(sampled)
            frontier = sampled.select(F.col("dst").alias("src")).distinct()
    edges.unpersist()
    if out is None:
        out = spark.createDataFrame(
            [], "hop INT, src LONG, dst LONG, edge_weight DOUBLE"
        )
    if graph.renumbered:
        out = graph.unrenumber(out, "src")
        out = graph.unrenumber(out, "dst")
    return out.select("hop", "src", "dst", "edge_weight")
