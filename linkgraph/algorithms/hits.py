"""HITS hubs & authorities.

Reference: link_analysis/hits.py:20-91 (gunrock wrapper,
cpp/src/link_analysis/gunrock_hits.cpp): alternating updates
    a(v) = Σ_{u->v} h(u);   h(u) = Σ_{u->v} a(v)
normalized each round (1-norm, as NetworkX/gunrock do for stability), stop
when Σ|h_new − h_old| + Σ|a_new − a_old| < tol or max_iter (HITS does not
hard-fail on max_iter in the reference wrapper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def hits(
    graph: Graph,
    max_iter: int = 100,
    tol: float = 1.0e-5,
    normalized: bool = True,
    num_partitions: int | None = None,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, hubs, authorities]."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = (
        graph.edges.select("src", "dst")
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    V = graph.number_of_vertices()
    bcast = V <= BROADCAST_STATE_MAX_V

    state = graph.vertices().select(
        "vertex", F.lit(1.0 / V).alias("h"), F.lit(1.0 / V).alias("a")
    ).localCheckpoint(eager=False)

    def maybe_bcast(df):
        return F.broadcast(df) if bcast else df

    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    with no_aqe(spark):
        for _ in range(n_iter):
            h_src = maybe_bcast(state.select(F.col("vertex").alias("src"), "h"))
            auth = (
                edges.join(h_src, on="src")
                .groupBy("dst")
                .agg(F.sum("h").alias("a_new"))
                .withColumnRenamed("dst", "vertex")
            )
            s1 = state.join(maybe_bcast(auth), on="vertex", how="left").select(
                "vertex", "h", "a", F.coalesce("a_new", F.lit(0.0)).alias("a_new")
            )
            a_sum = s1.agg(F.sum("a_new")).collect()[0][0] or 1.0
            s1 = s1.select(
                "vertex", "h", "a", (F.col("a_new") / F.lit(float(a_sum))).alias("a_n")
            ).localCheckpoint(eager=False)

            a_dst = maybe_bcast(s1.select(F.col("vertex").alias("dst"), "a_n"))
            hub = (
                edges.join(a_dst, on="dst")
                .groupBy("src")
                .agg(F.sum("a_n").alias("h_new"))
                .withColumnRenamed("src", "vertex")
            )
            s2 = s1.join(maybe_bcast(hub), on="vertex", how="left").select(
                "vertex", "h", "a", "a_n", F.coalesce("h_new", F.lit(0.0)).alias("h_new")
            )
            h_sum = s2.agg(F.sum("h_new")).collect()[0][0] or 1.0
            s2 = s2.select(
                "vertex",
                (F.col("h_new") / F.lit(float(h_sum))).alias("h"),
                F.col("a_n").alias("a"),
                F.col("h").alias("h_old"),
                F.col("a").alias("a_old"),
            ).localCheckpoint(eager=False)
            delta = s2.agg(
                F.sum(F.abs(F.col("h") - F.col("h_old")) + F.abs(F.col("a") - F.col("a_old")))
            ).collect()[0][0]
            state = s2.select("vertex", "h", "a")
            if fixed_iterations is None and delta < tol:
                break
    out = state.select(
        "vertex", F.col("h").alias("hubs"), F.col("a").alias("authorities")
    )
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out
