"""Leiden community detection — Louvain + connectivity-preserving refinement.

Reference: community/leiden.py:21-91 (`leiden(G, max_iter, resolution)` →
(DF[vertex, partition], modularity)); kernel cpp/src/community/
leiden.cuh / flatten_dendrogram.cuh. Leiden (Traag, Waltman, van Eck 2019)
fixes Louvain's badly-connected-community defect by inserting a REFINEMENT
phase between the local-move phase and aggregation: within each community,
vertices restart from singletons and merge only along intra-community
edges, and the graph is coarsened by the REFINED partition while community
labels survive as the coarse-level assignment.

This implementation composes the same fully-distributed move kernel as
Louvain (louvain._local_moves — argmax via max_by, broadcast-gated state,
truncate_plan per pass) three ways per dendrogram level:

1. local moves on the level graph → community labels c;
2. refinement: singleton restart over the edge subset {(u,v): c(u)=c(v)}
   with GLOBAL k_v/2m (gain is Leiden's ΔQ restricted to intra-community
   merges; candidates only ever arise from intra-community neighbors, so
   refined communities subdivide c exactly);
3. coarsen by the refined partition r (finer than c ⇒ better-connected
   supernodes), output labels follow c.

Determinism: the reference (and the published algorithm) break ties
randomly; we keep the engine-wide deterministic rules (up/down gating +
min-label tie-break), so output is reproducible run-to-run. Each level
restarts from singletons like our Louvain (the reference carries the
partition across levels; both converge to the same fixpoint family and the
test oracle pins OUR exact deterministic rules).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import truncate_plan
from ..structure.graph import Graph
from .clustering_metrics import analyze_clustering_modularity
from .louvain import _local_moves
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def leiden(
    graph: Graph,
    max_iter: int = 20,
    resolution: float = 1.0,
    max_levels: int = 10,
):
    """Returns (DF[vertex, partition], modularity: float)."""
    if graph.directed:
        raise ValueError("Leiden requires an undirected graph")
    spark = graph.edges.sparkSession
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    nparts = pick_partitions(spark, graph.edges.count(), None)
    edges = (
        graph.edges.select("src", "dst", w.alias("w"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m2 = edges.agg(F.sum("w")).collect()[0][0] or 0.0
    if m2 == 0:
        out = graph.vertices().select("vertex", F.col("vertex").alias("partition"))
        return graph.unrenumber(out, "vertex") if graph.renumbered else out, 0.0

    # flat_r: original vertex -> current-level REFINED supernode;
    # flat_c: original vertex -> final community (via current level's c)
    flat_r = truncate_plan(
        graph.vertices().select("vertex", F.col("vertex").alias("c")), eager=False
    )
    flat_c = flat_r
    level_edges = edges
    with no_aqe(spark, nparts):
        for _level in range(max_levels):
            kv_df = truncate_plan(
                level_edges.groupBy(F.col("src").alias("vertex")).agg(
                    F.sum("w").alias("k_v")
                ),
                eager=True,
            )
            n_verts = kv_df.count()
            bcast = n_verts <= BROADCAST_STATE_MAX_V

            def _state(df, key):
                return F.broadcast(df) if bcast else df.repartition(nparts, key)

            # 1. Louvain-style local moves
            labels = _local_moves(
                spark, level_edges, kv_df, n_verts, m2, resolution, max_iter, nparts
            )
            n_comm = labels.select("c").distinct().count()
            # community assignment of current supernodes -> original vertices
            lab_flat = labels.select(F.col("vertex").alias("c"), F.col("c").alias("c_next"))
            flat_c = truncate_plan(
                flat_r.join(_state(lab_flat, "c"), on="c", how="left").select(
                    "vertex", F.coalesce(F.col("c_next"), F.col("c")).alias("c")
                ),
                eager=False,
            )
            if n_comm == n_verts:
                break
            # 2. refinement: singleton restart on intra-community edges only
            lab_s = labels.select(F.col("vertex").alias("src"), F.col("c").alias("c_s"))
            lab_d = labels.select(F.col("vertex").alias("dst"), F.col("c").alias("c_d"))
            intra = (
                level_edges.join(_state(lab_s, "src"), on="src")
                .join(_state(lab_d, "dst"), on="dst")
                .filter(F.col("c_s") == F.col("c_d"))
                .select("src", "dst", "w")
            )
            intra = truncate_plan(intra, eager=True)
            refined = _local_moves(
                spark, intra, kv_df, n_verts, m2, resolution, max_iter, nparts
            )
            # vertices with no intra-community edge keep their singleton id
            refined = truncate_plan(
                kv_df.select("vertex").join(
                    _state(refined, "vertex"), on="vertex", how="left"
                ).select(
                    "vertex", F.coalesce(F.col("c"), F.col("vertex")).alias("c")
                ),
                eager=True,
            )
            # guard: a refinement that merges nothing would coarsen to the
            # identical graph — fall back to coarsening by c for progress
            n_ref = refined.select("c").distinct().count()
            if n_ref == n_verts:
                refined = labels
            # 3. flatten + coarsen by the REFINED partition
            ref_flat = refined.select(
                F.col("vertex").alias("c"), F.col("c").alias("c_next")
            )
            flat_r = truncate_plan(
                flat_r.join(_state(ref_flat, "c"), on="c", how="left").select(
                    "vertex", F.coalesce(F.col("c_next"), F.col("c")).alias("c")
                ),
                eager=False,
            )
            r_src = refined.select(F.col("vertex").alias("src"), F.col("c").alias("cs"))
            r_dst = refined.select(F.col("vertex").alias("dst"), F.col("c").alias("cd"))
            level_edges = truncate_plan(
                level_edges.join(_state(r_src, "src"), on="src")
                .join(_state(r_dst, "dst"), on="dst")
                .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
                .agg(F.sum("w").alias("w")),
                eager=True,
            )
            if level_edges.filter(F.col("src") != F.col("dst")).limit(1).count() == 0:
                break
    edges.unpersist()
    labels_out = flat_c.select("vertex", F.col("c").alias("labels"))
    q = analyze_clustering_modularity(graph, labels_out)
    out = labels_out.withColumnRenamed("labels", "partition")
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out, q
