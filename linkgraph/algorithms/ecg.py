"""ECG — Ensemble Clustering for Graphs.

Reference: community/ecg.py:20-84 (`ecg(G, min_weight=0.05,
ensemble_size=16)` → DF[vertex, partition]); kernel cpp/src/community/
ecg.cu. Poulin & Théberge 2018: run an ensemble of LEVEL-1 Louvain
partitions, reweight each edge by its co-clustering vote share

    w*(u,v) = min_weight + (1 - min_weight) · votes(u,v)/ensemble_size

restricted to edges inside the 2-core (everything else gets min_weight —
pendant edges carry no community signal), then run full Louvain on the
reweighted graph.

Ensemble diversity: the reference permutes vertex visiting order randomly
per member. Our move kernel is deterministic, so member i instead starts
from labels xxhash64(vertex, seed+i) — the label VALUES drive the up/down
gate ordering and tie-breaks (the gain formula never reads them), giving
per-member diversity that is REPRODUCIBLE run-to-run, seeded like the
engine's other sampling ops. Votes and the final Louvain are then
deterministic too.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import truncate_plan
from ..structure.graph import Graph
from .cores import core_number
from .louvain import _local_moves, louvain
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def ecg(
    graph: Graph,
    min_weight: float = 0.05,
    ensemble_size: int = 16,
    seed: int = 42,
    resolution: float = 1.0,
    max_iter: int = 20,
):
    """Returns (DF[vertex, partition], modularity of the final labeling on
    the ORIGINAL graph)."""
    if graph.directed:
        raise ValueError("ECG requires an undirected graph")
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
    kv_df = truncate_plan(
        edges.groupBy(F.col("src").alias("vertex")).agg(F.sum("w").alias("k_v")),
        eager=True,
    )
    n_verts = kv_df.count()
    bcast = n_verts <= BROADCAST_STATE_MAX_V

    def _state(df, key):
        return F.broadcast(df) if bcast else df.repartition(nparts, key)

    # votes(u,v) = #members whose level-1 partition co-clusters u and v
    votes = None
    with no_aqe(spark, nparts):
        for i in range(ensemble_size):
            init = kv_df.select(
                "vertex", F.xxhash64("vertex", F.lit(seed + i)).alias("c")
            )
            member = _local_moves(
                spark, edges, kv_df, n_verts, m2, resolution, max_iter, nparts,
                init_labels=init,
            )
            m_src = member.select(F.col("vertex").alias("src"), F.col("c").alias("c_s"))
            m_dst = member.select(F.col("vertex").alias("dst"), F.col("c").alias("c_d"))
            vote_i = (
                edges.join(_state(m_src, "src"), on="src")
                .join(_state(m_dst, "dst"), on="dst")
                .select(
                    "src", "dst",
                    (F.col("c_s") == F.col("c_d")).cast("long").alias("v"),
                )
            )
            votes = vote_i if votes is None else votes.unionByName(vote_i)
            votes = truncate_plan(
                votes.groupBy("src", "dst").agg(F.sum("v").alias("v")), eager=True
            )

    # 2-core gate: an edge carries the vote weight only when BOTH endpoints
    # have core number >= 2 (ecg.cu's two-core filter); pendant/tree edges
    # carry only min_weight
    int_graph = Graph(
        edges=graph.edges, directed=False, weighted=graph.weighted,
        renumbered=False, nmap=None, multi=graph.multi,
        _num_vertices=graph.number_of_vertices(),
    )
    cn = core_number(int_graph)  # internal-id space
    cn_s = cn.select(F.col("vertex").alias("src"), F.col("core_number").alias("ks"))
    cn_d = cn.select(F.col("vertex").alias("dst"), F.col("core_number").alias("kd"))
    reweighted = (
        edges.join(_state(votes, "src"), on=["src", "dst"], how="left")
        .join(_state(cn_s, "src"), on="src")
        .join(_state(cn_d, "dst"), on="dst")
        .select(
            "src", "dst",
            F.when(
                (F.col("ks") >= 2) & (F.col("kd") >= 2),
                F.lit(min_weight)
                + F.lit(1.0 - min_weight)
                * F.coalesce(F.col("v"), F.lit(0))
                / F.lit(float(ensemble_size)),
            )
            .otherwise(F.lit(min_weight))
            .alias("weight"),
        )
    )
    # final Louvain in internal-id space; unrenumber once at the end
    g2 = Graph(
        edges=truncate_plan(reweighted, eager=True),
        directed=False,
        weighted=True,
        renumbered=False,
        nmap=None,
        multi=graph.multi,
        _num_vertices=graph.number_of_vertices(),
    )
    parts_int, _ = louvain(g2, max_iter=max_iter, resolution=resolution)
    # cover the full vertex universe (isolated vertices keep their own label)
    parts_int = (
        graph.vertices()
        .join(_state(parts_int, "vertex"), on="vertex", how="left")
        .select(
            "vertex",
            F.coalesce(F.col("partition"), F.col("vertex")).alias("partition"),
        )
    )
    from .clustering_metrics import analyze_clustering_modularity

    q = analyze_clustering_modularity(
        graph, parts_int.select("vertex", F.col("partition").alias("labels"))
    )
    out = parts_int
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    edges.unpersist()
    return out, q
