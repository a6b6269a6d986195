"""Louvain community detection — deterministic distributed variant.

Reference: community/louvain.py:21-92 (`louvain(G, max_iter, resolution)` →
(DF[vertex, partition], modularity)); kernels cpp/src/community/
louvain.cuh:52-607 — per-vertex argmax-over-neighbor-communities
modularity-delta move (:68-72), alternating up/down tie-break to prevent
parallel-move oscillation (:94-101), then graph coarsening by cluster and
recursion over dendrogram levels (:157-181).

This implementation mirrors those mechanics relationally:

- local-move superstep = the two-level key-aggregated reduce
  (copy_v_transform_reduce_key_aggregated_out_nbr, SURVEY §2.4):
  ``groupBy(dst, community).sum(w)`` then argmax per dst via max(struct);
- gain formula (standard Louvain, resolution γ):
      ΔQ(v: c_old → c) ∝ k_{v,c} − k_{v,c_old\\v} − γ·k_v·(Σ_c − Σ_{c_old\\v})/(2m)
  a move happens only for strictly positive gain;
- parallel moves alternate an up/down pass (even iterations only allow
  moves to communities with id > current, odd ones to id <; exactly the
  reference's up_down switch) — this breaks two-vertex swap cycles and
  makes runs deterministic;
- when a level's local moves stop improving, the graph is coarsened
  (edges ⋈ labels on both endpoints → groupBy(c_src, c_dst).sum(w),
  the reference's coarsen_graph) and the next dendrogram level starts;
- returns (labels DataFrame, final modularity), labels flattened through
  all levels like the reference's flatten_dendrogram.

Louvain output is not unique across implementations; tests pin a
pure-Python oracle with these exact deterministic rules and additionally
check modularity quality on known graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..structure.graph import Graph
from .clustering_metrics import analyze_clustering_modularity
from .pagerank import no_aqe


def _local_moves(spark, edges, verts_kv, n_verts, m2, resolution, max_inner):
    """One dendrogram level. edges: (src,dst,w) symmetrized both directions,
    no self loops. verts_kv: (vertex, k_v). Returns labels (vertex, c).

    Hybrid execution: the E-row work — k_{v,c} aggregation over the edge
    table — stays distributed (join + map-side-combined hash agg); the
    V-row bookkeeping (sigma totals, gain argmax) is vectorized pandas on
    the driver. Rationale: a fully-DataFrame pass loop exhibited
    exponential per-pass planning latency in Catalyst (driver spinning in
    SizeInBytesOnlyStatsPlanVisitor with a CONSTANT 33-node plan — jstack'd;
    chained checkpoint self-joins trigger a planner pathology), while the
    V-row state here is exactly the community-count-bounded table that the
    reference also keeps resident per GPU. The scale ceiling is driver
    memory over O(V + Σ distinct neighbor-communities) rows per level —
    beyond that, shard the argmax by vertex range (documented follow-up).
    """
    import numpy as np
    import pandas as pd

    kv_pd = verts_kv.toPandas().sort_values("vertex").reset_index(drop=True)
    verts = kv_pd["vertex"].to_numpy()
    k_v = dict(zip(kv_pd["vertex"], kv_pd["k_v"]))
    labels = {int(v): int(v) for v in verts}
    prev_moved = None
    for inner in range(max_inner):
        lab_df = spark.createDataFrame(
            pd.DataFrame(
                {"src": list(labels.keys()), "c_nbr": list(labels.values())}
            )
        )
        kvc = (
            edges.join(F.broadcast(lab_df), on="src")
            .groupBy(F.col("dst").alias("vertex"), "c_nbr")
            .agg(F.sum("w").alias("k_vc"))
            .toPandas()
        )
        sigma: dict = {}
        for v, c in labels.items():
            sigma[c] = sigma.get(c, 0.0) + k_v[v]
        # vectorized gain computation
        vv = kvc["vertex"].to_numpy()
        cn = kvc["c_nbr"].to_numpy()
        kw = kvc["k_vc"].to_numpy()
        c_cur = np.array([labels[int(x)] for x in vv])
        k_in_cur_map = {
            (int(v), int(c)): w for v, c, w in zip(vv, cn, kw) if labels[int(v)] == int(c)
        }
        k_in_cur = np.array(
            [k_in_cur_map.get((int(v), int(c)), 0.0) for v, c in zip(vv, c_cur)]
        )
        kv_arr = np.array([k_v[int(x)] for x in vv])
        sig_cur = np.array([sigma[int(c)] for c in c_cur])
        sig_new = np.array([sigma.get(int(c), 0.0) for c in cn])
        g = kw - k_in_cur - resolution * kv_arr * (sig_new - (sig_cur - kv_arr)) / m2
        # direction gate: alternate up/down passes (louvain.cuh:94-101)
        gate = (cn > c_cur) if inner % 2 == 0 else (cn < c_cur)
        ok = (g > 1e-12) & gate & (cn != c_cur)
        moves: dict = {}
        bestkey: dict = {}
        for v, c, gg in zip(vv[ok], cn[ok], g[ok]):
            key = (float(gg), -int(c))
            if v not in bestkey or key > bestkey[v]:
                bestkey[v] = key
                moves[int(v)] = int(c)
        for v, c in moves.items():
            labels[v] = c
        n_moved = len(moves)
        # stop after a full up+down cycle moved at most 1% of vertices —
        # synchronous passes trail off geometrically (deterministic rule,
        # mirrored exactly by the test oracle)
        thresh = n_verts // 100
        if prev_moved is not None and n_moved <= thresh and prev_moved <= thresh:
            break
        prev_moved = n_moved
    return spark.createDataFrame(
        pd.DataFrame({"vertex": list(labels.keys()), "c": list(labels.values())})
    )


def louvain(
    graph: Graph,
    max_iter: int = 20,
    resolution: float = 1.0,
    max_levels: int = 10,
):
    """Returns (DF[vertex, partition], modularity: float).

    ``max_iter`` caps local-move passes PER LEVEL (the reference's per-level
    iteration budget); synchronous up/down passes move a trickle of vertices
    late in a level, so the default cap of 20 trades a negligible modularity
    difference for bounded superstep count on dense graphs.
    """
    if graph.directed:
        raise ValueError("Louvain requires an undirected graph")
    spark = graph.edges.sparkSession
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    # symmetrized, self-loops dropped for the move phase (their weight joins
    # the community's internal mass automatically after coarsening)
    edges = (
        graph.edges.select("src", "dst", w.alias("w"))
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=False)
    )
    m2 = edges.agg(F.sum("w")).collect()[0][0] or 0.0  # = 2m (both directions)
    if m2 == 0:
        out = graph.vertices().select("vertex", F.col("vertex").alias("partition"))
        return graph.unrenumber(out, "vertex") if graph.renumbered else out, 0.0

    # flat assignment: original vertex -> current-level community
    flat = graph.vertices().select("vertex", F.col("vertex").alias("c")).localCheckpoint(
        eager=False
    )
    level_edges = edges
    with no_aqe(spark):
        for _level in range(max_levels):
            verts_kv = (
                level_edges.groupBy(F.col("src").alias("vertex"))
                .agg(F.sum("w").alias("k_v"))
                .localCheckpoint(eager=False)
            )
            n_verts = verts_kv.count()
            labels = _local_moves(
                spark, level_edges, verts_kv, n_verts, m2, resolution, max_iter
            )
            n_comm = labels.select("c").distinct().count()
            # flatten this level into the original-vertex assignment
            flat = (
                flat.join(
                    labels.select(
                        F.col("vertex").alias("c"), F.col("c").alias("c_next")
                    ),
                    on="c",
                    how="left",
                )
                .select(
                    "vertex", F.coalesce(F.col("c_next"), F.col("c")).alias("c")
                )
                .localCheckpoint(eager=False)
            )
            if n_comm == n_verts:  # no merge happened at this level
                break
            # coarsen: communities become vertices (coarsen_graph_impl.cuh)
            lab_src = labels.withColumnRenamed("vertex", "src").withColumnRenamed("c", "cs")
            lab_dst = labels.withColumnRenamed("vertex", "dst").withColumnRenamed("c", "cd")
            # keep coarsened self-loops: internal community weight must count
            # in the next level's k_v and sigma (canonical Louvain semantics)
            # EAGER checkpoint: the coarsened table is referenced by two
            # branches of the next pass's single job; a lazy checkpoint that
            # both branches materialize concurrently deadlocks
            level_edges = (
                level_edges.join(F.broadcast(lab_src), on="src")
                .join(F.broadcast(lab_dst), on="dst")
                .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
                .agg(F.sum("w").alias("w"))
                .localCheckpoint(eager=True)
            )
            if level_edges.filter(F.col("src") != F.col("dst")).limit(1).count() == 0:
                break
    labels_out = flat.select("vertex", F.col("c").alias("labels"))
    q = analyze_clustering_modularity(graph, labels_out)
    out = labels_out.withColumnRenamed("labels", "partition")
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out, q
