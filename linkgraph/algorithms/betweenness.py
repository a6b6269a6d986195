"""Betweenness centrality — k-sampled batched Brandes.

Reference: centrality/betweenness_centrality.py:26-288
(`betweenness_centrality(G, k=None, normalized=True, seed=None)`), kernel
cpp/src/centrality/betweenness_centrality.cu (557 LoC) — Brandes 2001 with
k sampled sources; exact when k = V.

Distributed shape: ALL k sources advance together (rows tagged by source —
the reference batches sources across its grid the same way). Forward phase:
level-synchronous BFS accumulating sigma (number of shortest paths) per
(source, vertex) via sum-aggregated frontier pushes. Backward phase: walk
levels deepest-first accumulating the dependency
    delta(v) += sigma(v)/sigma(w) * (1 + delta(w))   for each DAG edge v->w
as a join + sum per level. Betweenness(v) = Σ_sources delta(v), halved for
undirected graphs, normalized like the reference/NetworkX when requested
(undirected: 2/((n-1)(n-2)); directed: 1/((n-1)(n-2)); k-sampling rescales
by n/k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import truncate_plan
from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def betweenness_centrality(
    graph: Graph,
    k: int | None = None,
    normalized: bool = True,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, betweenness_centrality] over all vertices."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = graph.vertices()
    n = verts.count()

    # sampled sources: deterministic seeded choice (reference uses seeded
    # random sampling, betweenness_centrality.py:seed); all-vertices if k None
    if k is None or k >= n:
        sources = verts.select(F.col("vertex").alias("s"))
        k_eff = n
    else:
        sources = (
            verts.withColumn("h", F.xxhash64("vertex", F.lit(seed)))
            .orderBy("h", "vertex")
            .limit(k)
            .select(F.col("vertex").alias("s"))
        )
        k_eff = k
    sources = sources.localCheckpoint(eager=False)

    # ---- forward: level-synchronous multi-source BFS with sigma counts ----
    # state rows: (s, vertex, dist, sigma). Frontier/visited sizes gate
    # broadcast vs co-partitioned joins — (source, vertex) state grows to
    # k·V rows, never unconditionally broadcastable (VERDICT r1 item 4).
    def _gate(df, n_rows, key):
        if n_rows <= BROADCAST_STATE_MAX_V:
            return F.broadcast(df)
        return df.repartition(nparts, key) if key else df

    cur = truncate_plan(
        sources.select(
            "s", F.col("s").alias("vertex"), F.lit(0).alias("dist"), F.lit(1.0).alias("sigma")
        ),
        eager=False,
    )
    levels = [cur]
    level_rows = [k_eff]
    n_visited = k_eff
    visited = truncate_plan(cur.select("s", "vertex"), eager=False)
    depth = 0
    with no_aqe(spark):
        while True:
            depth += 1
            pushed = (
                edges.join(
                    _gate(
                        cur.select(F.col("vertex").alias("src"), "s", "sigma"),
                        level_rows[-1],
                        "src",
                    ),
                    on="src",
                )
                .groupBy("s", F.col("dst").alias("vertex"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            nxt = truncate_plan(
                pushed.join(
                    _gate(visited, n_visited, None), on=["s", "vertex"], how="left_anti"
                ).select("s", "vertex", F.lit(depth).alias("dist"), "sigma"),
                eager=False,  # single consumer: the count below
            )
            n_new = nxt.count()
            if n_new == 0:
                break
            levels.append(nxt)
            level_rows.append(n_new)
            n_visited += n_new
            visited = truncate_plan(
                visited.unionByName(nxt.select("s", "vertex")), eager=False
            )
            cur = nxt

        # ---- backward: dependency accumulation, deepest level first ----
        # delta rows: (s, vertex, delta)
        delta = None
        acc = None  # per-vertex summed dependency
        for lvl in range(len(levels) - 1, 0, -1):
            w_lvl = levels[lvl]  # rows at distance lvl
            if delta is not None:
                w_full = w_lvl.join(delta, on=["s", "vertex"], how="left").select(
                    "s", "vertex", "sigma", F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta")
                )
            else:
                w_full = w_lvl.select("s", "vertex", "sigma", F.lit(0.0).alias("delta"))
            v_lvl = levels[lvl - 1]  # predecessors live exactly one level up
            # DAG edges v->w: edge (v,w) with dist(v)=lvl-1, dist(w)=lvl
            contrib = truncate_plan(
                edges.join(
                    _gate(
                        w_full.select(
                            F.col("vertex").alias("dst"),
                            "s",
                            F.col("sigma").alias("sigma_w"),
                            F.col("delta").alias("delta_w"),
                        ),
                        level_rows[lvl],
                        "dst",
                    ),
                    on="dst",
                )
                .join(
                    _gate(
                        v_lvl.select(
                            F.col("vertex").alias("src"), "s", F.col("sigma").alias("sigma_v")
                        ),
                        level_rows[lvl - 1],
                        None,
                    ),
                    on=["src", "s"],
                )
                .groupBy("s", F.col("src").alias("vertex"))
                .agg(
                    F.sum(
                        F.col("sigma_v") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("delta")
                ),
                eager=True,  # consumed by next level's w_full join and lvl_acc
            )
            delta = contrib
            lvl_acc = (
                w_full.filter(F.col("delta") > 0)
                .groupBy("vertex")
                .agg(F.sum("delta").alias("bc"))
            )
            acc = lvl_acc if acc is None else acc.unionByName(lvl_acc)
            acc = truncate_plan(
                acc.groupBy("vertex").agg(F.sum("bc").alias("bc")), eager=False
            )
        # level-0 deltas (sources themselves) are excluded by Brandes (w != s)

    if acc is None:
        acc = verts.select("vertex", F.lit(0.0).alias("bc")).limit(0)
    out = (
        verts.join(acc, on="vertex", how="left")
        .select("vertex", F.coalesce(F.col("bc"), F.lit(0.0)).alias("bc"))
    )
    scale = 1.0
    if not graph.directed:
        scale *= 0.5  # each undirected pair counted twice
    if normalized and n > 2:
        if graph.directed:
            scale *= 1.0 / ((n - 1) * (n - 2))
        else:
            scale *= 2.0 / ((n - 1) * (n - 2))
    # sampling rescale, gated exactly like the reference kernel
    # (betweenness_centrality.cu rescale_by_total_sources_used): only when
    # normalized, or unnormalized on an undirected graph, and only for n > 2
    if k_eff < n and n > 2 and (normalized or not graph.directed):
        scale *= n / k_eff
    out = out.select(
        "vertex", (F.col("bc") * F.lit(scale)).alias("betweenness_centrality")
    )
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out
