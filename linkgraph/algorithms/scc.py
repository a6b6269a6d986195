"""Strongly connected components — trim + multi-pivot coloring.

Reference: components/connectivity.py:198-293
(`strongly_connected_components(G)` → DF[vertex, labels]); legacy GEMM-style
kernel cpp/src/components/scc_matrix.cuh:55-61. The reference's labels are
arbitrary (algorithms.hpp:1381-1383); comparisons canonicalize, and this
implementation emits the canonical form directly: label = min vertex id of
the SCC (deterministic).

Algorithm (FW-BW-Trim / coloring, Slota et al. 2014 "BFS and
Coloring-Based Parallel Algorithms for SCC"):

1. **Bulk trim** — vertices with no in-edges or no out-edges in the
   remaining subgraph are singleton SCCs; peel them ALL per round (a web
   graph's millions of trivial SCCs disappear in a few set operations, not
   one driver round-trip each).
2. **Forward min-coloring** — propagate color(v) = min(v, min colors of
   in-neighbors) to fixpoint (WCC-shaped changed-count loop). Each color
   class is the forward-reachable region of its root r (color(r) = r).
3. **Backward multi-BFS** — from ALL roots simultaneously, walk reversed
   edges restricted to same-color pairs; every vertex reached is in its
   root's SCC. The root is provably the SCC's min member (any member
   reaches r forward, so a member < r would recolor r), hence labels are
   canonical min-member ids.
4. Remove labeled vertices and repeat. Every round retires ≥1 SCC per
   color class plus all trimmed vertices, so disjoint-small-SCC graphs
   finish in one round and web-shaped graphs in a handful.

All V-row state is broadcast-gated (BROADCAST_STATE_MAX_V) and every loop
iteration truncates lineage + carried stats via truncate_plan (see
linkgraph/plans.py for the compounding-stats pathology). E-scale tables
(edges, the same-color subset ec) are instead PERSISTED hash-partitioned:
InMemoryRelation keeps outputPartitioning, so the per-iteration joins read
them co-partitioned with no E-side exchange (a truncated LogicalRDD forgets
its partitioning — measured 2.5x slower per coloring iteration and 0.45
vs 0.85 4-to-16-core scaling efficiency at RMAT-21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import release_plan, truncate_plan
from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def strongly_connected_components(
    graph: Graph,
    max_rounds: int = 64,
    num_partitions: int | None = None,
    stats: dict | None = None,
    round_timings: list | None = None,
) -> DataFrame:
    """Returns DF[vertex, labels]; label = min vertex id of the SCC
    (canonical, deterministic). ``stats`` (optional dict) receives
    ``{"rounds", "trim_rounds", "color_iters", "bfs_iters"}`` for tests and
    tuning. ``round_timings`` collects per-iteration wall times of the
    FIRST outer round's forward min-coloring loop — the E-scale superstep
    (each iteration joins the full remaining edge set), the same
    steady-state protocol as pagerank's iteration_timings; iteration count
    is deterministic per input, hence identical across parallelism levels."""
    import time as _time
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    n_v = graph.number_of_vertices()
    bcast = n_v <= BROADCAST_STATE_MAX_V

    def _state(df, key):
        return F.broadcast(df) if bcast else df.repartition(nparts, key)

    # multiplicity and weights are irrelevant to SCC; self-loops are too.
    # E-scale tables are PERSISTED hash-partitioned (never truncate_plan'd):
    # InMemoryRelation keeps outputPartitioning, so every coloring/BFS
    # iteration joins the cached edges co-partitioned with ZERO exchange on
    # the E side — the same plan contract as pagerank's ecoef. A truncated
    # LogicalRDD forgets its partitioning and re-shuffles all E rows per
    # iteration (measured at RMAT-21 local[16]: 8.6 s/coloring-iter truncated
    # vs 3.4 s persisted; 4→16 scaling efficiency 0.45 vs 0.85).
    def _persist_edges(df, key):
        out = df.repartition(nparts, key).persist(StorageLevel.MEMORY_AND_DISK)
        out.count()
        return out

    edges = _persist_edges(
        graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct(),
        "src",
    )
    active = truncate_plan(graph.vertices(), eager=True)
    assigned: DataFrame | None = None
    counters = {"rounds": 0, "trim_rounds": 0, "color_iters": 0, "bfs_iters": 0}

    def _add(assigned, part):
        out = part if assigned is None else assigned.unionByName(part)
        # lazy: consumed once, by the final select (or next union's plan)
        return truncate_plan(out, eager=False)

    with no_aqe(spark, nparts):
        for _round in range(max_rounds):
            counters["rounds"] = _round + 1
            # --- bulk trim: peel every vertex lacking in- or out-edges ---
            while True:
                counters["trim_rounds"] += 1
                core = (
                    edges.select(F.col("src").alias("vertex"))
                    .distinct()
                    .join(
                        _state(edges.select(F.col("dst").alias("vertex")).distinct(), "vertex"),
                        on="vertex",
                    )
                )
                trimmed = truncate_plan(
                    active.join(_state(core, "vertex"), on="vertex", how="left_anti"),
                    eager=False,
                )
                if trimmed.count() == 0:
                    break
                assigned = _add(
                    assigned, trimmed.select("vertex", F.col("vertex").alias("labels"))
                )
                old_active, old_edges = active, edges
                active = truncate_plan(
                    active.join(_state(trimmed, "vertex"), on="vertex", how="left_anti"),
                    eager=True,
                )
                edges = _persist_edges(
                    edges.join(
                        _state(trimmed.select(F.col("vertex").alias("src")), "src"),
                        on="src",
                        how="left_anti",
                    ).join(
                        _state(trimmed.select(F.col("vertex").alias("dst")), "dst"),
                        on="dst",
                        how="left_anti",
                    ),
                    "src",
                )
                # both replacements are materialized; the superseded E/V
                # storage can be freed now (trimmed stays: the lazy
                # `assigned` chain reads its checkpoint at the end)
                release_plan(old_active)
                old_edges.unpersist()
            if active.count() == 0:
                break
            # --- forward min-coloring to fixpoint ---
            color = truncate_plan(
                active.select("vertex", F.col("vertex").alias("color")), eager=True
            )
            color_ck = color
            while True:
                counters["color_iters"] += 1
                t0 = _time.time()
                upd = (
                    edges.join(
                        _state(
                            color.select(
                                F.col("vertex").alias("src"), F.col("color").alias("c_in")
                            ),
                            "src",
                        ),
                        on="src",
                    )
                    .groupBy(F.col("dst").alias("vertex"))
                    .agg(F.min("c_in").alias("c_min"))
                )
                new = truncate_plan(
                    color.join(_state(upd, "vertex"), on="vertex", how="left").select(
                        "vertex",
                        F.least(
                            F.col("color"), F.coalesce(F.col("c_min"), F.col("color"))
                        ).alias("color"),
                        (
                            F.coalesce(F.col("c_min"), F.col("color")) < F.col("color")
                        ).alias("chg"),
                    ),
                    eager=False,  # single consumer: the changed-count below
                )
                n_chg = new.filter(F.col("chg")).count()
                release_plan(color_ck)  # `new` materialized by the count
                color_ck = new
                if round_timings is not None and _round == 0:
                    round_timings.append(_time.time() - t0)
                color = new.select("vertex", "color")
                if n_chg == 0:
                    break
            color = truncate_plan(color, eager=True)  # multi-branch consumer
            release_plan(color_ck)  # folded into the eager re-checkpoint
            # --- backward multi-BFS from all roots within color classes ---
            ec = (
                edges.join(
                    _state(
                        color.select(F.col("vertex").alias("src"), F.col("color").alias("c_s")),
                        "src",
                    ),
                    on="src",
                )
                .join(
                    _state(
                        color.select(F.col("vertex").alias("dst"), F.col("color").alias("c_d")),
                        "dst",
                    ),
                    on="dst",
                )
                .filter(F.col("c_s") == F.col("c_d"))
                .select("src", "dst")
            )
            ec = _persist_edges(ec, "dst")
            member = truncate_plan(
                color.filter(F.col("vertex") == F.col("color")).select("vertex"),
                eager=True,
            )
            frontier = member
            while True:
                counters["bfs_iters"] += 1
                preds = truncate_plan(
                    ec.join(
                        _state(frontier.select(F.col("vertex").alias("dst")), "dst"),
                        on="dst",
                    )
                    .select(F.col("src").alias("vertex"))
                    .distinct()
                    .join(_state(member, "vertex"), on="vertex", how="left_anti"),
                    eager=False,  # materialized by the count (member rides along)
                )
                if preds.count() == 0:
                    break
                old_member = member
                member = truncate_plan(member.unionByName(preds), eager=True)
                # old member (== the first frontier on iteration 1) is folded
                # into the new eager union; preds is already materialized by
                # its count, so nothing recomputes through the old frame
                release_plan(old_member)
                frontier = preds
            scc = member.join(_state(color, "vertex"), on="vertex").select(
                "vertex", F.col("color").alias("labels")
            )
            assigned = _add(assigned, scc)
            old_active, old_edges = active, edges
            active = truncate_plan(
                active.join(_state(member, "vertex"), on="vertex", how="left_anti"),
                eager=True,
            )
            edges = _persist_edges(
                edges.join(
                    _state(member.select(F.col("vertex").alias("src")), "src"),
                    on="src",
                    how="left_anti",
                ).join(
                    _state(member.select(F.col("vertex").alias("dst")), "dst"),
                    on="dst",
                    how="left_anti",
                ),
                "src",
            )
            release_plan(old_active)
            old_edges.unpersist()
            # ec is round-local (the lazy `assigned` chain reads member and
            # color, never ec); member/color stay until the final select
            ec.unpersist()
        else:
            raise RuntimeError("scc: max_rounds exceeded")
    edges.unpersist()
    if stats is not None:
        stats.update(counters)
    if assigned is None:
        return graph.vertices().select(
            "vertex", F.col("vertex").alias("labels")
        ).limit(0)
    out = assigned
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out
