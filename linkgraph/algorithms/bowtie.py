"""Bow-tie decomposition of a directed web graph (Broder et al. 2000,
"Graph structure in the Web").

Beyond-reference operator (cuGraph has no bow-tie API; its building blocks
are `strongly_connected_components`, components/connectivity.py:198-293, and
BFS, traversal/bfs.py:62-183 — this module composes OUR implementations of
the same blocks). Every vertex is assigned to exactly one Broder class:

- ``CORE``          — the largest SCC (ties by smallest canonical label);
- ``IN``            — reaches CORE, not in it;
- ``OUT``           — reachable from CORE, not in it;
- ``TUBES``         — in the giant weak component, outside CORE/IN/OUT,
                      reachable from IN **and** reaching OUT (the Broder
                      "passageways from IN to OUT bypassing the core");
- ``TENDRILS``      — the rest of the giant weak component (hangs off IN,
                      leads into OUT, or floats between tendrils);
- ``DISCONNECTED``  — outside the giant weak component.

Physical shape, sized for a 10^12-edge crawl graph:

- one SCC run + one WCC run (both already scale-audited superstep loops);
- FOUR set-reachability fixpoints (forward/backward from CORE, forward
  from IN, backward from OUT). Each superstep is ONE shuffle: an edge join
  against the persisted hash-partitioned frontier followed by a distinct
  + anti-join against the accumulated reach set — the frontier SHRINKS to
  the undiscovered boundary every round, so total work is O(E · diameter
  of the undiscovered region), not O(E · diameter) per round;
- class assignment is a single pass of left-anti/left-semi flag joins —
  no driver-side vertex state ever; only per-round frontier counts and the
  two (label,count) argmax rows reach the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import release_plan, truncate_plan
from ..structure.graph import Graph
from .pagerank import no_aqe, pick_partitions
from .scc import strongly_connected_components
from .wcc import weakly_connected_components

CLASSES = ("CORE", "IN", "OUT", "TUBES", "TENDRILS", "DISCONNECTED")


def _reach_from(
    edges: DataFrame, seeds: DataFrame, nparts: int, max_iter: int
) -> DataFrame:
    """All vertices reachable from the ``seeds`` set (inclusive) over
    ``edges`` — frontier fixpoint, one shuffle per superstep, lineage
    truncated every round. ``seeds``/result: DF[vertex]."""
    reached = truncate_plan(seeds.select("vertex").distinct())
    frontier = reached
    prev_reached = None
    it = 0
    while it < max_iter:
        it += 1
        nxt = truncate_plan(
            edges.join(
                frontier.select(F.col("vertex").alias("src")).repartition(
                    nparts, "src"
                ),
                on="src",
            )
            .select(F.col("dst").alias("vertex"))
            .distinct()
            .join(reached, on="vertex", how="left_anti")
        )
        if frontier is not reached:
            release_plan(frontier)
        if nxt.isEmpty():
            release_plan(nxt)
            break
        nxt_reached = truncate_plan(reached.unionByName(nxt))
        release_plan(prev_reached)
        prev_reached = reached
        reached = nxt_reached
        frontier = nxt
    release_plan(prev_reached)
    return reached


def bowtie_structure(graph: Graph, max_iter: int = 200) -> DataFrame:
    """DF[vertex, cls] — one row per vertex of ``graph``, ``cls`` one of
    :data:`CLASSES`. ``graph`` must be directed (a bow tie of an undirected
    graph degenerates to CORE + DISCONNECTED and is almost certainly a
    caller bug)."""
    if not graph.directed:
        raise ValueError("bowtie_structure requires a directed graph")
    spark = graph.edges.sparkSession

    # external-id edge space so the scc/wcc outputs join directly
    edges = graph.edges.select("src", "dst")
    if graph.renumbered:
        edges = graph.unrenumber(edges, "src")
        edges = graph.unrenumber(edges, "dst")
    nparts = pick_partitions(spark, edges.count(), None)
    edges = edges.repartition(nparts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    redges = (
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    scc = strongly_connected_components(graph).persist(StorageLevel.MEMORY_AND_DISK)
    core_row = (
        scc.groupBy("labels")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("labels"))
        .limit(1)
        .collect()[0]
    )
    core = truncate_plan(
        scc.filter(F.col("labels") == F.lit(core_row["labels"])).select("vertex")
    )

    wcc = weakly_connected_components(graph).persist(StorageLevel.MEMORY_AND_DISK)
    giant_row = (
        wcc.groupBy("labels")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("labels"))
        .limit(1)
        .collect()[0]
    )

    with no_aqe(spark, nparts):
        fwd_core = _reach_from(edges, core, nparts, max_iter)
        bwd_core = _reach_from(redges, core, nparts, max_iter)
        in_set = truncate_plan(bwd_core.join(core, on="vertex", how="left_anti"))
        out_set = truncate_plan(fwd_core.join(core, on="vertex", how="left_anti"))
        fwd_in = _reach_from(edges, in_set, nparts, max_iter)
        bwd_out = _reach_from(redges, out_set, nparts, max_iter)

    def flag(base: DataFrame, s: DataFrame, name: str) -> DataFrame:
        return base.join(
            s.select("vertex", F.lit(True).alias(name)), on="vertex", how="left"
        )

    # scc covers every vertex (isolated included) — it is the universe
    out = scc.select("vertex")
    out = flag(out, core, "__core")
    out = flag(out, in_set, "__in")
    out = flag(out, out_set, "__out")
    out = flag(out, fwd_in, "__fin")
    out = flag(out, bwd_out, "__bout")
    out = out.join(wcc.select("vertex", F.col("labels").alias("__w")), on="vertex")
    result = out.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.when(F.col("__core"), F.lit("CORE"))
        .when(F.col("__in"), F.lit("IN"))
        .when(F.col("__out"), F.lit("OUT"))
        .when(F.col("__w") != F.lit(giant_row["labels"]), F.lit("DISCONNECTED"))
        .when(F.col("__fin") & F.col("__bout"), F.lit("TUBES"))
        .otherwise(F.lit("TENDRILS"))
        .alias("cls"),
    )
    result = truncate_plan(result)
    for h in (fwd_core, bwd_core, in_set, out_set, fwd_in, bwd_out, core):
        release_plan(h)
    for p in (edges, redges, scc, wcc):
        p.unpersist()
    return result
