"""Distributed greedy graph coloring — Jones-Plassmann (1993) with
DETERMINISTIC LCG priorities.

Absent from the reference fork (no coloring under cpp/src or
python/cugraph); specced from the published algorithm with the repo's
determinism rule (SURVEY §2.5), sharing the LCG priority key with Luby MIS
(`mis.py` — JP is the coloring refinement of the same independent-set
superstep).

Per round, on the symmetrized self-loop-free graph:

    key(v)  = ((A * v + C) mod 2^31) * 2^32 + v          (unique BIGINT)
    winners = { v uncolored : key(v) < min key(u) over uncolored nbrs u }
    color(v)= mex{ color(u) : u in N(v), u already colored }

Winners form an independent set among the uncolored, so simultaneous
assignment is race-free, and the final coloring is EXACTLY the sequential
greedy coloring in increasing-key order (each vertex's color depends only
on its higher-priority neighbors' colors — the classic JP equivalence),
which is what the driver oracle replays round-for-round.

Physical shape per round: TWO E-scale jobs — one map-side-combined
(dst, min active-neighbor key) aggregation, one winner-semi-joined
neighbor-color gather whose collect_set is bounded by the color count
(<= Δ+1), never raw hub degree, because duplicates collapse in partial
agg — plus one scalar action. Edges persist ONCE, hash-partitioned on
dst; only the V-row active/color frames are rewritten (localCheckpoint
truncates their lineage each round). Rounds = longest decreasing-priority
path, O(log V / log log V) expected under the LCG draw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges
from .mis import _key
from .pagerank import no_aqe, pick_partitions


def greedy_color(
    graph: Graph,
    max_iter: int = 512,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, color] (colors 0..k-1) covering every vertex; no
    edge joins two vertices of the same color.

    Deterministic: the LCG-keyed Jones-Plassmann order admits exactly one
    coloring per graph (the driver oracle ``coloring`` replays it).
    Vertex ids must be non-negative and < 2^32 (renumber=True guarantees
    dense ids), as for `maximal_independent_set`.
    """
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)

    edges = graph.edges.select("src", "dst")
    if graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    edges = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .repartition(nparts, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()

    all_verts = (
        graph.vertices()
        .select("vertex")
        .repartition(nparts, "vertex")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    active = all_verts
    colors: DataFrame | None = None  # DF[vertex, color], grows each round

    mex = F.coalesce(
        F.aggregate(
            F.array_sort(F.collect_set("c")),
            F.lit(0),
            lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
        ),
        F.lit(0),
    )

    with no_aqe(spark, nparts):
        it = 0
        while it < max_iter:
            it += 1
            asrc = active.select(F.col("vertex").alias("src"))
            min_nb = (
                edges.join(asrc, on="src", how="left_semi")
                .groupBy("dst")
                .agg(F.min(_key(F.col("src"))).alias("mk"))
            )
            winners = (
                active.join(min_nb, active.vertex == min_nb.dst, "left")
                .filter(F.col("mk").isNull() | (_key(F.col("vertex")) < F.col("mk")))
                .select("vertex")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            if winners.count() == 0:  # active empty next check; guard anyway
                winners.unpersist()
                break
            # colors of already-colored neighbors; dup colors collapse in
            # partial agg so the gather is color-bounded, not degree-bounded
            if colors is not None:
                nbrc = (
                    edges.join(
                        winners.select(F.col("vertex").alias("dst")),
                        on="dst",
                        how="left_semi",
                    )
                    .join(
                        colors.select(
                            F.col("vertex").alias("src"), F.col("color").alias("c")
                        ),
                        on="src",
                    )
                    .groupBy("dst")
                    .agg(mex.alias("color"))
                )
                newly = winners.join(
                    nbrc, winners.vertex == nbrc.dst, "left"
                ).select(
                    "vertex", F.coalesce("color", F.lit(0)).cast("long").alias("color")
                )
            else:
                newly = winners.select("vertex", F.lit(0).cast("long").alias("color"))
            grown = (
                newly if colors is None else colors.unionByName(newly)
            ).localCheckpoint(eager=True)
            new_active = (
                active.join(winners, on="vertex", how="left_anti")
                .repartition(nparts, "vertex")
                .localCheckpoint(eager=True)
            )
            winners.unpersist()
            if active is not all_verts:
                active.unpersist()
            colors, active = grown, new_active
            if active.count() == 0:
                break
        else:
            raise ValueError(
                f"greedy_color did not converge in {max_iter} rounds"
            )

    out = colors if colors is not None else all_verts.select(
        "vertex", F.lit(0).cast("long").alias("color")
    )
    out = graph.unrenumber(out, "vertex")
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    all_verts.unpersist()
    if active is not all_verts:
        try:
            active.unpersist()
        except Exception:
            pass
    return out
