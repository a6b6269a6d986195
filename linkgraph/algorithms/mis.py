"""Maximal independent set — Luby's algorithm (Luby 1986) with
DETERMINISTIC LCG priorities.

Absent from the reference fork (no MIS under cpp/src or python/cugraph —
modern cuGraph grew one later); specced from the published algorithm with
the repo's determinism rule (SURVEY §2.5): the random priority draw is
replaced by the fixed 31-bit LCG hash already used for seeds/sampling,
tie-broken by vertex id, so every run — and the DuckDB driver oracle —
selects the identical set.

Per round, on the symmetrized self-loop-free graph restricted to ACTIVE
vertices:

    key(v)   = ((A * v + C) mod 2^31) * 2^32 + v        (unique BIGINT)
    winners  = { v : key(v) < min key(u) over active neighbors u }
               (vertices with no active neighbor win unconditionally)
    MIS     += winners;  active -= winners ∪ N(winners)

Every round is one E-scale map-side-combined (dst, min key) aggregation
plus semi/anti joins keyed the same way — no windows, no driver state
beyond one scalar count per round (the loop-termination action). Luby
guarantees expected-constant fraction of edges removed per round, ~O(log
V) rounds; each round's edge table shrinks, is re-persisted
hash-partitioned, and the superseded plan is released (the repo's
iterative-plan hygiene).

100-TB: the per-round aggregation collapses hub in-neighborhoods in
partial agg (min is commutative), the active-set joins are all on the
vertex hash partitioning, and the output is a V-row frame. Rounds are
data-independent of hub degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges
from .pagerank import no_aqe, pick_partitions

MIS_LCG_A = 1103515245
MIS_LCG_C = 12345
MIS_LCG_M = 1 << 31


def _key(col):
    h = (MIS_LCG_A * col + MIS_LCG_C) % MIS_LCG_M
    return (h * F.lit(1 << 32) + col).cast("long")


def maximal_independent_set(
    graph: Graph,
    max_iter: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, in_mis] (in_mis ∈ {0, 1}) covering every vertex.

    Deterministic: the LCG-keyed Luby selection admits exactly one MIS
    per graph, replayed verbatim by the driver oracle (query ``mis``).

    Vertex ids must be non-negative and < 2^32 (renumber=True guarantees
    dense ids) — required for the BIGINT key packing and for ``%`` parity
    with the SQL oracle dialect.
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

    verts = (
        graph.vertices()
        .select("vertex")
        .repartition(nparts, "vertex")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    all_verts = verts
    mis_parts: list[DataFrame] = []

    with no_aqe(spark, nparts):
        it = 0
        while it < max_iter:
            it += 1
            # min active-neighbor key per active vertex: E-scale partial agg
            min_nb = edges.groupBy("dst").agg(F.min(_key(F.col("src"))).alias("mk"))
            winners = (
                verts.join(min_nb, verts.vertex == min_nb.dst, "left")
                .filter(F.col("mk").isNull() | (_key(F.col("vertex")) < F.col("mk")))
                .select("vertex")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            # no winners.count() action: active non-empty always yields a
            # winner under Luby (the global-min key wins unconditionally),
            # and the empty-actives case breaks at new_verts.count() below
            # — the one scalar action per round. The persist materializes
            # with that same action.
            mis_parts.append(winners)

            # removed = winners ∪ N(winners); ONE distinct on the union
            # (an inner distinct on nbrs would be subsumed by it — same
            # set, one aggregation instead of two)
            nbrs = edges.join(
                winners.select(F.col("vertex").alias("src")), on="src", how="leftsemi"
            ).select(F.col("dst").alias("vertex"))
            removed = winners.select("vertex").union(nbrs).distinct()
            new_verts = (
                verts.join(removed, on="vertex", how="left_anti")
                .repartition(nparts, "vertex")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            if new_verts.count() == 0:
                if verts is not all_verts:
                    verts.unpersist()
                verts = new_verts
                break
            keep = new_verts.select(F.col("vertex").alias("k"))
            new_edges = (
                edges.join(keep, edges.src == keep.k, "leftsemi")
                .join(keep, edges.dst == keep.k, "leftsemi")
                .select("src", "dst")
                .repartition(nparts, "dst")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            new_edges.count()
            edges.unpersist()
            if verts is not all_verts:
                verts.unpersist()
            edges, verts = new_edges, new_verts

    mis = mis_parts[0] if mis_parts else all_verts.limit(0)
    for p in mis_parts[1:]:
        mis = mis.union(p)
    out = all_verts.join(
        mis.select("vertex", F.lit(1).alias("in_mis")), on="vertex", how="left"
    ).select("vertex", F.coalesce("in_mis", F.lit(0)).cast("int").alias("in_mis"))
    out = graph.unrenumber(out, "vertex")
    # pin the answer, then free every per-round cache (ADVICE r3: no
    # persisted frames may outlive the call)
    out = out.localCheckpoint(eager=True)
    for p in mis_parts:
        p.unpersist()
    edges.unpersist()
    if verts is not all_verts:
        verts.unpersist()
    all_verts.unpersist()
    return out
