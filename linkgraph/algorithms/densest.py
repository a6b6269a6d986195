"""Densest subgraph — greedy peeling 2(1+eps)-approximation.

Charikar (2000) peeling in the Bahmani-Kumar-Vassilvitskii (VLDB 2012)
MapReduce formulation — THE canonical shuffle-round-bounded densest-
subgraph algorithm, designed for exactly Spark's execution model: per
round remove EVERY vertex whose degree is at most 2(1+eps) times the
current average density, so the vertex set shrinks geometrically and the
number of rounds is log_{1+eps} V (~30 rounds at 10^9 vertices for
eps=0.5) instead of the sequential algorithm's V rounds.

Absent from the reference fork (no densest-subgraph routine under
cpp/src or python/cugraph in the 2021 snapshot); specced from the
published algorithm. Deterministic — no randomness anywhere — and exact:
the density threshold and the best-round argmax are compared with
cross-multiplied BIGINT arithmetic (never a float), so the DuckDB driver
oracle (query ``densest``) replays every peel round and the final
subgraph verbatim.

Definitions (per round t, on the symmetrized self-loop-free edge set):

    active_t  = endpoints of the current edge set (isolated vertices can
                never join the densest subgraph, so they leave the
                working set the moment they are isolated)
    S_t       = directed-row count of the sym edge set  (= 2|E_und|)
    V_t       = |active_t|,  density_t = S_t / (2 V_t) = |E|/|V|
    peel_t    = { v : deg(v) * V_t * q  <=  S_t * (q + p) }   (eps = p/q)

The subgraph returned is active_t* for the t* maximizing density_t
(earliest round on exact ties). Guarantee: density(answer) >=
opt / (2(1+eps)) (Bahmani et al., Theorem 1).

100-TB shape: per round ONE E-scale map-side-combined degree
aggregation + one two-scalar agg action + two semi-joins keyed on the
same vertex hash partitioning; every superseded frame is unpersisted and
only the best active set (V-scale) is retained. No windows, no driver
state beyond two scalars per round.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges
from .pagerank import no_aqe, pick_partitions


def densest_subgraph(
    graph: Graph,
    epsilon: float = 0.5,
    max_iter: int = 256,
    num_partitions: int | None = None,
) -> DataFrame:
    """DF[vertex, density_num, density_den, density_e9] — the vertices of
    the densest peel iterate. density = density_num / density_den =
    |E_und| / |V| of the returned subgraph; density_e9 is the half-up
    scaled integer ``(1e9 * S + V) // (2 V)`` (exact integer rounding,
    identical in the SQL oracle).
    """
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    frac = Fraction(str(epsilon))
    p, q = frac.numerator, frac.denominator

    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)

    edges = graph.edges.select("src", "dst")
    if graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    edges = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    best: tuple[int, int] | None = None  # (S, V) of the best round
    best_set: DataFrame | None = None

    with no_aqe(spark, nparts):
        it = 0
        while it < max_iter:
            it += 1
            deg = (
                edges.groupBy("src")
                .agg(F.count("*").alias("d"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            row = deg.agg(
                F.count("*").alias("vv"), F.sum("d").alias("ss")
            ).collect()[0]  # the one action per round
            vv, ss = row.vv, (row.ss or 0)
            if ss == 0:
                deg.unpersist()
                break
            # strict improvement, exact rational compare (earliest max wins)
            if best is None or ss * best[1] > best[0] * vv:
                if best_set is not None:
                    best_set.unpersist()
                best = (ss, vv)
                best_set = deg.select(F.col("src").alias("vertex")).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                best_set.count()
            # peel everything at or below 2(1+eps) * density
            keep = deg.filter(
                F.col("d") * F.lit(vv) * F.lit(q) > F.lit(ss * (q + p))
            ).select(F.col("src").alias("k"))
            new_edges = (
                edges.join(keep, edges.src == keep.k, "leftsemi")
                .join(keep, edges.dst == keep.k, "leftsemi")
                .select("src", "dst")
                .repartition(nparts, "src")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            new_edges.count()
            edges.unpersist()
            deg.unpersist()
            edges = new_edges

    edges.unpersist()
    if best is None or best_set is None:
        # no edges at all: empty result with the contract schema
        return (
            graph.vertices()
            .limit(0)
            .select(
                "vertex",
                F.lit(0).cast("long").alias("density_num"),
                F.lit(0).cast("long").alias("density_den"),
                F.lit(0).cast("long").alias("density_e9"),
            )
        )
    ss, vv = best
    e9 = (10**9 * ss + vv) // (2 * vv)
    out = best_set.select(
        "vertex",
        F.lit(ss).cast("long").alias("density_num"),
        F.lit(2 * vv).cast("long").alias("density_den"),
        F.lit(e9).cast("long").alias("density_e9"),
    )
    out = graph.unrenumber(out, "vertex")
    out = out.localCheckpoint(eager=True)
    best_set.unpersist()
    return out
