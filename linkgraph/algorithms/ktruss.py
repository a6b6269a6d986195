"""K-truss subgraph: iterative triangle-support edge peeling.

Reference: community/ktruss_subgraph.py:40-166 (`k_truss(G, k)` /
`ktruss_subgraph`); kernel cpp/src/community/legacy/ktruss.cu (150 LoC).
Definition: the maximal subgraph in which every edge participates in at
least (k-2) triangles. Fixpoint is unique, so iterative peeling in any
order converges to the same subgraph as the reference.

Spark shape: per round, count each undirected edge's triangle support with
the same degree-ordered orientation joins as triangle_count (skew-resistant),
drop edges with support < k-2, repeat until stable. Rounds are bounded by
the peeling depth (small in practice); each round is two hash joins + one
hash agg over a shrinking edge set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans import release_plan
from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges
from .pagerank import no_aqe


def ktruss_subgraph(graph: Graph, k: int, max_iter: int = 100) -> Graph:
    """Returns the k-truss subgraph (undirected input required, like
    triangle_count / the reference's ktruss_subgraph)."""
    if graph.directed:
        raise ValueError("input graph must be undirected")
    if k < 3:
        raise ValueError("k must be >= 3")
    spark = graph.edges.sparkSession
    # canonical undirected edge set (u < v)
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # referenced 4x per support round
    )
    need = k - 2
    with no_aqe(spark):
        for _ in range(max_iter):
            # support(u,v) = # common neighbors via wedge joins on the
            # canonical (u<v) edge set: triangle (a<b<c) contributes to all
            # three of (a,b), (b,c), (a,c)
            ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
            ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
            tri = ab.join(bc, on="b").join(ac, on=["a", "c"])  # (a,b,c) triangles
            support = (
                tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
                .unionByName(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
                .unionByName(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
                .groupBy("src", "dst")
                .agg(F.count("*").alias("sup"))
            )
            kept = (
                e.join(support, on=["src", "dst"], how="left")
                .filter(F.coalesce(F.col("sup"), F.lit(0)) >= need)
                .select("src", "dst")
                .localCheckpoint(eager=True)  # referenced 4x next round
            )
            n_before, n_after = e.count(), kept.count()
            release_plan(e)  # kept is eager-materialized; old edge set free
            e = kept
            if n_after == n_before or n_after == 0:
                break
    full = symmetrize_edges(e, weight=None, symmetrize=True)
    return Graph(
        edges=full,
        directed=False,
        weighted=False,
        renumbered=graph.renumbered,
        nmap=graph.nmap,
    )


def k_truss(graph: Graph, k: int) -> Graph:
    """community/ktruss_subgraph.py:40 alias."""
    return ktruss_subgraph(graph, k)
