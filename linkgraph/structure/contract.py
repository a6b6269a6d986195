"""Graph contraction (quotient graph): collapse vertex groups into
super-vertices and aggregate parallel edges.

This is the page-graph → host-graph coarsening a Common-Crawl-scale link
pipeline runs before host-level ranking, and the same relational shape the
Louvain dendrogram uses internally between levels
(``louvain.py`` coarsen step; reference: cpp coarsen_graph —
``python/cugraph/cugraph/community/louvain.py:60-78`` exposes it only
implicitly through the dendrogram).  Here it is a public operator over an
arbitrary vertex→group assignment.

100-TB shape: two hash joins of the edge table against the assignment
(broadcast when the assignment is small, else both sides hash-partitioned
on the join key) followed by ONE map-side-combined aggregation on
(group_src, group_dst).  The output is |groups|²-bounded but in practice
tiny relative to E (hosts ≪ pages), so every downstream algorithm runs on
a graph orders of magnitude smaller — the contraction itself is the only
E-scale pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..algorithms.pagerank import BROADCAST_STATE_MAX_V, pick_partitions
from .graph import Graph


def contract_vertices(
    graph: Graph,
    assignments: DataFrame,
    vertex_col: str = "vertex",
    group_col: str = "group",
    self_loops: bool = False,
    num_partitions: int | None = None,
) -> Graph:
    """Contract ``graph`` by the vertex→group ``assignments``.

    ``assignments`` must be keyed by the graph's INTERNAL vertex ids (the
    id domain of ``graph.edges``; for a renumbered graph apply
    ``graph.nmap`` first) and should cover every edge endpoint — edges
    with an unassigned endpoint are dropped (inner-join semantics, so
    composing ``induced_subgraph`` → ``contract_vertices`` needs no
    dummy groups).  Group ids must be non-negative longs (they become the
    contracted graph's vertex ids under the same max+1 universe rule).

    Edge weights of parallel edges are summed (1.0/edge when the input is
    unweighted — multiplicity count); ``self_loops=False`` drops
    intra-group edges after contraction.
    """
    spark = graph.edges.sparkSession
    amap = assignments.select(
        F.col(vertex_col).cast("long").alias("vertex"),
        F.col(group_col).cast("long").alias("group"),
    )
    bcast = amap.count() <= BROADCAST_STATE_MAX_V
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)

    def _side(key):
        m = amap.select(F.col("vertex").alias(key), F.col("group").alias(f"g_{key}"))
        return F.broadcast(m) if bcast else m.repartition(nparts, key)

    w = F.col("weight") if graph.weighted else F.lit(1.0)
    contracted = (
        graph.edges.select("src", "dst", w.alias("w"))
        .join(_side("src"), on="src")
        .join(_side("dst"), on="dst")
        .groupBy(F.col("g_src").alias("src"), F.col("g_dst").alias("dst"))
        .agg(F.sum("w").alias("weight"))
    )
    if not self_loops:
        contracted = contracted.filter(F.col("src") != F.col("dst"))
    return Graph(
        edges=contracted,
        directed=graph.directed,
        weighted=True,
        renumbered=False,
        multi=False,
    )


HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def host_of(url):
    """Host component of a URL column — pure JVM ``regexp_extract``
    (scheme-generic authority per RFC 3986), empty string when the value
    is not a URL."""
    return F.regexp_extract(url, HOST_RE, 1)


def host_edges(url_edges: DataFrame, src: str = "src_url", dst: str = "dst_url") -> DataFrame:
    """Collapse a url→url link table to a weighted host→host edge table:
    DF[src_host, dst_host, weight] with weight = number of page-level
    links, cross-host only.  One projection + one map-side-combined
    aggregation; no UDFs."""
    return (
        url_edges.select(
            host_of(F.col(src)).alias("src_host"),
            host_of(F.col(dst)).alias("dst_host"),
        )
        .filter(
            (F.col("src_host") != F.col("dst_host"))
            & (F.col("src_host") != "")
            & (F.col("dst_host") != "")
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
