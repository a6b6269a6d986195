"""Clustering quality metrics: modularity, edge cut, ratio cut.

Reference: community/spectral_clustering.py:20-368 exposes
`analyzeClustering_modularity`, `analyzeClustering_edge_cut`,
`analyzeClustering_ratio_cut` (kernel cpp/src/community/legacy/
spectral_clustering.cu). The spectral *clustering* itself needs an
eigensolver and stays out of scope; the metrics are pure relational
aggregations and are implemented here (they score any labeling — ours
typically comes from LPA/WCC).

Definitions (undirected, weighted; m = total edge weight):
- modularity  Q = Σ_c (in_c / m  −  (tot_c / (2m))²)
  with in_c = weight inside cluster c (each undirected edge once),
  tot_c = summed degree-weight of c;
- edge cut    = total weight of edges crossing clusters (each pair once);
- ratio cut   = Σ_c cut_c / |c|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..structure.graph import Graph
from ..structure.symmetrize import upper_triangle


def _labeled_edges(graph: Graph, labels: DataFrame):
    """Undirected edge rows (upper triangle) tagged with both endpoints'
    cluster ids. `labels`: DF[vertex, labels] in internal ids."""
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    e = upper_triangle(graph.edges).select("src", "dst", w.alias("w"))
    lab = labels.select("vertex", F.col("labels").alias("c"))
    return (
        e.join(lab.withColumnRenamed("vertex", "src").withColumnRenamed("c", "c_src"), on="src")
        .join(lab.withColumnRenamed("vertex", "dst").withColumnRenamed("c", "c_dst"), on="dst")
    )


def analyze_clustering_modularity(graph: Graph, labels: DataFrame) -> float:
    le = _labeled_edges(graph, labels).cache()
    m = le.agg(F.sum("w")).collect()[0][0] or 0.0
    if m == 0:
        return 0.0
    inside = (
        le.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy("c_src")
        .agg(F.sum("w").alias("in_w"))
        .withColumnRenamed("c_src", "c")
    )
    tot = (
        le.select(F.col("c_src").alias("c"), "w")
        .unionByName(le.select(F.col("c_dst").alias("c"), "w"))
        .groupBy("c")
        .agg(F.sum("w").alias("tot_w"))
    )
    q = (
        tot.join(inside, on="c", how="left")
        .select(
            (
                F.coalesce(F.col("in_w"), F.lit(0.0)) / F.lit(m)
                - (F.col("tot_w") / F.lit(2.0 * m)) ** 2
            ).alias("term")
        )
        .agg(F.sum("term"))
        .collect()[0][0]
    )
    le.unpersist()
    return float(q)


def analyze_clustering_edge_cut(graph: Graph, labels: DataFrame) -> float:
    le = _labeled_edges(graph, labels)
    cut = le.filter(F.col("c_src") != F.col("c_dst")).agg(F.sum("w")).collect()[0][0]
    return float(cut or 0.0)


def analyze_clustering_ratio_cut(graph: Graph, labels: DataFrame) -> float:
    le = _labeled_edges(graph, labels).cache()
    sizes = labels.groupBy(F.col("labels").alias("c")).agg(F.count("*").alias("n"))
    cut_per = (
        le.filter(F.col("c_src") != F.col("c_dst"))
        .select(F.col("c_src").alias("c"), "w")
        .unionByName(
            le.filter(F.col("c_src") != F.col("c_dst")).select(
                F.col("c_dst").alias("c"), "w"
            )
        )
        .groupBy("c")
        .agg(F.sum("w").alias("cut_w"))
    )
    out = (
        sizes.join(cut_per, on="c", how="left")
        .select((F.coalesce(F.col("cut_w"), F.lit(0.0)) / F.col("n")).alias("r"))
        .agg(F.sum("r"))
        .collect()[0][0]
    )
    le.unpersist()
    return float(out or 0.0)
