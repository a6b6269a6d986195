"""Exact triangle counting via degree-ordered edge orientation.

Reference: community/triangle_count.py:19-57 (undirected graphs only,
raises otherwise :52-53; returns a host int64 scalar :33-37); kernel
cpp/src/community/legacy/triangles_counting.cu:198-858 — per-row adjacency
set intersection with per-degree-class kernels (bitmap/shared/warp/thread).

Spark mapping (SURVEY §2.5): orient each undirected edge from the
lower-(degree, id) endpoint to the higher one — the standard orientation
that bounds every vertex's oriented out-degree by O(sqrt(E)), which is what
makes the self-join skew-resistant on power-law graphs (the relational
analogue of the reference's degree-class dispatch). Then

    triangles = |(u,v) ⋈ (v,w) ⋈ (u,w)|

over the oriented edge set: two hash joins, no windows, no UDFs. Exact
integer result.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph


def triangle_count(graph: Graph, num_partitions: int | None = None) -> int:
    if graph.directed:
        # triangle_count.py:52-53 — undirected input required
        raise ValueError("input graph must be undirected")
    spark = graph.edges.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    deg = graph.degree()  # total degree incl. both directions of each edge
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    d_src = deg.select(F.col("vertex").alias("src"), F.col("degree").alias("ds"))
    d_dst = deg.select(F.col("vertex").alias("dst"), F.col("degree").alias("dd"))
    oriented = (
        e.join(d_src, on="src")
        .join(d_dst, on="dst")
        .filter(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    b = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    c = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = a.join(b, on="v")
    n = wedges.join(c, on=["u", "w"], how="leftsemi").count()
    oriented.unpersist()
    return int(n)
