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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph


def _edge_degrees(edges: DataFrame) -> DataFrame:
    """DF[vertex, degree] for every vertex APPEARING in the edge table —
    one exploded map-side-combined aggregation instead of Graph.degree()'s
    two aggregations + three vertex-universe joins. Identical values
    (in-degree + out-degree over the same rows); the orientation only ever
    compares degrees of existing edge endpoints, so vertices outside the
    edge table (degree 0 in Graph.degree()) are irrelevant here."""
    return (
        edges.select(F.explode(F.array("src", "dst")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count("*").alias("degree"))
    )


def triangle_count(graph: Graph, num_partitions: int | None = None) -> int:
    if graph.directed:
        # triangle_count.py:52-53 — undirected input required
        raise ValueError("input graph must be undirected")
    spark = graph.edges.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # persist the (possibly expensive) upstream edge pipeline ONCE — the
    # degree aggregation and the orientation join otherwise each recompute
    # the full symmetrize/dedup lineage (guide §5: cache only genuinely
    # reused frames; this one is scanned 2x here + 3x via `oriented`)
    base = graph.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    deg = _edge_degrees(base)  # total degree incl. both directions of each edge
    e = base.filter(F.col("src") != F.col("dst"))
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
    base.unpersist()
    return int(n)


def triangle_counts(
    graph: Graph, num_partitions: int | None = None
) -> "DataFrame":
    """DF[vertex, counts] — triangles incident to each vertex (every
    triangle contributes 1 to each of its three corners). The reference
    fork returns only the global scalar (community/triangle_count.py:33-37
    — "not the number per vertex"); the per-vertex form is the modern
    cuGraph API shape and what local clustering coefficient needs, so this
    is a small beyond-reference extension of the same oriented plan.

    Plan: the identical degree-ordered orientation and two hash joins as
    :func:`triangle_count`, but the closing join is an inner join (each row
    = one triangle, listed exactly once), then one explode-to-corners
    map-side-combined aggregation. Isolated and triangle-free vertices are
    emitted with 0 over the full [0, V) universe.
    """
    out = _triangle_counts_internal(graph)
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out


def _triangle_counts_internal(graph: Graph, num_partitions: int | None = None) -> DataFrame:
    """DF[vertex, counts] in INTERNAL ids. The V-row result is eagerly
    localCheckpointed so the oriented-edge cache can be released before
    returning (a lazy return would either leak the cache or recompute the
    orientation once per a/b/c scan leg at the caller's action)."""
    if graph.directed:
        raise ValueError("input graph must be undirected")
    from ..plans import truncate_plan

    spark = graph.edges.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    base = graph.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    deg = _edge_degrees(base)
    e = base.filter(F.col("src") != F.col("dst"))
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
    tri = a.join(b, on="v").join(c, on=["u", "w"])  # one row per triangle
    corners = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count("*").alias("counts"))
    )
    out = truncate_plan(
        graph.vertices()
        .join(corners, on="vertex", how="left")
        .select("vertex", F.coalesce(F.col("counts"), F.lit(0)).alias("counts")),
        eager=True,
    )
    oriented.unpersist()
    base.unpersist()
    return out


def clustering_coefficient(
    graph: Graph, num_partitions: int | None = None
) -> "DataFrame":
    """DF[vertex, triangles, nbr_degree, local_cc] — local clustering
    coefficient 2·t(v) / (d·(d−1)) with d = number of DISTINCT neighbors
    excluding self-loops (the quantity the formula is defined over;
    vertices with d < 2 get 0.0). Both operands are exact integers, so the
    double division is correctly rounded and cross-engine identical.

    Joins on INTERNAL ids and unrenumbers once at the end (composite
    external keys expand 'vertex' into multiple columns, so joining after
    unrenumbering would break — and would pay a second map join)."""
    t = _triangle_counts_internal(graph, num_partitions)
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    nd = (
        e.select(F.col("src").alias("vertex"), F.col("dst").alias("n"))
        .distinct()
        .groupBy("vertex")
        .agg(F.count("*").alias("nbr_degree"))
    )
    out = t.join(nd, on="vertex", how="left").select(
        "vertex",
        F.col("counts").alias("triangles"),
        F.coalesce(F.col("nbr_degree"), F.lit(0)).alias("nbr_degree"),
    )
    denom = F.col("nbr_degree") * (F.col("nbr_degree") - 1)
    out = out.withColumn(
        "local_cc",
        F.when(denom > 0, 2.0 * F.col("triangles") / denom).otherwise(F.lit(0.0)),
    )
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out


def _oriented_edges(graph: Graph, nparts: int) -> DataFrame:
    """Degree-ordered orientation (lower (degree, id) -> higher): bounds
    every oriented out-degree by O(sqrt(E)) — the skew bound all motif
    joins here rely on. Caller unpersists."""
    base = graph.edges.select("src", "dst")
    deg = _edge_degrees(base)
    e = base.filter(F.col("src") != F.col("dst"))
    d_src = deg.select(F.col("vertex").alias("src"), F.col("degree").alias("ds"))
    d_dst = deg.select(F.col("vertex").alias("dst"), F.col("degree").alias("dd"))
    return (
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


def four_clique_count(graph: Graph, num_partitions: int | None = None) -> int:
    """Exact K4 (4-clique) count — the next motif after triangles.

    Each K4 is counted exactly once: in the acyclic degree orientation its
    four vertices form one oriented triangle (a,b,c) over its three
    LOWEST-ordered members plus an apex d that all three point to, so

        K4 = |triangles(a,b,c) ⋈ O(a,d) ⋈semi O(b,d) ⋈semi O(c,d)|

    — three more hash joins on the oriented edge set. The same
    O(sqrt(E)) out-degree bound that makes the triangle self-join
    skew-resistant bounds the triangle->apex fan-out here; no windows, no
    UDFs, exact integers. Reference N/A (the 2021 fork counts only
    triangles); beyond-reference motif completion alongside
    `butterflies`.
    """
    if graph.directed:
        raise ValueError("input graph must be undirected")
    spark = graph.edges.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    oriented = _oriented_edges(graph, nparts)

    a = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    b = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    c = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = a.join(b, on="v").join(c, on=["u", "w"])  # (u, v, w), u<v<w ordered
    ou = oriented.select(F.col("src").alias("u"), F.col("dst").alias("x"))
    ov = oriented.select(F.col("src").alias("v"), F.col("dst").alias("x"))
    ow = oriented.select(F.col("src").alias("w"), F.col("dst").alias("x"))
    n = (
        tri.join(ou, on="u")
        .join(ov, on=["v", "x"], how="leftsemi")
        .join(ow, on=["w", "x"], how="leftsemi")
        .count()
    )
    oriented.unpersist()
    return int(n)
