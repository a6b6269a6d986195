"""Link-prediction similarity coefficients: Jaccard, Overlap, Sørensen.

Reference: link_prediction/jaccard.py:23-185 (default vertex pairs = the
graph's existing edges, :35-42), overlap.py:22-105, sorensen.py:23-153;
kernels cpp/src/link_prediction/jaccard.cu (per-pair neighbor-set
intersection). Weighted variants (jaccard_w etc.) use the sum of vertex
weights over the intersection/union; v1 implements the unweighted family.

Relational mapping (SURVEY §2.2 two-hop shape): for pair (u, v),
|N(u) ∩ N(v)| is a wedge count — join the undirected edge table with itself
through the common neighbor, then count per pair; degrees give the
denominators:
    jaccard  = |∩| / (deg(u) + deg(v) − |∩|)
    overlap  = |∩| / min(deg(u), deg(v))
    sorensen = 2|∩| / (deg(u) + deg(v))
All hash joins + hash aggs, map-side combined; no windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges, upper_triangle


def _pair_common_neighbors(graph: Graph, vertex_pair: DataFrame | None):
    """(first, second, cn, deg_first, deg_second) for the requested pairs."""
    edges = graph.edges.select("src", "dst")
    if graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    edges = edges.filter(F.col("src") != F.col("dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if vertex_pair is None:
        # default: the existing (undirected) edges (jaccard.py:35-42)
        pairs = upper_triangle(edges).select(
            F.col("src").alias("first"), F.col("dst").alias("second")
        )
    else:
        pairs = vertex_pair.select("first", "second")
    a = edges.select(F.col("src").alias("first"), F.col("dst").alias("nbr"))
    b = edges.select(F.col("src").alias("second"), F.col("dst").alias("nbr"))
    cn = (
        pairs.join(a, on="first")
        .join(b, on=["second", "nbr"], how="leftsemi")
        .groupBy("first", "second")
        .agg(F.count("*").alias("cn"))
    )
    deg = edges.groupBy(F.col("src").alias("vertex")).agg(F.count("*").alias("deg"))
    out = (
        pairs.join(cn, on=["first", "second"], how="left")
        .fillna(0, subset=["cn"])
        .join(deg.select(F.col("vertex").alias("first"), F.col("deg").alias("deg_first")), on="first", how="left")
        .join(deg.select(F.col("vertex").alias("second"), F.col("deg").alias("deg_second")), on="second", how="left")
        .fillna(0, subset=["deg_first", "deg_second"])
    )
    return out


def _finish(graph: Graph, df: DataFrame, coeff_col, name: str) -> DataFrame:
    out = df.select(
        F.col("first").alias("source"),
        F.col("second").alias("destination"),
        coeff_col.alias(name),
    )
    if graph.renumbered:
        out = graph.unrenumber(graph.unrenumber(out, "source"), "destination")
    return out


def jaccard(graph: Graph, vertex_pair: DataFrame | None = None) -> DataFrame:
    """DF[source, destination, jaccard_coeff]."""
    d = _pair_common_neighbors(graph, vertex_pair)
    denom = F.col("deg_first") + F.col("deg_second") - F.col("cn")
    coeff = F.when(denom > 0, F.col("cn") / denom).otherwise(F.lit(0.0))
    return _finish(graph, d, coeff, "jaccard_coeff")


def overlap(graph: Graph, vertex_pair: DataFrame | None = None) -> DataFrame:
    """DF[source, destination, overlap_coeff]."""
    d = _pair_common_neighbors(graph, vertex_pair)
    denom = F.least("deg_first", "deg_second")
    coeff = F.when(denom > 0, F.col("cn") / denom).otherwise(F.lit(0.0))
    return _finish(graph, d, coeff, "overlap_coeff")


def sorensen(graph: Graph, vertex_pair: DataFrame | None = None) -> DataFrame:
    """DF[source, destination, sorensen_coeff]."""
    d = _pair_common_neighbors(graph, vertex_pair)
    denom = F.col("deg_first") + F.col("deg_second")
    coeff = F.when(denom > 0, 2.0 * F.col("cn") / denom).otherwise(F.lit(0.0))
    return _finish(graph, d, coeff, "sorensen_coeff")


# --- weighted variants (jaccard_w / overlap_w / sorensen_w) -----------------
# Reference: link_prediction/wjaccard.py / woverlap.py / wsorensen.py —
# per-VERTEX weights; coefficient = sum of weights over the neighbor-set
# intersection vs union / min-set / sum-of-sets.


def _pair_weighted(graph: Graph, weights: DataFrame, vertex_pair: DataFrame | None):
    edges = graph.edges.select("src", "dst")
    if graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    edges = edges.filter(F.col("src") != F.col("dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    wtab = weights.select(
        F.col("vertex").alias("nbr"), F.col("weight").cast("double").alias("wv")
    )
    if vertex_pair is None:
        pairs = upper_triangle(edges).select(
            F.col("src").alias("first"), F.col("dst").alias("second")
        )
    else:
        pairs = vertex_pair.select("first", "second")
    a = edges.select(F.col("src").alias("first"), F.col("dst").alias("nbr"))
    b = edges.select(F.col("src").alias("second"), F.col("dst").alias("nbr"))
    inter = (
        pairs.join(a, on="first")
        .join(b, on=["second", "nbr"], how="leftsemi")
        .join(wtab, on="nbr")
        .groupBy("first", "second")
        .agg(F.sum("wv").alias("w_inter"))
    )
    setw = (
        edges.join(wtab, on=F.col("dst") == F.col("nbr"))
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.sum("wv").alias("w_set"))
    )
    return (
        pairs.join(inter, on=["first", "second"], how="left")
        .fillna(0.0, subset=["w_inter"])
        .join(
            setw.select(F.col("vertex").alias("first"), F.col("w_set").alias("wa")),
            on="first",
            how="left",
        )
        .join(
            setw.select(F.col("vertex").alias("second"), F.col("w_set").alias("wb")),
            on="second",
            how="left",
        )
        .fillna(0.0, subset=["wa", "wb"])
    )


def jaccard_w(graph: Graph, weights: DataFrame, vertex_pair: DataFrame | None = None) -> DataFrame:
    d = _pair_weighted(graph, weights, vertex_pair)
    denom = F.col("wa") + F.col("wb") - F.col("w_inter")
    coeff = F.when(denom > 0, F.col("w_inter") / denom).otherwise(F.lit(0.0))
    return _finish(graph, d, coeff, "jaccard_coeff")


def overlap_w(graph: Graph, weights: DataFrame, vertex_pair: DataFrame | None = None) -> DataFrame:
    d = _pair_weighted(graph, weights, vertex_pair)
    denom = F.least("wa", "wb")
    coeff = F.when(denom > 0, F.col("w_inter") / denom).otherwise(F.lit(0.0))
    return _finish(graph, d, coeff, "overlap_coeff")


def sorensen_w(graph: Graph, weights: DataFrame, vertex_pair: DataFrame | None = None) -> DataFrame:
    d = _pair_weighted(graph, weights, vertex_pair)
    denom = F.col("wa") + F.col("wb")
    coeff = F.when(denom > 0, 2.0 * F.col("w_inter") / denom).otherwise(F.lit(0.0))
    return _finish(graph, d, coeff, "sorensen_coeff")


# --- beyond-reference coefficients -------------------------------------------
# Adamic-Adar / resource allocation (Zhou-Lu-Zhang 2009) / preferential
# attachment / cosine — the standard common-neighbor link-prediction family
# the fork stops short of (it ships only jaccard/overlap/sorensen; upstream
# cuGraph later added cosine). Same wedge-count physical plan as
# _pair_common_neighbors, but the common neighbor w is kept as a row (inner
# join instead of leftsemi) so its degree can weight the sum:
#     adamic_adar           = sum_w 1 / ln(deg(w))
#     resource_allocation   = sum_w 1 / deg(w)
#     preferential_attachment = deg(u) * deg(v)
#     cosine                = |∩| / sqrt(deg(u) * deg(v))
# ``link_scores`` exposes the EXACT-INTEGER building blocks (cn, pa,
# ra_e9 = sum_w 1e9 DIV deg(w)) so the driver oracle replays them
# bit-for-bit; the coefficient APIs derive the float columns from them.

RA_SCALE = 1_000_000_000


def _pair_cn_degree_scores(graph: Graph, vertex_pair: DataFrame | None):
    """(first, second, cn, ra_e9, aa, deg_first, deg_second): per-pair
    common-neighbor count plus degree-weighted sums over the common
    neighbors (deg(w) >= 2 for any common neighbor, so ln(deg) > 0)."""
    edges = graph.edges.select("src", "dst")
    if graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    edges = edges.filter(F.col("src") != F.col("dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if vertex_pair is None:
        pairs = upper_triangle(edges).select(
            F.col("src").alias("first"), F.col("dst").alias("second")
        )
    else:
        pairs = vertex_pair.select("first", "second")
    deg = edges.groupBy(F.col("src").alias("vertex")).agg(F.count("*").alias("deg"))
    a = edges.select(F.col("src").alias("first"), F.col("dst").alias("nbr"))
    b = edges.select(F.col("src").alias("second"), F.col("dst").alias("nbr"))
    cn = (
        pairs.join(a, on="first")
        .join(b, on=["second", "nbr"])
        .join(deg.select(F.col("vertex").alias("nbr"), F.col("deg").alias("d_n")), on="nbr")
        .groupBy("first", "second")
        .agg(
            F.count("*").alias("cn"),
            F.sum(F.expr(f"{RA_SCALE} DIV d_n")).alias("ra_e9"),
            F.sum(F.lit(1.0) / F.log(F.col("d_n").cast("double"))).alias("aa"),
        )
    )
    return (
        pairs.join(cn, on=["first", "second"], how="left")
        .fillna(0, subset=["cn", "ra_e9"])
        .fillna(0.0, subset=["aa"])
        .join(deg.select(F.col("vertex").alias("first"), F.col("deg").alias("deg_first")), on="first", how="left")
        .join(deg.select(F.col("vertex").alias("second"), F.col("deg").alias("deg_second")), on="second", how="left")
        .fillna(0, subset=["deg_first", "deg_second"])
    )


def link_scores(graph: Graph, vertex_pair: DataFrame | None = None) -> DataFrame:
    """DF[source, destination, cn, pa, ra_e9] — exact-integer link-prediction
    building blocks (driver-oracle surface). ``ra_e9`` uses integer division
    (1e9 DIV deg) so both engines compute identical BIGINTs."""
    d = _pair_cn_degree_scores(graph, vertex_pair)
    out = d.select(
        F.col("first").alias("source"),
        F.col("second").alias("destination"),
        F.col("cn").cast("long").alias("cn"),
        (F.col("deg_first") * F.col("deg_second")).cast("long").alias("pa"),
        F.col("ra_e9").cast("long").alias("ra_e9"),
    )
    if graph.renumbered:
        out = graph.unrenumber(graph.unrenumber(out, "source"), "destination")
    return out


def adamic_adar(graph: Graph, vertex_pair: DataFrame | None = None) -> DataFrame:
    """DF[source, destination, adamic_adar_coeff]."""
    d = _pair_cn_degree_scores(graph, vertex_pair)
    return _finish(graph, d, F.col("aa"), "adamic_adar_coeff")


def resource_allocation(graph: Graph, vertex_pair: DataFrame | None = None) -> DataFrame:
    """DF[source, destination, resource_allocation_coeff]."""
    d = _pair_cn_degree_scores(graph, vertex_pair)
    return _finish(
        graph, d, F.col("ra_e9").cast("double") / F.lit(float(RA_SCALE)),
        "resource_allocation_coeff",
    )


def preferential_attachment(graph: Graph, vertex_pair: DataFrame | None = None) -> DataFrame:
    """DF[source, destination, preferential_attachment_coeff] (exact long)."""
    d = _pair_cn_degree_scores(graph, vertex_pair)
    return _finish(
        graph, d, (F.col("deg_first") * F.col("deg_second")).cast("long"),
        "preferential_attachment_coeff",
    )


def cosine(graph: Graph, vertex_pair: DataFrame | None = None) -> DataFrame:
    """DF[source, destination, cosine_coeff] — |∩| / sqrt(deg(u)·deg(v))."""
    d = _pair_cn_degree_scores(graph, vertex_pair)
    denom = F.sqrt((F.col("deg_first") * F.col("deg_second")).cast("double"))
    coeff = F.when(denom > 0, F.col("cn") / denom).otherwise(F.lit(0.0))
    return _finish(graph, d, coeff, "cosine_coeff")
