"""Reference-name compatibility layer.

The reference's public import surface (python/cugraph/cugraph/__init__.py:
14-110) exposes several aliases and convenience sinks beyond the core
operators. This module provides 1:1 names so a reference user can switch
imports without renaming call sites. Every function is a thin delegation —
no logic lives here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .algorithms.link_prediction import jaccard, overlap, sorensen
from .algorithms.scc import strongly_connected_components
from .algorithms.triangles import triangle_count
from .structure.graph import Graph, from_pandas_edgelist
from .structure.symmetrize import symmetrize_edges, upper_triangle


def triangles(G: Graph) -> int:
    """Reference name for the triangle count (community/triangle_count.py:
    19-57 — returns the int64 total)."""
    return triangle_count(G)


def jaccard_coefficient(G: Graph, ebunch: DataFrame | None = None) -> DataFrame:
    """NetworkX-compat alias (link_prediction/jaccard.py:126-185)."""
    return jaccard(G, vertex_pair=ebunch)


def overlap_coefficient(G: Graph, ebunch: DataFrame | None = None) -> DataFrame:
    """NetworkX-compat alias (link_prediction/overlap.py)."""
    return overlap(G, vertex_pair=ebunch)


def sorensen_coefficient(G: Graph, ebunch: DataFrame | None = None) -> DataFrame:
    """NetworkX-compat alias (link_prediction/sorensen.py)."""
    return sorensen(G, vertex_pair=ebunch)


def symmetrize_df(
    df: DataFrame,
    src_name: str = "src",
    dst_name: str = "dst",
    multi: bool = False,
    symmetrize: bool = True,
) -> DataFrame:
    """structure/symmetrize.py:20-85 public name. Weight column (any column
    besides src/dst) is carried through the dedup-min."""
    others = [c for c in df.columns if c not in (src_name, dst_name)]
    weight = others[0] if others else None
    return symmetrize_edges(
        df, src=src_name, dst=dst_name, weight=weight,
        symmetrize=symmetrize, multi=multi,
    )


def symmetrize_ddf(
    df: DataFrame, src_name: str = "src", dst_name: str = "dst",
    weight_name: str | None = None,
) -> DataFrame:
    """Distributed variant (structure/symmetrize.py:88-150) — collapses
    into the same DataFrame program here (Spark is always distributed)."""
    return symmetrize_edges(df, src=src_name, dst=dst_name, weight=weight_name)


def symmetrize(
    df: DataFrame,
    src_name: str = "src",
    dst_name: str = "dst",
    value_name: str | None = None,
    multi: bool = False,
    symmetrize: bool = True,
) -> DataFrame:
    """structure/symmetrize.py:155-238. DEVIATION: the reference takes bare
    cudf columns (source_col, dest_col, value_col); Spark columns only
    exist inside a DataFrame, so this takes the DataFrame + column names."""
    return symmetrize_edges(
        df, src=src_name, dst=dst_name, weight=value_name,
        symmetrize=symmetrize, multi=multi,
    )


def is_weighted(G: Graph) -> bool:
    """structure/graph_classes.py:863."""
    return bool(G.weighted)


def subgraph(G: Graph, vertices) -> Graph:
    """community/subgraph_extraction.py:22-89 — induced subgraph on a vertex
    list or single-column DataFrame."""
    if not isinstance(vertices, DataFrame):
        spark = G.edges.sparkSession
        vertices = spark.createDataFrame([(v,) for v in vertices], ["vertex"])
    return G.subgraph(vertices)


def from_edgelist(df, source="source", destination="destination",
                  edge_attr=None, create_using=None, **kw) -> Graph:
    """structure/convert_matrix.py:30-90 dispatch: pandas DataFrame or Spark
    DataFrame in, Graph out. ``create_using`` accepts the Graph class or an
    instance-style flag object with a ``directed`` attribute."""
    import pandas as pd

    directed = bool(getattr(create_using, "directed", False)) or (
        getattr(create_using, "__name__", "") in ("DiGraph", "MultiDiGraph")
    )
    if isinstance(df, pd.DataFrame):
        spark = kw.pop("spark", None)
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.active()
        return from_pandas_edgelist(
            spark, df, source=source, destination=destination,
            edge_attr=edge_attr, directed=directed, **kw,
        )
    return Graph.from_edgelist(
        df, src=source, dst=destination, weight=edge_attr, directed=directed, **kw
    )


def to_pandas_edgelist(G: Graph):
    """simpleGraph.py:182-197 sink (upper triangle for undirected)."""
    return G.view_edge_list().toPandas()


def _dense(G: Graph):
    import numpy as np

    n = G.number_of_vertices()
    a = np.zeros((n, n))
    w = F.col("weight") if G.weighted else F.lit(1.0)
    for r in G.edges.select("src", "dst", w.alias("w")).collect():
        a[r.src][r.dst] = r.w
    return a


def to_numpy_array(G: Graph):
    """graph_classes.py to_numpy_array — dense adjacency. Driver-side sink:
    O(V^2) memory by definition, test/inspection scale only."""
    return _dense(G)


def to_numpy_matrix(G: Graph):
    import numpy as np

    return np.asmatrix(_dense(G))


def to_pandas_adjacency(G: Graph):
    import pandas as pd

    n = G.number_of_vertices()
    idx = list(range(n))
    return pd.DataFrame(_dense(G), index=idx, columns=idx)


def strong_connected_component(G: Graph) -> DataFrame:
    """proto/components alias — superseded by the trim+coloring SCC
    (algorithms/scc.py); kept for import parity."""
    return strongly_connected_components(G)
