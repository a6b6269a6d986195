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
    """Dense adjacency + the sorted external vertex labels it is indexed
    by. Rows/columns follow the reference/NetworkX convention of the sorted
    node list (graph_classes.py to_numpy_array), so external ids — sparse,
    non-contiguous, or renumbered away internally — land at their label's
    position, never at their raw value. Driver-side sink: O(V^2) memory by
    definition, test/inspection scale only."""
    import numpy as np

    if G.renumbered and len(G.nmap.key_cols) > 1:
        raise ValueError(
            "dense adjacency is undefined for composite external keys"
        )
    w = F.col("weight") if G.weighted else F.lit(1.0)
    e = G.edges.select("src", "dst", w.alias("w"))
    e = G.unrenumber(G.unrenumber(e, "src"), "dst")
    if G.renumbered:
        key = G.nmap.key_cols[0]
        labels = sorted(r[0] for r in G.nmap.map.select(key).collect())
    else:
        labels = [r[0] for r in G.vertices().orderBy("vertex").collect()]
    idx = {v: i for i, v in enumerate(labels)}
    a = np.zeros((len(labels), len(labels)))
    for r in e.collect():
        a[idx[r.src]][idx[r.dst]] = r.w
    return a, labels


def to_numpy_array(G: Graph):
    """graph_classes.py to_numpy_array — dense adjacency over the sorted
    external node list. Driver-side sink, test/inspection scale only."""
    return _dense(G)[0]


def to_numpy_matrix(G: Graph):
    import numpy as np

    return np.asmatrix(_dense(G)[0])


def to_pandas_adjacency(G: Graph):
    import pandas as pd

    a, labels = _dense(G)
    return pd.DataFrame(a, index=labels, columns=labels)


def strong_connected_component(G: Graph) -> DataFrame:
    """proto/components alias — superseded by the trim+coloring SCC
    (algorithms/scc.py); kept for import parity."""
    return strongly_connected_components(G)


def from_cudf_edgelist(df, source="source", destination="destination",
                       edge_attr=None, create_using=None, **kw) -> Graph:
    """Reference public name (cugraph/__init__.py:39, structure/
    convert_matrix.py:146-205). The reference ingests a cudf DataFrame;
    the engine-native column store here is a Spark DataFrame, so this
    accepts a Spark or pandas DataFrame and dispatches identically to
    :func:`from_edgelist`."""
    return from_edgelist(
        df, source=source, destination=destination,
        edge_attr=edge_attr, create_using=create_using, **kw,
    )


def from_adjlist(offsets, indices, values=None, create_using=Graph, spark=None) -> Graph:
    """Module-level CSR ingest (cugraph/__init__.py:48, structure/
    convert_matrix.py:86-145): pandas/array-like ``offsets``/``indices``
    (+ optional ``values``) in scipy-CSR form. CSR series are driver-side
    host data in the reference too, so the CSR->COO expansion happens on
    the driver and the COO rows enter Spark via createDataFrame."""
    import numpy as np

    if type(offsets) is not type(indices):
        raise TypeError(
            f"'offsets' type {type(offsets)} != 'indices' type {type(indices)}"
        )
    if values is not None and type(values) is not type(offsets):
        raise TypeError(
            f"'values' type {type(values)} != 'offsets' type {type(offsets)}"
        )
    off = np.asarray(offsets, dtype="int64")
    ind = np.asarray(indices, dtype="int64")
    directed = bool(getattr(create_using, "directed", False)) or (
        getattr(create_using, "__name__", "") in ("DiGraph", "MultiDiGraph")
    )
    src = np.repeat(np.arange(len(off) - 1, dtype="int64"), np.diff(off))
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.active()
    if values is not None:
        vals = np.asarray(values, dtype="float64")
        rows = [(int(s), int(d), float(w)) for s, d, w in zip(src, ind, vals)]
        sdf = spark.createDataFrame(rows, "src long, dst long, weight double")
        return Graph.from_edgelist(sdf, weight="weight", directed=directed)
    rows = [(int(s), int(d)) for s, d in zip(src, ind)]
    sdf = spark.createDataFrame(rows, "src long, dst long")
    return Graph.from_edgelist(sdf, directed=directed)


# camelCase clustering-metric names from the reference's public import list
# (cugraph/__init__.py:22-24 -> community/spectral_clustering.py:177-388).
# The reference clustering frame carries EXTERNAL vertex ids; the internal
# snake_case metrics take internal ids, so these wrappers renumber first.
def _internal_labels(G: Graph, clustering: DataFrame,
                     vertex_col_name: str, cluster_col_name: str) -> DataFrame:
    lab = clustering.select(
        F.col(vertex_col_name).alias("vertex"),
        F.col(cluster_col_name).alias("labels"),
    )
    if G.renumbered:
        lab = G.nmap.add_internal_vertex_id(lab, "vertex", "__vid__")
        lab = lab.withColumnRenamed("__vid__", "vertex")
    return lab.select("vertex", "labels")


def analyzeClustering_modularity(G: Graph, n_clusters=None, clustering=None,
                                 vertex_col_name="vertex",
                                 cluster_col_name="cluster") -> float:
    from .algorithms.clustering_metrics import analyze_clustering_modularity

    return analyze_clustering_modularity(
        G, _internal_labels(G, clustering, vertex_col_name, cluster_col_name)
    )


def analyzeClustering_edge_cut(G: Graph, n_clusters=None, clustering=None,
                               vertex_col_name="vertex",
                               cluster_col_name="cluster") -> float:
    from .algorithms.clustering_metrics import analyze_clustering_edge_cut

    return analyze_clustering_edge_cut(
        G, _internal_labels(G, clustering, vertex_col_name, cluster_col_name)
    )


def analyzeClustering_ratio_cut(G: Graph, n_clusters=None, clustering=None,
                                vertex_col_name="vertex",
                                cluster_col_name="cluster") -> float:
    from .algorithms.clustering_metrics import analyze_clustering_ratio_cut

    return analyze_clustering_ratio_cut(
        G, _internal_labels(G, clustering, vertex_col_name, cluster_col_name)
    )
