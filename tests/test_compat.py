"""Reference public-name compatibility layer (linkgraph/compat.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from conftest import load_csv_edges
from linkgraph import (
    Graph,
    from_edgelist,
    is_weighted,
    jaccard,
    jaccard_coefficient,
    strong_connected_component,
    strongly_connected_components,
    subgraph,
    symmetrize_df,
    to_numpy_array,
    to_pandas_adjacency,
    to_pandas_edgelist,
    triangle_count,
    triangles,
)


@pytest.fixture(scope="module")
def karate(spark):
    return Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False,
        directed=False,
    )


def test_triangles_alias(karate):
    assert triangles(karate) == triangle_count(karate)


def test_jaccard_coefficient_alias(karate):
    a = sorted(map(tuple, jaccard(karate).collect()))
    b = sorted(map(tuple, jaccard_coefficient(karate).collect()))
    assert a == b


def test_symmetrize_df_dedup_min(spark):
    df = spark.createDataFrame(
        [(0, 1, 5.0), (1, 0, 2.0), (0, 1, 9.0)], "src LONG, dst LONG, weight DOUBLE"
    )
    got = {(r.src, r.dst): r.weight for r in symmetrize_df(df).collect()}
    assert got == {(0, 1): 2.0, (1, 0): 2.0}


def test_from_edgelist_dispatch(spark):
    pdf = pd.DataFrame({"source": [0, 1], "destination": [1, 2]})
    g1 = from_edgelist(pdf, spark=spark)
    assert g1.number_of_vertices() == 3
    sdf = spark.createDataFrame([(0, 1), (1, 2)], "source LONG, destination LONG")
    g2 = from_edgelist(sdf)
    assert sorted(map(tuple, g1.edges.collect())) == sorted(
        map(tuple, g2.edges.collect())
    )


def test_subgraph_and_is_weighted(spark, karate):
    assert is_weighted(karate)
    sub = subgraph(karate, [0, 1, 2, 3])
    verts = {r.src for r in sub.edges.collect()} | {
        r.dst for r in sub.edges.collect()
    }
    assert verts <= {0, 1, 2, 3}
    assert sub.edges.count() > 0


def test_dense_sinks(spark):
    df = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0)], "src LONG, dst LONG, weight DOUBLE"
    )
    g = Graph.from_edgelist(df, weight="weight", renumber=False, directed=True)
    a = to_numpy_array(g)
    assert a.shape == (3, 3) and a[0][1] == 2.0 and a[1][2] == 3.0
    pa = to_pandas_adjacency(g)
    assert np.allclose(pa.to_numpy(), a)
    pe = to_pandas_edgelist(g)
    assert len(pe) == 2


def test_strong_connected_component_alias(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 3)], "src LONG, dst LONG"
    )
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    a = sorted(map(tuple, strong_connected_component(g).collect()))
    b = sorted(map(tuple, strongly_connected_components(g).collect()))
    assert a == b


# Every name the reference exports at package level (reference
# cugraph/__init__.py:14-113) — ALL of them, including the infra layer
# (utils, comms, raft_include_test, get_versions), which round 3 shims
# with Spark-native semantics. This pins the full 80-name list importable.
REFERENCE_PUBLIC_NAMES = [
    # community (__init__.py:14-29)
    "ecg", "ktruss_subgraph", "k_truss", "louvain", "leiden",
    "spectralBalancedCutClustering",
    "spectralModularityMaximizationClustering",
    "analyzeClustering_modularity", "analyzeClustering_edge_cut",
    "analyzeClustering_ratio_cut", "subgraph", "triangles", "ego_graph",
    "batched_ego_graphs",
    # structure (__init__.py:31-57)
    "Graph", "DiGraph", "MultiGraph", "MultiDiGraph", "BiPartiteGraph",
    "BiPartiteDiGraph", "from_edgelist", "from_cudf_edgelist",
    "from_pandas_edgelist", "to_pandas_edgelist", "from_pandas_adjacency",
    "to_pandas_adjacency", "from_numpy_array", "to_numpy_array",
    "from_numpy_matrix", "to_numpy_matrix", "from_adjlist", "hypergraph",
    "symmetrize", "symmetrize_df", "symmetrize_ddf", "is_weighted",
    "is_directed", "is_multigraph", "is_bipartite", "is_multipartite",
    # centrality (__init__.py:59-63)
    "betweenness_centrality", "edge_betweenness_centrality",
    "katz_centrality",
    # cores / components (__init__.py:65-71)
    "core_number", "k_core", "connected_components",
    "weakly_connected_components", "strongly_connected_components",
    # link analysis / prediction (__init__.py:73-85)
    "pagerank", "hits", "jaccard", "jaccard_coefficient", "overlap",
    "overlap_coefficient", "sorensen", "sorensen_coefficient",
    "jaccard_w", "overlap_w", "sorensen_w",
    # traversal (__init__.py:87-96)
    "bfs", "bfs_edges", "sssp", "shortest_path", "filter_unreachable",
    "shortest_path_length", "concurrent_bfs", "multi_source_bfs",
    # tree / proto / assignment / layout / sampling (__init__.py:98-108)
    "minimum_spanning_tree", "maximum_spanning_tree",
    "strong_connected_component", "find_bicliques", "hungarian",
    "dense_hungarian", "force_atlas2", "random_walks", "rw_path",
    # infra (__init__.py:100-113): utilities, RAFT probe, comms, versioneer
    "utils", "raft_include_test", "comms", "get_versions",
]


def test_reference_public_names_all_importable():
    import linkgraph

    missing = [n for n in REFERENCE_PUBLIC_NAMES if not hasattr(linkgraph, n)]
    assert missing == []


def test_from_cudf_edgelist_alias(spark):
    from linkgraph import from_cudf_edgelist

    sdf = spark.createDataFrame([(0, 1), (1, 2)], "source LONG, destination LONG")
    g = from_cudf_edgelist(sdf)
    assert g.number_of_vertices() == 3


def test_module_level_from_adjlist_csr(spark):
    """CSR offsets/indices/values round-trip (reference convert_matrix.py:
    86-145): 0->1(2.0), 0->2(3.0), 1->2(4.0), 2 has no out-edges."""
    from linkgraph import DiGraph, from_adjlist

    offsets = pd.Series([0, 2, 3, 3])
    indices = pd.Series([1, 2, 2])
    values = pd.Series([2.0, 3.0, 4.0])
    g = from_adjlist(offsets, indices, values, create_using=DiGraph, spark=spark)
    got = {(r.src, r.dst): r.weight
           for r in g.unrenumber(g.unrenumber(g.edges, "src"), "dst").collect()}
    assert got == {(0, 1): 2.0, (0, 2): 3.0, (1, 2): 4.0}
    with pytest.raises(TypeError):
        from_adjlist(pd.Series([0, 1]), [0], spark=spark)


def test_analyzeClustering_camelcase_external_ids(spark):
    """External (non-contiguous) vertex ids through the camelCase metric
    names must agree with the internal snake_case metrics."""
    from linkgraph import (
        analyzeClustering_edge_cut,
        analyzeClustering_modularity,
        analyze_clustering_edge_cut,
        analyze_clustering_modularity,
    )

    # triangle {10,20,30} + triangle {40,50,60} + one cut edge
    tri = [(10, 20), (20, 30), (10, 30), (40, 50), (50, 60), (40, 60), (30, 40)]
    e = spark.createDataFrame(tri, "src LONG, dst LONG")
    g = Graph.from_edgelist(e, directed=False, renumber=True)
    clustering = spark.createDataFrame(
        [(v, 0) for v in (10, 20, 30)] + [(v, 1) for v in (40, 50, 60)],
        "vertex LONG, cluster LONG",
    )
    cut = analyzeClustering_edge_cut(g, 2, clustering)
    assert cut == 1.0
    q = analyzeClustering_modularity(g, 2, clustering)
    # same answer via the internal-id path
    lab = g.nmap.add_internal_vertex_id(
        clustering.withColumnRenamed("cluster", "labels"), "vertex", "vertex2"
    ).select(F.col("vertex2").alias("vertex"), "labels")
    assert q == pytest.approx(analyze_clustering_modularity(g, lab))
    assert cut == analyze_clustering_edge_cut(g, lab)


def test_connected_components_strong_dispatch(spark):
    from linkgraph import connected_components, strongly_connected_components

    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)], "src LONG, dst LONG"
    )
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    a = sorted(map(tuple, connected_components(g, connection="strong").collect()))
    b = sorted(map(tuple, strongly_connected_components(g).collect()))
    assert a == b
    with pytest.raises(ValueError):
        connected_components(g, connection="semiweak")


def test_dense_sinks_external_ids(spark):
    """ADVICE r2: sparse external ids must map to positions in the sorted
    node list, and renumbered graphs must label rows with EXTERNAL ids."""
    df = spark.createDataFrame(
        [(100, 7, 2.0), (7, 55, 3.0)], "src LONG, dst LONG, weight DOUBLE"
    )
    g = Graph.from_edgelist(df, weight="weight", renumber=True, directed=True)
    pa = to_pandas_adjacency(g)
    assert list(pa.index) == [7, 55, 100]
    assert pa.loc[100, 7] == 2.0 and pa.loc[7, 55] == 3.0
    a = to_numpy_array(g)
    assert a.shape == (3, 3) and a[2][0] == 2.0 and a[0][1] == 3.0
