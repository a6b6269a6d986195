"""ER/path/mesh generators, NX-compat BFS wrappers, adjacency conveniences."""

import numpy as np
import pandas as pd
import pytest

import linkgraph as lg
from linkgraph import Graph


def test_erdos_renyi_deterministic_and_plausible(spark):
    e1 = lg.erdos_renyi_edges(spark, 200, 0.05, seed=7)
    e2 = lg.erdos_renyi_edges(spark, 200, 0.05, seed=7, partitions=3)
    s1 = {(r.src, r.dst) for r in e1.collect()}
    s2 = {(r.src, r.dst) for r in e2.collect()}
    assert s1 == s2, "partitioning must not change the sampled graph"
    n_pairs = 200 * 199 // 2
    # binomial(19900, 0.05): mean 995, sd ~31 — allow 6 sd
    assert abs(len(s1) - 0.05 * n_pairs) < 200
    assert all(0 <= s < d < 200 for s, d in s1)


def test_path_and_mesh_generators(spark):
    p = {(r.src, r.dst) for r in lg.path_graph_edges(spark, 5).collect()}
    assert p == {(0, 1), (1, 2), (2, 3), (3, 4)}
    m = {(r.src, r.dst) for r in lg.mesh_graph_edges(spark, 2, 3).collect()}
    # 2x3 grid: rights (0,1),(1,2),(3,4),(4,5); downs (0,3),(1,4),(2,5)
    assert m == {(0, 1), (1, 2), (3, 4), (4, 5), (0, 3), (1, 4), (2, 5)}


def test_bfs_edges_and_reverse(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (3, 2)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    fwd = {r.vertex: r.distance for r in lg.bfs_edges(g, 0).collect()}
    assert fwd[0] == 0 and fwd[1] == 1 and fwd[2] == 2 and fwd[3] is None
    rev = {r.vertex: r.distance for r in lg.bfs_edges(g, 2, reverse=True).collect()}
    assert rev[2] == 0 and rev[1] == 1 and rev[3] == 1 and rev[0] == 2


def test_concurrent_bfs(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    got = {
        (r.seed, r.vertex): r.distance
        for r in lg.concurrent_bfs(g, [0, 3]).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2, (3, 3): 0, (3, 4): 1}


def test_from_pandas_adjacency_and_numpy_matrix(spark):
    pdf = pd.DataFrame(
        [[0, 1, 0], [1, 0, 2], [0, 2, 0]],
        index=["a", "b", "c"],
        columns=["a", "b", "c"],
    )
    g = lg.from_pandas_adjacency(spark, pdf, directed=False)
    assert g.number_of_vertices() == 3
    back = g.unrenumber(g.unrenumber(g.view_edge_list(), "src"), "dst")
    got = {(min(r.src, r.dst), max(r.src, r.dst), r.weight) for r in back.collect()}
    assert got == {("a", "b", 1.0), ("b", "c", 2.0)}

    m = lg.from_numpy_matrix(spark, np.array([[0, 3], [0, 0]]), directed=True)
    rows = m.edges.collect()
    assert len(rows) == 1 and rows[0].src == 0 and rows[0].dst == 1

    with pytest.raises(ValueError):
        lg.from_pandas_adjacency(
            spark, pd.DataFrame([[0, 1]], index=["a"], columns=["a", "b"])
        )
