"""Typed graph-class surface (reference graph_classes.py:32-830)."""

import pytest
from pyspark.sql import functions as F

from linkgraph.structure.graph_classes import (
    BiPartiteGraph,
    DiGraph,
    MultiDiGraph,
    MultiGraph,
    NPartiteGraph,
    Tree,
    is_bipartite,
    is_directed,
    is_multigraph,
    is_multipartite,
)
from linkgraph import Graph


def _edges(spark, rows, schema="src LONG, dst LONG"):
    return spark.createDataFrame(rows, schema)


def test_multigraph_keeps_parallel_edges(spark):
    df = _edges(spark, [(0, 1), (0, 1), (1, 2)])
    g = MultiGraph.from_edgelist(df, directed=True, renumber=False)
    assert g.is_multigraph() and g.multi
    assert g.edges.count() == 3  # dedup skipped (symmetrize.py:82-83 parity)
    plain = Graph.from_edgelist(df, directed=True, renumber=False)
    assert plain.edges.count() == 2


def test_digraph_deprecated_forces_directed(spark):
    df = _edges(spark, [(0, 1)])
    with pytest.warns(DeprecationWarning):
        g = DiGraph.from_edgelist(df, renumber=False)
    assert g.directed and is_directed(g)
    with pytest.warns(DeprecationWarning):
        m = MultiDiGraph.from_edgelist(df, renumber=False)
    assert m.directed and m.multi and is_multigraph(m)


def test_tree_flag_and_check(spark):
    path = Tree.from_edgelist(_edges(spark, [(0, 1), (1, 2), (2, 3)]), renumber=False)
    assert path.tree and path.is_tree()
    cycle = Tree.from_edgelist(
        _edges(spark, [(0, 1), (1, 2), (2, 0)]), renumber=False
    )
    assert not cycle.is_tree()  # E = V, not V-1
    forest = Tree.from_edgelist(
        _edges(spark, [(0, 1), (2, 3), (3, 4)]), renumber=False
    )
    assert not forest.is_tree()  # E = V-1 fails (5 vertices, 3 edges)


def test_bipartite_partitions(spark):
    df = _edges(spark, [(0, 10), (1, 10), (2, 11)])
    g = BiPartiteGraph.from_edgelist(df, directed=False, renumber=False)
    assert is_bipartite(g) and is_multipartite(g)
    g.add_nodes_from([0, 1, 2], bipartite="left")
    g.add_nodes_from([10, 11], bipartite="right")
    s = g.sets()
    assert sorted(s) == ["left", "right"]
    assert {r.vertex for r in s["left"].collect()} == {0, 1, 2}
    with pytest.raises(ValueError):
        g.add_nodes_from([5], bipartite="third")
    assert sorted(g.sets()) == ["left", "right"]  # rejected call stored nothing
    g.add_nodes_from([0, 1], bipartite="left")  # replacing an existing set is fine
    assert {r.vertex for r in g.sets()["left"].collect()} == {0, 1}
    with pytest.raises(ValueError):
        g.add_nodes_from([5])  # bipartite name required


def test_npartite_partitions_and_guards(spark):
    df = _edges(spark, [(0, 10), (10, 20)])
    g = NPartiteGraph.from_edgelist(df, directed=False, renumber=False)
    assert is_multipartite(g) and not is_bipartite(g)
    g.add_nodes_from([0], multipartite="a")
    g.add_nodes_from([10], multipartite="b")
    g.add_nodes_from([20], multipartite="c")
    assert sorted(g.sets()) == ["a", "b", "c"]
    with pytest.raises(ValueError):
        g.add_nodes_from([0], bipartite="x")  # not a bipartite graph
    # DataFrame input accepted
    g.add_nodes_from(spark.createDataFrame([(0,), (10,)], ["v"]))
    assert "all_nodes" in g.sets()


def test_npartite_directed_variants(spark):
    from linkgraph.structure.graph_classes import BiPartiteDiGraph, NPartiteDiGraph

    df = _edges(spark, [(0, 10), (0, 11)])
    b = BiPartiteDiGraph.from_edgelist(df, renumber=False)
    n = NPartiteDiGraph.from_edgelist(df, renumber=False)
    assert b.directed and n.directed
    assert b.edges.count() == 2  # NOT symmetrized
    assert is_bipartite(b) and is_multipartite(n)


def test_plain_graph_predicates(spark):
    g = Graph.from_edgelist(_edges(spark, [(0, 1)]), renumber=False)
    assert not is_multigraph(g) and not is_bipartite(g) and not is_multipartite(g)
