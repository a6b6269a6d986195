"""Whole-graph measures: reciprocity, degree assortativity, degree
histogram (algorithms/graph_measures.py) against hand-computed values."""

import math

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.graph_measures import (
    degree_assortativity,
    degree_histogram,
    reciprocity,
)
from linkgraph.structure.graph import Graph


def _g(spark, rows, directed):
    df = spark.createDataFrame(rows, "src long, dst long")
    return Graph.from_edgelist(df, directed=directed, renumber=False)


def test_reciprocity_hand_graph(spark):
    # 0->1 and 1->0 reciprocal; 0->2, 2->3 one-way; self loop 3->3 excluded
    g = _g(spark, [(0, 1), (1, 0), (0, 2), (2, 3), (3, 3)], directed=True)
    row = reciprocity(g).collect()[0]
    assert row.m == 4
    assert row.recip == 2
    assert row.reciprocity_e6 == 500000


def test_reciprocity_requires_directed(spark):
    g = _g(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        reciprocity(g)


def test_assortativity_star_is_negative(spark):
    # star graph: hubs link only to leaves -> perfectly disassortative
    g = _g(spark, [(0, i) for i in range(1, 6)], directed=False)
    row = degree_assortativity(g).collect()[0]
    # all edges pair degree 5 with degree 1: zero variance on each side
    # conditional on direction; the Pearson r over the sym edge list is -1
    assert row.assortativity_e6 == -1000000


def test_assortativity_matches_manual(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    g = _g(spark, edges, directed=False)
    row = degree_assortativity(g).collect()[0]
    # manual Pearson over the symmetrized edge list
    deg = {0: 3, 1: 2, 2: 3, 3: 2}
    pairs = []
    for u, v in edges:
        pairs.append((deg[u], deg[v]))
        pairs.append((deg[v], deg[u]))
    m = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    assert (row.m, row.sx, row.sy, row.sxx, row.syy, row.sxy) == (
        m, sx, sy, sxx, syy, sxy,
    )
    r = (m * sxy - sx * sy) / (
        math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    )
    assert row.assortativity_e6 == round(1e6 * r)


def test_assortativity_degenerate_is_null(spark):
    # 2-cycle: every endpoint degree is 1 -> zero variance -> r undefined
    g = _g(spark, [(0, 1)], directed=False)
    row = degree_assortativity(g).collect()[0]
    assert row.assortativity_e6 is None


def test_degree_histogram_includes_isolated(spark):
    # vertex universe is max+1: vertices 2,3 isolated
    g = _g(spark, [(0, 1), (0, 4)], directed=True)
    hist = {
        r.degree: r.n_vertices
        for r in degree_histogram(g, direction="total").collect()
    }
    assert hist == {0: 2, 1: 2, 2: 1}
    out = {
        r.degree: r.n_vertices
        for r in degree_histogram(g, direction="out").collect()
    }
    assert out == {0: 4, 2: 1}
    assert sum(hist.values()) == g.number_of_vertices()


def test_degree_histogram_bad_direction(spark):
    g = _g(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        degree_histogram(g, direction="sideways")
