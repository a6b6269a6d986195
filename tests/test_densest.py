"""Densest subgraph (algorithms/densest.py) — Bahmani peeling against
hand-checkable cores."""

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.densest import densest_subgraph
from linkgraph.structure.graph import Graph


def _g(spark, rows, directed=False):
    df = spark.createDataFrame(rows, "src long, dst long")
    return Graph.from_edgelist(df, directed=directed, renumber=False)


def test_clique_with_pendants_recovers_clique(spark):
    # K5 on 0..4 (|E|=10, density 2.0) + a pendant path 4-5-6-7 dragging
    # the whole-graph density down to 13/8 — a fine peel (small eps)
    # must recover the K5 (eps=0.5 legitimately keeps the whole graph:
    # 13/8 >= 2.0 / (2*1.5) is within the Bahmani bound)
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pendants = [(4, 5), (5, 6), (6, 7)]
    g = _g(spark, clique + pendants)
    out = densest_subgraph(g, epsilon=0.01).collect()
    assert sorted(r.vertex for r in out) == [0, 1, 2, 3, 4]
    r = out[0]
    assert (r.density_num, r.density_den) == (20, 10)  # sym rows / 2V = 2.0
    assert r.density_e9 == 2_000_000_000


def test_whole_graph_when_uniform(spark):
    # a 4-cycle is degree-regular: round 1 (the full graph) is optimal
    g = _g(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    out = densest_subgraph(g).collect()
    assert sorted(r.vertex for r in out) == [0, 1, 2, 3]
    assert out[0].density_e9 == 1_000_000_000


def test_directed_input_symmetrized(spark):
    g = _g(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    out = densest_subgraph(g).collect()
    assert sorted(r.vertex for r in out) == [0, 1, 2]
    assert out[0].density_e9 == 1_000_000_000


def test_empty_edgeset(spark):
    # self-loop-only graph: no edges survive -> empty contract frame
    g = _g(spark, [(3, 3)], directed=True)
    out = densest_subgraph(g)
    assert out.columns == ["vertex", "density_num", "density_den", "density_e9"]
    assert out.count() == 0


def test_bad_epsilon(spark):
    g = _g(spark, [(0, 1)])
    with pytest.raises(ValueError):
        densest_subgraph(g, epsilon=0)


def test_approximation_bound_on_two_cliques(spark):
    # K6 (density 2.5) union K3 (density 1.0), disjoint: answer must be
    # within 2(1+eps) of opt; a fine peel nails the K6 exactly
    k6 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    k3 = [(10, 11), (11, 12), (10, 12)]
    g = _g(spark, k6 + k3)
    out = densest_subgraph(g, epsilon=0.01).collect()
    got = sorted(r.vertex for r in out)
    num, den = out[0].density_num, out[0].density_den
    assert num / den >= 2.5 / 3.0  # Bahmani bound
    assert got == [0, 1, 2, 3, 4, 5]  # and in fact exact here
