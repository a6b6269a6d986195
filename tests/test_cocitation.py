"""Co-citation / bibliographic coupling vs a brute-force python oracle."""

import itertools

import pytest

from linkgraph import Graph, bibliographic_coupling, cocitation
from linkgraph.generators import rmat_edges


def _brute(edges, mode, min_count=1, max_degree=None):
    out_adj, in_adj = {}, {}
    for s, d in edges:
        out_adj.setdefault(s, set()).add(d)
        in_adj.setdefault(d, set()).add(s)
    shared = out_adj if mode == "cocitation" else in_adj
    if max_degree is not None:
        shared = {k: v for k, v in shared.items() if len(v) <= max_degree}
    counts = {}
    for _, members in shared.items():
        for a, b in itertools.combinations(sorted(members), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return {p: c for p, c in counts.items() if c >= min_count}


@pytest.fixture(scope="module")
def small_graph(spark):
    df = rmat_edges(spark, scale=7, edgefactor=8, seed=11).select("src", "dst").distinct()
    edges = [(r.src, r.dst) for r in df.collect() if r.src != r.dst]
    g = Graph.from_edgelist(
        df.filter("src <> dst"), directed=True, renumber=False
    )
    return g, edges


def test_cocitation_matches_brute(spark, small_graph):
    g, edges = small_graph
    got = {
        (r.first, r.second): r.cocitation
        for r in cocitation(g, min_count=2).collect()
    }
    assert got == _brute(edges, "cocitation", min_count=2)


def test_coupling_matches_brute(spark, small_graph):
    g, edges = small_graph
    got = {
        (r.first, r.second): r.coupling
        for r in bibliographic_coupling(g, min_count=2).collect()
    }
    assert got == _brute(edges, "coupling", min_count=2)


def test_max_degree_cap(spark, small_graph):
    g, edges = small_graph
    got = {
        (r.first, r.second): r.cocitation
        for r in cocitation(g, max_degree=4).collect()
    }
    assert got == _brute(edges, "cocitation", max_degree=4)


def test_renumbered_pairs_are_external_canonical(spark, small_graph):
    _, edges = small_graph
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edgelist(df, directed=True, renumber=True)
    rows = cocitation(g, min_count=2).collect()
    got = {(r.first, r.second): r.cocitation for r in rows}
    assert all(r.first < r.second for r in rows)
    assert got == _brute(edges, "cocitation", min_count=2)


def test_undirected_rejected(spark, small_graph):
    _, edges = small_graph
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edgelist(df, directed=False, renumber=False)
    with pytest.raises(ValueError):
        cocitation(g)
    with pytest.raises(ValueError):
        bibliographic_coupling(g)
