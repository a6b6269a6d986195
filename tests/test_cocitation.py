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


class TestButterflies:
    def test_bruteforce_bipartite(self, spark):
        from itertools import combinations

        from linkgraph.algorithms.cocitation import butterfly_count
        from linkgraph.structure.graph import Graph

        # K2,3 (u0,u1 x w0..w2) + a pendant edge: butterflies(K2,3 side u)
        # = C(3,2) = 3 per u-vertex
        edges = [(0, 10), (0, 11), (0, 12), (1, 10), (1, 11), (1, 12), (2, 10)]
        df = spark.createDataFrame(edges, "src long, dst long")
        g = Graph.from_edgelist(df, directed=True, renumber=False)
        got = {r.vertex: r.butterflies for r in butterfly_count(g, side="src").collect()}
        # brute force: count 4-cycles per src vertex
        from collections import Counter, defaultdict

        nbrs = defaultdict(set)
        for s, d in edges:
            nbrs[s].add(d)
        exp = Counter()
        for u, v in combinations(sorted(nbrs), 2):
            w = len(nbrs[u] & nbrs[v])
            exp[u] += w * (w - 1) // 2
            exp[v] += w * (w - 1) // 2
        assert got == {k: v for k, v in exp.items() if v > 0}
        assert got == {0: 3, 1: 3}

    def test_side_dst_and_validation(self, spark):
        import pytest

        from linkgraph.algorithms.cocitation import butterfly_count
        from linkgraph.structure.graph import Graph

        edges = [(0, 10), (0, 11), (1, 10), (1, 11)]  # one butterfly
        df = spark.createDataFrame(edges, "src long, dst long")
        g = Graph.from_edgelist(df, directed=True, renumber=False)
        assert {r.vertex: r.butterflies for r in butterfly_count(g, side="dst").collect()} == {10: 1, 11: 1}
        with pytest.raises(ValueError):
            butterfly_count(g, side="nope")

    def test_renumbered_external_ids(self, spark):
        from linkgraph.algorithms.cocitation import butterfly_count
        from linkgraph.structure.graph import Graph

        edges = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
        df = spark.createDataFrame(edges, "src string, dst string")
        g = Graph.from_edgelist(df, directed=True, renumber=True)
        got = {r.vertex: r.butterflies for r in butterfly_count(g, side="src").collect()}
        assert got == {"a": 1, "b": 1}
