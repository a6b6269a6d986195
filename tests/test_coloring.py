"""greedy_color vs the sequential greedy replay in LCG-priority order
(the Jones-Plassmann equivalence) + proper-coloring invariants."""

import random

import pytest

from linkgraph.algorithms.coloring import greedy_color
from linkgraph.algorithms.mis import MIS_LCG_A, MIS_LCG_C, MIS_LCG_M
from linkgraph.structure.graph import Graph


def _key(v):
    return (((MIS_LCG_A * v + MIS_LCG_C) % MIS_LCG_M) << 32) + v


def _sequential(edges, universe):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v in sorted(universe, key=_key):
        used = {out[u] for u in adj.get(v, ()) if u in out}
        c = 0
        while c in used:
            c += 1
        out[v] = c
    return out


@pytest.mark.parametrize("n,m,seed", [(30, 60, 7), (50, 200, 11), (20, 20, 3)])
def test_matches_sequential_greedy(spark, n, m, seed):
    rng = random.Random(seed)
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edgelist(df, directed=True, renumber=False)
    got = {r.vertex: r.color for r in greedy_color(g).collect()}
    mx = max(max(a, b) for a, b in edges)
    assert got == _sequential(edges, range(mx + 1))
    assert all(got[a] != got[b] for a, b in edges)


def test_renumbered_external_ids(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]  # triangle -> 3 colors
    df = spark.createDataFrame(edges, "src string, dst string")
    g = Graph.from_edgelist(df, directed=True, renumber=True)
    got = {r.vertex: r.color for r in greedy_color(g).collect()}
    assert sorted(got) == ["a", "b", "c"]
    assert sorted(got.values()) == [0, 1, 2]


def test_path_graph_two_colors(spark):
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edgelist(df, directed=False, renumber=False)
    got = {r.vertex: r.color for r in greedy_color(g).collect()}
    assert all(got[a] != got[b] for a, b in edges)
    assert max(got.values()) <= 2  # greedy on a path uses <= 3, usually 2


def test_nonconvergence_guard(spark):
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edgelist(df, directed=False, renumber=False)
    with pytest.raises(ValueError):
        greedy_color(g, max_iter=1)
