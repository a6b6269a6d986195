"""Luby maximal independent set (algorithms/mis.py) — deterministic LCG
priorities; validity + exact python-replay checks."""

from linkgraph.algorithms.mis import (
    MIS_LCG_A,
    MIS_LCG_C,
    MIS_LCG_M,
    maximal_independent_set,
)
from linkgraph.structure.graph import Graph


def _key(v):
    return ((MIS_LCG_A * v + MIS_LCG_C) % MIS_LCG_M) * (1 << 32) + v


def _py_mis(edges, universe):
    adj = {v: set() for v in universe}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    active, mis = set(universe), set()
    while active:
        winners = {
            v for v in active if all(_key(v) < _key(u) for u in adj[v] if u in active)
        }
        mis |= winners
        removed = set(winners)
        for w in winners:
            removed |= adj[w] & active
        active -= removed
    return mis


def _check(spark, edges, directed=False):
    g = Graph.from_edgelist(
        spark.createDataFrame(edges, ["src", "dst"]), directed=directed, renumber=False
    )
    out = {r.vertex: r.in_mis for r in maximal_independent_set(g).collect()}
    universe = range(max(max(s, d) for s, d in edges) + 1)
    exp = _py_mis(edges, universe)
    assert out == {v: (1 if v in exp else 0) for v in universe}
    # independence + maximality
    adj = {v: set() for v in universe}
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    assert not any(out[s] and out[d] for s, d in edges if s != d)
    assert all(out[v] or any(out[u] for u in adj[v]) for v in universe)
    return out


def test_mis_cycle_and_pendant(spark):
    _check(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (2, 5), (5, 6)])


def test_mis_star_hub(spark):
    out = _check(spark, [(0, i) for i in range(1, 12)])
    # star: either the hub alone or all leaves — LCG decides, replay pins it
    assert sum(out.values()) in (1, 11)


def test_mis_lcg_deterministic_universe_gap(spark):
    # vertex 3 is isolated under the max+1 universe rule -> always in MIS
    out = _check(spark, [(0, 1), (1, 2), (4, 5)])
    assert out[3] == 1


def test_mis_directed_symmetrizes(spark):
    # directed input must behave as its symmetrized undirected graph
    a = _check(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    assert sum(a.values()) == 1  # triangle admits exactly one MIS vertex


def test_mis_renumbered_path(spark):
    g = Graph.from_edgelist(
        spark.createDataFrame(
            [(100, 200), (200, 300), (300, 400)], ["src", "dst"]
        ),
        directed=False,
        renumber=True,
    )
    out = {r.vertex: r.in_mis for r in maximal_independent_set(g).collect()}
    # renumbered path on dense ids: unrenumbered output, valid MIS
    assert set(out) == {100, 200, 300, 400}
    assert out[100] + out[200] in (1, 2) and sum(out.values()) == 2
