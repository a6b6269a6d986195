"""Leiden and ECG — quality, connectivity, and determinism checks.

Unlike Louvain (exact pure-Python oracle in test_louvain.py), Leiden/ECG are
checked structurally: community quality on known graphs, Leiden's headline
guarantee (internally connected communities), and bit-reproducibility.
"""

import pytest

from conftest import load_csv_edges
from linkgraph import Graph
from linkgraph.algorithms.ecg import ecg
from linkgraph.algorithms.leiden import leiden


def _two_cliques(spark):
    clique = lambda off: [
        (off + i, off + j, 1.0) for i in range(4) for j in range(i + 1, 4)
    ]
    rows = clique(0) + clique(10) + [(0, 10, 1.0)]
    e = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    return Graph.from_edgelist(e, weight="weight", renumber=False, directed=False)


def _karate(spark):
    return Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False,
        directed=False,
    )


def _connected(members, adj):
    members = set(members)
    if not members:
        return True
    seen = {next(iter(members))}
    stack = [next(iter(seen))]
    while stack:
        v = stack.pop()
        for u in adj.get(v, ()):  # adj over the full graph
            if u in members and u not in seen:
                seen.add(u)
                stack.append(u)
    return seen == members


def test_leiden_two_cliques(spark):
    g = _two_cliques(spark)
    res, q = leiden(g)
    got = {r.vertex: r.partition for r in res.collect()}
    left = {got[v] for v in [0, 1, 2, 3]}
    right = {got[v] for v in [10, 11, 12, 13]}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert q > 0.3


def test_leiden_karate_quality_connectivity_determinism(spark):
    g = _karate(spark)
    res, q = leiden(g)
    got = {r.vertex: r.partition for r in res.collect()}
    assert q > 0.35, f"modularity too low: {q}"
    n_comm = len(set(got.values()))
    assert 2 <= n_comm <= 8
    # Leiden's guarantee: every community is internally connected
    adj = {}
    for r in g.edges.collect():
        adj.setdefault(r.src, set()).add(r.dst)
    by_comm = {}
    for v, c in got.items():
        by_comm.setdefault(c, set()).add(v)
    for c, members in by_comm.items():
        assert _connected(members, adj), f"community {c} disconnected: {members}"
    res2, q2 = leiden(g)
    assert {r.vertex: r.partition for r in res2.collect()} == got and q2 == q


def test_leiden_requires_undirected(spark):
    e = spark.createDataFrame([(0, 1)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    with pytest.raises(ValueError):
        leiden(g)


def test_ecg_two_cliques(spark):
    g = _two_cliques(spark)
    res, q = ecg(g, ensemble_size=6)
    got = {r.vertex: r.partition for r in res.collect()}
    left = {got[v] for v in [0, 1, 2, 3]}
    right = {got[v] for v in [10, 11, 12, 13]}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert q > 0.3


def test_ecg_karate_quality_and_determinism(spark):
    g = _karate(spark)
    res, q = ecg(g, ensemble_size=6)
    got = {r.vertex: r.partition for r in res.collect()}
    assert q > 0.33, f"modularity too low: {q}"
    assert 2 <= len(set(got.values())) <= 10
    res2, q2 = ecg(g, ensemble_size=6)
    assert {r.vertex: r.partition for r in res2.collect()} == got and q2 == q
