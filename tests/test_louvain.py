"""Louvain vs a pure-Python oracle implementing the identical deterministic
rules (synchronous moves, up/down alternation, min-label tie-break,
self-loop-carrying coarsening). On integer-weight graphs every quantity is
exact in doubles, so label equality is exact."""

import pytest

from conftest import load_csv_edges
from linkgraph import Graph
from linkgraph.algorithms.louvain import louvain

GAMMA = 1.0
EPS = 1e-12


def _oracle_level(edges, m2, resolution, max_inner):
    verts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    k_v = {v: 0.0 for v in verts}
    for s, d, w in edges:
        k_v[s] += w  # self-loop weight counts in k_v (and thus sigma)
    labels = {v: v for v in verts}
    prev_moved = None
    for inner in range(max_inner):
        kvc = {v: {} for v in verts}
        for s, d, w in edges:
            if s == d:
                continue  # self-loops excluded from candidate k_{v,c}
            c = labels[s]
            kvc[d][c] = kvc[d].get(c, 0.0) + w
        sigma = {}
        for v in verts:
            sigma[labels[v]] = sigma.get(labels[v], 0.0) + k_v[v]
        moves = {}
        for v in verts:
            c = labels[v]
            k_in_cur = kvc[v].get(c, 0.0)
            best = None
            for c_nbr, k_vc in kvc[v].items():
                if c_nbr == c:
                    continue
                if inner % 2 == 0 and not c_nbr > c:
                    continue
                if inner % 2 == 1 and not c_nbr < c:
                    continue
                g = (
                    k_vc
                    - k_in_cur
                    - resolution * k_v[v] * (sigma[c_nbr] - (sigma[c] - k_v[v])) / m2
                )
                if g > EPS and (best is None or (g, -c_nbr) > best[:2]):
                    best = (g, -c_nbr, c_nbr)
            if best is not None:
                moves[v] = best[2]
        for v, c in moves.items():
            labels[v] = c
        n_moved = len(moves)
        thresh = len(verts) // 100
        if prev_moved is not None and n_moved <= thresh and prev_moved <= thresh:
            break
        prev_moved = n_moved
    return labels


def oracle_louvain(edges, resolution=GAMMA, max_iter=20, max_levels=10):
    m2 = sum(w for _, _, w in edges)  # self-loops included in 2m
    flat = {v: v for v in {s for s, _, _ in edges} | {d for _, d, _ in edges}}
    level_edges = list(edges)  # self-loops carried through coarsening
    for _ in range(max_levels):
        labels = _oracle_level(level_edges, m2, resolution, max_iter)
        n_comm = len(set(labels.values()))
        n_verts = len(labels)
        flat = {v: labels.get(c, c) for v, c in flat.items()}
        if n_comm == n_verts:
            break
        agg = {}
        for s, d, w in level_edges:
            key = (labels[s], labels[d])
            agg[key] = agg.get(key, 0.0) + w
        level_edges = [(s, d, w) for (s, d), w in agg.items()]
        if not any(s != d for s, d, _ in level_edges):
            break
    return flat


def test_louvain_karate_exact_vs_oracle(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    edges = [(r.src, r.dst, r.weight) for r in g.edges.collect()]
    expected = oracle_louvain(edges)
    res, q = louvain(g)
    got = {r.vertex: r.partition for r in res.collect()}
    assert got == expected
    # Louvain on karate should find real community structure
    assert q > 0.35, f"modularity too low: {q}"
    n_comm = len(set(got.values()))
    assert 2 <= n_comm <= 8


def test_louvain_two_cliques(spark):
    clique = lambda off: [
        (off + i, off + j, 1.0) for i in range(4) for j in range(i + 1, 4)
    ]
    rows = clique(0) + clique(10) + [(0, 10, 1.0)]
    e = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    g = Graph.from_edgelist(e, weight="weight", renumber=False, directed=False)
    res, q = louvain(g)
    got = {r.vertex: r.partition for r in res.collect()}
    left = {got[v] for v in [0, 1, 2, 3]}
    right = {got[v] for v in [10, 11, 12, 13]}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert q > 0.3


def test_louvain_self_loops_exact_vs_oracle(spark):
    """Self-loop weight counts in m2/k_v/sigma but never in candidate
    k_{v,c} (reference louvain.cuh:409-411 cluster_subtract)."""
    clique = lambda off: [
        (off + i, off + j, 1.0) for i in range(4) for j in range(i + 1, 4)
    ]
    rows = clique(0) + clique(10) + [(0, 10, 1.0), (2, 2, 5.0), (11, 11, 3.0)]
    e = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    g = Graph.from_edgelist(e, weight="weight", renumber=False, directed=False)
    edges = [(r.src, r.dst, r.weight) for r in g.edges.collect()]
    expected = oracle_louvain(edges)
    # max+1 universe rule: isolated vertices keep their own label
    for v in range(14):
        expected.setdefault(v, v)
    res, q = louvain(g)
    got = {r.vertex: r.partition for r in res.collect()}
    assert got == expected
    left = {got[v] for v in [0, 1, 2, 3]}
    right = {got[v] for v in [10, 11, 12, 13]}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_louvain_requires_undirected(spark):
    e = spark.createDataFrame([(0, 1)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    with pytest.raises(ValueError):
        louvain(g)
