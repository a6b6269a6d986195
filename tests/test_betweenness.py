"""Betweenness centrality vs a pure-Python Brandes oracle."""

from collections import deque

import pytest

from conftest import load_csv_edges
from linkgraph import Graph
from linkgraph.algorithms.betweenness import (
    betweenness_centrality,
    edge_betweenness_centrality,
)


def oracle_brandes(adj, vertices, normalized, directed, sources=None):
    bc = {v: 0.0 for v in vertices}
    for s in sources if sources is not None else vertices:
        S, P = [], {v: [] for v in vertices}
        sigma = {v: 0.0 for v in vertices}
        dist = {v: -1 for v in vertices}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            S.append(v)
            for w in adj.get(v, []):
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = {v: 0.0 for v in vertices}
        while S:
            w = S.pop()
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    n = len(vertices)
    scale = 1.0
    if not directed:
        scale *= 0.5
    if normalized and n > 2:
        scale *= (1.0 if directed else 2.0) / ((n - 1) * (n - 2))
    if sources is not None and len(sources) < n:
        scale *= n / len(sources)
    return {v: bc[v] * scale for v in vertices}


def _graph_and_adj(spark, dataset, directed):
    g = Graph.from_edgelist(
        load_csv_edges(spark, dataset), weight="weight", renumber=False, directed=directed
    )
    adj = {}
    for r in g.edges.collect():
        if r.src != r.dst:
            adj.setdefault(r.src, []).append(r.dst)
    verts = [r.vertex for r in g.vertices().collect()]
    return g, adj, verts


@pytest.mark.parametrize("normalized", [True, False])
def test_betweenness_karate_exact(spark, normalized):
    g, adj, verts = _graph_and_adj(spark, "karate.csv", directed=False)
    exp = oracle_brandes(adj, verts, normalized, directed=False)
    got = {
        r.vertex: r.betweenness_centrality
        for r in betweenness_centrality(g, normalized=normalized).collect()
    }
    assert len(got) == 34
    for v in verts:
        assert abs(got[v] - exp[v]) < 1e-9, f"vertex {v}: {got[v]} vs {exp[v]}"


def test_betweenness_directed(spark):
    g, adj, verts = _graph_and_adj(spark, "karate-asymmetric.csv", directed=True)
    exp = oracle_brandes(adj, verts, True, directed=True)
    got = {
        r.vertex: r.betweenness_centrality
        for r in betweenness_centrality(g, normalized=True).collect()
    }
    for v in verts:
        assert abs(got[v] - exp[v]) < 1e-9


def oracle_brandes_edges(adj, vertices, normalized, directed, k=None):
    """NetworkX-style edge betweenness (undirected: one slot per unordered
    pair, _rescale_e convention)."""
    eb = {}
    for s in vertices:
        S, P = [], {v: [] for v in vertices}
        sigma = {v: 0.0 for v in vertices}
        dist = {v: -1 for v in vertices}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            S.append(v)
            for w in adj.get(v, []):
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = {v: 0.0 for v in vertices}
        while S:
            w = S.pop()
            for v in P[w]:
                c = sigma[v] / sigma[w] * (1 + delta[w])
                key = (v, w) if directed else (min(v, w), max(v, w))
                eb[key] = eb.get(key, 0.0) + c
                delta[v] += c
    n = len(vertices)
    scale = None
    if normalized and n > 1:
        scale = 1.0 / (n * (n - 1))
    elif not directed:
        scale = 0.5
    if scale is not None:
        if k is not None and k < n:
            scale *= n / k
        eb = {e: v * scale for e, v in eb.items()}
    return eb


@pytest.mark.parametrize("normalized", [True, False])
def test_edge_betweenness_karate(spark, normalized):
    g, adj, verts = _graph_and_adj(spark, "karate.csv", directed=False)
    exp = oracle_brandes_edges(adj, verts, normalized, directed=False)
    got = {
        (r.src, r.dst): r.betweenness_centrality
        for r in edge_betweenness_centrality(g, normalized=normalized).collect()
    }
    assert len(got) == 78  # karate edge count, upper triangle
    for e, v in got.items():
        assert abs(v - exp.get(e, 0.0)) < 1e-9, f"edge {e}: {v} vs {exp.get(e)}"


def test_edge_betweenness_directed(spark):
    g, adj, verts = _graph_and_adj(spark, "karate-asymmetric.csv", directed=True)
    exp = oracle_brandes_edges(adj, verts, True, directed=True)
    got = {
        (r.src, r.dst): r.betweenness_centrality
        for r in edge_betweenness_centrality(g, normalized=True).collect()
    }
    for e, v in got.items():
        assert abs(v - exp.get(e, 0.0)) < 1e-9


def test_betweenness_sampled_k(spark):
    """k-sampled estimate must equal the oracle restricted to the same
    sources (deterministic seeded sampling)."""
    g, adj, verts = _graph_and_adj(spark, "karate.csv", directed=False)
    import pyspark.sql.functions as F

    k, seed = 8, 42
    sources = [
        r.vertex
        for r in g.vertices()
        .withColumn("h", F.xxhash64("vertex", F.lit(seed)))
        .orderBy("h", "vertex")
        .limit(k)
        .collect()
    ]
    exp = oracle_brandes(adj, verts, True, directed=False, sources=sources)
    got = {
        r.vertex: r.betweenness_centrality
        for r in betweenness_centrality(g, k=k, seed=seed).collect()
    }
    for v in verts:
        assert abs(got[v] - exp[v]) < 1e-9


def test_betweenness_explicit_source_list(spark):
    """k as an explicit vertex list (the reference's 'k : int or list'
    form) must equal the oracle restricted to exactly those sources."""
    g, adj, verts = _graph_and_adj(spark, "karate.csv", directed=False)
    sources = [v for v in sorted(verts) if v % 3 == 0]
    exp = oracle_brandes(adj, verts, True, directed=False, sources=sources)
    got = {
        r.vertex: r.betweenness_centrality
        for r in betweenness_centrality(g, k=sources).collect()
    }
    for v in verts:
        assert abs(got[v] - exp[v]) < 1e-9
