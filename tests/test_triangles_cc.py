"""Per-vertex triangle counts + local clustering coefficient vs a
brute-force itertools oracle on a fixed small graph."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.triangles import (
    clustering_coefficient,
    triangle_count,
    triangle_counts,
)
from linkgraph.structure.graph import Graph

EDGES = [
    (0, 1), (1, 2), (0, 2),          # triangle 0-1-2
    (2, 3), (3, 4), (2, 4), (3, 4),  # triangle 2-3-4 (with a dup edge)
    (4, 5), (5, 6),                  # path tail
    (7, 7),                          # self-loop
    (0, 3),
]


@pytest.fixture(scope="module")
def g(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    return Graph.from_edgelist(df, directed=False, renumber=False)


def _brute():
    nbrs: dict[int, set[int]] = {}
    for u, v in EDGES:
        if u == v:
            nbrs.setdefault(u, set())
            continue
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    V = max(max(u, v) for u, v in EDGES) + 1
    t = {v: 0 for v in range(V)}
    for a, b, c in combinations(sorted(nbrs), 3):
        if b in nbrs[a] and c in nbrs[a] and c in nbrs[b]:
            for x in (a, b, c):
                t[x] += 1
    d = {v: len(nbrs.get(v, ())) for v in range(V)}
    return t, d


def test_per_vertex_counts(g):
    t, _ = _brute()
    got = {r.vertex: r.counts for r in triangle_counts(g).collect()}
    assert got == t
    # corners sum to 3x the scalar API
    assert sum(got.values()) == 3 * triangle_count(g)


def test_clustering_coefficient(g):
    t, d = _brute()
    rows = {r.vertex: r for r in clustering_coefficient(g).collect()}
    assert set(rows) == set(t)
    for v, r in rows.items():
        assert r.triangles == t[v]
        assert r.nbr_degree == d[v]
        exp = 2.0 * t[v] / (d[v] * (d[v] - 1)) if d[v] > 1 else 0.0
        assert r.local_cc == pytest.approx(exp, abs=0)
