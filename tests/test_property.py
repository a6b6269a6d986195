"""Property-based structure tests (hypothesis) — random small edge lists
exercise the invariants of SURVEY §1.3 that example-based suites only probe
pointwise: symmetrize dedup-min, dense degree-desc renumbering, WCC vs a
union-find oracle. The reference has no property testing (SURVEY §5.1);
these guard the invariants every algorithm builds on.
"""

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkgraph import Graph
from linkgraph.structure.symmetrize import symmetrize_edges

EDGE = st.tuples(
    st.integers(min_value=0, max_value=12),
    st.integers(min_value=0, max_value=12),
    st.integers(min_value=1, max_value=50),  # integer weights: exact compares
)
EDGE_LISTS = st.lists(EDGE, min_size=1, max_size=40)

PROP = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(s, d, float(w)) for s, d, w in rows], "src LONG, dst LONG, weight DOUBLE"
    )


@given(rows=EDGE_LISTS)
@PROP
def test_symmetrize_dedup_min(spark, rows):
    got = {
        (r.src, r.dst): r.weight
        for r in symmetrize_edges(_df(spark, rows), weight="weight").collect()
    }
    exp = {}
    for s, d, w in rows:
        for a, b in ((s, d), (d, s)):
            k = (a, b)
            exp[k] = min(exp.get(k, float(w)), float(w))
    assert got == exp


@given(rows=EDGE_LISTS)
@PROP
def test_renumber_dense_degree_desc(spark, rows):
    g = Graph.from_edgelist(_df(spark, rows), directed=True, renumber=True)
    m = {r["key"]: r["vid"] for r in g.nmap.map.select("key", "vid").collect()}
    ids = sorted(m.values())
    assert ids == list(range(len(ids)))  # dense [0, V)
    # degree-descending internal order: out-degrees (raw edge rows, the
    # map's contract) of the id sequence must be non-increasing and match
    # a python recount
    outdeg = defaultdict(int)
    for s, _d, _w in rows:
        outdeg[s] += 1
    eng_deg = {
        r["key"]: r["out_degree"]
        for r in g.nmap.map.select("key", "out_degree").collect()
    }
    assert eng_deg == {v: outdeg[v] for v in eng_deg}
    by_id = sorted(m.items(), key=lambda kv: kv[1])
    degs = [outdeg[v] for v, _ in by_id]
    assert degs == sorted(degs, reverse=True)


@given(rows=EDGE_LISTS)
@PROP
def test_wcc_matches_union_find(spark, rows):
    from linkgraph import weakly_connected_components

    g = Graph.from_edgelist(
        _df(spark, rows).select("src", "dst"), directed=False, renumber=False
    )
    got = defaultdict(set)
    for r in weakly_connected_components(g).collect():
        got[r.labels].add(r.vertex)
    # union-find oracle over the max+1 vertex universe
    n = max(max(s, d) for s, d, _ in rows) + 1
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _ in rows:
        parent[find(s)] = find(d)
    exp = defaultdict(set)
    for v in range(n):
        exp[find(v)].add(v)
    assert sorted(map(sorted, got.values())) == sorted(map(sorted, exp.values()))


@given(rows=EDGE_LISTS)
@PROP
def test_pagerank_mass_conservation(spark, rows):
    from pyspark.sql import functions as F

    from linkgraph import pagerank

    g = Graph.from_edgelist(_df(spark, rows), directed=True, renumber=False)
    pr = pagerank(g, tol=1e-8, max_iter=200)
    total = pr.agg(F.sum("pagerank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)
    assert pr.filter(F.col("pagerank") <= 0).count() == 0


@given(rows=EDGE_LISTS)
@PROP
def test_triangle_count_matches_bruteforce(spark, rows):
    from itertools import combinations

    from linkgraph import triangle_count

    g = Graph.from_edgelist(
        _df(spark, rows).select("src", "dst"), directed=False, renumber=False
    )
    adj = defaultdict(set)
    for s, d, _ in rows:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    exp = sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert triangle_count(g) == exp
