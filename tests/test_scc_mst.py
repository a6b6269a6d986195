"""SCC, MST/MSF, and weighted similarity vs pure-Python oracles."""

import pyspark.sql.functions as F
import pytest

from conftest import load_csv_edges
from linkgraph import Graph
from linkgraph.algorithms.link_prediction import jaccard_w, overlap_w, sorensen_w
from linkgraph.algorithms.mst import maximum_spanning_tree, minimum_spanning_tree
from linkgraph.algorithms.scc import strongly_connected_components


def oracle_scc(edges, vertices):
    """Iterative Tarjan."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    index_of, low, on_stack, stack = {}, {}, set(), []
    comps = {}
    counter = [0]
    for root in sorted(vertices):
        if root in index_of:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index_of[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = sorted(adj.get(v, []))
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index_of:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index_of[w])
            if not recurse:
                if low[v] == index_of[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    m = min(comp)
                    for w in comp:
                        comps[w] = m
                work.pop()
                if work:
                    p, _ = work[-1]
                    low[p] = min(low[p], low[v])
    return comps


def test_scc_cycle_and_tail(spark):
    # 0->1->2->0 cycle, 2->3->4 tail, 5 isolated
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)], "src LONG, dst LONG"
    )
    v = spark.createDataFrame([(i,) for i in range(6)], "vertex LONG")
    g = Graph.from_edgelist(e, renumber=True, directed=True, vertices=v)
    got = {r.vertex: r.labels for r in strongly_connected_components(g).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5}


def test_scc_matches_tarjan(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate-asymmetric.csv"),
        weight="weight",
        renumber=False,
        directed=True,
    )
    edges = [(r.src, r.dst) for r in g.edges.collect()]
    verts = [r.vertex for r in g.vertices().collect()]
    expected = oracle_scc(edges, verts)
    got = {r.vertex: r.labels for r in strongly_connected_components(g).collect()}
    assert got == expected


def test_scc_many_small_components_few_rounds(spark):
    """10³ disjoint small SCCs must resolve in O(1) outer rounds (bulk trim
    + multi-pivot coloring), not one driver round-trip per component."""
    edges = []
    for k in range(500):  # 500 2-cycles
        a, b = 2 * k, 2 * k + 1
        edges += [(a, b), (b, a)]
    for k in range(500):  # 500 triangles, each with a trim tail
        a = 1000 + 4 * k
        edges += [(a, a + 1), (a + 1, a + 2), (a + 2, a), (a + 2, a + 3)]
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    stats = {}
    got = {
        r.vertex: r.labels
        for r in strongly_connected_components(g, stats=stats).collect()
    }
    expected = oracle_scc(edges, sorted({v for p in edges for v in p}))
    assert got == expected
    assert stats["rounds"] <= 3, stats
    assert stats["bfs_iters"] <= 8, stats


def oracle_mst_weight(edges):
    """Kruskal total weight of the spanning forest."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total, count = 0.0, 0
    for w, u, v in sorted((w, min(u, v), max(u, v)) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            total += w
            count += 1
    return total, count


def test_mst_weighted_graph(spark):
    e = spark.createDataFrame(
        [
            (0, 1, 1.0), (1, 2, 2.0), (2, 0, 3.0),  # triangle: drop 3.0
            (2, 3, 1.5), (3, 4, 0.5), (4, 2, 5.0),  # triangle: drop 5.0
            (7, 8, 9.0),                             # separate component
        ],
        "src LONG, dst LONG, weight DOUBLE",
    )
    g = Graph.from_edgelist(e, weight="weight", renumber=False, directed=False)
    res = minimum_spanning_tree(g)
    rows = [(r.src, r.dst, r.weight) for r in res.collect()]
    exp_total, exp_count = oracle_mst_weight(
        [(r.src, r.dst, r.weight) for r in e.collect()]
    )
    assert len(rows) == exp_count
    assert abs(sum(w for _, _, w in rows) - exp_total) < 1e-9
    # MSF edges must connect everything each component spans
    assert (7, 8, 9.0) in rows


def test_mst_karate_matches_kruskal_weight(spark):
    raw = load_csv_edges(spark, "karate.csv")
    # synthesize distinct-ish weights deterministically
    weighted = raw.select(
        "src", "dst", (F.col("src") * 7 % 13 + F.col("dst") * 3 % 11 + 1.0).alias("weight")
    )
    g = Graph.from_edgelist(weighted, weight="weight", renumber=False, directed=False)
    res = minimum_spanning_tree(g)
    exp_total, exp_count = oracle_mst_weight(
        [(r.src, r.dst, r.weight) for r in g.edges.filter("src < dst").collect()]
    )
    got = res.collect()
    assert len(got) == exp_count == 33  # spanning tree of connected 34 vertices
    assert abs(sum(r.weight for r in got) - exp_total) < 1e-9
    mx = maximum_spanning_tree(g)
    assert sum(r.weight for r in mx.collect()) > exp_total


def test_weighted_similarity(spark):
    e = spark.createDataFrame(
        [(0, 2), (0, 3), (1, 2), (1, 3), (1, 4), (0, 1)], "src LONG, dst LONG"
    )
    g = Graph.from_edgelist(e, renumber=False, directed=False)
    w = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(5)], "vertex LONG, weight DOUBLE"
    )
    pairs = spark.createDataFrame([(0, 1)], "first LONG, second LONG")
    # N(0)={1,2,3}, N(1)={0,2,3,4}; inter={2,3} w=3+4=7; wa=2+3+4=9; wb=1+3+4+5=13
    jw = jaccard_w(g, w, pairs).collect()[0]
    assert abs(jw.jaccard_coeff - 7.0 / (9 + 13 - 7)) < 1e-9
    ow = overlap_w(g, w, pairs).collect()[0]
    assert abs(ow.overlap_coeff - 7.0 / 9.0) < 1e-9
    sw = sorensen_w(g, w, pairs).collect()[0]
    assert abs(sw.sorensen_coeff - 14.0 / 22.0) < 1e-9
