"""BFS / SSSP vs pure-Python oracles (ports of tests/test_bfs.py and
tests/test_sssp.py differential patterns)."""

import heapq

import pyspark.sql.functions as F
import pytest

from conftest import load_csv_edges
from linkgraph import Graph, bfs, filter_unreachable, shortest_path_length, sssp


def _adj(g, weighted=False):
    rows = g.edges.collect()
    adj = {}
    for r in rows:
        adj.setdefault(r.src, []).append((r.dst, r.weight if weighted else 1.0))
    return adj


def oracle_bfs(adj, start, V):
    dist, pred = {start: 0}, {start: -1}
    frontier = [start]
    d = 0
    while frontier:
        d += 1
        nxt = {}
        for u in frontier:
            for v, _ in adj.get(u, []):
                if v not in dist:
                    nxt.setdefault(v, u)
        for v in nxt:
            dist[v] = d
            # deterministic min-predecessor among frontier parents
            parents = [u for u in frontier for w, _ in adj.get(u, []) if w == v]
            pred[v] = min(parents)
        frontier = list(nxt)
    return dist, pred


def oracle_dijkstra(adj, start):
    dist = {start: 0.0}
    pq = [(0.0, start)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_bfs_karate(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    adj = _adj(g)
    exp_dist, exp_pred = oracle_bfs(adj, 0, g.number_of_vertices())
    res = {r.vertex: (r.distance, r.predecessor) for r in bfs(g, 0).collect()}
    assert len(res) == 34
    for v, (d, p) in res.items():
        assert d == exp_dist.get(v), f"distance mismatch at {v}"
        assert p == (exp_pred.get(v) if v != 0 else -1) or v == 0
    assert res[0] == (0, -1)


def test_bfs_unreachable_and_depth_limit(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    res = {r.vertex: r.distance for r in bfs(g, 0).collect()}
    assert res[0] == 0 and res[1] == 1 and res[2] == 2
    assert res[5] is None and res[6] is None  # unreachable
    lim = {r.vertex: r.distance for r in bfs(g, 0, depth_limit=1).collect()}
    assert lim[2] is None
    reach = filter_unreachable(bfs(g, 0))
    assert reach.count() == 3


def test_bfs_renumbered_string_ids(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src STRING, dst STRING")
    g = Graph.from_edgelist(e, renumber=True, directed=True)
    res = {r.vertex: r.distance for r in bfs(g, "a").collect()}
    assert res == {"a": 0, "b": 1, "c": 2}


@pytest.mark.parametrize("dataset", ["karate.csv", "karate-asymmetric.csv"])
def test_sssp_vs_dijkstra(spark, dataset):
    directed = "asym" in dataset
    g = Graph.from_edgelist(
        load_csv_edges(spark, dataset), weight="weight", renumber=False, directed=directed
    )
    adj = _adj(g, weighted=True)
    exp = oracle_dijkstra(adj, 1)
    res = {r.vertex: r.distance for r in sssp(g, 1).collect()}
    for v, d in res.items():
        if d is None:
            assert v not in exp
        else:
            assert abs(d - exp[v]) < 1e-9, f"distance mismatch at {v}"


def test_sssp_weighted_vs_hops(spark):
    # weights make the 2-hop path cheaper than the 1-hop path
    e = spark.createDataFrame(
        [(0, 2, 10.0), (0, 1, 1.0), (1, 2, 1.0)], "src LONG, dst LONG, weight DOUBLE"
    )
    g = Graph.from_edgelist(e, weight="weight", renumber=False, directed=True)
    res = {r.vertex: (r.distance, r.predecessor) for r in sssp(g, 0).collect()}
    assert res[2] == (2.0, 1)
    assert shortest_path_length(g, 0, 2) == 2.0


def test_sssp_negative_weight_rejected(spark):
    e = spark.createDataFrame([(0, 1, -1.0)], "src LONG, dst LONG, weight DOUBLE")
    g = Graph.from_edgelist(e, weight="weight", renumber=False, directed=True)
    with pytest.raises(ValueError):
        sssp(g, 0)


def test_shortest_path_alias_and_all_targets(spark):
    from linkgraph import shortest_path

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (0, 3, 10.0)], "src LONG, dst LONG, weight DOUBLE"
    )
    g = Graph.from_edgelist(e, weight="weight", renumber=False, directed=True)
    alias_rows = {(r.vertex, r.distance) for r in shortest_path(g, 0).collect()}
    sssp_rows = {(r.vertex, r.distance) for r in sssp(g, 0).collect()}
    assert alias_rows == sssp_rows
    # target=None returns the full distance table (reference sssp.py:262)
    all_d = {r.vertex: r.distance for r in shortest_path_length(g, 0).collect()}
    assert all_d[2] == 3.0 and all_d[3] == 10.0
    assert shortest_path_length(g, 0, 2) == 3.0


def test_bfs_sp_counter(spark):
    """sp_counter = number of shortest paths from the source (reference
    traversal/bfs.py return_sp_counter)."""
    # diamond: 0->1, 0->2, 1->3, 2->3 -> two shortest paths to 3
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], "src LONG, dst LONG"
    )
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    res = {r.vertex: (r.distance, r.sp_counter)
           for r in bfs(g, 0, return_sp_counter=True).collect()}
    assert res[0] == (0, 1.0)
    assert res[1] == (1, 1.0) and res[2] == (1, 1.0)
    assert res[3] == (2, 2.0)
    assert res[4] == (3, 2.0)
    # default: no sp_counter column (unchanged contract)
    assert "sp_counter" not in bfs(g, 0).columns


def test_bfs_sssp_unrenumber_predecessor(spark):
    # reference bfs.py:179-180 / sssp.py:209-210: predecessor comes back in
    # EXTERNAL ids on renumbered graphs; the root's -1 sentinel -> null
    e = spark.createDataFrame(
        [(100, 200), (200, 300), (100, 400)], "src LONG, dst LONG"
    )
    g = Graph.from_edgelist(e, renumber=True, directed=True)
    res = {r.vertex: r.predecessor for r in bfs(g, 100).collect()}
    assert res[200] == 100 and res[300] == 200 and res[400] == 100
    assert res[100] is None  # root sentinel has no external key
    res_s = {r.vertex: r.predecessor for r in sssp(g, 100).collect()}
    assert res_s[300] == 200 and res_s[100] is None
