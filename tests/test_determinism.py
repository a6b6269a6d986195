"""Determinism across partitionings and runs (SURVEY §5.2.2).

Integer-state algorithms (WCC/LPA/BFS labels & distances) must be
bit-identical across different parallelism; float algorithms (PageRank) must
be bit-identical across REPEATED runs at the same configuration and
allclose(1e-12) across partitionings (double sum order differs)."""

import pyspark.sql.functions as F

from conftest import load_csv_edges
from linkgraph import Graph, bfs, label_propagation, pagerank, weakly_connected_components
from linkgraph.algorithms.traversal import multi_source_bfs


def _g(spark):
    return Graph.from_edgelist(
        load_csv_edges(spark, "karate-disjoint.csv"),
        weight="weight",
        renumber=False,
        directed=False,
    )


def test_wcc_lpa_identical_across_partitionings(spark):
    g = _g(spark)
    for fn, kw in [(weakly_connected_components, {}), (label_propagation, {"fixed_iterations": 4})]:
        a = {r.vertex: r.labels for r in fn(g, num_partitions=1, **kw).collect()}
        b = {r.vertex: r.labels for r in fn(g, num_partitions=8, **kw).collect()}
        assert a == b


def test_pagerank_repeat_bitwise_and_cross_partition_close(spark):
    g = _g(spark)
    a = {r.vertex: r.pagerank for r in pagerank(g, tol=1e-6, max_iter=500, num_partitions=4).collect()}
    b = {r.vertex: r.pagerank for r in pagerank(g, tol=1e-6, max_iter=500, num_partitions=4).collect()}
    assert a == b  # bitwise repeatability at fixed configuration
    c = {r.vertex: r.pagerank for r in pagerank(g, tol=1e-6, max_iter=500, num_partitions=8).collect()}
    assert all(abs(a[v] - c[v]) < 1e-9 for v in a)


def test_bfs_deterministic_predecessors(spark):
    g = _g(spark)
    a = sorted(map(tuple, bfs(g, 0, num_partitions=1).collect()))
    b = sorted(map(tuple, bfs(g, 0, num_partitions=8).collect()))
    assert a == b


def test_multi_source_bfs(spark):
    g = _g(spark)
    res = multi_source_bfs(g, [0, 100], depth_limit=2)
    d = {(r.seed, r.vertex): r.distance for r in res.collect()}
    assert d[(0, 0)] == 0 and d[(100, 100)] == 0
    # balls stay in their own components
    assert all(s < 100 and v < 100 or (s >= 100 and v >= 100) for s, v in d)


def test_spectral_identical_across_partitionings(spark):
    from linkgraph import spectral_balanced_cut_clustering

    g = _g(spark)
    a = {r.vertex: r.cluster for r in spectral_balanced_cut_clustering(
        g, num_clusters=2, num_partitions=1).collect()}
    b = {r.vertex: r.cluster for r in spectral_balanced_cut_clustering(
        g, num_clusters=2, num_partitions=8).collect()}
    # labels are k-means ids; partition structure must match exactly
    from collections import defaultdict

    def sets(d):
        out = defaultdict(set)
        for v, c in d.items():
            out[c].add(v)
        return sorted(out.values(), key=min)

    assert sets(a) == sets(b)


def test_fa2_close_across_partitionings(spark):
    from linkgraph import force_atlas2

    g = _g(spark)
    a = {r.vertex: (r.x, r.y) for r in force_atlas2(
        g, max_iter=5, num_partitions=1).collect()}
    b = {r.vertex: (r.x, r.y) for r in force_atlas2(
        g, max_iter=5, num_partitions=8).collect()}
    # float force sums reorder across partitionings -> allclose, not bitwise
    assert all(
        abs(a[v][0] - b[v][0]) < 1e-6 and abs(a[v][1] - b[v][1]) < 1e-6
        for v in a
    )
