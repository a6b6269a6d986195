"""M1: symmetrize / renumber / Graph structure tests (ports of the
reference's test_symmetrize.py / test_renumber.py / test_graph.py patterns)."""

import pyspark.sql.functions as F

from conftest import load_csv_edges
from linkgraph import Graph, build_number_map, symmetrize_edges, upper_triangle


def test_symmetrize_both_directions(spark):
    e = spark.createDataFrame([(0, 1, 2.0), (1, 2, 3.0)], "src LONG, dst LONG, weight DOUBLE")
    s = symmetrize_edges(e)
    rows = {(r.src, r.dst): r.weight for r in s.collect()}
    assert rows == {(0, 1): 2.0, (1, 0): 2.0, (1, 2): 3.0, (2, 1): 3.0}


def test_symmetrize_dedup_keeps_min_weight(spark):
    """structure/symmetrize.py:85 — parallel edges collapse to min weight."""
    e = spark.createDataFrame(
        [(0, 1, 5.0), (0, 1, 2.0), (1, 0, 9.0)], "src LONG, dst LONG, weight DOUBLE"
    )
    s = symmetrize_edges(e)
    rows = {(r.src, r.dst): r.weight for r in s.collect()}
    assert rows == {(0, 1): 2.0, (1, 0): 2.0}
    # directed (no symmetrize) still dedups to min
    d = symmetrize_edges(e, symmetrize=False)
    rows = {(r.src, r.dst): r.weight for r in d.collect()}
    assert rows == {(0, 1): 2.0, (1, 0): 9.0}
    # multigraph keeps duplicates (symmetrize.py:82-83)
    m = symmetrize_edges(e, symmetrize=False, multi=True)
    assert m.count() == 3


def test_multi_edge_dataset(spark, data_dir):
    raw = load_csv_edges(spark, "karate_multi_edge.csv")
    g = Graph.from_edgelist(raw, weight="weight", renumber=False, directed=False)
    # deduped: each (src,dst) appears once
    assert g.edges.groupBy("src", "dst").count().filter("count > 1").count() == 0


def test_self_loops_kept(spark, data_dir):
    raw = load_csv_edges(spark, "karate_s_loop.csv")
    g = Graph.from_edgelist(raw, weight="weight", renumber=False, directed=False)
    assert g.edges.filter(F.col("src") == F.col("dst")).count() > 0


def test_upper_triangle_view(spark, data_dir):
    raw = load_csv_edges(spark, "karate.csv")
    g = Graph.from_edgelist(raw, weight="weight", renumber=False, directed=False)
    assert g.number_of_edges() == 78  # karate has 78 undirected edges
    assert upper_triangle(g.edges).filter(F.col("src") > F.col("dst")).count() == 0


def test_max_plus_one_vertex_rule(spark, data_dir):
    """simpleGraph.py:497-499 — vertex set is [0, max+1) without renumbering."""
    raw = load_csv_edges(spark, "karate-disjoint.csv")
    g = Graph.from_edgelist(raw, weight="weight", renumber=False, directed=False)
    assert g.number_of_vertices() == 134  # ids 0..33 and 100..133 -> max+1
    assert g.vertices().count() == 134


def test_renumber_dense_and_degree_descending(spark, data_dir):
    raw = load_csv_edges(spark, "karate.csv")
    nmap = build_number_map(raw)
    m = nmap.map.orderBy("vid").collect()
    vids = [r.vid for r in m]
    assert vids == list(range(34))  # dense [0, V)
    degs = [r.out_degree for r in m]
    assert degs == sorted(degs, reverse=True)  # degree-descending
    # vertex 33 has max degree (17) in karate; ties broken by key asc
    assert m[0].key == 33 and m[0].out_degree == 17


def test_renumber_string_roundtrip(spark):
    """String external ids (urls) -> dense ids -> back (number_map.py:475-517
    legacy renumber path capability)."""
    e = spark.createDataFrame(
        [("u_a", "u_b"), ("u_b", "u_c"), ("u_a", "u_c")], "src STRING, dst STRING"
    )
    g = Graph.from_edgelist(e, renumber=True, directed=True)
    assert g.number_of_vertices() == 3
    internal = g.edges.select("src", "dst").collect()
    assert all(isinstance(r.src, int) for r in internal)
    # unrenumber round trip reproduces the external edges
    back = g.unrenumber(g.unrenumber(g.edges.select("src", "dst"), "src"), "dst")
    got = {(r.src, r.dst) for r in back.collect()}
    assert got == {("u_a", "u_b"), ("u_b", "u_c"), ("u_a", "u_c")}


def test_renumber_composite_key_roundtrip(spark):
    """Multi-column external vertex ids — (host, path) pairs keyed as a
    tuple (number_map.py:475-517 column-list capability)."""
    e = spark.createDataFrame(
        [
            ("h1", "/a", "h1", "/b"),
            ("h1", "/b", "h2", "/a"),
            ("h2", "/a", "h1", "/a"),
            ("h1", "/a", "h2", "/a"),
        ],
        "sh STRING, sp STRING, dh STRING, dp STRING",
    )
    g = Graph.from_edgelist(
        e, src=["sh", "sp"], dst=["dh", "dp"], renumber=True, directed=True
    )
    # vertices: (h1,/a) deg2, (h1,/b) deg1, (h2,/a) deg1 -> dense [0,3)
    assert g.number_of_vertices() == 3
    m = {(r.key_0, r.key_1): r.vid for r in g.nmap.map.collect()}
    assert m[("h1", "/a")] == 0  # max out-degree first
    assert set(m.values()) == {0, 1, 2}
    internal = {(r.src, r.dst) for r in g.edges.collect()}
    assert internal == {
        (m[("h1", "/a")], m[("h1", "/b")]),
        (m[("h1", "/b")], m[("h2", "/a")]),
        (m[("h2", "/a")], m[("h1", "/a")]),
        (m[("h1", "/a")], m[("h2", "/a")]),
    }
    # unrenumber expands into per-key columns
    back = g.unrenumber(g.unrenumber(g.edges.select("src", "dst"), "src"), "dst")
    got = {(r.src_0, r.src_1, r.dst_0, r.dst_1) for r in back.collect()}
    assert got == {
        ("h1", "/a", "h1", "/b"),
        ("h1", "/b", "h2", "/a"),
        ("h2", "/a", "h1", "/a"),
        ("h1", "/a", "h2", "/a"),
    }
    # point lookups take key tuples
    assert g.has_node(("h2", "/a")) and not g.has_node(("h2", "/zz"))
    assert g.has_edge(("h1", "/a"), ("h2", "/a"))
    # pagerank end-to-end on a composite-keyed graph unrenumbers cleanly
    from linkgraph.algorithms.pagerank import pagerank

    pr = pagerank(g, max_iter=100)
    assert pr.count() == 3 and {"vertex_0", "vertex_1"} <= set(pr.columns)


def test_renumber_composite_requires_renumber(spark):
    e = spark.createDataFrame([("a", "b", "c", "d")], "sh STRING, sp STRING, dh STRING, dp STRING")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        Graph.from_edgelist(e, src=["sh", "sp"], dst=["dh", "dp"], renumber=False)


def test_isolated_vertices_renumbered_last(spark):
    """renumber_edgelist_impl.cuh:250-280 — isolated vertices appended after
    non-isolated; here as degree-0 sorting last."""
    e = spark.createDataFrame([("a", "b")], "src STRING, dst STRING")
    v = spark.createDataFrame([("a",), ("b",), ("zzz_iso",)], "vertex STRING")
    g = Graph.from_edgelist(e, renumber=True, directed=True, vertices=v)
    assert g.number_of_vertices() == 3
    m = {r.key: r.vid for r in g.nmap.map.collect()}
    assert m["zzz_iso"] == 2  # degree 0 -> last vid


def test_degrees(spark, data_dir):
    raw = load_csv_edges(spark, "karate.csv")
    g = Graph.from_edgelist(raw, weight="weight", renumber=False, directed=False)
    od = {r.vertex: r.degree for r in g.out_degree().collect()}
    assert od[33] == 17 and od[0] == 16  # known karate degrees
    # undirected: in == out
    idg = {r.vertex: r.degree for r in g.in_degree().collect()}
    assert od == idg


def test_two_hop_neighbors(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    pairs = {(r.first, r.second) for r in g.two_hop_neighbors().collect()}
    assert pairs == {(0, 2), (1, 3)}


def test_subgraph(spark, data_dir):
    raw = load_csv_edges(spark, "karate.csv")
    g = Graph.from_edgelist(raw, weight="weight", renumber=False, directed=False)
    verts = spark.createDataFrame([(0,), (1,), (2,)], "vertex LONG")
    sub = g.subgraph(verts)
    got = {(r.src, r.dst) for r in upper_triangle(sub.edges).collect()}
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_adjlist_views(spark):
    e = spark.createDataFrame([(0, 1), (0, 2), (1, 2)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    adj = {r.vertex: r.nbrs for r in g.view_adj_list().collect()}
    assert adj == {0: [1, 2], 1: [2]}
    tadj = {r.vertex: r.nbrs for r in g.view_transposed_adj_list().collect()}
    assert tadj == {1: [0], 2: [0, 1]}
    # round-trip: from_adjlist rebuilds the same COO
    g2 = Graph.from_adjlist(
        g.view_adj_list(), vid="vertex", nbrs="nbrs", renumber=False, directed=True
    )
    assert {(r.src, r.dst) for r in g2.edges.collect()} == {(0, 1), (0, 2), (1, 2)}


def test_point_lookups(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src STRING, dst STRING")
    g = Graph.from_edgelist(e, renumber=True, directed=True)
    assert g.has_node("a") and not g.has_node("zz")
    assert g.has_edge("a", "b") and not g.has_edge("a", "c")
    assert {r.vertex for r in g.neighbors("a").collect()} == {"b"}
