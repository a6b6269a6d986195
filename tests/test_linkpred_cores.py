"""Jaccard/Overlap/Sorensen + core-number/k-core + ego graph + hypergraph."""

import pyspark.sql.functions as F

from conftest import load_csv_edges
from linkgraph import (
    Graph,
    batched_ego_graphs,
    core_number,
    ego_graph,
    hypergraph,
    jaccard,
    k_core,
    overlap,
    sorensen,
)


def _nbrs(g):
    adj = {}
    for r in g.edges.collect():
        if r.src != r.dst:
            adj.setdefault(r.src, set()).add(r.dst)
    return adj


def test_similarity_coefficients_karate(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    adj = _nbrs(g)
    jc = {(r.source, r.destination): r.jaccard_coeff for r in jaccard(g).collect()}
    ov = {(r.source, r.destination): r.overlap_coeff for r in overlap(g).collect()}
    so = {(r.source, r.destination): r.sorensen_coeff for r in sorensen(g).collect()}
    assert len(jc) == 78  # one row per undirected edge (jaccard.py:35-42)
    for (u, v), coeff in jc.items():
        cn = len(adj[u] & adj[v])
        union = len(adj[u]) + len(adj[v]) - cn
        assert abs(coeff - (cn / union if union else 0.0)) < 1e-9
        assert abs(ov[(u, v)] - (cn / min(len(adj[u]), len(adj[v])))) < 1e-9
        assert abs(so[(u, v)] - (2 * cn / (len(adj[u]) + len(adj[v])))) < 1e-9


def test_jaccard_explicit_pairs(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    pairs = spark.createDataFrame([(0, 33), (0, 1)], "first LONG, second LONG")
    res = {(r.source, r.destination): r.jaccard_coeff for r in jaccard(g, pairs).collect()}
    assert set(res) == {(0, 33), (0, 1)}
    adj = _nbrs(g)
    cn = len(adj[0] & adj[33])
    assert abs(res[(0, 33)] - cn / (len(adj[0]) + len(adj[33]) - cn)) < 1e-9


def test_core_number_karate(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    got = {r.vertex: r.core_number for r in core_number(g).collect()}
    # networkx-known karate core numbers: max core = 4, vertices 0 and 33 in it
    assert max(got.values()) == 4
    assert got[0] == 4 and got[33] == 4
    assert got[9] == 2  # known 2-core member
    # k_core subgraph only contains vertices with core >= k
    sub = k_core(g, k=4)
    members = {
        r.src for r in sub.edges.collect()
    } | {r.dst for r in sub.edges.collect()}
    assert members == {v for v, c in got.items() if c >= 4}


def test_core_number_isolated_zero(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src LONG, dst LONG")
    v = spark.createDataFrame([(0,), (1,), (2,), (9,)], "vertex LONG")
    g = Graph.from_edgelist(e, renumber=True, directed=False, vertices=v)
    got = {r.vertex: r.core_number for r in core_number(g).collect()}
    assert got == {0: 2, 1: 2, 2: 2, 9: 0}


def test_ego_graph(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 4)], "src LONG, dst LONG"
    )
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    ball = {(r.seed, r.vertex): r.distance for r in batched_ego_graphs(g, [0], radius=2).collect()}
    assert ball == {(0, 0): 0, (0, 1): 1, (0, 4): 1, (0, 2): 2}
    sub = ego_graph(g, 0, radius=1)
    got = {(r.src, r.dst) for r in sub.edges.collect()}
    assert got == {(0, 1), (0, 4)}
    multi = batched_ego_graphs(g, [0, 2], radius=1)
    assert multi.filter(F.col("seed") == 2).count() == 2  # {2, 3}


def test_hypergraph_bipartite_and_direct(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x")], "id LONG, u STRING, w STRING"
    )
    hg = hypergraph(df, columns=["u", "w"], event_id_col="id")
    edges = {(r.src, r.dst) for r in hg["edges"].collect()}
    assert edges == {
        ("event::1", "u::a"),
        ("event::1", "w::x"),
        ("event::2", "u::b"),
        ("event::2", "w::x"),
    }
    ents = {(r.node_id, r.category) for r in hg["entities"].collect()}
    assert ("u::a", "u") in ents and ("w::x", "w") in ents
    direct = hypergraph(df, columns=["u", "w"], direct=True, event_id_col="id")
    dedges = {(r.src, r.dst) for r in direct["edges"].collect()}
    assert dedges == {("u::a", "w::x"), ("u::b", "w::x")}
    # the bipartite edge list is a valid Graph input
    g = Graph.from_edgelist(hg["edges"], renumber=True, directed=False)
    assert g.number_of_vertices() == 5


def test_clustering_metrics(spark):
    """Modularity / edge-cut / ratio-cut vs hand-computed values on two
    triangles joined by one bridge edge."""
    from linkgraph.algorithms.clustering_metrics import (
        analyze_clustering_edge_cut,
        analyze_clustering_modularity,
        analyze_clustering_ratio_cut,
    )

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        "src LONG, dst LONG",
    )
    g = Graph.from_edgelist(e, renumber=False, directed=False)
    labels = spark.createDataFrame(
        [(v, 0 if v < 3 else 1) for v in range(6)], "vertex LONG, labels LONG"
    )
    # m=7; in_0=in_1=3; tot_0 = 2*3+1 = 7, tot_1 = 7
    exp_q = 2 * (3 / 7 - (7 / 14) ** 2)
    assert abs(analyze_clustering_modularity(g, labels) - exp_q) < 1e-9
    assert analyze_clustering_edge_cut(g, labels) == 1.0
    assert abs(analyze_clustering_ratio_cut(g, labels) - (1 / 3 + 1 / 3)) < 1e-9


def test_from_pandas_and_numpy(spark):
    import numpy as np
    import pandas as pd

    from linkgraph.structure.graph import from_numpy_array, from_pandas_edgelist

    pdf = pd.DataFrame({"src": [0, 1], "dst": [1, 2], "w": [1.0, 2.0]})
    g = from_pandas_edgelist(spark, pdf, edge_attr="w", directed=True, renumber=False)
    assert g.number_of_edges() == 2 and g.weighted
    a = np.array([[0, 1.0], [2.0, 0]])
    g2 = from_numpy_array(spark, a, directed=True)
    got = {(r.src, r.dst): r.weight for r in g2.edges.collect()}
    assert got == {(0, 1): 1.0, (1, 0): 2.0}


def test_linkpred_extras_karate(spark):
    """Adamic-Adar / resource-allocation / preferential-attachment / cosine
    vs a pure-Python brute force over the karate neighbor sets."""
    import math

    from linkgraph import (
        adamic_adar,
        cosine,
        link_scores,
        preferential_attachment,
        resource_allocation,
    )

    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight",
        renumber=False, directed=False,
    )
    adj = _nbrs(g)
    aa = {(r.source, r.destination): r.adamic_adar_coeff
          for r in adamic_adar(g).collect()}
    ra = {(r.source, r.destination): r.resource_allocation_coeff
          for r in resource_allocation(g).collect()}
    pa = {(r.source, r.destination): r.preferential_attachment_coeff
          for r in preferential_attachment(g).collect()}
    co = {(r.source, r.destination): r.cosine_coeff for r in cosine(g).collect()}
    ls = {(r.source, r.destination): (r.cn, r.pa, r.ra_e9)
          for r in link_scores(g).collect()}
    assert len(aa) == 78 and len(ls) == 78
    for (u, v) in aa:
        common = adj[u] & adj[v]
        du, dv = len(adj[u]), len(adj[v])
        assert abs(aa[(u, v)] - sum(1.0 / math.log(len(adj[w])) for w in common)) < 1e-9
        assert abs(ra[(u, v)] - sum(1.0 / len(adj[w]) for w in common)) < 1e-6
        assert pa[(u, v)] == du * dv
        assert abs(co[(u, v)] - (len(common) / math.sqrt(du * dv))) < 1e-9
        assert ls[(u, v)] == (
            len(common), du * dv,
            sum(1_000_000_000 // len(adj[w]) for w in common),
        )


def test_linkpred_extras_explicit_pairs(spark):
    """Non-adjacent pairs (the actual link-prediction use) and zero-cn pairs."""
    from linkgraph import adamic_adar, link_scores

    edges = [(0, 1), (0, 2), (3, 1), (3, 2), (4, 5)]
    g = Graph.from_edgelist(
        spark.createDataFrame(edges, "src long, dst long"),
        directed=False, renumber=False,
    )
    pairs = spark.createDataFrame([(0, 3), (0, 4)], "first long, second long")
    got = {(r.source, r.destination): r.adamic_adar_coeff
           for r in adamic_adar(g, pairs).collect()}
    import math
    assert abs(got[(0, 3)] - 2 / math.log(2)) < 1e-9  # common nbrs 1,2 (deg 2)
    assert got[(0, 4)] == 0.0
    ls = {(r.source, r.destination): (r.cn, r.pa, r.ra_e9)
          for r in link_scores(g, pairs).collect()}
    assert ls[(0, 3)] == (2, 4, 2 * (1_000_000_000 // 2))
    assert ls[(0, 4)] == (0, 2 * 1, 0)  # deg(0)=2, deg(4)=1
