"""Frontier/state broadcast gating: every iterative algorithm must produce
identical results on the big-frontier (co-partitioned shuffle) path as on
the broadcast path. Forcing BROADCAST_STATE_MAX_V to 0 exercises the shuffle
path on small fixtures; by construction no state broadcast can then exceed
the gate (VERDICT r1 items 4-5)."""

import pytest

from conftest import load_csv_edges
from linkgraph import Graph


@pytest.fixture()
def karate_directed(spark):
    return Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False,
        directed=True,
    )


@pytest.fixture()
def karate_undirected(spark):
    return Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False,
        directed=False,
    )


def _force_shuffle_path(monkeypatch, *modules):
    for m in modules:
        monkeypatch.setattr(m, "BROADCAST_STATE_MAX_V", 0)


def test_egonet_gated_path_matches(spark, karate_directed, monkeypatch):
    import linkgraph.algorithms.egonet as egonet

    from linkgraph.algorithms.egonet import batched_ego_graphs

    want = sorted(
        (r.seed, r.vertex, r.distance)
        for r in batched_ego_graphs(karate_directed, [0, 33, 5], radius=3).collect()
    )
    _force_shuffle_path(monkeypatch, egonet)
    got = sorted(
        (r.seed, r.vertex, r.distance)
        for r in batched_ego_graphs(karate_directed, [0, 33, 5], radius=3).collect()
    )
    assert got == want and len(got) > 3


def test_betweenness_gated_path_matches(spark, karate_undirected, monkeypatch):
    import linkgraph.algorithms.betweenness as bc

    from linkgraph.algorithms.betweenness import betweenness_centrality

    want = {
        r.vertex: round(r.betweenness_centrality, 9)
        for r in betweenness_centrality(karate_undirected).collect()
    }
    _force_shuffle_path(monkeypatch, bc)
    got = {
        r.vertex: round(r.betweenness_centrality, 9)
        for r in betweenness_centrality(karate_undirected).collect()
    }
    assert got == want


def test_louvain_gated_path_matches(spark, karate_undirected, monkeypatch):
    import linkgraph.algorithms.louvain as lv

    want_df, want_q = lv.louvain(karate_undirected)
    want = {r.vertex: r.partition for r in want_df.collect()}
    _force_shuffle_path(monkeypatch, lv)
    got_df, got_q = lv.louvain(karate_undirected)
    got = {r.vertex: r.partition for r in got_df.collect()}
    assert got == want
    assert abs(got_q - want_q) < 1e-12


def test_scc_gated_path_matches(spark, monkeypatch):
    import linkgraph.algorithms.scc as sccmod

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (5, 0)],
        "src LONG, dst LONG",
    )
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    want = {
        r.vertex: r.labels
        for r in sccmod.strongly_connected_components(g).collect()
    }
    _force_shuffle_path(monkeypatch, sccmod)
    got = {
        r.vertex: r.labels
        for r in sccmod.strongly_connected_components(g).collect()
    }
    assert got == want == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}
