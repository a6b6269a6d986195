"""M3: WCC + LPA + triangle counting vs oracles."""

import pyspark.sql.functions as F
import pytest

from conftest import load_csv_edges
from linkgraph import Graph, label_propagation, triangle_count, weakly_connected_components
from oracles import oracle_lpa, oracle_triangles, oracle_wcc


def _edges_and_vertices(g):
    pdf = g.edges.select("src", "dst").toPandas()
    verts = [r.vertex for r in g.vertices().collect()]
    return pdf["src"].tolist(), pdf["dst"].tolist(), verts


# ---- WCC -------------------------------------------------------------------

def test_wcc_karate_single_component(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    res = weakly_connected_components(g)
    labels = {r.vertex: r.labels for r in res.collect()}
    assert len(labels) == 34
    assert set(labels.values()) == {0}  # one component, canonical label = min id


def test_wcc_disjoint_matches_union_find(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate-disjoint.csv"),
        weight="weight",
        renumber=False,
        directed=False,
    )
    src, dst, verts = _edges_and_vertices(g)
    expected = oracle_wcc(src, dst, verts)
    got = {r.vertex: r.labels for r in weakly_connected_components(g).collect()}
    assert got == expected
    # component count & sorted size distribution (test_connectivity.py:310-318)
    import collections

    sizes = sorted(collections.Counter(got.values()).values())
    exp_sizes = sorted(collections.Counter(expected.values()).values())
    assert sizes == exp_sizes


def test_wcc_directed_symmetrizes(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate-asymmetric.csv"),
        weight="weight",
        renumber=False,
        directed=True,
    )
    src, dst, verts = _edges_and_vertices(g)
    # weak connectivity = connectivity of symmetrized graph
    expected = oracle_wcc(src + dst, dst + src, verts)
    got = {r.vertex: r.labels for r in weakly_connected_components(g).collect()}
    assert got == expected


def test_wcc_isolated_vertex_own_component(spark):
    e = spark.createDataFrame([(0, 1), (5, 6)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=False)
    got = {r.vertex: r.labels for r in weakly_connected_components(g).collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4, 5: 5, 6: 5}


# ---- LPA -------------------------------------------------------------------

def test_lpa_fixed_iterations_match_oracle(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    src, dst, verts = _edges_and_vertices(g)
    for iters in (1, 3, 5):
        expected = oracle_lpa(src, dst, verts, iters)
        got = {
            r.vertex: r.labels
            for r in label_propagation(g, fixed_iterations=iters).collect()
        }
        assert got == expected, f"mismatch at {iters} iterations"


def test_lpa_deterministic(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    a = {r.vertex: r.labels for r in label_propagation(g, fixed_iterations=4).collect()}
    b = {r.vertex: r.labels for r in label_propagation(g, fixed_iterations=4).collect()}
    assert a == b


def test_lpa_isolated_keeps_own_label(spark):
    e = spark.createDataFrame([(0, 1)], "src LONG, dst LONG")
    v = spark.createDataFrame([(0,), (1,), (9,)], "vertex LONG")
    g = Graph.from_edgelist(e, renumber=True, directed=False, vertices=v)
    got = {r.vertex: r.labels for r in label_propagation(g, fixed_iterations=3).collect()}
    # 9 is isolated: its community contains only itself
    assert len({k for k, lv in got.items() if lv == got[9]}) == 1


# ---- Triangles ---------------------------------------------------------------

@pytest.mark.parametrize(
    "dataset,known",
    [("karate.csv", 45), ("karate-disjoint.csv", 90)],
)
def test_triangles_known_counts(spark, dataset, known):
    g = Graph.from_edgelist(
        load_csv_edges(spark, dataset), weight="weight", renumber=False, directed=False
    )
    src, dst, _ = _edges_and_vertices(g)
    assert oracle_triangles(src, dst) == known
    assert triangle_count(g) == known


def test_triangles_self_loops_ignored(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate_s_loop.csv"),
        weight="weight",
        renumber=False,
        directed=False,
    )
    src, dst, _ = _edges_and_vertices(g)
    assert triangle_count(g) == oracle_triangles(src, dst)


def test_triangles_requires_undirected(spark):
    e = spark.createDataFrame([(0, 1)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    with pytest.raises(ValueError):
        triangle_count(g)
