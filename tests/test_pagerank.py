"""M2: PageRank vs the NumPy oracle (port of the reference pytest pattern,
tests/test_pagerank.py:133-195: grid over personalization/nstart, tol=1e-6,
alpha=0.85)."""

import numpy as np
import pytest

from conftest import load_csv_edges
from linkgraph import Graph, PageRankConvergenceError, pagerank
from oracles import oracle_pagerank

ALPHA, TOL = 0.85, 1e-6


def _graph_arrays(g):
    pdf = g.edges.toPandas()
    w = pdf["weight"].values if "weight" in pdf.columns else None
    return pdf["src"].values, pdf["dst"].values, w


def _run_and_compare(g, V, personalization=None, nstart=None, spark=None):
    src, dst, w = _graph_arrays(g)
    expected = oracle_pagerank(
        src, dst, w, V, ALPHA, TOL, 500,
        personalization=personalization, nstart=nstart,
    )
    kwargs = {}
    if personalization is not None:
        kwargs["personalization"] = spark.createDataFrame(
            list(personalization.items()), "vertex LONG, values DOUBLE"
        )
    if nstart is not None:
        kwargs["nstart"] = spark.createDataFrame(
            list(nstart.items()), "vertex LONG, values DOUBLE"
        )
    res = pagerank(g, alpha=ALPHA, tol=TOL, max_iter=500, **kwargs)
    got = {r.vertex: r.pagerank for r in res.collect()}
    assert len(got) == V  # a row for ALL vertices (pagerank_wrapper.pyx:56-57)
    got_arr = np.array([got[v] for v in range(V)])
    np.testing.assert_allclose(got_arr, expected, atol=1e-6)


@pytest.mark.parametrize("dataset", ["karate.csv", "karate-disjoint.csv"])
def test_pagerank_undirected(spark, dataset):
    g = Graph.from_edgelist(
        load_csv_edges(spark, dataset), weight="weight", renumber=False, directed=False
    )
    _run_and_compare(g, g.number_of_vertices(), spark=spark)


def test_pagerank_directed_asymmetric(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate-asymmetric.csv"),
        weight="weight",
        renumber=False,
        directed=True,
    )
    _run_and_compare(g, g.number_of_vertices(), spark=spark)


@pytest.mark.parametrize("pers_frac", [0.1, 0.5])
def test_pagerank_personalization(spark, pers_frac):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    V = g.number_of_vertices()
    rng = np.random.default_rng(42)
    k = max(1, int(V * pers_frac))
    verts = rng.choice(V, size=k, replace=False)
    pers = {int(v): float(rng.random() + 0.01) for v in verts}
    _run_and_compare(g, V, personalization=pers, spark=spark)


def test_pagerank_nstart(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    V = g.number_of_vertices()
    nstart = {v: 1.0 + (v % 3) for v in range(V)}
    _run_and_compare(g, V, nstart=nstart, spark=spark)


def test_pagerank_unweighted(spark):
    e = load_csv_edges(spark, "karate.csv").select("src", "dst")
    g = Graph.from_edgelist(e, renumber=False, directed=False)
    _run_and_compare(g, g.number_of_vertices(), spark=spark)


def test_pagerank_dangling_and_isolated(spark):
    # 0->1->2, 2 dangling; 3 isolated (appears only via max+1 rule)
    e = spark.createDataFrame([(0, 1), (1, 2), (3, 2)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    V = g.number_of_vertices()
    assert V == 4
    _run_and_compare(g, V, spark=spark)


def test_pagerank_renumbered_string_ids(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src STRING, dst STRING"
    )
    g = Graph.from_edgelist(e, renumber=True, directed=True)
    res = pagerank(g, alpha=ALPHA, tol=TOL, max_iter=500)
    got = {r.vertex: r.pagerank for r in res.collect()}
    assert set(got) == {"a", "b", "c"}
    # oracle on the internal (renumbered) edge table
    src, dst, w = _graph_arrays(g)
    exp = oracle_pagerank(src, dst, w, 3, ALPHA, TOL, 500)
    m = {r.key: r.vid for r in g.nmap.map.collect()}
    for k, vid in m.items():
        assert abs(got[k] - exp[vid]) < 1e-6


def test_pagerank_max_iter_hard_failure(spark):
    """pagerank_impl.cuh:274-275 — CUGRAPH_FAIL on non-convergence."""
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    with pytest.raises(PageRankConvergenceError):
        pagerank(g, alpha=ALPHA, tol=1e-12, max_iter=2)
