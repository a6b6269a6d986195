"""Katz / HITS vs NumPy oracles."""

import numpy as np
import pytest

from conftest import load_csv_edges
from linkgraph import Graph, KatzConvergenceError, hits, katz_centrality


def _coo(g):
    pdf = g.edges.toPandas()
    return pdf["src"].values, pdf["dst"].values


def oracle_katz(src, dst, V, alpha, beta, tol, max_iter):
    c = np.zeros(V)
    for _ in range(max_iter):
        new = np.zeros(V)
        np.add.at(new, dst, c[src])
        new = alpha * new + beta
        if np.abs(new - c).sum() < tol:
            c = new
            break
        c = new
    return c / np.sqrt((c * c).sum())


def oracle_hits(src, dst, V, max_iter, tol):
    h = np.full(V, 1.0 / V)
    a = np.full(V, 1.0 / V)
    for _ in range(max_iter):
        a_new = np.zeros(V)
        np.add.at(a_new, dst, h[src])
        a_new /= a_new.sum() or 1.0
        h_new = np.zeros(V)
        np.add.at(h_new, src, a_new[dst])
        h_new /= h_new.sum() or 1.0
        d = np.abs(h_new - h).sum() + np.abs(a_new - a).sum()
        h, a = h_new, a_new
        if d < tol:
            break
    return h, a


def test_katz_karate(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    V = g.number_of_vertices()
    src, dst = _coo(g)
    alpha = 1.0 / 34.0  # 1/(max total degree 17*2) as our degree() doubles undirected
    dmax = max(np.bincount(np.concatenate([src]), minlength=V).max(), 1)
    res = katz_centrality(g, alpha=0.02, tol=1e-9, max_iter=1000)
    got = {r.vertex: r.katz_centrality for r in res.collect()}
    exp = oracle_katz(src, dst, V, 0.02, 1.0, 1e-9, 1000)
    for v in range(V):
        assert abs(got[v] - exp[v]) < 1e-6


def test_katz_divergence_raises(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    with pytest.raises(KatzConvergenceError):
        katz_centrality(g, alpha=0.9, tol=1e-12, max_iter=5)


def test_hits_asymmetric(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate-asymmetric.csv"),
        weight="weight",
        renumber=False,
        directed=True,
    )
    V = g.number_of_vertices()
    src, dst = _coo(g)
    res = hits(g, max_iter=50, tol=1e-8)
    got = {r.vertex: (r.hubs, r.authorities) for r in res.collect()}
    h, a = oracle_hits(src, dst, V, 50, 1e-8)
    for v in range(V):
        assert abs(got[v][0] - h[v]) < 1e-6
        assert abs(got[v][1] - a[v]) < 1e-6


def test_katz_nstart_converges_to_same_fixpoint(spark):
    """nstart is an initial guess — the fixpoint is unique for alpha <
    1/lambda_max, so warm and cold starts must agree (reference
    katz_centrality.py:80-86)."""
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False,
        directed=False,
    )
    cold = {r.vertex: r.katz_centrality
            for r in katz_centrality(g, alpha=0.02, tol=1e-9, max_iter=1000).collect()}
    ns = spark.createDataFrame(
        [(v, 0.5) for v in range(0, g.number_of_vertices(), 2)],
        "vertex LONG, values DOUBLE",
    )
    warm = {r.vertex: r.katz_centrality
            for r in katz_centrality(g, alpha=0.02, tol=1e-9, max_iter=1000,
                                     nstart=ns).collect()}
    for v in cold:
        assert abs(cold[v] - warm[v]) < 1e-6


def test_katz_nstart_external_ids(spark):
    """nstart carries EXTERNAL ids on a renumbered graph."""
    e = spark.createDataFrame(
        [(100, 200), (200, 300), (300, 100)], "src LONG, dst LONG"
    )
    g = Graph.from_edgelist(e, renumber=True, directed=True)
    ns = spark.createDataFrame(
        [(100, 1.0), (200, 1.0), (300, 1.0)], "vertex LONG, values DOUBLE"
    )
    res = katz_centrality(g, alpha=0.1, tol=1e-9, max_iter=500, nstart=ns)
    got = {r.vertex: r.katz_centrality for r in res.collect()}
    assert set(got) == {100, 200, 300}
    # symmetric cycle: all three scores equal
    vals = list(got.values())
    assert max(vals) - min(vals) < 1e-9


def test_hits_nstart_and_fused_delta(spark):
    """nstart seeds the hub vector; with a uniform nstart the result equals
    the default init, and the fused-delta iteration still matches the
    NumPy oracle."""
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate-asymmetric.csv"), weight="weight",
        renumber=False, directed=True,
    )
    V = g.number_of_vertices()
    src, dst = _coo(g)
    ns = spark.createDataFrame(
        [(v, 2.5) for v in range(V)], "vertex LONG, values DOUBLE"
    )
    res = hits(g, max_iter=50, tol=1e-8, nstart=ns)
    got = {r.vertex: (r.hubs, r.authorities) for r in res.collect()}
    h, a = oracle_hits(src, dst, V, 50, 1e-8)
    for v in range(V):
        assert abs(got[v][0] - h[v]) < 1e-6
        assert abs(got[v][1] - a[v]) < 1e-6


def oracle_salsa(src, dst, V, iters):
    """NumPy replay of salsa.py's documented message-passing recurrence."""
    W = np.zeros((V, V))
    W[src, dst] = 1.0
    od, idg = W.sum(1), W.sum(0)
    inv_out = np.where(od > 0, 1.0 / np.where(od > 0, od, 1), 0.0)
    inv_in = np.where(idg > 0, 1.0 / np.where(idg > 0, idg, 1), 0.0)
    h = np.full(V, 1.0 / V)
    a = np.full(V, 1.0 / V)
    t = W @ (a * inv_in)
    for _ in range(iters):
        p, r = W.T @ (h * inv_out), W.T @ (t * inv_out)
        a_n = r / r.sum()
        q = p
        z, s = W @ (q * inv_in), W @ (a_n * inv_in)
        h = z / z.sum()
        t = s
        a = a_n
    return h, a


def test_salsa_vs_numpy(spark):
    from linkgraph import salsa

    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate-asymmetric.csv"), weight="weight",
        renumber=False, directed=True,
    )
    V = g.number_of_vertices()
    src, dst = _coo(g)
    res = salsa(g, fixed_iterations=7)
    got = {r.vertex: (r.hubs, r.authorities) for r in res.collect()}
    h, a = oracle_salsa(src, dst, V, 7)
    for v in range(V):
        assert abs(got[v][0] - h[v]) < 1e-9
        assert abs(got[v][1] - a[v]) < 1e-9


def test_salsa_stationary_is_degree_proportional(spark):
    """Lempel-Moran: when the authority chain is irreducible (connected
    co-citation structure — here every authority shares hub 0) the
    converged authority distribution is proportional to in-degree and the
    hub distribution to out-degree. This pins the walk's normalization
    direction: normalizing at the RECEIVING end instead converges to
    uniform, not degree-proportional."""
    from linkgraph import salsa

    edges = (
        [(0, j) for j in range(3, 8)]
        + [(1, 3), (1, 4), (2, 5), (2, 6)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edgelist(df, directed=True, renumber=False)
    res = salsa(g, max_iter=500, tol=1e-12).collect()
    idg = {}
    od = {}
    for s, d in edges:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    E = len(edges)
    for r in res:
        assert abs(r.authorities - idg.get(r.vertex, 0) / E) < 1e-6
        assert abs(r.hubs - od.get(r.vertex, 0) / E) < 1e-6


# ---------------------------------------------------------------------------
# eigenvector centrality (shifted power iteration, NetworkX semantics)
# ---------------------------------------------------------------------------


def oracle_eigenvector(src, dst, V, max_iter, tol, fixed=None):
    x = np.full(V, 1.0)
    x /= np.sqrt((x * x).sum())
    it = fixed if fixed is not None else max_iter
    for _ in range(it):
        new = x.copy()
        np.add.at(new, dst, x[src])
        nrm = np.sqrt((new * new).sum())
        new /= nrm
        d = np.abs(new - x).sum()
        x = new
        if fixed is None and d < V * tol:
            break
    return x


def test_eigenvector_karate(spark):
    from linkgraph import eigenvector_centrality

    g = Graph.from_edgelist(load_csv_edges(spark, "karate.csv"), renumber=False, directed=False)
    V = g.number_of_vertices()
    src, dst = _coo(g)
    res = eigenvector_centrality(g, tol=1e-9, max_iter=1000)
    got = {r.vertex: r.eigenvector_centrality for r in res.collect()}
    exp = oracle_eigenvector(src, dst, V, 1000, 1e-9)
    for v in range(V):
        assert abs(got[v] - exp[v]) < 1e-6


def test_eigenvector_fixed_iterations_and_bipartite(spark):
    """Plain power iteration zeroes on a directed bipartite DAG; the shifted
    recurrence must not — and fixed_iterations must match the unrolled
    oracle step for step."""
    from linkgraph import eigenvector_centrality

    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (1, 3)], ["src", "dst"]
    )
    g = Graph.from_edgelist(edges, renumber=False, directed=True)
    V = g.number_of_vertices()
    src, dst = _coo(g)
    for iters in (1, 3):
        res = eigenvector_centrality(g, fixed_iterations=iters)
        got = {r.vertex: r.eigenvector_centrality for r in res.collect()}
        exp = oracle_eigenvector(src, dst, V, 0, 0, fixed=iters)
        for v in range(V):
            assert abs(got[v] - exp[v]) < 1e-9


def test_eigenvector_nstart_zero_raises(spark):
    from linkgraph import eigenvector_centrality

    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    g = Graph.from_edgelist(edges, renumber=False, directed=True)
    ns = spark.createDataFrame([(0, 0.0), (1, 0.0)], ["vertex", "values"])
    with pytest.raises(ValueError):
        eigenvector_centrality(g, nstart=ns)
