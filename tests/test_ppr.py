"""Batched personalized PageRank (random-walk-with-restart) — dense numpy
oracle, mass conservation, renumbered external-id round-trip, top-k
semantics, and argument validation."""

import numpy as np
import pytest

from conftest import load_csv_edges
from linkgraph import Graph
from linkgraph.algorithms.ppr import batched_personalized_pagerank, ppr_topk

ALPHA = 0.85
ITERS = 12


def _dense_ppr(edges, n, seed, alpha=ALPHA, iters=ITERS):
    """Dense replay of the restart-to-seed update: r' = alpha*P^T r +
    e_seed * ((1-alpha) + alpha*dangling_mass)."""
    out = np.zeros(n)
    for s, d in edges:
        out[s] += 1.0
    P = np.zeros((n, n))
    for s, d in edges:
        P[s, d] += 1.0 / out[s]
    r = np.zeros(n)
    r[seed] = 1.0
    for _ in range(iters):
        dangling = sum(r[v] for v in range(n) if out[v] == 0)
        nxt = alpha * (P.T @ r)
        nxt[seed] += (1.0 - alpha) + alpha * dangling
        r = nxt
    return r


EDGES = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 0), (2, 3), (4, 0)]  # 5 is absent
N = 5


def _graph(spark, renumber=False):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    return Graph.from_edgelist(df, directed=True, renumber=renumber)


def test_matches_dense_oracle(spark):
    g = _graph(spark)
    res = batched_personalized_pagerank(g, [0, 2, 4], alpha=ALPHA, iterations=ITERS)
    got = {(r.seed, r.vertex): r.ppr for r in res.collect()}
    for seed in (0, 2, 4):
        want = _dense_ppr(EDGES, N, seed)
        for v in range(N):
            if want[v] == 0.0:
                assert (seed, v) not in got  # unreached vertices carry no rows
            else:
                assert got[(seed, v)] == pytest.approx(want[v], abs=1e-12)


def test_dangling_seed_keeps_unit_mass(spark):
    """A seed with no out-edges propagates nothing: its vector must stay
    exactly {seed: 1.0} every iteration. Pins the fused superstep's
    no-messages case — the restart row comes only from the constant +1
    seed row (no mirror rows exist), replacing the old coalesce(m, 0)
    left-join path."""
    df = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    g = Graph.from_edgelist(df, directed=True, renumber=False)
    rows = batched_personalized_pagerank(g, [2], alpha=ALPHA, iterations=5).collect()
    assert len(rows) == 1
    assert (rows[0].seed, rows[0].vertex, rows[0].ppr) == (2, 2, 1.0)


def test_mass_conservation(spark):
    g = _graph(spark)
    res = batched_personalized_pagerank(g, [0, 1, 2, 3], iterations=7).collect()
    mass = {}
    for r in res:
        mass[r.seed] = mass.get(r.seed, 0.0) + r.ppr
    assert set(mass) == {0, 1, 2, 3}
    for s, m in mass.items():
        assert m == pytest.approx(1.0, abs=1e-12)


def test_renumbered_external_ids(spark):
    ext = [(100 + s, 100 + d) for s, d in EDGES]
    g = Graph.from_edgelist(
        spark.createDataFrame(ext, ["src", "dst"]), directed=True, renumber=True
    )
    res = batched_personalized_pagerank(g, [102], alpha=ALPHA, iterations=ITERS)
    got = {r.vertex: r.ppr for r in res.collect()}
    want = _dense_ppr(EDGES, N, 2)
    assert set(got) == {100 + v for v in range(N) if want[v] > 0}
    for v in range(N):
        if want[v] > 0:
            assert got[100 + v] == pytest.approx(want[v], abs=1e-12)


def test_topk_ordering_and_seed_exclusion(spark):
    g = _graph(spark)
    rows = ppr_topk(g, [0, 2], k=2, alpha=ALPHA, iterations=ITERS).collect()
    by_seed = {}
    for r in rows:
        by_seed.setdefault(r.seed, []).append(r)
    for seed, rs in by_seed.items():
        rs.sort(key=lambda r: r.rnk)
        assert len(rs) == 2
        assert all(r.vertex != seed for r in rs)
        assert rs[0].ppr >= rs[1].ppr
        want = _dense_ppr(EDGES, N, seed)
        order = sorted(
            (v for v in range(N) if v != seed and want[v] > 0),
            key=lambda v: (-want[v], v),
        )
        assert [r.vertex for r in rs] == order[:2]


def test_topk_include_seed(spark):
    g = _graph(spark)
    rows = ppr_topk(g, [0], k=1, iterations=ITERS, include_seed=True).collect()
    assert len(rows) == 1 and rows[0].vertex == 0  # seed holds the most mass


def test_karate_sums_and_determinism(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), renumber=False, directed=False
    )
    a = sorted(
        (r.seed, r.vertex, round(r.ppr, 12))
        for r in batched_personalized_pagerank(g, [0, 33], iterations=6).collect()
    )
    b = sorted(
        (r.seed, r.vertex, round(r.ppr, 12))
        for r in batched_personalized_pagerank(g, [0, 33], iterations=6).collect()
    )
    assert a == b
    mass = {}
    for s, _v, p in a:
        mass[s] = mass.get(s, 0.0) + p
    for m in mass.values():
        assert m == pytest.approx(1.0, abs=1e-9)


def test_argument_validation(spark):
    g = _graph(spark)
    with pytest.raises(ValueError):
        batched_personalized_pagerank(g, [])
    with pytest.raises(ValueError):
        batched_personalized_pagerank(g, [0, 0])
    with pytest.raises(ValueError):
        batched_personalized_pagerank(g, [0], iterations=0)
    g2 = _graph(spark, renumber=True)
    with pytest.raises(ValueError):
        batched_personalized_pagerank(g2, [99])
    # non-renumbered graphs reject out-of-universe seeds too
    with pytest.raises(ValueError):
        batched_personalized_pagerank(g, [99])
    with pytest.raises(ValueError):
        batched_personalized_pagerank(g, [-1])


def test_string_vertex_ids_topk(spark):
    # regression: verify-drive found ppr_topk crashed on string external ids
    # (negation tie-break ran after unrenumbering); ranking now happens on
    # internal numeric ids.
    ext = [(f"u{s}", f"u{d}") for s, d in EDGES]
    g = Graph.from_edgelist(
        spark.createDataFrame(ext, ["src", "dst"]), directed=True, renumber=True
    )
    rows = ppr_topk(g, ["u0"], k=3, alpha=ALPHA, iterations=ITERS).collect()
    want = _dense_ppr(EDGES, N, 0)
    by_mass = sorted(
        (v for v in range(N) if v != 0 and want[v] > 0), key=lambda v: -want[v]
    )
    assert [r.vertex for r in sorted(rows, key=lambda r: r.rnk)] == [
        f"u{v}" for v in by_mass[:3]
    ]
    full = batched_personalized_pagerank(g, ["u0"], alpha=ALPHA, iterations=ITERS)
    got = {r.vertex: r.ppr for r in full.collect()}
    for v in range(N):
        if want[v] > 0:
            assert got[f"u{v}"] == pytest.approx(want[v], abs=1e-12)


def test_trustrank_matches_dense_personalized(spark):
    from linkgraph.algorithms.ppr import trustrank

    g = _graph(spark)
    trusted = [0, 3]
    res = {r.vertex: r.trust for r in
           trustrank(g, trusted, alpha=ALPHA, fixed_iterations=ITERS).collect()}
    # dense replay of the personalized update with uniform start
    out = np.zeros(N)
    for s, d in EDGES:
        out[s] += 1.0
    P = np.zeros((N, N))
    for s, d in EDGES:
        P[s, d] += 1.0 / out[s]
    p = np.zeros(N)
    for t in trusted:
        p[t] = 1.0 / len(trusted)
    r = np.full(N, 1.0 / N)
    for _ in range(ITERS):
        dangling = sum(r[v] for v in range(N) if out[v] == 0)
        r = (dangling * ALPHA + (1.0 - ALPHA)) * p + ALPHA * (P.T @ r)
    assert set(res) == set(range(N))
    for v in range(N):
        assert res[v] == pytest.approx(r[v], abs=1e-12)
    # untrusted sink pages starve: vertex 4 only links out, nothing links in
    assert res[4] == pytest.approx(0.0, abs=1e-12)


def test_trustrank_validation(spark):
    from linkgraph.algorithms.ppr import trustrank

    with pytest.raises(ValueError):
        trustrank(_graph(spark), [])
