"""ANF / effective diameter — accuracy vs exact transitive closure,
fixpoint behavior, and estimator sanity."""

import numpy as np

from linkgraph import Graph
from linkgraph.algorithms.anf import effective_diameter, neighborhood_function


def _exact_nf(edges, n, max_t):
    """N(t) = # ordered pairs (u,v), v reachable from u in <= t hops,
    including u itself (matches the sketch: own bit is always set)."""
    A = np.zeros((n, n), dtype=bool)
    for s, d in edges:
        A[s, d] = True
    R = np.eye(n, dtype=bool)
    out = [int(R.sum())]
    for _ in range(max_t):
        R = R | (A @ R)  # one more hop: u -> w -> (reach of w)
        out.append(int(R.sum()))
    return out


def test_path_graph_fixpoint_is_diameter(spark):
    edges = [(i, i + 1) for i in range(9)]
    g = Graph.from_edgelist(
        spark.createDataFrame(edges, "src long, dst long"),
        directed=True, renumber=False,
    )
    curve, _ = neighborhood_function(g, max_hops=20, num_registers=16,
                                     hash_mode="lcg")
    # early-stop fires one hop after the last register change; the last
    # CHANGE happens exactly at the diameter (9 for the 10-vertex path)
    assert len(curve) - 2 == 9
    totals = [pt["reg_total"] for pt in curve]
    assert totals == sorted(totals)  # monotone: balls only grow


def test_estimate_tracks_exact_closure(spark):
    rng = np.random.default_rng(11)
    n = 300
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, n, size=(900, 2)) if a != b}
    )
    g = Graph.from_edgelist(
        spark.createDataFrame(edges, "src long, dst long"),
        directed=True, renumber=False,
    )
    exact = _exact_nf(edges, n, 12)
    curve, _ = neighborhood_function(g, max_hops=12, num_registers=64,
                                     hash_mode="xxhash")
    # FM stddev ~ 0.78/sqrt(64) ~ 10%; allow 25% at the converged tail
    # (plus small-n bias at t=0, which we do not assert on)
    last = min(len(curve), len(exact)) - 1
    rel = abs(curve[last]["n_est"] - exact[last]) / exact[last]
    assert rel < 0.25, (curve[last], exact[last])
    # monotone curve
    ests = [pt["n_est"] for pt in curve]
    assert all(b >= a * 0.999 for a, b in zip(ests, ests[1:]))


def test_lcg_mode_is_deterministic(spark):
    edges = [(i, (i * 7 + 3) % 50) for i in range(50)]
    g = Graph.from_edgelist(
        spark.createDataFrame(edges, "src long, dst long"),
        directed=True, renumber=False,
    )
    _, sk1 = neighborhood_function(g, max_hops=4, num_registers=4,
                                   hash_mode="lcg", return_sketches=True)
    _, sk2 = neighborhood_function(g, max_hops=4, num_registers=4,
                                   hash_mode="lcg", return_sketches=True)
    r1 = sorted((r.vertex, r.j, r.mask) for r in sk1.collect())
    r2 = sorted((r.vertex, r.j, r.mask) for r in sk2.collect())
    assert r1 == r2


def test_effective_diameter_on_cycle(spark):
    # directed 12-cycle: every vertex reaches all 12 at t=11;
    # N(t) = 12*(t+1) exactly linear, so d_eff(0.9) ~ 0.9*11 = 9.9
    edges = [(i, (i + 1) % 12) for i in range(12)]
    g = Graph.from_edgelist(
        spark.createDataFrame(edges, "src long, dst long"),
        directed=True, renumber=False,
    )
    d = effective_diameter(g, q=0.9, max_hops=20, num_registers=64,
                           hash_mode="xxhash")
    assert 8.0 <= d <= 11.0, d
