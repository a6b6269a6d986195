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


# --- HyperBall harmonic centrality ------------------------------------------

from linkgraph.algorithms.anf import (  # noqa: E402
    LCG_A, LCG_C, LCG_J, LCG_M, LCG_TZ_CAP,
    harm_weight, harmonic_centrality, pow2_frac_table,
)


def _replay_harmonic(edges, n, r, seed, max_hops, mode):
    """Pure-Python replay of harmonic_centrality's lcg mode (exact ints)."""
    mask31 = LCG_M - 1
    if mode == "in":
        edges = [(d, s) for s, d in edges]
    out_nbrs = {}
    for s, d in edges:
        if s != d:
            out_nbrs.setdefault(s, set()).add(d)
    masks = {}
    for v in range(n):
        for j in range(r):
            h = (LCG_A * (v + j * LCG_J + seed) + LCG_C) % LCG_M
            h ^= (h << 13) & mask31
            h ^= h >> 17
            h ^= (h << 5) & mask31
            pos = LCG_TZ_CAP if h == 0 else min((h & -h).bit_length() - 1, LCG_TZ_CAP)
            masks[(v, j)] = 1 << pos
    frac = pow2_frac_table(r)

    def rt(v):
        tot = 0
        for j in range(r):
            m = masks[(v, j)]
            tot += bin(m & ~(m + 1) & ((1 << 62) - 1)).count("1")
        return tot

    def ball(v):
        t = rt(v)
        return (1 << (t // r)) * frac[t % r]

    prev = {v: ball(v) for v in range(n)}
    acc = {v: 0 for v in range(n)}
    sumdist = {v: 0 for v in range(n)}
    for t in range(1, max_hops + 1):
        new = {}
        for v in range(n):
            for j in range(r):
                m = masks[(v, j)]
                for w in out_nbrs.get(v, ()):
                    m |= masks[(w, j)]
                new[(v, j)] = m
        masks = new
        w_t = harm_weight(t)
        for v in range(n):
            b = ball(v)
            acc[v] += (b - prev[v]) * w_t
            sumdist[v] += (b - prev[v]) * t
            prev[v] = b
    return acc, sumdist


def test_harmonic_matches_pure_python_replay(spark):
    rng = np.random.default_rng(7)
    n = 60
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, n, size=(150, 2)) if a != b}
    )
    sdf = spark.createDataFrame(edges, "src long, dst long")
    for mode in ("in", "out"):
        g = Graph.from_edgelist(sdf, directed=True, renumber=False)
        rows = harmonic_centrality(
            g, max_hops=6, num_registers=4, seed=42, hash_mode="lcg", mode=mode
        ).collect()
        got = {r_.vertex: r_.harmonic_e for r_ in rows}
        got_sd = {r_.vertex: r_.sumdist_e for r_ in rows}
        want, want_sd = _replay_harmonic(edges, n, 4, 42, 6, mode)
        assert got == want, mode
        assert got_sd == want_sd, mode


def test_harmonic_star_hub_ranks_first(spark):
    # star: every leaf points at the hub; mode="in" counts reachers of v,
    # so the hub's harmonic ~ n-1 and every leaf's ~ 0
    n = 40
    edges = [(i, 0) for i in range(1, n)]
    g = Graph.from_edgelist(
        spark.createDataFrame(edges, "src long, dst long"),
        directed=True, renumber=False,
    )
    rows = harmonic_centrality(
        g, max_hops=4, num_registers=64, hash_mode="xxhash", mode="in"
    ).collect()
    by_v = {r_.vertex: r_.harmonic for r_ in rows}
    assert max(by_v, key=by_v.get) == 0
    assert abs(by_v[0] - (n - 1)) / (n - 1) < 0.35, by_v[0]
    assert all(abs(by_v[v]) < 1e-9 for v in range(1, n))


def test_harmonic_fixpoint_terms_are_zero(spark):
    # diameter-3 graph: extra hops past the fixpoint change nothing
    edges = [(0, 1), (1, 2), (2, 3), (0, 2)]
    g = Graph.from_edgelist(
        spark.createDataFrame(edges, "src long, dst long"),
        directed=True, renumber=False,
    )
    a = sorted(
        (r_.vertex, r_.harmonic_e)
        for r_ in harmonic_centrality(
            g, max_hops=4, num_registers=8, hash_mode="lcg"
        ).collect()
    )
    b = sorted(
        (r_.vertex, r_.harmonic_e)
        for r_ in harmonic_centrality(
            g, max_hops=16, num_registers=8, hash_mode="lcg"
        ).collect()
    )
    assert a == b


def test_closeness_lin_index_properties(spark):
    from linkgraph.algorithms.anf import closeness_centrality

    # star (leaves -> hub) plus one isolated vertex (id 40, via max+1 rule
    # being exceeded intentionally with an explicit extra edgeless id):
    n = 40
    edges = [(i, 0) for i in range(1, n)] + [(41, 41)]  # self-loop: filtered
    g = Graph.from_edgelist(
        spark.createDataFrame(edges, "src long, dst long"),
        directed=True, renumber=False,
    )
    rows = closeness_centrality(
        g, max_hops=4, num_registers=64, hash_mode="xxhash", mode="in"
    ).collect()
    by_v = {r.vertex: r for r in rows}
    assert len(by_v) == 42  # max+1 vertex universe
    # nothing reaches a leaf -> sketch never grows -> Lin convention 1.0
    assert by_v[1].sumdist_e == 0 and by_v[1].lin == 1.0
    # the hub is reached by all 39 leaves at distance 1: highest Lin index
    hub = by_v[0]
    assert hub.sumdist_e > 0
    assert hub.lin == max(r.lin for r in rows)
    # hub: reach ~ 40, sumdist ~ 39 -> lin ~ 40^2/39 ~ 41
    assert 25.0 < hub.lin < 60.0, hub.lin
