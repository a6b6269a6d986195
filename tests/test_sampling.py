"""Uniform neighbor sampling (GraphSAGE fanout) — structure, determinism,
and an exact pure-python replay of the lcg rank mode."""

from collections import defaultdict

from conftest import load_csv_edges
from linkgraph import Graph
from linkgraph.algorithms.sampling import uniform_neighbor_sample


def _graph(spark):
    return Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), renumber=False, directed=False
    )


def test_fanout_bounds_and_edge_validity(spark):
    g = _graph(spark)
    res = uniform_neighbor_sample(g, [0, 1, 33], fanouts=[4, 2]).collect()
    adj = defaultdict(set)
    for e in g.edges.collect():
        adj[e.src].add(e.dst)
    per = defaultdict(int)
    hop0_dst, hop1_src = set(), set()
    for r in res:
        assert r.dst in adj[r.src], "sampled edge must exist"
        per[(r.hop, r.src)] += 1
        if r.hop == 0:
            hop0_dst.add(r.dst)
        else:
            hop1_src.add(r.src)
    assert all(
        n <= (4 if h == 0 else 2) for (h, _s), n in per.items()
    ), "fanout bound violated"
    assert per[(0, 0)] == 4  # vertex 0 has degree >= 4 in karate
    assert hop1_src <= hop0_dst, "hop-1 frontier must be hop-0 samples"


def test_deterministic_across_partitioning(spark):
    g = _graph(spark)
    a = sorted(
        (r.hop, r.src, r.dst)
        for r in uniform_neighbor_sample(g, [0, 5], fanouts=[3, 3]).collect()
    )
    g2 = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv").repartition(7),
        renumber=False,
        directed=False,
    )
    b = sorted(
        (r.hop, r.src, r.dst)
        for r in uniform_neighbor_sample(g2, [0, 5], fanouts=[3, 3]).collect()
    )
    assert a == b


def test_lcg_mode_exact_replay(spark):
    from linkgraph.algorithms.random_walks import (
        RW_LCG_A,
        RW_LCG_B,
        RW_LCG_C,
        RW_LCG_P,
    )

    g = _graph(spark)
    seed = 11
    fanouts = [3, 2]
    starts = [0, 1, 2]
    got = sorted(
        (r.hop, r.src, r.dst)
        for r in uniform_neighbor_sample(
            g, starts, fanouts=fanouts, seed=seed, rank_mode="lcg"
        ).collect()
    )
    adj = defaultdict(set)
    for e in g.edges.collect():
        adj[e.src].add(e.dst)
    exp = []
    frontier = sorted(set(starts))
    for hop, k in enumerate(fanouts):
        nxt = set()
        for s in frontier:
            ranked = sorted(
                adj[s],
                key=lambda d: (
                    (RW_LCG_A * s + RW_LCG_B * (hop + 1) + RW_LCG_C * d + seed)
                    % RW_LCG_P,
                    d,
                ),
            )[:k]
            for d in ranked:
                exp.append((hop, s, d))
                nxt.add(d)
        frontier = sorted(nxt)
    assert got == sorted(exp)
