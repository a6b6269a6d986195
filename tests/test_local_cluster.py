"""ACL local clustering (algorithms/local_cluster.py) on hand graphs."""

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.local_cluster import local_cluster
from linkgraph.structure.graph import Graph


def _g(spark, rows, directed=False, renumber=False):
    df = spark.createDataFrame(rows, "src long, dst long")
    return Graph.from_edgelist(df, directed=directed, renumber=renumber)


def _barbell():
    # K5 on 0..4 and K5 on 5..9 joined by the single bridge 4-5
    k1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    k2 = [(i, j) for i in range(5, 10) for j in range(i + 1, 10)]
    return k1 + k2 + [(4, 5)]


def test_barbell_finds_seed_side_clique(spark):
    g = _g(spark, _barbell())
    out = local_cluster(g, seed=0, iterations=8).collect()
    assert sorted(r.vertex for r in out) == [0, 1, 2, 3, 4]
    r = out[0]
    # cut: the bridge counted once per direction; vol(S) = 4*4 + 5 = 21
    assert (r.cut, r.den) == (2, 21)
    assert r.phi_e9 == (2 * 10**9 * 2 + 21) // (2 * 21)


def test_barbell_other_side(spark):
    g = _g(spark, _barbell())
    out = local_cluster(g, seed=9, iterations=8).collect()
    assert sorted(r.vertex for r in out) == [5, 6, 7, 8, 9]


def test_rejects_directed(spark):
    g = _g(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        local_cluster(g, seed=0)


def test_renumbered_graph_external_ids(spark):
    # shifted ids exercise the renumbered path end to end
    rows = [(u + 100, v + 100) for (u, v) in _barbell()]
    g = _g(spark, rows, renumber=True)
    out = local_cluster(g, seed=100, iterations=8).collect()
    assert sorted(r.vertex for r in out) == [100, 101, 102, 103, 104]


def test_ranks_are_sweep_prefix(spark):
    g = _g(spark, _barbell())
    out = local_cluster(g, seed=0, iterations=8).collect()
    ranks = sorted(r.rank for r in out)
    assert ranks == list(range(1, len(out) + 1))


def test_max_support_truncation_is_exact_prefix(spark):
    g = _g(spark, _barbell())
    full = local_cluster(g, seed=0, iterations=8).collect()
    trunc = local_cluster(g, seed=0, iterations=8, max_support=6).collect()
    assert sorted((r.vertex, r.rank, r.cut, r.den, r.phi_e9) for r in full) == \
        sorted((r.vertex, r.rank, r.cut, r.den, r.phi_e9) for r in trunc)


def test_default_cap_engages_and_warns(spark, monkeypatch):
    # a walk that reaches the whole graph: with the cap forced below the
    # support size the truncation must bind and warn loudly, and the result
    # must still be the exact truncated-sweep prefix
    import linkgraph.algorithms.local_cluster as lc

    g = _g(spark, _barbell())
    with pytest.warns(UserWarning, match="max_support cap"):
        monkeypatch.setattr(lc, "DEFAULT_MAX_SUPPORT", 4)
        out = lc.local_cluster(g, seed=0, iterations=8, max_support=4).collect()
    assert len(out) <= 4
    assert sorted(r.rank for r in out) == list(range(1, len(out) + 1))


def test_default_cap_default_value_unbinding(spark):
    # default cap (1e6) never binds on small graphs: identical to uncapped
    g = _g(spark, _barbell())
    capped = local_cluster(g, seed=0, iterations=8).collect()  # default cap
    uncapped = local_cluster(g, seed=0, iterations=8, max_support=None).collect()
    key = lambda r: (r.vertex, r.rank, r.cut, r.den, r.phi_e9)  # noqa: E731
    assert sorted(map(key, capped)) == sorted(map(key, uncapped))
