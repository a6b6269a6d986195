"""Force Atlas 2 layout quality + determinism oracles.

The reference (layout/force_atlas2.py) validates its GPU layout against
trustworthiness-of-embedding metrics on real datasets; at this scale the
equivalent acceptance notion is structural: planted communities must end up
spatially separated, forces must stay finite, and (stronger than the
reference, whose device RNG is not reproducible) the layout must be
bit-deterministic for a fixed seed."""

import math

import pytest
from pyspark.sql import functions as F

from linkgraph import Graph, force_atlas2


def _two_cliques(spark, size=8):
    rows = []
    for base in (0, size):
        for i in range(size):
            for j in range(i + 1, size):
                rows.append((base + i, base + j))
    rows.append((size - 1, size))  # bridge
    return Graph.from_edgelist(
        spark.createDataFrame(rows, "src LONG, dst LONG"),
        directed=False, renumber=False,
    )


def _centroid(ps, vs):
    xs = [ps[v][0] for v in vs]
    ys = [ps[v][1] for v in vs]
    return sum(xs) / len(xs), sum(ys) / len(ys)


def test_fa2_separates_cliques(spark):
    g = _two_cliques(spark)
    pos = force_atlas2(g, max_iter=40)
    rows = pos.collect()
    assert len(rows) == 16
    ps = {r.vertex: (r.x, r.y) for r in rows}
    assert all(math.isfinite(x) and math.isfinite(y) for x, y in ps.values())
    c1 = _centroid(ps, range(8))
    c2 = _centroid(ps, range(8, 16))
    inter = math.dist(c1, c2)
    intra1 = max(math.dist(ps[v], c1) for v in range(8))
    intra2 = max(math.dist(ps[v], c2) for v in range(8, 16))
    # the two cliques must be farther apart than either cluster's radius
    assert inter > max(intra1, intra2), (inter, intra1, intra2)


def test_fa2_deterministic(spark):
    g = _two_cliques(spark)
    a = {(r.vertex, r.x, r.y) for r in force_atlas2(g, max_iter=5).collect()}
    b = {(r.vertex, r.x, r.y) for r in force_atlas2(g, max_iter=5).collect()}
    assert a == b


def test_fa2_exact_mode_and_options(spark):
    g = _two_cliques(spark, size=5)
    pos = force_atlas2(
        g, max_iter=15, barnes_hut_optimize=False,
        lin_log_mode=True, strong_gravity_mode=True,
        outbound_attraction_distribution=False,
    )
    rows = pos.collect()
    assert len(rows) == 10
    assert all(math.isfinite(r.x) and math.isfinite(r.y) for r in rows)


def test_fa2_guards_and_callback(spark):
    g = _two_cliques(spark, size=4)
    with pytest.raises(NotImplementedError):
        force_atlas2(g, prevent_overlapping=True)

    seen = []

    class CB:
        def on_preprocess_end(self, df):
            seen.append("pre")

        def on_epoch_end(self, df):
            seen.append("epoch")

        def on_train_end(self, df):
            seen.append("end")

    force_atlas2(g, max_iter=2, callback=CB()).count()
    assert seen == ["pre", "epoch", "epoch", "end"]


def test_fa2_pos_list_and_renumbered(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "s STRING, d STRING"
    )
    g = Graph.from_edgelist(df, src="s", dst="d", directed=False, renumber=True)
    out = force_atlas2(g, max_iter=3)
    assert {r.vertex for r in out.collect()} == {"a", "b", "c"}
    # pos_list uses EXTERNAL ids and may be partial (others get hash seeds)
    pl = spark.createDataFrame([("a", 5.0, 5.0), ("b", -5.0, -5.0)],
                               "vertex STRING, x DOUBLE, y DOUBLE")
    warm = force_atlas2(g, max_iter=0, pos_list=pl)
    ps = {r.vertex: (r.x, r.y) for r in warm.collect()}
    assert ps["a"] == (5.0, 5.0) and ps["b"] == (-5.0, -5.0)
    assert "c" in ps and abs(ps["c"][0]) <= 1.0  # hash-seeded in [-1, 1]
