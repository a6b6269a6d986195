"""apply_edge_delta (structure/delta.py) — incremental recrawl updates.

Oracle strategy: brute-force edge-set arithmetic in plain Python over the
same rows, then compare the resulting edge sets / weights exactly. The
warm-restart equivalence test pins the capability claim: PageRank on the
delta-applied graph warm-started from the old scores equals PageRank
computed cold on an identically-rebuilt graph (same iteration count, same
arithmetic) — i.e. the delta path changes the PLAN, not the answer.
"""

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.pagerank import pagerank
from linkgraph.structure.delta import apply_edge_delta
from linkgraph.structure.graph import Graph


def _edge_df(spark, rows, weighted=False):
    schema = "src LONG, dst LONG" + (", weight DOUBLE" if weighted else "")
    return spark.createDataFrame(rows, schema)


def _delta_df(spark, rows):
    return spark.createDataFrame(rows, "src LONG, dst LONG, dw DOUBLE")


def test_unweighted_directed_add_remove(spark):
    g = Graph.from_edgelist(
        _edge_df(spark, [(0, 1), (1, 2), (2, 0)]), directed=True, renumber=False
    )
    delta = _delta_df(spark, [(0, 1, -1.0), (2, 3, 1.0), (3, 0, 1.0)])
    g2 = apply_edge_delta(g, delta, weight="dw")
    got = {(r.src, r.dst) for r in g2.edges.collect()}
    assert got == {(1, 2), (2, 0), (2, 3), (3, 0)}
    assert g2.number_of_vertices() == 4  # max+1 universe grew


def test_unweighted_remove_clamps_below_zero(spark):
    g = Graph.from_edgelist(_edge_df(spark, [(0, 1)]), directed=True, renumber=False)
    # removing more multiplicity than exists still just deletes the edge,
    # and a later +1 on a never-existing edge creates it
    delta = _delta_df(spark, [(0, 1, -5.0)])
    g2 = apply_edge_delta(g, delta, weight="dw")
    assert g2.edges.count() == 0


def test_default_dw_is_plus_one(spark):
    g = Graph.from_edgelist(_edge_df(spark, [(0, 1)]), directed=True, renumber=False)
    g2 = apply_edge_delta(g, spark.createDataFrame([(1, 2)], "src LONG, dst LONG"))
    got = {(r.src, r.dst) for r in g2.edges.collect()}
    assert got == {(0, 1), (1, 2)}


def test_undirected_symmetric_application(spark):
    g = Graph.from_edgelist(
        _edge_df(spark, [(0, 1), (1, 2)]), directed=False, renumber=False
    )
    # remove (0,1) specifying only ONE direction; add self-loop (3,3)
    delta = _delta_df(spark, [(0, 1, -1.0), (3, 3, 1.0), (2, 3, 1.0)])
    g2 = apply_edge_delta(g, delta, weight="dw")
    got = {(r.src, r.dst) for r in g2.edges.collect()}
    # both stored directions of (0,1) gone; additions stored both ways,
    # self-loop once (the storage convention of symmetrize_edges)
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2), (3, 3)}


def test_weighted_sum_and_drop(spark):
    g = Graph.from_edgelist(
        _edge_df(spark, [(0, 1, 2.0), (1, 2, 1.0)], weighted=True),
        weight="weight",
        directed=True,
        renumber=False,
    )
    delta = _delta_df(spark, [(0, 1, -0.5), (1, 2, -1.0), (2, 0, 3.0)])
    g2 = apply_edge_delta(g, delta, weight="dw")
    got = {(r.src, r.dst): r.weight for r in g2.edges.collect()}
    assert got == {(0, 1): 1.5, (2, 0): 3.0}  # (1,2) dropped at weight 0


def test_renumbered_extends_map_for_new_vertices(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "s STRING, d STRING"
    )
    g = Graph.from_edgelist(e, src="s", dst="d", directed=True, renumber=True)
    v0 = g.number_of_vertices()
    delta = spark.createDataFrame(
        [("c", "zz", 1.0), ("zz", "a", 1.0), ("a", "b", -1.0)],
        "src STRING, dst STRING, dw DOUBLE",
    )
    g2 = apply_edge_delta(g, delta, weight="dw")
    assert g2.number_of_vertices() == v0 + 1
    # new key appended AFTER the existing ids (old ids stable)
    m = {r[g.nmap.key_cols[0]]: r.vid for r in g2.nmap.map.collect()}
    m0 = {r[g.nmap.key_cols[0]]: r.vid for r in g.nmap.map.collect()}
    for k, v in m0.items():
        assert m[k] == v
    assert m["zz"] == v0
    # edge set in external ids
    ext = g2.nmap.unrenumber(g2.nmap.unrenumber(g2.edges, "src"), "dst")
    got = {(r.src, r.dst) for r in ext.collect()}
    assert got == {("b", "c"), ("c", "a"), ("c", "zz"), ("zz", "a")}


def test_extend_map_no_single_partition_exchange(spark):
    """Id assignment for delta-new vertices is the two-level bucket scheme:
    the physical plan must contain a bucket-partitioned window and NO
    SinglePartition exchange (a fresh-crawl delta with billions of new urls
    must never funnel through one task)."""
    from linkgraph.structure.delta import _extend_map
    from linkgraph.structure.renumber import NumberMap

    nmap = NumberMap(
        map=spark.createDataFrame(
            [(0, "a", 1), (1, "b", 1)], "vid LONG, key STRING, out_degree LONG"
        ),
        key_cols=["key"],
    )
    g = Graph(
        edges=spark.createDataFrame([(0, 1)], "src LONG, dst LONG"),
        directed=True,
        renumbered=True,
        nmap=nmap,
    )
    d = spark.createDataFrame(
        [(f"n{i:03d}", "a", 1.0) for i in range(50)], "src STRING, dst STRING, dw DOUBLE"
    )
    ext = _extend_map(g, d, materialize=False)
    plan = ext.map._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "windowspecdefinition(bkt" in plan, plan

    # dense, stable, deterministic under any input partitioning
    got = {r.key: r.vid for r in ext.map.collect()}
    assert got["a"] == 0 and got["b"] == 1
    assert sorted(v for k, v in got.items() if k.startswith("n")) == list(range(2, 52))
    d7 = d.repartition(7)
    got7 = {r.key: r.vid for r in _extend_map(g, d7).map.collect()}
    assert got7 == got


def test_multigraph_raises(spark):
    g = Graph.from_edgelist(
        _edge_df(spark, [(0, 1), (0, 1)]), directed=True, renumber=False, multi=True
    )
    with pytest.raises(NotImplementedError):
        apply_edge_delta(g, _delta_df(spark, [(0, 1, 1.0)]), weight="dw")


def test_warm_restart_equals_cold_on_rebuilt_graph(spark):
    """The capability claim: delta-apply + warm restart is a PLAN change,
    not an answer change — fixed-iteration PageRank on the delta graph
    warm-started from anywhere must equal the same iterations cold-started
    from the same vector on a from-scratch rebuild."""
    base_rows = [(i, (i * 3 + 1) % 20) for i in range(20)] + [
        (i, (i + 7) % 20) for i in range(0, 20, 2)
    ]
    base_rows = [r for r in base_rows if r[0] != r[1]]
    g = Graph.from_edgelist(_edge_df(spark, base_rows), directed=True, renumber=False)
    pr0 = pagerank(g, fixed_iterations=8)
    delta = _delta_df(
        spark,
        [(0, (0 * 3 + 1) % 20, -1.0), (2, (2 + 7) % 20, -1.0), (5, 21, 1.0), (21, 3, 1.0)],
    )
    g2 = apply_edge_delta(g, delta, weight="dw")
    ns = pr0.select("vertex", F.col("pagerank").alias("values"))
    warm = pagerank(g2, nstart=ns, fixed_iterations=4)

    rebuilt_rows = {(r[0], r[1]) for r in base_rows}
    rebuilt_rows -= {(0, 1), (2, 9)}
    rebuilt_rows |= {(5, 21), (21, 3)}
    g3 = Graph.from_edgelist(
        _edge_df(spark, sorted(rebuilt_rows)), directed=True, renumber=False
    )
    cold = pagerank(g3, nstart=ns, fixed_iterations=4)
    a = {r.vertex: r.pagerank for r in warm.collect()}
    b = {r.vertex: r.pagerank for r in cold.collect()}
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_incremental_wcc_quotient_path(spark):
    """incremental_wcc == cold WCC on the updated graph, while touching
    only quotient-scale state. Scenario: two diameter-9 paths bridged by
    one added edge, plus an added edge introducing a brand-new vertex."""
    from linkgraph.algorithms.wcc import (
        incremental_wcc,
        weakly_connected_components,
    )

    rows = [(i, i + 1) for i in range(9)] + [(10 + i, 11 + i) for i in range(9)]
    g = Graph.from_edgelist(_edge_df(spark, rows), directed=False, renumber=False)
    l0 = weakly_connected_components(g)
    assert {r.labels for r in l0.collect()} == {0, 10}
    adds = spark.createDataFrame([(9, 19), (19, 20)], "src LONG, dst LONG")
    g2 = apply_edge_delta(g, adds)
    inc = incremental_wcc(g2, l0, adds)
    cold = weakly_connected_components(g2)
    a = sorted((r.vertex, r.labels) for r in inc.collect())
    b = sorted((r.vertex, r.labels) for r in cold.collect())
    assert a == b
    assert {l for _, l in a} == {0}  # everything merged into component 0


def test_incremental_wcc_empty_and_untouched(spark):
    """A delta that merges nothing (self-contained new component) leaves
    old labels untouched and labels the new vertices canonically."""
    from linkgraph.algorithms.wcc import (
        incremental_wcc,
        weakly_connected_components,
    )

    g = Graph.from_edgelist(
        _edge_df(spark, [(0, 1), (2, 3)]), directed=False, renumber=False
    )
    l0 = weakly_connected_components(g)
    adds = spark.createDataFrame([(5, 6)], "src LONG, dst LONG")
    g2 = apply_edge_delta(g, adds)
    inc = {(r.vertex, r.labels) for r in incremental_wcc(g2, l0, adds).collect()}
    cold = {
        (r.vertex, r.labels)
        for r in weakly_connected_components(g2).collect()
    }
    assert inc == cold
    assert (5, 5) in inc and (6, 5) in inc and (4, 4) in inc  # 4 isolated


def test_incremental_wcc_init_labels_equivalence(spark):
    """The plain init_labels warm start also reaches the identical
    fixpoint (it just propagates inside merged regions edge-by-edge)."""
    from linkgraph.algorithms.wcc import weakly_connected_components

    rows = [(i, i + 1) for i in range(9)] + [(10 + i, 11 + i) for i in range(9)]
    g = Graph.from_edgelist(_edge_df(spark, rows), directed=False, renumber=False)
    l0 = weakly_connected_components(g)
    g2 = apply_edge_delta(g, spark.createDataFrame([(9, 19)], "src LONG, dst LONG"))
    warm = weakly_connected_components(g2, init_labels=l0)
    cold = weakly_connected_components(g2)
    assert sorted(map(tuple, warm.collect())) == sorted(map(tuple, cold.collect()))
