"""Graph contraction (quotient graph) + host-graph helpers.

Oracle: brute-force Python aggregation over the same edge list — contraction
is a pure relational statement, so the differential is exact.
"""

from collections import Counter

from pyspark.sql import functions as F

from linkgraph.structure.contract import contract_vertices, host_edges, host_of
from linkgraph.structure.graph import Graph

EDGES = [
    # (src, dst, weight) — two parallel page links collapse into one host edge
    (0, 3, 2.0),
    (1, 3, 1.0),
    (1, 4, 1.0),
    (2, 5, 4.0),
    (3, 0, 1.0),
    (4, 5, 1.0),
    (5, 5, 9.0),  # self-loop collapses into an intra-group edge
]
# groups of 2: {0,1}->0, {2,3}->1, {4,5}->2
GROUP_OF = {v: v // 2 for v in range(6)}


def _python_contract(edges, self_loops):
    agg = Counter()
    for s, d, w in edges:
        gs, gd = GROUP_OF[s], GROUP_OF[d]
        if gs == gd and not self_loops:
            continue
        agg[(gs, gd)] += w
    return {k: float(v) for k, v in agg.items()}


def _build(spark, weighted, directed=True):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG, weight DOUBLE")
    return Graph.from_edgelist(
        df,
        weight="weight" if weighted else None,
        directed=directed,
        renumber=False,
    )


def _amap(spark):
    return spark.createDataFrame(
        [(v, g) for v, g in GROUP_OF.items()], "vertex LONG, group LONG"
    )


def test_contract_weighted_directed(spark):
    cg = contract_vertices(_build(spark, weighted=True), _amap(spark))
    got = {(r.src, r.dst): r.weight for r in cg.edges.collect()}
    assert got == _python_contract(EDGES, self_loops=False)
    assert cg.directed and cg.weighted and not cg.renumbered


def test_contract_self_loops_kept(spark):
    cg = contract_vertices(
        _build(spark, weighted=True), _amap(spark), self_loops=True
    )
    got = {(r.src, r.dst): r.weight for r in cg.edges.collect()}
    assert got == _python_contract(EDGES, self_loops=True)
    assert got[(2, 2)] == 9.0 + 1.0  # self-loop + intra-group 4->5


def test_contract_unweighted_multiplicity(spark):
    cg = contract_vertices(_build(spark, weighted=False), _amap(spark))
    got = {(r.src, r.dst): r.weight for r in cg.edges.collect()}
    expect = _python_contract([(s, d, 1.0) for s, d, _ in EDGES], self_loops=False)
    assert got == expect


def test_contract_partial_assignment_drops_edges(spark):
    amap = _amap(spark).filter(F.col("vertex") != 5)  # vertex 5 unassigned
    cg = contract_vertices(_build(spark, weighted=True), amap)
    got = {(r.src, r.dst): r.weight for r in cg.edges.collect()}
    expect = _python_contract(
        [(s, d, w) for s, d, w in EDGES if 5 not in (s, d)], self_loops=False
    )
    assert got == expect


def test_contract_vertex_universe_rule(spark):
    cg = contract_vertices(_build(spark, weighted=True), _amap(spark))
    # contracted ids 0..2 -> max+1 universe
    assert cg.number_of_vertices() == 3


def test_host_of_and_host_edges(spark):
    rows = [
        ("https://a.example.com/p/1", "http://b.example.com/x"),
        ("https://a.example.com/p/2", "http://b.example.com/y"),
        ("http://b.example.com/x", "https://a.example.com/p/1"),
        ("https://a.example.com/p/1", "https://a.example.com/p/2"),  # intra-host
        ("not a url", "https://a.example.com/"),  # unparseable src
    ]
    df = spark.createDataFrame(rows, "src_url STRING, dst_url STRING")
    assert df.select(host_of(F.col("src_url")).alias("h")).collect()[0].h == (
        "a.example.com"
    )
    got = {
        (r.src_host, r.dst_host): r.weight for r in host_edges(df).collect()
    }
    assert got == {
        ("a.example.com", "b.example.com"): 2.0,
        ("b.example.com", "a.example.com"): 1.0,
    }
