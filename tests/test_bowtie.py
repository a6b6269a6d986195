"""Bow-tie decomposition (algorithms/bowtie.py) — hand-built graph with
every Broder class populated, plus structural invariants on the driver
query's purpose-built 600-vertex graph."""

import pytest

from linkgraph.algorithms.bowtie import bowtie_structure
from linkgraph.structure.graph import Graph


def _classes(spark, edges):
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    g = Graph.from_edgelist(df, directed=True, renumber=False)
    return {r["vertex"]: r["cls"] for r in bowtie_structure(g).collect()}


def test_bowtie_all_classes(spark):
    # core {0,1}; 2 reaches core (IN); 3 reached from core (OUT);
    # 4 hangs off IN (tendril); 5 leads into OUT (tendril);
    # 6 bridges IN->OUT avoiding core (tube); 7->8 separate component;
    # 9 points into a tendril: neither from-IN nor to-OUT (tendril).
    edges = [
        (0, 1), (1, 0),          # CORE
        (2, 0),                  # IN
        (1, 3),                  # OUT
        (2, 4),                  # tendril off IN
        (5, 3),                  # tendril into OUT
        (2, 6), (6, 3),          # tube
        (7, 8),                  # disconnected pair
        (9, 4),                  # floater between tendrils
    ]
    got = _classes(spark, edges)
    assert got == {
        0: "CORE", 1: "CORE",
        2: "IN", 3: "OUT",
        4: "TENDRILS", 5: "TENDRILS",
        6: "TUBES",
        7: "DISCONNECTED", 8: "DISCONNECTED",
        9: "TENDRILS",
    }


def test_bowtie_rejects_undirected(spark):
    df = spark.createDataFrame([(0, 1)], "src LONG, dst LONG")
    g = Graph.from_edgelist(df, directed=False, renumber=False)
    with pytest.raises(ValueError, match="directed"):
        bowtie_structure(g)


def test_bowtie_query_bands(spark, data_dir):
    """On the driver graph the band layout fully determines the class —
    the engine must recover it from structure alone."""
    import os

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        pytest.skip("driver testdata not present")
    from linkgraph.queries import QUERIES

    rows = QUERIES["bowtie"](spark, sf_dir).collect()
    assert len(rows) == 600
    expect = {
        (0, 100): "IN",
        (100, 300): "CORE",
        (300, 400): "OUT",
        (400, 450): "TENDRILS",
        (450, 500): "TENDRILS",
        (500, 550): "TUBES",
        (550, 600): "DISCONNECTED",
    }
    for r in rows:
        v = r["vertex"]
        want = next(c for (lo, hi), c in expect.items() if lo <= v < hi)
        assert r["cls"] == want, f"vertex {v}: {r['cls']} != {want}"
