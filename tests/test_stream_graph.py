"""Streaming graph maintenance: delta stream -> versioned edge store ->
warm-restart PageRank per cycle, with resume across restarts."""

import json
import os

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.pagerank import pagerank
from linkgraph.streaming import (
    GRAPH_DELTA_SCHEMA,
    read_edge_store,
    stream_graph_maintenance,
)
from linkgraph.structure.delta import apply_edge_delta
from linkgraph.structure.graph import Graph


def _write_delta(spark, path, rows):
    spark.createDataFrame(rows, GRAPH_DELTA_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "deltas"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )


def test_stream_maintenance_versions_and_warm_restart(spark, dirs):
    delta_dir, store_dir, ckpt = dirs
    # cycle 1: a small directed cycle + chain; cycle 2: add edges;
    # cycle 3: delete one edge (negative dw)
    _write_delta(spark, delta_dir, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)])
    _write_delta(spark, delta_dir, [(2, 3, 1.0), (3, 0, 1.0), (1, 3, 1.0)])
    _write_delta(spark, delta_dir, [(1, 3, -1.0)])

    q = stream_graph_maintenance(
        spark, delta_dir, store_dir, ckpt, directed=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    versions = sorted(
        d for d in os.listdir(store_dir)
        if d.startswith("v") and os.path.exists(f"{store_dir}/{d}/meta.json")
    )
    assert len(versions) == 3

    g, meta = read_edge_store(spark, store_dir)
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == {(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)}  # (1,3) deleted
    assert meta["edges_after"] == 5 and meta["edges_before"] == 6
    assert meta["warm_start"] is True

    # lineage chain is intact across the manifests
    metas = [
        json.load(open(f"{store_dir}/{v}/meta.json")) for v in versions
    ]
    assert [m["prev_version"] for m in metas] == [None, metas[0]["version"], metas[1]["version"]]
    assert [m["edges_before"] for m in metas] == [0, 3, 6]

    # every cycle recorded its convergence metrics; warm start engaged from
    # the second cycle on (the warm-vs-cold iteration-budget claim itself is
    # pinned on a non-degenerate graph in test_delta.py)
    assert all(m["pagerank_iters"] >= 1 for m in metas)
    assert [m["warm_start"] for m in metas] == [False, True, True]

    # streamed scores == cold PageRank on the same final graph
    streamed = {
        r["vertex"]: r["pagerank"]
        for r in spark.read.parquet(f"{store_dir}/{versions[-1]}/scores").collect()
    }
    cold = {r["vertex"]: r["pagerank"] for r in pagerank(g, tol=1e-6).collect()}
    assert set(streamed) == set(cold)
    for v in cold:
        assert abs(streamed[v] - cold[v]) < 1e-5


def test_stream_maintenance_resume(spark, dirs):
    delta_dir, store_dir, ckpt = dirs
    _write_delta(spark, delta_dir, [(0, 1, 1.0), (1, 0, 1.0)])
    q = stream_graph_maintenance(spark, delta_dir, store_dir, ckpt)
    q.awaitTermination(300)
    g1, m1 = read_edge_store(spark, store_dir)
    assert m1["edges_after"] == 2

    # restart with a new delta file: the stream checkpoint skips the
    # already-processed file, the store gains exactly one version
    _write_delta(spark, delta_dir, [(1, 2, 1.0)])
    q2 = stream_graph_maintenance(spark, delta_dir, store_dir, ckpt)
    q2.awaitTermination(300)
    g2, m2 = read_edge_store(spark, store_dir)
    assert m2["edges_after"] == 3 and m2["edges_before"] == 2
    assert m2["prev_version"] == m1["version"]

    # time travel: the superseded version is still queryable by number,
    # bit-identical to what it returned when it was latest
    g_old, m_old = read_edge_store(spark, store_dir, version=m1["version"])
    assert m_old == m1
    assert g_old.edges.count() == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not committed"):
        read_edge_store(spark, store_dir, version=m2["version"] + 999)

    # the final store equals one batch apply of the full delta history
    base = Graph(
        edges=spark.createDataFrame([], "src LONG, dst LONG, weight DOUBLE"),
        directed=True, weighted=True, renumbered=False, nmap=None, multi=False,
    )
    all_deltas = spark.read.parquet(delta_dir)
    expect = {
        (r["src"], r["dst"])
        for r in apply_edge_delta(base, all_deltas, weight="dw").edges.collect()
    }
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == expect
