"""The round-3 infra shims: utils (traversal paths, renumber_vertex_pair,
import_optional), comms session binding, raft probe, get_versions."""

import pytest
from pyspark.sql import functions as F

from linkgraph import Graph, bfs, get_versions, raft_include_test, sssp
from linkgraph import comms as lg_comms
from linkgraph import utils as lg_utils


@pytest.fixture(scope="module")
def path_graph(spark):
    # 0 -> 1 -> 2 -> 3 plus a branch 1 -> 4
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (1, 4)], "src LONG, dst LONG"
    )
    return Graph.from_edgelist(e, directed=True, renumber=False)


def test_get_traversed_path_list(path_graph):
    res = bfs(path_graph, start=0)
    assert lg_utils.get_traversed_path_list(res, 3) == [3, 2, 1, 0]
    assert lg_utils.get_traversed_path_list(res, 4) == [4, 1, 0]
    assert lg_utils.get_traversed_path_list(res, 0) == [0]


def test_get_traversed_path_df(path_graph):
    res = sssp(path_graph, source=0)
    path = lg_utils.get_traversed_path(res, 3)
    got = sorted(r["vertex"] for r in path.collect())
    assert got == [0, 1, 2, 3]
    # result keeps the BFS/SSSP schema
    assert set(path.columns) == {"vertex", "distance", "predecessor"}


def test_get_traversed_path_validation(path_graph, spark):
    res = bfs(path_graph, start=0)
    with pytest.raises(ValueError, match="not in the result set"):
        lg_utils.get_traversed_path_list(res, 99)
    bad = spark.createDataFrame([(1,)], "vertex LONG")
    with pytest.raises(ValueError, match="distance"):
        lg_utils.get_traversed_path_list(bad, 1)


def test_renumber_vertex_pair(spark):
    e = spark.createDataFrame(
        [(100, 200), (200, 300), (300, 100)], "src LONG, dst LONG"
    )
    g = Graph.from_edgelist(e, directed=False, renumber=True)
    pairs = spark.createDataFrame([(100, 300)], "first LONG, second LONG")
    out = lg_utils.renumber_vertex_pair(g, pairs)
    rows = out.collect()
    assert len(rows) == 1
    internal = {r["vid"] for r in g.nmap.map.collect()}
    assert rows[0]["first"] in internal and rows[0]["second"] in internal
    # unrenumbered graph: identity
    g2 = Graph.from_edgelist(e, directed=False, renumber=False)
    assert lg_utils.renumber_vertex_pair(g2, pairs) is pairs


def test_import_optional():
    import json as real_json

    assert lg_utils.import_optional("json") is real_json
    missing = lg_utils.import_optional("definitely_not_a_module_xyz")
    assert isinstance(missing, lg_utils.MissingModule)
    with pytest.raises(RuntimeError, match="definitely_not_a_module_xyz"):
        missing.anything


def test_comms_lifecycle(spark):
    assert not lg_comms.is_initialized() or lg_comms.destroy() is None
    lg_comms.initialize(spark=spark)
    try:
        assert lg_comms.is_initialized()
        n = lg_comms.get_n_workers()
        assert n >= 1
        assert lg_comms.get_workers() == list(range(n))
        prows, pcols, ptype = lg_comms.get_2D_partition()
        assert prows * pcols == n and ptype == 1
        assert lg_comms.get_comms() is spark
        assert lg_comms.get_worker_id() == 0
        assert isinstance(lg_comms.get_session_id(), str)
    finally:
        lg_comms.destroy()
    assert not lg_comms.is_initialized()
    assert lg_comms.get_comms() is None


def test_raft_include_test(spark):
    # mirror of reference tests/test_raft.py:20
    assert raft_include_test()


def test_get_versions():
    v = get_versions()
    assert isinstance(v, dict) and v["version"]
