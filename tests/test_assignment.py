"""Linear assignment (auction) vs brute-force permutation oracle.

Reference contract: linear_assignment/lap.py:18-133. With integer costs the
auction's final ε < 1/(n+1) phase is exactly optimal (Bertsekas bound), so
the oracle comparison is on total cost equality, not assignment identity
(ties between equal-cost matchings may resolve differently)."""

import itertools

import pytest
from pyspark.sql import functions as F

from linkgraph import Graph
from linkgraph.algorithms.assignment import dense_hungarian, hungarian


def _brute_min_cost(cost_rows):
    """cost_rows: dict (i, j) -> cost. Min total over max-size matchings
    of workers to jobs (complete assignment of all workers required)."""
    workers = sorted({i for i, _ in cost_rows})
    jobs = sorted({j for _, j in cost_rows})
    best = None
    for perm in itertools.permutations(jobs, len(workers)):
        if all((w, j) in cost_rows for w, j in zip(workers, perm)):
            c = sum(cost_rows[(w, j)] for w, j in zip(workers, perm))
            best = c if best is None else min(best, c)
    return best


def test_dense_square(spark):
    costs = [4, 1, 3,
             2, 0, 5,
             3, 2, 2]
    total, asg = dense_hungarian(costs, 3, 3, spark=spark)
    oracle = _brute_min_cost({(i, j): costs[i * 3 + j] for i in range(3) for j in range(3)})
    assert total == oracle == 5.0
    assert sorted(asg) == [0, 1, 2]  # a permutation


def test_dense_rectangular_more_jobs(spark):
    costs = [9, 2, 7, 8,
             6, 4, 3, 7]
    total, asg = dense_hungarian(costs, 2, 4, spark=spark)
    oracle = _brute_min_cost({(i, j): costs[i * 4 + j] for i in range(2) for j in range(4)})
    assert total == oracle == 5.0
    assert len(set(asg)) == 2 and all(j >= 0 for j in asg)


def test_dense_random_vs_bruteforce(spark):
    import random

    rng = random.Random(11)
    for trial in range(3):
        n = 5
        costs = [float(rng.randint(0, 20)) for _ in range(n * n)]
        total, asg = dense_hungarian(costs, n, n, spark=spark)
        oracle = _brute_min_cost(
            {(i, j): costs[i * n + j] for i in range(n) for j in range(n)}
        )
        assert total == oracle, f"trial {trial}: {total} vs {oracle}"
        assert sorted(asg) == list(range(n))


def test_sparse_hungarian_on_graph(spark):
    # bipartite: workers 0..2, jobs 10..12, not all pairs allowed
    rows = [
        (0, 10, 4.0), (0, 11, 1.0),
        (1, 10, 2.0), (1, 12, 5.0),
        (2, 11, 2.0), (2, 12, 2.0),
    ]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    g = Graph.from_edgelist(df, weight="weight", directed=False, renumber=False)
    cost, res = hungarian(g, [0, 1, 2])
    oracle = _brute_min_cost({(s, d): w for s, d, w in rows})
    assert cost == oracle == 5.0
    got = {r.vertex: r.assignment for r in res.collect()}
    assert set(got) == {0, 1, 2}
    assert len(set(got.values())) == 3


def test_sparse_partial_assignment(spark):
    # 3 workers, 2 jobs: exactly one worker stays unassigned
    rows = [(0, 10, 1.0), (1, 10, 2.0), (2, 11, 1.0), (1, 11, 4.0)]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    g = Graph.from_edgelist(df, weight="weight", directed=False, renumber=False)
    cost, res = hungarian(g, [0, 1, 2])
    matched = {r.vertex: r.assignment for r in res.collect()}
    assert len(matched) == 2
    assert cost == 2.0  # 0->10 (1.0), 2->11 (1.0); worker 1 unassignable


def test_hungarian_renumbered_external_ids(spark):
    rows = [("w1", "jA", 3.0), ("w1", "jB", 1.0), ("w2", "jA", 2.0)]
    df = spark.createDataFrame(rows, "src STRING, dst STRING, weight DOUBLE")
    g = Graph.from_edgelist(df, weight="weight", directed=False, renumber=True)
    cost, res = hungarian(g, ["w1", "w2"])
    assert cost == 3.0
    got = {r.vertex: r.assignment for r in res.collect()}
    assert got == {"w1": "jB", "w2": "jA"}


def test_hungarian_multigraph_parallel_edges(spark):
    from linkgraph.structure.graph_classes import MultiGraph

    rows = [(0, 10, 5.0), (0, 10, 3.0), (1, 11, 2.0)]  # parallel 0-10 edges
    df = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    g = MultiGraph.from_edgelist(df, weight="weight", directed=False, renumber=False)
    cost, res = hungarian(g, [0, 1])
    assert cost == 5.0  # min(5,3) + 2 — not inflated by the duplicate edge
    assert res.count() == 2


def test_unweighted_graph_rejected(spark):
    g = Graph.from_edgelist(
        spark.createDataFrame([(0, 1)], "src LONG, dst LONG"), renumber=False
    )
    with pytest.raises(ValueError):
        hungarian(g, [0])
