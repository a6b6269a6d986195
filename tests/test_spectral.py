"""Spectral clustering oracle tests.

Strategy (SURVEY.md §5): the eigensolver is pinned against a dense
numpy ``eigh`` on the same small graph (the strongest possible oracle for a
Lanczos implementation); the end-to-end clusterings are pinned against
planted community structure and the engine's own clustering metrics
(reference scores clusterings with analyzeClustering_*, so quality-level
parity is the reference's own acceptance notion for these kernels —
community/spectral_clustering.py:183-368).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph import (
    Graph,
    analyze_clustering_edge_cut,
    analyze_clustering_modularity,
    spectral_balanced_cut_clustering,
    spectral_modularity_maximization_clustering,
)
from linkgraph.algorithms.spectral import _lanczos, _weighted_edges
from linkgraph.algorithms.pagerank import pick_partitions


def _planted(spark, k=3, size=12, p_in=1.0, bridge=True):
    """k cliques of `size`, optionally chained by single bridge edges.
    Returns (Graph, expected cluster sets)."""
    rows = []
    for c in range(k):
        base = c * size
        for i in range(size):
            for j in range(i + 1, size):
                rows.append((base + i, base + j, 1.0))
        if bridge and c + 1 < k:
            rows.append((base + size - 1, base + size, 1.0))
    df = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    g = Graph.from_edgelist(df, weight="weight", directed=False, renumber=False)
    expected = [set(range(c * size, (c + 1) * size)) for c in range(k)]
    return g, expected


def _cluster_sets(df):
    rows = df.collect()
    out = {}
    for r in rows:
        out.setdefault(r.cluster, set()).add(r.vertex)
    return sorted(out.values(), key=lambda s: min(s))


def test_lanczos_vs_dense_eigh(spark):
    """Smallest Laplacian eigenvalues from the distributed Lanczos match a
    dense numpy eigendecomposition of the same graph."""
    rng = np.random.default_rng(5)
    n = 40
    rows = []
    W = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.15:
                w = float(rng.integers(1, 5))
                rows.append((i, j, w))
                W[i, j] = W[j, i] = w
    # ensure no isolated vertex ambiguity: connect a ring
    for i in range(n):
        j = (i + 1) % n
        if W[i, j] == 0:
            rows.append((min(i, j), max(i, j), 1.0))
            W[i, j] = W[j, i] = 1.0
    df = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    g = Graph.from_edgelist(df, weight="weight", directed=False, renumber=False)

    L = np.diag(W.sum(axis=1)) - W
    dense_vals = np.linalg.eigvalsh(L)

    edges = _weighted_edges(g)
    nparts = pick_partitions(spark, g.edges.count(), None)
    deg = edges.groupBy(F.col("src").alias("vertex")).agg(F.sum("w").alias("deg"))
    sigma = 2.0 * deg.agg(F.max("deg")).collect()[0][0]
    diag = deg.select("vertex", (F.lit(sigma) - F.col("deg")).alias("dg"))
    verts = g.vertices()
    alphas, betas, _basis = _lanczos(
        spark, edges, verts, diag, None, 1.0, 30, 1e-8, nparts
    )
    T = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
    ritz = sigma - np.linalg.eigvalsh(T)  # flip back: eig(L) = sigma - eig(Op)
    # extremal Ritz values converge first: compare the 4 smallest
    got = np.sort(ritz)[:4]
    want = dense_vals[:4]
    assert np.allclose(got, want, atol=1e-4), f"{got} vs {want}"


def test_balanced_cut_recovers_cliques(spark):
    g, expected = _planted(spark, k=3, size=10)
    res = spectral_balanced_cut_clustering(g, num_clusters=3, num_eigen_vects=3)
    assert res.columns == ["vertex", "cluster"]
    got = _cluster_sets(res)
    assert got == expected
    # cut cost: only the 2 bridge edges cross
    labels = res.select("vertex", F.col("cluster").alias("labels"))
    assert analyze_clustering_edge_cut(g, labels) == pytest.approx(2.0)


def test_modularity_maximization_recovers_cliques(spark):
    g, expected = _planted(spark, k=3, size=10)
    res = spectral_modularity_maximization_clustering(
        g, num_clusters=3, num_eigen_vects=3
    )
    got = _cluster_sets(res)
    assert got == expected
    labels = res.select("vertex", F.col("cluster").alias("labels"))
    q = analyze_clustering_modularity(g, labels)
    assert q > 0.6  # 3 near-disjoint cliques: modularity close to 2/3


def test_validation_and_unrenumber(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "z"), ("z", "x"),
         ("a", "x")],
        "s STRING, d STRING",
    )
    g = Graph.from_edgelist(df, src="s", dst="d", directed=False, renumber=True)
    with pytest.raises(ValueError):
        spectral_balanced_cut_clustering(g, num_clusters=1)
    with pytest.raises(ValueError):
        spectral_balanced_cut_clustering(g, num_clusters=2, num_eigen_vects=5)
    res = spectral_balanced_cut_clustering(g, num_clusters=2, num_eigen_vects=2)
    got = _cluster_sets(res)
    assert got == [{"a", "b", "c"}, {"x", "y", "z"}]
    dg = Graph.from_edgelist(
        spark.createDataFrame([(0, 1)], "src LONG, dst LONG"),
        directed=True, renumber=False,
    )
    with pytest.raises(ValueError):
        spectral_balanced_cut_clustering(dg, num_clusters=2)
