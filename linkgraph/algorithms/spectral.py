"""Spectral clustering: balanced cut and modularity maximization.

Reference surface: community/spectral_clustering.py:20-368
(`spectralBalancedCutClustering`, `spectralModularityMaximizationClustering`,
kernels cpp/src/community/legacy/spectral_clustering.cu — nvgraph Lanczos +
k-means). Declared out of scope in round 1 for want of an eigensolver; this
module supplies one built from the engine's own superstep machinery.

Architecture (Spark-first, no dense V×V anything):

- **Lanczos eigensolver** whose operator matvec is ONE E-scale shuffle
  (join edges with the iterate on ``src``, map-side-combined sum by
  ``dst``) plus V-row column arithmetic — the identical physical shape to
  a PageRank superstep, so everything known about that plan (partitioning,
  broadcast gating, plan truncation) transfers. The Krylov basis is carried
  as an ``array<double>`` column on a V-row DataFrame; only the scalar
  recurrence (the m×m tridiagonal matrix) lives on the driver.
- **Full reorthogonalization** each step: the projections of the new
  iterate onto ALL previous basis vectors are computed in one V-row
  aggregate (m scalar sums over array slots), subtracted in one select.
  This keeps the basis numerically orthogonal so the driver-side
  tridiagonal eigenproblem (numpy, m ≤ ~60) is trustworthy.
- **Spectral transforms, not shift-invert**: smallest eigenvectors of the
  Laplacian L = D − W are extracted as the LARGEST of σI − L with
  σ = 2·max weighted degree (Gershgorin bound, so σI − L ⪰ 0) — plain
  Lanczos converges to extremal eigenvalues, and a spectrum flip is a
  V-row subtraction, not a solve. Modularity maximization runs on
  B = W − d dᵀ/2m directly (largest); the rank-one term needs only the
  scalar d·x per step, never a materialized dense matrix.
- **k-means** (k-means++ seeded, Lloyd) with driver-held k×k centroids
  broadcast into a V-row argmin expression; the update is one
  map-side-combined groupBy. Weighted k-means++ sampling is distributed
  via the exponential-race trick (argmax of rand(seed)^(1/w)), one V-row
  ``max_by`` aggregate per seed — no driver-side candidate lists.

At 100 TB: every Lanczos step is one E-shuffle + two V-row aggregates;
k-means is one V-row agg per Lloyd round. Nothing driver-side scales with
V or E; the basis column costs m doubles per vertex (m ≈ 4k+12).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import truncate_plan
from ..structure.graph import Graph
from .pagerank import no_aqe, pick_partitions


from ..deterministic import hash_uniform as _hash_uniform


def _weighted_edges(graph: Graph) -> DataFrame:
    w = F.col("weight").cast("double") if graph.weighted else F.lit(1.0)
    return graph.edges.select("src", "dst", w.alias("w"))


def _lanczos(
    spark,
    edges: DataFrame,  # symmetric COO [src, dst, w], internal ids, persisted
    vertices: DataFrame,  # DF[vertex]
    diag: DataFrame,  # DF[vertex, dg] — operator diagonal addend (σ−deg or 0)
    rank_one: DataFrame | None,  # DF[vertex, d] for B's −d dᵀ/2m term, or None
    m2: float,
    n_steps: int,
    tol: float,
    nparts: int,
    seed: int = 17,
) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """Run ``n_steps`` of Lanczos for the symmetric operator

        Op(x) = W x + dg ∘ x − d (d·x)/m2        (last term iff rank_one)

    Returns (alphas, betas, basis_df) where basis_df is
    DF[vertex, basis: array<double>] holding the orthonormal Krylov basis
    column-wise and (alphas, betas) define the tridiagonal T.
    """
    V = vertices.count()
    # deterministic seeded start vector, unit norm
    q0 = vertices.select(
        "vertex", (_hash_uniform(F.col("vertex"), seed) - F.lit(0.5)).alias("q")
    )
    nrm = q0.agg(F.sqrt(F.sum(F.col("q") * F.col("q")))).collect()[0][0]
    state = (
        q0.select("vertex", (F.col("q") / F.lit(nrm)).alias("q"))
        .join(diag, on="vertex", how="left")
        .select(
            "vertex",
            F.coalesce("dg", F.lit(0.0)).alias("dg"),
            F.array(F.col("q")).alias("basis"),
        )
    )
    if rank_one is not None:
        state = state.join(rank_one, on="vertex", how="left").select(
            "vertex", "dg", "basis", F.coalesce("d", F.lit(0.0)).alias("d")
        )
    else:
        state = state.withColumn("d", F.lit(0.0))
    state = truncate_plan(state.repartition(nparts, "vertex"))

    alphas: list[float] = []
    betas: list[float] = []  # betas[i] couples q_i and q_{i+1}
    for i in range(n_steps):
        cur = F.col("basis")[i]
        # --- matvec: ONE E-scale shuffle (+ scalar d·x when rank-one term)
        dx = 0.0
        if rank_one is not None:
            dx = state.agg(F.sum(F.col("d") * cur)).collect()[0][0] or 0.0
        wx = (
            edges.join(
                state.select(F.col("vertex").alias("src"), cur.alias("x")),
                on="src",
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("w") * F.col("x")).alias("wx"))
        )
        nxt = state.join(wx, on="vertex", how="left").select(
            "vertex",
            "dg",
            "d",
            "basis",
            (
                F.coalesce("wx", F.lit(0.0))
                + F.col("dg") * cur
                - F.col("d") * F.lit(dx / m2)
            ).alias("w_new"),
        )
        nxt = truncate_plan(nxt, eager=False)
        # --- full reorthogonalization, TWO classical-GS passes ("twice is
        # enough", Kahan/Parlett): a single pass leaves O(ε·κ) components
        # once the Krylov space starts converging and the recurrence then
        # diverges (observed: betas exploding after ~20 steps on a 40-vertex
        # graph). Each pass is ONE V-row aggregate of k scalar projections.
        k = i + 1
        alpha_i = 0.0
        for p in ("w_new", "r"):
            dots = nxt.agg(
                *[F.sum(F.col("basis")[j] * F.col(p)).alias(f"p{j}") for j in range(k)]
            ).collect()[0]
            proj = [float(dots[f"p{j}"] or 0.0) for j in range(k)]
            alpha_i += proj[i]
            resid = F.col(p)
            for j in range(k):
                resid = resid - F.col("basis")[j] * F.lit(proj[j])
            nxt = truncate_plan(
                nxt.select("vertex", "dg", "d", "basis", resid.alias("r")),
                eager=False,
            )
        alphas.append(alpha_i)
        beta = nxt.agg(F.sqrt(F.sum(F.col("r") * F.col("r")))).collect()[0][0]
        beta = float(beta or 0.0)
        if i == n_steps - 1 or beta < tol or k >= V:
            state = nxt.select("vertex", "basis")
            break
        betas.append(beta)
        state = truncate_plan(
            nxt.select(
                "vertex",
                "dg",
                "d",
                F.concat("basis", F.array(F.col("r") / F.lit(beta))).alias("basis"),
            )
        )
    else:  # pragma: no cover — loop always breaks on last i
        state = state.select("vertex", "basis")
    return np.array(alphas), np.array(betas), state


def _ritz_embedding(
    basis: DataFrame, T_vecs: np.ndarray, which: np.ndarray
) -> DataFrame:
    """DF[vertex, emb: array<double>] with emb_i = Σ_j s[j,i]·basis_j for
    the selected tridiagonal eigenvector columns ``which`` — a V-row map."""
    cols = []
    for i in which:
        expr = F.lit(0.0)
        for j in range(T_vecs.shape[0]):
            c = float(T_vecs[j, i])
            if abs(c) > 1e-14:
                expr = expr + F.col("basis")[j] * F.lit(c)
        cols.append(expr)
    return basis.select("vertex", F.array(*cols).alias("emb"))


def _kmeans(
    emb: DataFrame,
    k: int,
    max_iter: int,
    tol: float,
    nparts: int,
    seed: int = 23,
) -> DataFrame:
    """Distributed Lloyd with k-means++ init. emb: DF[vertex, emb array<d>].
    Returns DF[vertex, cluster:int]."""
    emb = emb.repartition(nparts, "vertex").persist(StorageLevel.MEMORY_AND_DISK)
    dim = len(emb.select("emb").first()["emb"])

    def dist2(centroid: list[float]):
        e = F.lit(0.0)
        for j in range(dim):
            d = F.col("emb")[j] - F.lit(float(centroid[j]))
            e = e + d * d
        return e

    # k-means++: first centroid = exponential-race argmax on uniform weight,
    # then argmax of rand^(1/D²) per round — one max_by aggregate each.
    first = emb.agg(
        F.max_by("emb", _hash_uniform(F.col("vertex"), seed))
    ).collect()[0][0]
    centroids = [list(first)]
    def _min_dist2():
        terms = [dist2(c) for c in centroids]
        return terms[0] if len(terms) == 1 else F.least(*terms)

    for r in range(1, k):
        mind = _min_dist2()
        u = _hash_uniform(F.col("vertex"), seed + r)
        nxt = emb.agg(
            F.max_by(
                "emb",
                F.when(mind > 0, F.pow(u, F.lit(1.0) / mind)).otherwise(F.lit(-1.0)),
            )
        ).collect()[0][0]
        centroids.append(list(nxt))

    assigned = None
    for _ in range(max(max_iter, 1)):  # ≥1: always produce an assignment
        mind = F.array(*[dist2(c) for c in centroids])
        assigned = emb.select(
            "vertex",
            "emb",
            F.array_position(mind, F.array_min(mind)).cast("int").alias("cluster"),
        )
        # ONE map-side-combined agg: per-cluster sums + counts
        rows = (
            assigned.groupBy("cluster")
            .agg(
                *[F.sum(F.col("emb")[j]).alias(f"s{j}") for j in range(dim)],
                F.count("*").alias("n"),
            )
            .collect()
        )
        new_c = [list(c) for c in centroids]
        for row in rows:
            c = row["cluster"] - 1
            new_c[c] = [row[f"s{j}"] / row["n"] for j in range(dim)]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(ca, cb)) ** 0.5
            for ca, cb in zip(centroids, new_c)
        )
        centroids = new_c
        if shift < tol:
            break
    out = assigned.select("vertex", (F.col("cluster") - 1).alias("cluster"))
    emb.unpersist()
    return out


def _prep(
    graph: Graph,
    num_clusters: int,
    num_eigen_vects: int,
    num_partitions: int | None = None,
):
    if num_clusters < 2:
        raise ValueError("num_clusters must be > 1 (reference contract)")
    if num_eigen_vects > num_clusters:
        raise ValueError("num_eigen_vects must be <= num_clusters")
    if graph.directed:
        raise ValueError("spectral clustering requires an undirected graph")
    spark = graph.edges.sparkSession
    edges = _weighted_edges(graph)
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = edges.repartition(nparts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    verts = graph.vertices().repartition(nparts, "vertex")
    deg = (
        verts.join(
            edges.groupBy(F.col("src").alias("vertex")).agg(F.sum("w").alias("deg")),
            on="vertex",
            how="left",
        ).select("vertex", F.coalesce("deg", F.lit(0.0)).alias("deg"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return spark, edges, verts, deg, nparts


def spectral_balanced_cut_clustering(
    graph: Graph,
    num_clusters: int,
    num_eigen_vects: int = 2,
    evs_tolerance: float = 1.0e-5,
    evs_max_iter: int = 100,
    kmean_tolerance: float = 1.0e-5,
    kmean_max_iter: int = 100,
    seed: int = 17,
    num_partitions: int | None = None,
) -> DataFrame:
    """Balanced-cut spectral clustering → DF[vertex, cluster].

    Reference: community/spectral_clustering.py:20-99. Smallest
    ``num_eigen_vects`` eigenvectors of L = D − W (obtained as the largest
    of σI − L, σ = 2·d_max by Gershgorin), then k-means on the embedding.
    """
    spark, edges, verts, deg, nparts = _prep(graph, num_clusters, num_eigen_vects, num_partitions)
    sigma = 2.0 * (deg.agg(F.max("deg")).collect()[0][0] or 1.0)
    # Op = σI − L = W + (σ − deg) on the diagonal — PSD, extremes flipped
    diag = deg.select("vertex", (F.lit(sigma) - F.col("deg")).alias("dg"))
    m = min(max(4 * num_clusters + 12, 2 * num_eigen_vects + 10), evs_max_iter)
    with no_aqe(spark, nparts):
        alphas, betas, basis = _lanczos(
            spark, edges, verts, diag, None, 1.0, m, evs_tolerance, nparts, seed
        )
        vals, vecs = np.linalg.eigh(
            np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
        )
        # largest of σI−L == smallest of L
        which = np.argsort(-vals)[:num_eigen_vects]
        emb = _ritz_embedding(basis, vecs, which)
        out = _kmeans(emb, num_clusters, kmean_max_iter, kmean_tolerance, nparts, seed + 6)
    edges.unpersist()
    deg.unpersist()
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out


def spectral_modularity_maximization_clustering(
    graph: Graph,
    num_clusters: int,
    num_eigen_vects: int = 2,
    evs_tolerance: float = 1.0e-5,
    evs_max_iter: int = 100,
    kmean_tolerance: float = 1.0e-5,
    kmean_max_iter: int = 100,
    seed: int = 17,
    num_partitions: int | None = None,
) -> DataFrame:
    """Modularity-maximization spectral clustering → DF[vertex, cluster].

    Reference: community/spectral_clustering.py:101-180. Largest
    ``num_eigen_vects`` eigenvectors of B = W − d dᵀ/2m (the rank-one term
    enters the matvec as the scalar d·x — never materialized), then k-means.
    """
    spark, edges, verts, deg, nparts = _prep(graph, num_clusters, num_eigen_vects, num_partitions)
    m2 = edges.agg(F.sum("w")).collect()[0][0] or 1.0  # = 2m on symmetric COO
    diag = deg.select("vertex", F.lit(0.0).alias("dg"))
    rank_one = deg.select("vertex", F.col("deg").alias("d"))
    m = min(max(4 * num_clusters + 12, 2 * num_eigen_vects + 10), evs_max_iter)
    with no_aqe(spark, nparts):
        alphas, betas, basis = _lanczos(
            spark, edges, verts, diag, rank_one, m2, m, evs_tolerance, nparts, seed
        )
        vals, vecs = np.linalg.eigh(
            np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
        )
        which = np.argsort(-vals)[:num_eigen_vects]
        emb = _ritz_embedding(basis, vecs, which)
        out = _kmeans(emb, num_clusters, kmean_max_iter, kmean_tolerance, nparts, seed + 6)
    edges.unpersist()
    deg.unpersist()
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out


# reference-spelled aliases (community/spectral_clustering.py public names)
spectralBalancedCutClustering = spectral_balanced_cut_clustering
spectralModularityMaximizationClustering = spectral_modularity_maximization_clustering
