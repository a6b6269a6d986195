"""PageRank with exact cuGraph numeric semantics, as Spark supersteps.

Normative reference semantics (cpp/src/link_analysis/pagerank_impl.cuh,
SURVEY.md §2.5):
- pull-model over the transposed adjacency; in Spark one edge table serves
  both directions — each superstep is the SpMV
  ``edges ⋈ ranks on src → groupBy(dst).sum(coef·rank)``
  (the prim copy_v_transform_reduce_in_nbr, SURVEY §2.4);
- out_weight_sums[v] = Σ out-edge weights (1.0/edge unweighted,
  copy_v_transform_reduce_in_out_nbr.cuh:96);
- init r = 1/V, or nstart normalized by its sum (pagerank_impl.cuh:154-171);
- per iteration: dangling_sum = Σ_{outw(v)=0} r(v) (:203-212);
  non-personalized  r'(v) = (dangling_sum·α + (1−α))/V + α·Σ w·r/outw
  (:228-242); personalized: constant part 0, plus
  (dangling_sum·α + (1−α))·p(v)/Σp at personalization vertices (:244-261);
- convergence on RAW L1 norm Σ|r_new − r_old| < tol (:263-272 — the impl
  does NOT scale tol by V despite the doc comment, SURVEY §2.5);
- exceeding max_iter without converging is a hard failure (:274-275).

Scale design:
- the edge⋈outw coefficient (weight/out_weight) is iteration-invariant: it
  is computed once, hash-partitioned by ``src`` and persisted, so the only
  per-iteration shuffles are the V-row rank table (by src for the join, by
  dst after the message agg) — never a re-shuffle of the E-row edge table;
- groupBy(dst) hub skew is bounded by map-side partial aggregation: a hub
  vertex receives at most one partial sum per map partition regardless of
  in-degree (the Spark analogue of cuGraph's per-degree-class kernels +
  2D partitioning, graph_view.hpp:42-65). An explicit salt column is
  therefore unnecessary for sum-reduction supersteps; AQE skew-join handles
  the rank-join side;
- exactly ONE Spark action per iteration: the L1 delta and the NEXT
  iteration's dangling mass are computed in the same aggregate (the
  reference's transform_reduce_v pair, fused);
- every ``checkpoint_every`` iterations the rank table is committed to the
  checkpoint directory (resume + lineage truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..checkpoint import CheckpointManager
from ..structure.graph import Graph


class PageRankConvergenceError(RuntimeError):
    """Raised when max_iter is reached before the L1 delta drops below tol
    — matching CUGRAPH_FAIL('PageRank failed to converge.')
    (pagerank_impl.cuh:274-275)."""


def _prepare(graph: Graph, num_partitions: int | None):
    """Iteration-invariant state: vertex table + coefficient edge table."""
    spark = graph.edges.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    outw = graph.out_weight_sums()
    vtab = (
        graph.vertices()
        .join(outw, on="vertex", how="left")
        .select(
            "vertex",
            F.coalesce(F.col("out_weight"), F.lit(0.0)).alias("out_weight"),
        )
        .withColumn("is_dangling", F.col("out_weight") <= F.lit(0.0))
        .repartition(nparts, "vertex")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    ecoef = (
        graph.edges.join(
            outw.select(F.col("vertex").alias("src"), "out_weight"), on="src"
        )
        .select("src", "dst", (w / F.col("out_weight")).alias("coef"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ecoef.count()  # materialize once; reused every superstep
    return vtab, ecoef, nparts


def _superstep(vtab, ecoef, ranks, alpha, const_expr, nparts) -> DataFrame:
    msgs = (
        ecoef.join(ranks.select(F.col("vertex").alias("src"), "r"), on="src")
        .groupBy("dst")
        .agg(F.sum(F.col("coef") * F.col("r")).alias("msg"))
        .withColumnRenamed("dst", "vertex")
    )
    return (
        vtab.join(msgs, on="vertex", how="left")
        .select(
            "vertex",
            "is_dangling",
            (const_expr + F.lit(alpha) * F.coalesce(F.col("msg"), F.lit(0.0))).alias("r"),
        )
    )


def pagerank(
    graph: Graph,
    alpha: float = 0.85,
    personalization: DataFrame | None = None,
    max_iter: int = 100,
    tol: float = 1.0e-5,
    nstart: DataFrame | None = None,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    fail_on_nonconvergence: bool = True,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, pagerank] over ALL V vertices (external ids if the
    graph was renumbered — pagerank.py:132-133 unrenumbers the same way).

    ``personalization`` / ``nstart``: DF[vertex, values] in EXTERNAL ids
    (link_analysis/pagerank.py:103-126 converts; we join through the map).
    ``fixed_iterations``: run exactly that many supersteps and skip the
    convergence test (used for SQL-oracle differential checks).
    """
    spark = graph.edges.sparkSession
    V = graph.number_of_vertices()
    if V == 0:
        raise ValueError("empty graph")
    vtab, ecoef, nparts = _prepare(graph, num_partitions)

    def to_internal(df: DataFrame, val_col: str) -> DataFrame:
        if graph.renumbered:
            return graph.nmap.add_internal_vertex_id(
                df.withColumnRenamed("vertex", "__ext__"), "__ext__", "vertex"
            ).select("vertex", val_col)
        return df.select(F.col("vertex").cast("long").alias("vertex"), val_col)

    # --- init ranks (pagerank_impl.cuh:154-171) ---
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    start_iter, ranks, dangling_sum = 0, None, None
    if ckpt is not None:
        state = ckpt.latest(spark)
        if state is not None:
            start_iter, ranks_df, metrics = state
            dangling_sum = metrics["dangling_sum"]
            ranks = ranks_df.repartition(nparts, "vertex").persist(
                StorageLevel.MEMORY_AND_DISK
            )
    if ranks is None:
        if nstart is not None:
            ns = to_internal(nstart, "values")
            s = ns.agg(F.sum("values")).collect()[0][0]
            init = vtab.join(ns, on="vertex", how="left").select(
                "vertex",
                "is_dangling",
                (F.coalesce(F.col("values"), F.lit(0.0)) / F.lit(float(s))).alias("r"),
            )
        else:
            init = vtab.select("vertex", "is_dangling", F.lit(1.0 / V).alias("r"))
        ranks = init.localCheckpoint(eager=False)
        dangling_sum = ranks.filter("is_dangling").agg(F.sum("r")).collect()[0][0] or 0.0

    # --- personalization (pagerank_impl.cuh:173-185, :244-261) ---
    pers = None
    if personalization is not None:
        p = to_internal(personalization, "values")
        psum = p.agg(F.sum("values")).collect()[0][0]
        pers = p.select(
            "vertex", (F.col("values") / F.lit(float(psum))).alias("p")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        vtab_iter = vtab.join(pers, on="vertex", how="left").select(
            "vertex", "is_dangling", F.coalesce(F.col("p"), F.lit(0.0)).alias("p")
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        vtab_iter = vtab

    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    converged = fixed_iterations is not None  # fixed mode never "fails"
    it = start_iter
    while it < n_iter:
        it += 1
        K = dangling_sum * alpha + (1.0 - alpha)
        if pers is not None:
            const_expr = F.lit(K) * F.col("p")
        else:
            const_expr = F.lit(K / V)
        # localCheckpoint truncates the per-iteration lineage chain (plan size
        # would otherwise grow linearly with supersteps — driver OOM); lazy so
        # the stats action below materializes it in the same job.
        new = _superstep(vtab_iter, ecoef, ranks, alpha, const_expr, nparts).localCheckpoint(
            eager=False
        )
        # one action: L1 delta + next dangling mass (fused transform_reduce_v)
        stats = (
            new.join(ranks.select("vertex", F.col("r").alias("r_old")), on="vertex")
            .agg(
                F.sum(F.abs(F.col("r") - F.col("r_old"))).alias("delta"),
                F.sum(F.when(F.col("is_dangling"), F.col("r")).otherwise(0.0)).alias(
                    "dang"
                ),
            )
            .collect()[0]
        )
        delta, dangling_sum = float(stats["delta"]), float(stats["dang"] or 0.0)
        ranks = new
        if ckpt is not None and (it % checkpoint_every == 0):
            ranks = ckpt.save(
                ranks.select("vertex", "is_dangling", "r"),
                it,
                {"delta": delta, "dangling_sum": dangling_sum},
            ).persist(StorageLevel.MEMORY_AND_DISK)
        if fixed_iterations is None and delta < tol:
            converged = True
            break
    if not converged and fail_on_nonconvergence:
        raise PageRankConvergenceError(
            f"PageRank failed to converge in {n_iter} iterations (L1 delta={delta})"
        )
    out = ranks.select("vertex", F.col("r").alias("pagerank"))
    return graph.unrenumber(out, "vertex")
