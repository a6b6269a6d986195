"""K-core decomposition: core_number and k_core subgraph extraction.

Reference: cores/core_number.py:20-66 (DF[vertex, core_number]),
cores/k_core.py:21-110 (induced subgraph of vertices with core >= k);
kernel cpp/src/cores/core_number.cu (179 LoC peeling).

Distributed algorithm: h-index iteration (Lu et al. 2016, "The H-index of a
network node and its relation to degree and coreness", Nature Comms —
repeatedly replacing each vertex's value with the h-index of its neighbors'
values converges to the core number). Unlike sequential peeling
(O(k_max x peel-rounds) driver-synchronized jobs — VERDICT r1 item 6), the
h-index iteration is a fixed dataflow per round:

    cap(v,u)  = min(c(u), c(v))          for every edge (u -> v)
    ge(v,t)   = #neighbors with cap >= t (hash agg + tiny per-vertex window:
                rows per vertex = DISTINCT c-values among neighbors, which is
                bounded by the global distinct-coreness count — O(thousands)
                under power law — NOT by hub degree)
    c'(v)     = max_t min(t, ge(v,t))    (the h-index)

and converges in tens of rounds regardless of k_max. Core numbers are
unique, so the fixpoint equals the peeling result exactly. Self-loops are
ignored for degree purposes (consistent with NetworkX/cuGraph core_number
on simple graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import release_plan, truncate_plan
from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def core_number(
    graph: Graph,
    num_partitions: int | None = None,
    max_iter: int = 10_000,
    fixed_iterations: int | None = None,
    round_timings: list | None = None,
) -> DataFrame:
    """Returns DF[vertex, core_number] for every vertex (isolated -> 0).

    ``fixed_iterations`` runs exactly that many h-index rounds with no
    convergence break (benchmark mode — every round joins the FULL edge
    set, so per-round wall time is the E-scale superstep cost);
    ``round_timings`` collects per-round wall times in-loop (the same
    steady-state protocol as pagerank's iteration_timings)."""
    import time as _time
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = graph.edges.select("src", "dst")
    if graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    edges = (
        edges.filter(F.col("src") != F.col("dst"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bcast = graph.number_of_vertices() <= BROADCAST_STATE_MAX_V

    def _state(df, key):
        return F.broadcast(df) if bcast else df.repartition(nparts, key)

    verts = graph.vertices()
    deg = edges.groupBy(F.col("src").alias("vertex")).agg(F.count("*").alias("c"))
    c = truncate_plan(
        verts.join(deg, on="vertex", how="left")
        .fillna(0, subset=["c"])
        .select("vertex", F.col("c").cast("long").alias("c")),
        eager=True,
    )
    n_rounds = fixed_iterations if fixed_iterations is not None else max_iter
    c_ck = c  # checkpointed frame backing `c`, freed once superseded
    with no_aqe(spark, nparts):
        for _ in range(n_rounds):
            t0 = _time.time()
            c_src = c.select(F.col("vertex").alias("src"), F.col("c").alias("c_u"))
            capped = (
                edges.join(_state(c_src, "src"), on="src")
                .select(F.col("dst").alias("vertex"), "c_u")
                .join(
                    _state(c.select("vertex", F.col("c").alias("c_v")), "vertex"),
                    on="vertex",
                )
                .select("vertex", F.least("c_u", "c_v").alias("cap"))
            )
            cnt = capped.groupBy("vertex", "cap").agg(F.count("*").alias("n"))
            w = (
                Window.partitionBy("vertex")
                .orderBy(F.desc("cap"))
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            newh = (
                cnt.withColumn("ge", F.sum("n").over(w))
                .groupBy("vertex")
                .agg(F.max(F.least(F.col("cap"), F.col("ge"))).alias("h"))
            )
            new_c = truncate_plan(
                c.join(_state(newh, "vertex"), on="vertex", how="left").select(
                    "vertex",
                    F.coalesce(F.col("h"), F.col("c")).alias("c"),
                    (F.coalesce(F.col("h"), F.col("c")) != F.col("c")).alias("chg"),
                ),
                eager=False,  # single consumer: the changed-count below
            )
            n_chg = new_c.filter(F.col("chg")).count()
            release_plan(c_ck)  # new_c materialized by the count
            c_ck = new_c
            if round_timings is not None:
                round_timings.append(_time.time() - t0)
            c = new_c.select("vertex", "c")
            if fixed_iterations is None and n_chg == 0:
                break
        else:
            if fixed_iterations is None:
                raise RuntimeError("core_number: max_iter exceeded")
    edges.unpersist()
    out = c.select("vertex", F.col("c").alias("core_number"))
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out


def k_core(graph: Graph, k: int | None = None, core_numbers: DataFrame | None = None) -> Graph:
    """Induced subgraph on vertices with core_number >= k (default k = max
    core, matching cores/k_core.py:21-110's default)."""
    cn = core_numbers
    if cn is None:
        cn = core_number(graph)
        if graph.renumbered:  # core_number unrenumbered; redo in internal ids
            cn = graph.nmap.add_internal_vertex_id(
                cn.withColumnRenamed("vertex", "__ext__"), "__ext__", "vertex"
            ).select("vertex", "core_number")
    if k is None:
        k = cn.agg(F.max("core_number")).collect()[0][0]
    keep = cn.filter(F.col("core_number") >= k).select("vertex")
    return graph.subgraph(keep)
