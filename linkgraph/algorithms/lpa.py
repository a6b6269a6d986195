"""Label propagation (community detection) — synchronous, deterministic.

Absent from the reference fork (SURVEY.md header note, verified by grep);
specced from (a) the min-label WCC kernel shape
(cpp/src/components/weak_cc.cuh:199), (b) Louvain's
argmax-over-neighbor-clusters update (cpp/src/community/louvain.cuh:52-101),
and (c) the published algorithm (Raghavan et al. 2007), with DETERMINISTIC
min-label tie-breaking instead of Raghavan's random choice (required for
resumability and golden tests — SURVEY §2.5).

Update rule per superstep on the symmetrized graph:
    label'(v) = argmax_l |{u in nbr(v): label(u) = l}|, ties -> min l
Dataflow shape = the reference prim
copy_v_transform_reduce_key_aggregated_out_nbr (two-level reduce,
copy_v_transform_reduce_key_aggregated_out_nbr.cuh:143-567):
    groupBy(dst, label).count()              (level 1 — partial-agg, skew-safe)
    groupBy(dst).max(struct(count, -label))  (level 2 — argmax w/ min tie)
No window functions: a per-hub window sort would single-task hub keys at
10^12-scale; max_by over a struct keeps both levels as hash aggregations
with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..checkpoint import CheckpointManager
from ..plans import release_plan
from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def label_propagation(
    graph: Graph,
    max_iter: int = 100,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, labels]; community labels are vertex ids
    (deterministic); isolated vertices keep their own label."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = graph.edges.select("src", "dst")
    if graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    # dst-partitioned in broadcast mode: both aggregation levels group on
    # dst (hashpartitioning(dst) satisfies the (dst, labels) clustering),
    # so the whole two-level argmax runs exchange-free off the broadcast
    # label join — same trick as pagerank _prepare / wcc
    bcast = graph.number_of_vertices() <= BROADCAST_STATE_MAX_V
    edges = edges.repartition(
        nparts, "dst" if bcast else "src"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    start_iter, labels = 0, None
    if ckpt is not None:
        state = ckpt.latest(spark)
        if state is not None:
            start_iter, ldf, _ = state
            labels = ldf.repartition(nparts, "vertex").persist(
                StorageLevel.MEMORY_AND_DISK
            )
    if labels is None:
        labels = (
            graph.vertices()
            .select("vertex", F.col("vertex").alias("labels"))
            .repartition(nparts, "vertex")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

    prev_ck = None  # superseded superstep checkpoint, freed once replaced
    it = start_iter
    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    # the changed-count is only consumed by the convergence test (tol
    # mode) and checkpoint metrics — plain fixed-iteration runs skip the
    # per-superstep count action and chain supersteps lazily in bursts
    # of 4 (the pagerank fixed-mode treatment)
    need_stats = fixed_iterations is None or ckpt is not None
    pending: list = []  # lazy frames since the last materialized state
    with no_aqe(spark, nparts):
        while it < n_iter:
            it += 1
            l_src = labels.select(F.col("vertex").alias("src"), "labels")
            if bcast:
                # broadcast labels into the dst-partitioned edge table:
                # both argmax levels reuse the stored partitioning
                # (exchange-free); the only exchange is the V-row labels
                # side of the join-back
                counts = (
                    edges.join(F.broadcast(l_src), on="src")
                    .groupBy("dst", "labels")
                    .agg(F.count("*").alias("cnt"))
                )
                # argmax by count, tie -> min label: max(struct(cnt, -label))
                mode_l = (
                    counts.groupBy("dst")
                    .agg(
                        F.max(
                            F.struct(F.col("cnt"), (-F.col("labels")).alias("nl"))
                        ).alias("t")
                    )
                    .select(F.col("dst").alias("vertex"), (-F.col("t.nl")).alias("new_l"))
                )
                new = (
                    labels.join(mode_l, on="vertex", how="left")
                    .select(
                        "vertex",
                        F.coalesce(F.col("new_l"), F.col("labels")).alias("labels"),
                        (
                            F.coalesce(F.col("new_l"), F.col("labels"))
                            != F.col("labels")
                        ).alias("changed"),
                    )
                    .localCheckpoint(eager=False)  # truncate superstep lineage
                )
            else:
                # huge-V path: the carried labeling rides the level-2
                # argmax as a cnt=0 row (any real neighbor label has
                # cnt >= 1 and beats it; with no neighbor messages the
                # carry row IS the argmax) — one fused map-side-combined
                # groupBy(vertex), no state join-back
                counts = (
                    edges.join(l_src.repartition(nparts, "src"), on="src")
                    .groupBy("dst", "labels")
                    .agg(F.count("*").alias("cnt"))
                )
                contrib = counts.select(
                    F.col("dst").alias("vertex"),
                    "cnt",
                    "labels",
                    F.lit(None).cast("long").alias("old"),
                )
                carry = labels.select(
                    "vertex",
                    F.lit(0).cast("long").alias("cnt"),
                    "labels",
                    F.col("labels").alias("old"),
                )
                new = (
                    contrib.unionByName(carry)
                    .groupBy("vertex")
                    .agg(
                        F.max(
                            F.struct(F.col("cnt"), (-F.col("labels")).alias("nl"))
                        ).alias("t"),
                        F.max("old").alias("old"),
                    )
                    .select(
                        "vertex",
                        (-F.col("t.nl")).alias("labels"),
                        ((-F.col("t.nl")) != F.col("old")).alias("changed"),
                    )
                    .localCheckpoint(eager=False)  # truncate superstep lineage
                )
            if need_stats:
                n_changed = new.filter(F.col("changed")).count()
                release_plan(prev_ck)  # `new` materialized by the count
                prev_ck = new
                labels = new.select("vertex", "labels")
                if ckpt is not None and it % checkpoint_every == 0:
                    labels = ckpt.save(labels, it, {"changed": n_changed})
                if fixed_iterations is None and n_changed == 0:
                    break
            else:
                # note: `new` above was built with eager=False either way;
                # re-checkpoint eagerly at burst boundaries to materialize
                # and truncate the pending chain
                if it % 4 == 0 or it == n_iter:
                    new = new.localCheckpoint(eager=True)
                    for f in pending:
                        release_plan(f)
                    pending.clear()
                else:
                    pending.append(new)
                labels = new.select("vertex", "labels")
    out = labels.select("vertex", "labels")
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out
