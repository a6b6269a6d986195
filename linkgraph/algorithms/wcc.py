"""Weakly connected components — deterministic min-label propagation.

Reference: the legacy SG kernel is iterated min-label propagation with
labels initialized per-vertex (cpp/src/components/weak_cc.cuh:126-330,
init label = vid+1 at :129); the newer impl is multi-root BFS with ARBITRARY
labels (weakly_connected_components_impl.cuh:236-700; the C API documents
"Component IDs can be arbitrary", algorithms.hpp:1381-1383). Because labels
are arbitrary, ANY correct WCC is output-equivalent after canonicalization
(min member id per component) — which is exactly how the reference's own
tests compare (tests/test_connectivity.py:294-330). We pick the
deterministic min-label algorithm so runs are reproducible/resumable; our
labels ARE already canonical (min vertex id of the component).

WCC requires a symmetric graph (weakly_connected_components_impl.cuh:236-238);
on directed input we symmetrize first (components/connectivity.py derives the
undirected view the same way).

Scale design: each round is one join + one min-aggregation over the
symmetrized edge table (prim update_frontier_v_push_if_out_nbr with a min
reduce, SURVEY §2.4). Label propagation converges in O(diameter) rounds —
small for web graphs. A frontier optimization only ships labels that changed
last round, so late rounds touch a shrinking fraction of E. Map-side partial
min bounds hub-key skew exactly as in PageRank.
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


def weakly_connected_components(
    graph: Graph,
    max_iter: int = 200,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, labels] — label = min INTERNAL vertex id in the
    component (canonical). Column name `labels` matches the reference output
    (components/connectivity.py:101-195).

    Label-space contract: on a renumbered graph, `vertex` is mapped back to
    external ids but `labels` stays in internal-id space — labels are opaque
    component KEYS, not vertex references, exactly like the reference's
    arbitrary kernel labels (algorithms.hpp:1381-1383; its python layer also
    unrenumbers only the vertex column). Rows with equal `labels` are in the
    same component; compare labels for equality only."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = graph.edges.select("src", "dst")
    if graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    edges = edges.repartition(nparts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    verts = graph.vertices().repartition(nparts, "vertex").persist(
        StorageLevel.MEMORY_AND_DISK
    )
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
        labels = verts.select(
            "vertex", F.col("vertex").alias("labels")
        ).persist(StorageLevel.MEMORY_AND_DISK)

    # frontier = vertices whose label changed last round (all, initially)
    bcast = graph.number_of_vertices() <= BROADCAST_STATE_MAX_V
    frontier = labels
    prev_ck = None  # superseded superstep checkpoint, freed once replaced
    it = start_iter
    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    with no_aqe(spark):
        while it < n_iter:
            it += 1
            f_src = frontier.select(F.col("vertex").alias("src"), "labels")
            f_src = F.broadcast(f_src) if bcast else f_src.repartition(nparts, "src")
            msgs = (
                edges.join(f_src, on="src")
                .groupBy("dst")
                .agg(F.min("labels").alias("m"))
                .withColumnRenamed("dst", "vertex")
            )
            if bcast:
                msgs = F.broadcast(msgs)
            new = (
                labels.join(msgs, on="vertex", how="left")
                .select(
                    "vertex",
                    F.least(F.col("labels"), F.coalesce(F.col("m"), F.col("labels"))).alias(
                        "labels"
                    ),
                    (F.col("m") < F.col("labels")).alias("changed"),
                )
                .localCheckpoint(eager=False)  # truncate superstep lineage
            )
            n_changed = new.filter(F.col("changed")).count()
            release_plan(prev_ck)  # `new` materialized by the count
            prev_ck = new
            labels = new.select("vertex", "labels")
            frontier = new.filter(F.col("changed")).select("vertex", "labels")
            if ckpt is not None and it % checkpoint_every == 0:
                labels = ckpt.save(labels, it, {"changed": n_changed})
            if fixed_iterations is None and n_changed == 0:
                break
    out = labels.select("vertex", "labels")
    if graph.renumbered:
        # vertex -> external; labels stay internal component keys (see
        # docstring label-space contract)
        out = graph.unrenumber(out, "vertex")
    return out


def connected_components(graph: Graph, connection: str = "weak", **kw) -> DataFrame:
    """components/connectivity.py:296-384 dispatch: 'weak' -> WCC here,
    'strong' -> the trim+multi-pivot-coloring SCC (algorithms/scc.py)."""
    if connection == "weak":
        return weakly_connected_components(graph, **kw)
    if connection == "strong":
        from .scc import strongly_connected_components

        return strongly_connected_components(graph, **kw)
    raise ValueError(f"unknown connection type {connection!r}")
