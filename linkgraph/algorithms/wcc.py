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
from ..plans import release_plan, truncate_plan
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
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """Returns DF[vertex, labels] — label = min INTERNAL vertex id in the
    component (canonical). Column name `labels` matches the reference output
    (components/connectivity.py:101-195).

    Label-space contract: on a renumbered graph, `vertex` is mapped back to
    external ids but `labels` stays in internal-id space — labels are opaque
    component KEYS, not vertex references, exactly like the reference's
    arbitrary kernel labels (algorithms.hpp:1381-1383; its python layer also
    unrenumbers only the vertex column). Rows with equal `labels` are in the
    same component; compare labels for equality only.

    ``init_labels`` (DF[vertex, labels], same column spaces as the OUTPUT —
    external vertex ids on a renumbered graph, internal label keys) warm-
    starts the propagation, e.g. from a previous run's result after an
    ADDITIONS-ONLY ``apply_edge_delta``: additions can only merge
    components and each old label is the min member id of a subset of its
    new component, so the fixpoint is the identical canonical labeling and
    every component the delta did not touch is stable from round 1 (the
    shrinking-frontier optimization then confines all work to the merged
    regions). The new minimum still travels edge-by-edge inside an absorbed
    component, so the ROUND count stays O(diameter of the merged regions) —
    for quotient-diameter round counts use :func:`incremental_wcc`, which
    runs the propagation on the delta-sized label quotient instead.
    Vertices absent from ``init_labels`` (e.g. delta-new) start at their
    own id. NOT valid after edge REMOVALS — a removal can split a
    component, leaving stale labels min-propagation cannot raise; rerun
    cold instead."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges = graph.edges.select("src", "dst")
    if graph.directed:
        edges = symmetrize_edges(edges, weight=None, symmetrize=True)
    # broadcast-state loops persist the edges DST-partitioned so the
    # frontier join (broadcast) preserves it into groupBy(dst) and the
    # message aggregation runs exchange-free (same trick as pagerank
    # _prepare); the huge-V shuffle path keeps src-partitioning so the
    # frontier repartition co-locates with the edges
    bcast = graph.number_of_vertices() <= BROADCAST_STATE_MAX_V
    edges = edges.repartition(
        nparts, "dst" if bcast else "src"
    ).persist(StorageLevel.MEMORY_AND_DISK)
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
    if labels is None and init_labels is not None:
        init = init_labels.select(
            F.col("vertex").alias("__iv__"), F.col("labels").alias("__il__")
        )
        if graph.renumbered:
            init = graph.nmap.add_internal_vertex_id(init, "__iv__", "vertex")
        else:
            init = init.withColumnRenamed("__iv__", "vertex")
        labels = (
            verts.join(init, on="vertex", how="left")
            .select(
                "vertex",
                F.coalesce(F.col("__il__"), F.col("vertex")).alias("labels"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    if labels is None:
        labels = verts.select(
            "vertex", F.col("vertex").alias("labels")
        ).persist(StorageLevel.MEMORY_AND_DISK)

    # frontier = vertices whose label changed last round (all, initially)
    frontier = labels
    prev_ck = None  # superseded superstep checkpoint, freed once replaced
    it = start_iter
    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    with no_aqe(spark, nparts):
        while it < n_iter:
            it += 1
            f_src = frontier.select(F.col("vertex").alias("src"), "labels")
            if bcast:
                # broadcast frontier into the dst-partitioned edge table:
                # the min-label message aggregation reuses the stored
                # partitioning and runs WITHOUT an exchange; the only
                # exchange is the V-row labels side of the join-back
                msgs = (
                    edges.join(F.broadcast(f_src), on="src")
                    .groupBy("dst")
                    .agg(F.min("labels").alias("m"))
                    .withColumnRenamed("dst", "vertex")
                )
                new = (
                    labels.join(msgs, on="vertex", how="left")
                    .select(
                        "vertex",
                        F.least(
                            F.col("labels"),
                            F.coalesce(F.col("m"), F.col("labels")),
                        ).alias("labels"),
                        (F.col("m") < F.col("labels")).alias("changed"),
                    )
                    .localCheckpoint(eager=False)  # truncate superstep lineage
                )
            else:
                # huge-V path: fused union-aggregate — messages and the
                # V-row carried labeling ride ONE map-side-combined
                # groupBy(vertex) min (exact integer min; `old` travels as
                # max over its single non-null carry value)
                contrib = edges.join(
                    f_src.repartition(nparts, "src"), on="src"
                ).select(
                    F.col("dst").alias("vertex"),
                    F.col("labels").alias("l"),
                    F.lit(None).cast("long").alias("old"),
                )
                carry = labels.select(
                    "vertex", F.col("labels").alias("l"), F.col("labels").alias("old")
                )
                new = (
                    contrib.unionByName(carry)
                    .groupBy("vertex")
                    .agg(F.min("l").alias("labels"), F.max("old").alias("old"))
                    .select(
                        "vertex",
                        "labels",
                        (F.col("labels") < F.col("old")).alias("changed"),
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


def incremental_wcc(
    graph: Graph,
    old_labels: DataFrame,
    added_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
) -> DataFrame:
    """WCC of a delta-applied graph from the previous labeling, in work
    proportional to the DELTA, not the graph.

    ``graph`` is the post-delta graph (e.g. ``apply_edge_delta`` output),
    ``old_labels`` the previous :func:`weakly_connected_components` result
    on the pre-delta graph, ``added_edges`` the ADDITIONS (no removals —
    additions only merge components; a removal can split one, which needs a
    cold rerun).

    Plan shape (the 100-TB recrawl path): label the two endpoints of every
    added edge with their old component labels (two delta-scale joins
    against the V-row label table), contract to the LABEL QUOTIENT graph —
    at most one vertex per touched component — run the ordinary WCC
    superstep loop on that delta-sized graph (renumbered, so its universe
    is the touched labels, not [0, max_label)), and apply the resulting
    old-label → merged-canonical-label remap back with one V-row join.
    Total: O(|delta|) superstep work + two V-row hash joins. The edge table
    is never shuffled; it is not read at all on renumbered graphs, and on
    non-renumbered graphs only by the single column-pruned max-id scan that
    defines the [0, max+1) vertex universe. Output contract identical to
    :func:`weakly_connected_components` (canonical min-member labels) —
    equality with a cold rerun on the updated graph is the test oracle.
    """
    d = added_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ol = old_labels.select("vertex", "labels")
    if graph.renumbered:
        # old internal ids are stable under apply_edge_delta's map
        # extension, so the old labels remain valid internal keys
        d = graph.nmap.add_internal_vertex_id(
            d.withColumnRenamed("src", "__s__"), "__s__", "src"
        )
        d = graph.nmap.add_internal_vertex_id(
            d.withColumnRenamed("dst", "__d__"), "__d__", "dst"
        )
        ol = graph.nmap.add_internal_vertex_id(
            ol.withColumnRenamed("vertex", "__v__"), "__v__", "vertex"
        )
    # endpoint -> old label; endpoints the old labeling never saw (new
    # vertices) are their own singleton component
    for col, lab in (("src", "ls"), ("dst", "ld")):
        m = ol.select(F.col("vertex").alias(col), F.col("labels").alias(lab))
        d = d.join(m, on=col, how="left").withColumn(
            lab, F.coalesce(F.col(lab), F.col(col))
        )
    q_edges = (
        d.select(F.col("ls").alias("src"), F.col("ld").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # Pin the delta-scale quotient edge list NOW. Its plan embeds the
    # caller's old_labels lineage (often a full WCC loop) plus the extended
    # number map; the quotient renumber + superstep loop below would
    # otherwise compose that subtree several times per round — measured as
    # minutes of driver-side Catalyst analysis on a toy graph when the
    # caller passes a lazy labels frame. Materializing here is delta-sized.
    q_edges = truncate_plan(q_edges, eager=True)
    base = (
        graph.vertices()
        .join(ol.select("vertex", "labels"), on="vertex", how="left")
        .select("vertex", F.coalesce(F.col("labels"), F.col("vertex")).alias("l"))
    )
    if q_edges.limit(1).count() == 0:
        out = base.select("vertex", F.col("l").alias("labels"))
    else:
        # renumber=True: the quotient universe is exactly the touched
        # labels (delta-scale), NOT [0, max_label) — the superstep loop
        # below runs on delta-sized tables
        qg = Graph.from_edgelist(q_edges, directed=False, renumber=True)
        qcc = weakly_connected_components(qg, num_partitions=num_partitions)
        canon = qcc.groupBy("labels").agg(F.min("vertex").alias("canon"))
        remap = qcc.join(canon, on="labels").select(
            F.col("vertex").alias("l"), "canon"
        )
        n_remap = remap.count()
        if n_remap <= BROADCAST_STATE_MAX_V:
            remap = F.broadcast(remap)
        out = base.join(remap, on="l", how="left").select(
            "vertex", F.coalesce(F.col("canon"), F.col("l")).alias("labels")
        )
    if graph.renumbered:
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
