"""Louvain community detection — deterministic distributed variant.

Reference: community/louvain.py:21-92 (`louvain(G, max_iter, resolution)` →
(DF[vertex, partition], modularity)); kernels cpp/src/community/
louvain.cuh:52-607 — per-vertex argmax-over-neighbor-communities
modularity-delta move (:68-72), alternating up/down tie-break to prevent
parallel-move oscillation (:94-101), self-loop weight excluded from both
cluster sums in the gain (:409-411 cluster_subtract), then graph coarsening
by cluster and recursion over dendrogram levels (:157-181).

This implementation mirrors those mechanics relationally and is FULLY
DISTRIBUTED — no V-row state ever touches the driver:

- local-move superstep = the two-level key-aggregated reduce
  (copy_v_transform_reduce_key_aggregated_out_nbr, SURVEY §2.4):
  ``groupBy(dst, c_nbr).sum(w)`` builds k_{v,c}, then argmax per vertex via
  ``max(struct(gain, -c))`` — the same window-free hash-agg shape as LPA
  (lpa.py) so hub vertices never serialize into one window task;
- gain formula (standard Louvain, resolution γ):
      ΔQ(v: c_old → c) ∝ k_{v,c} − k_{v,c_old\\v} − γ·k_v·(Σ_c − (Σ_{c_old} − k_v))/(2m)
  a move happens only for strictly positive gain. Self-loop weight is
  excluded from k_{v,c} and k_{v,c_old\\v} (it moves with v and cancels),
  but INCLUDED in k_v, Σ, and 2m — matching the reference's
  cluster_subtract semantics (louvain.cuh:409-411);
- parallel moves alternate an up/down pass (even iterations only allow
  moves to communities with id > current, odd ones to id <; exactly the
  reference's up_down switch) — this breaks two-vertex swap cycles and
  makes runs deterministic;
- when a level's local moves stop improving, the graph is coarsened
  (edges ⋈ labels on both endpoints → groupBy(c_src, c_dst).sum(w),
  the reference's coarsen_graph; self-loops carried) and the next
  dendrogram level starts;
- returns (labels DataFrame, final modularity), labels flattened through
  all levels like the reference's flatten_dendrogram.

Scale notes (100-TB design): all V-row state (labels, sigma, k_in) is
broadcast only below BROADCAST_STATE_MAX_V, else co-partitioned shuffle
joins; per-pass lineage is truncated by a lazy localCheckpoint materialized
immediately by the single move-count action (the lazy-single-consumer rule
— see docs/PLANS.md §6; eager checkpoints guard every table consumed by
two branches of one job, the measured deadlock shape).

Louvain output is not unique across implementations; tests pin a
pure-Python oracle with these exact deterministic rules and additionally
check modularity quality on known graphs.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from .clustering_metrics import analyze_clustering_modularity
from ..plans import release_plan, truncate_plan
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions

_EPS = 1e-12

# Gate for broadcasting the per-community weight table (sigma: C rows of
# (c, sig)) into the E-scale candidate join. This is a DIFFERENT tradeoff
# from BROADCAST_STATE_MAX_V (measured crossover 150k): there the
# alternative is an exchange-free co-partitioned join (broadcast saves
# nothing), here the alternative is a full E-scale re-exchange of the
# candidate table on c_nbr — at E/C ratios of 15-30x the broadcast wins
# far past the state-table crossover.
SIGMA_BCAST_MAX_C = 4_000_000


def _local_moves(
    spark,
    edges_all,
    kv_df,
    n_verts,
    m2,
    resolution,
    max_inner,
    nparts,
    init_labels=None,
    round_timings=None,
):
    """One dendrogram level, fully distributed.

    edges_all: (src, dst, w) symmetrized both directions, self-loops KEPT
    (they count in k_v via kv_df but are excluded from candidate k_{v,c}).
    kv_df: (vertex, k_v) including self-loop weight. Returns DF[vertex, c].

    ``init_labels`` (vertex, c) optionally overrides the singleton start —
    used by ECG's hash-relabeled ensemble members (label VALUES only affect
    the up/down gate ordering and tie-breaks, not the gain formula) and by
    Leiden's refinement (singleton start over a constrained edge set).
    """
    bcast = n_verts <= BROADCAST_STATE_MAX_V

    def _state(df, key):
        return F.broadcast(df) if bcast else df.repartition(nparts, key)

    edges_nl = edges_all.filter(F.col("src") != F.col("dst"))
    labels = truncate_plan(
        init_labels if init_labels is not None
        else kv_df.select("vertex", F.col("vertex").alias("c")),
        eager=True,
    )
    import time as _time

    prev_moved = None
    labels_ck = labels  # checkpointed frame backing `labels`, for release
    n_comms = n_verts  # exact count refreshed by each pass's stats action
    for inner in range(max_inner):
        t0 = _time.time()
        # kvl: (vertex, c, k_v, sig_cur) — V rows, rebuilt per pass from
        # materialized inputs. sigma (the per-community weight) is attached
        # HERE, at V scale, not to the E-scale candidate table: joining it
        # onto cand would re-exchange ~E rows on c where this costs one
        # V-row join (see the measured pass-time comparison at
        # SIGMA_BCAST_MAX_C).
        kvl = labels.join(_state(kv_df, "vertex"), on="vertex")
        sigma = kvl.groupBy("c").agg(F.sum("k_v").alias("sig"))
        kvl = kvl.join(
            _state(sigma.select("c", F.col("sig").alias("sig_cur")), "c"), on="c"
        )
        # k_{v,c}: E-row join + map-side-combined hash agg, then attach the
        # vertex's own (c, k_v, sig_cur). `cur` feeds both the k_in branch
        # and the candidate branch of the same downstream job, so it is
        # PERSISTED repartitioned on vertex — InMemoryRelation keeps
        # outputPartitioning, so the k_in join, cand join, and the argmax
        # groupBy all read it exchange-free (an eager truncate_plan stores
        # the same bytes in the block manager but forgets the partitioning
        # and re-exchanges the ~E-row table downstream; same pathology
        # measured in SCC: 2.5x per-iteration cost).
        lab_src = _state(
            labels.select(F.col("vertex").alias("src"), F.col("c").alias("c_nbr")),
            "src",
        )
        cur = (
            edges_nl.join(lab_src, on="src")
            .groupBy(F.col("dst").alias("vertex"), "c_nbr")
            .agg(F.sum("w").alias("k_vc"))
            .join(_state(kvl, "vertex"), on="vertex")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cur.count()
        k_in_tab = cur.filter(F.col("c_nbr") == F.col("c")).select(
            "vertex", F.col("k_vc").alias("k_in")
        )
        gate = (
            (F.col("c_nbr") > F.col("c"))
            if inner % 2 == 0
            else (F.col("c_nbr") < F.col("c"))
        )
        # sig_new lookup: C rows joined into the E-scale candidate set.
        # Broadcast while C fits (see SIGMA_BCAST_MAX_C note) so cand never
        # leaves its vertex partitioning; shuffle fallback beyond the gate.
        sig_new = sigma.select(
            F.col("c").alias("c_nbr"), F.col("sig").alias("sig_new")
        )
        sig_new = (
            F.broadcast(sig_new)
            if n_comms <= SIGMA_BCAST_MAX_C
            else _state(sig_new, "c_nbr")
        )
        cand = (
            cur.filter(F.col("c_nbr") != F.col("c"))
            .filter(gate)
            .join(_state(k_in_tab, "vertex"), on="vertex", how="left")
            .join(sig_new, on="c_nbr")
            .withColumn(
                "g",
                F.col("k_vc")
                - F.coalesce(F.col("k_in"), F.lit(0.0))
                - F.lit(resolution)
                * F.col("k_v")
                * (F.col("sig_new") - (F.col("sig_cur") - F.col("k_v")))
                / F.lit(m2),
            )
        )
        # argmax by gain, tie -> min community id: max(struct(g, -c_nbr))
        moves = (
            cand.filter(F.col("g") > _EPS)
            .groupBy("vertex")
            .agg(F.max(F.struct(F.col("g"), (-F.col("c_nbr")).alias("nc"))).alias("t"))
            .select("vertex", (-F.col("t.nc")).alias("c_new"))
        )
        new_labels = truncate_plan(
            labels.join(_state(moves, "vertex"), on="vertex", how="left").select(
                "vertex",
                F.coalesce(F.col("c_new"), F.col("c")).alias("c"),
                F.col("c_new").isNotNull().alias("moved"),
            ),
            eager=False,  # single consumer: the count below materializes it
        )
        # single action per pass: materializes the lazy checkpoint AND
        # returns (move count, live community count — the sig_new broadcast
        # gate for the next pass) in one job.
        stats = new_labels.agg(
            F.count(F.when(F.col("moved"), F.lit(1))).alias("nm"),
            F.countDistinct("c").alias("nc"),
        ).first()
        n_moved, n_comms = stats["nm"], stats["nc"]
        # new_labels is materialized by the count: this pass's E-scale
        # `cur` cache and the superseded labels state can be freed NOW
        # — left to the ContextCleaner they accumulate ~E rows/pass in the
        # block manager and move passes degrade 3-4x by pass 8 (RMAT-21).
        cur.unpersist()
        release_plan(labels_ck)
        labels_ck = new_labels
        if round_timings is not None:
            round_timings.append(_time.time() - t0)
        labels = new_labels.select("vertex", "c")
        # stop after a full up+down cycle moved at most 1% of vertices —
        # synchronous passes trail off geometrically (deterministic rule,
        # mirrored exactly by the test oracle)
        thresh = n_verts // 100
        if prev_moved is not None and n_moved <= thresh and prev_moved <= thresh:
            break
        prev_moved = n_moved
    return labels


def louvain(
    graph: Graph,
    max_iter: int = 20,
    resolution: float = 1.0,
    max_levels: int = 10,
    round_timings: list | None = None,
):
    """Returns (DF[vertex, partition], modularity: float).

    ``max_iter`` caps local-move passes PER LEVEL (the reference's per-level
    iteration budget); synchronous up/down passes move a trickle of vertices
    late in a level, so the default cap of 20 trades a negligible modularity
    difference for bounded superstep count on dense graphs.
    """
    if graph.directed:
        raise ValueError("Louvain requires an undirected graph")
    spark = graph.edges.sparkSession
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    nparts = pick_partitions(spark, graph.edges.count(), None)
    # symmetrized both directions; self-loops KEPT — their weight counts in
    # m2, k_v, sigma and is carried through coarsening (louvain.cuh:66)
    edges = (
        graph.edges.select("src", "dst", w.alias("w"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m2 = edges.agg(F.sum("w")).collect()[0][0] or 0.0  # = 2m (both directions)
    if m2 == 0:
        out = graph.vertices().select("vertex", F.col("vertex").alias("partition"))
        return graph.unrenumber(out, "vertex") if graph.renumbered else out, 0.0

    # flat assignment: original vertex -> current-level community
    flat = truncate_plan(
        graph.vertices().select("vertex", F.col("vertex").alias("c")), eager=False
    )
    level_edges = edges
    with no_aqe(spark, nparts):
        for _level in range(max_levels):
            # k_v INCLUDES self-loop weight (it belongs to the vertex's
            # degree mass); EAGER: consumed by several branches per pass
            kv_df = truncate_plan(
                level_edges.groupBy(F.col("src").alias("vertex")).agg(
                    F.sum("w").alias("k_v")
                ),
                eager=True,
            )
            n_verts = kv_df.count()
            bcast = n_verts <= BROADCAST_STATE_MAX_V
            labels = _local_moves(
                spark, level_edges, kv_df, n_verts, m2, resolution, max_iter,
                nparts,
                round_timings=round_timings if _level == 0 else None,
            )
            n_comm = labels.select("c").distinct().count()
            # flatten this level into the original-vertex assignment
            lab_flat = labels.select(F.col("vertex").alias("c"), F.col("c").alias("c_next"))
            flat = (
                flat.join(
                    F.broadcast(lab_flat) if bcast else lab_flat.repartition(nparts, "c"),
                    on="c",
                    how="left",
                )
                .select(
                    "vertex", F.coalesce(F.col("c_next"), F.col("c")).alias("c")
                )
            )
            flat = truncate_plan(flat, eager=False)
            if n_comm == n_verts:  # no merge happened at this level
                break
            # coarsen: communities become vertices (coarsen_graph_impl.cuh);
            # self-loops (community-internal mass) are produced and carried.
            lab_src = labels.select(F.col("vertex").alias("src"), F.col("c").alias("cs"))
            lab_dst = labels.select(F.col("vertex").alias("dst"), F.col("c").alias("cd"))
            if bcast:
                lab_src, lab_dst = F.broadcast(lab_src), F.broadcast(lab_dst)
            else:
                lab_src = lab_src.repartition(nparts, "src")
                lab_dst = lab_dst.repartition(nparts, "dst")
            # EAGER checkpoint: the coarsened table is referenced by two
            # branches of the next pass's single job; a lazy checkpoint that
            # both branches materialize concurrently deadlocks
            level_edges = (
                level_edges.join(lab_src, on="src")
                .join(lab_dst, on="dst")
                .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
                .agg(F.sum("w").alias("w"))
            )
            level_edges = truncate_plan(level_edges, eager=True)
            if level_edges.filter(F.col("src") != F.col("dst")).limit(1).count() == 0:
                break
    edges.unpersist()
    labels_out = flat.select("vertex", F.col("c").alias("labels"))
    q = analyze_clustering_modularity(graph, labels_out)
    out = labels_out.withColumnRenamed("labels", "partition")
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out, q
