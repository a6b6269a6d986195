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

Scale design (measured on RMAT scale-17, local[32]):
- the edge⋈outw coefficient (weight/out_weight) is iteration-invariant:
  computed once, hash-partitioned by ``src``, persisted — the E-row edge
  table never moves during iterations;
- per-vertex state (vertex, is_dangling, p?, r) lives in ONE DataFrame; the
  superstep carries r_old through so the L1 delta and the next dangling mass
  come from the same single action per iteration (the reference's
  transform_reduce_v pair, fused) — no extra stats join;
- when V ≤ BROADCAST_STATE_MAX_V the V-row state is hint-broadcast into the
  edge join and the V-row message table broadcast back: one shuffle per
  superstep (the map-side-combined message reduce). Above the threshold the
  state is hash-repartitioned to the edge table's src-partitioning (the
  10^12-vertex path). Explicit hints matter: localCheckpoint erases
  partitioning/statistics and Spark otherwise re-broadcasts the much larger
  EDGE table every iteration (observed: 65 MB/superstep);
- groupBy(dst) hub skew is bounded by map-side partial aggregation: a hub
  vertex receives at most one partial sum per map partition regardless of
  in-degree (the Spark analogue of cuGraph's degree-segment kernels + 2D
  partitioning, graph_view.hpp:42-65), so no salt column is needed for
  sum-reduce supersteps;
- each iteration ends in a lazy localCheckpoint — plan depth stays O(1)
  (a growing lineage chain costs quadratic analysis time and OOMs the
  driver) — and AQE is disabled inside the loop (stage re-planning adds
  ~35% latency to small fixed-shape supersteps; measured 1.41 -> 1.04 s/it);
- every ``checkpoint_every`` iterations the rank table is committed to the
  checkpoint directory (durable resume point + metrics).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..checkpoint import CheckpointManager
from ..plans import release_plan
from ..structure.graph import Graph


class PageRankConvergenceError(RuntimeError):
    """Raised when max_iter is reached before the L1 delta drops below tol
    — matching CUGRAPH_FAIL('PageRank failed to converge.')
    (pagerank_impl.cuh:274-275)."""


# Measured crossover on local[32] (median steady-state s/superstep):
#   V=131k: broadcast 0.77 vs shuffle 1.31  -> broadcast wins
#   V=262k: broadcast 1.07 vs shuffle 0.90  -> shuffle wins
#   V=524k: broadcast ~3.5 vs shuffle ~1.2  -> shuffle wins clearly
BROADCAST_STATE_MAX_V = 150_000


@contextmanager
def no_aqe(spark, nparts: int | None = None):
    """Superstep loop conf: disable adaptive execution for fixed-shape
    iterative supersteps, and (when ``nparts`` is given) pin the in-loop
    shuffle partition count to the graph's own scale-derived partitioning.

    With AQE off, every in-loop groupBy/join exchange otherwise falls back
    to the session-wide ``spark.sql.shuffle.partitions`` — sized for the
    CLUSTER, not for this graph. pick_partitions already derives nparts
    from E (capped by the session conf), so pinning the loop to it is
    scale-adaptive, not a local-mode constant: on a graph big enough to hit
    the cap the loop runs at the session setting, on a small graph the
    per-superstep reduce stages stop paying (sessions_conf − nparts) empty
    task launches per exchange (guide §2.2 — fewer, larger partitions;
    measured on the 451k-edge sf0.1 link graph: 0.36 → 0.24 s/superstep at
    32 → 5 partitions, identical results)."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if nparts:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(nparts)))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


def pick_partitions(spark, n_edges: int, num_partitions: int | None = None) -> int:
    """Target ~100k edge rows per partition, capped by the session's shuffle
    partitions. Iterative supersteps pay fixed per-stage scheduling cost per
    partition, so small graphs on many partitions are pure overhead (measured
    3.2 s/superstep for a 451k-edge graph at 32 partitions vs sub-second at
    4); on a real cluster E/100k exceeds the conf cap, which then wins."""
    if num_partitions:
        return num_partitions
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(cap, (n_edges + 99_999) // 100_000))


def _prepare(graph: Graph, num_partitions: int | None, part_key: str = "src"):
    """Iteration-invariant state: vertex table + coefficient edge table.

    ``part_key`` picks the persisted edge partitioning: broadcast-state
    loops partition by ``dst`` so the per-superstep message aggregation
    (`groupBy(dst)` downstream of a broadcast join) is satisfied by the
    stored partitioning and runs exchange-free (guide §2.4: one exchange
    paid once at prepare replaces one per superstep); shuffle-state loops
    keep ``src`` so the state join co-partitions with the edges."""
    spark = graph.edges.sparkSession
    if not graph.renumbered and graph._num_vertices is None:
        # fuse the two setup actions (edge count for pick_partitions + the
        # max-id scan behind number_of_vertices) into ONE aggregate job —
        # both scan the same edge table
        row = graph.edges.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max(F.greatest("src", "dst")).alias("m"),
        ).collect()[0]
        n_edges = int(row["cnt"])
        graph._num_vertices = int(row["m"]) + 1 if row["m"] is not None else 0
    else:
        n_edges = graph.edges.count()
    nparts = pick_partitions(spark, n_edges, num_partitions)
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
        .repartition(nparts, part_key)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ecoef.count()  # materialize once; reused every superstep
    return vtab, ecoef, nparts


def _superstep(ecoef, ranks, state_cols, alpha, const_expr, nparts, bcast) -> DataFrame:
    """ranks(vertex, is_dangling, [p,] r) -> new(…, r, r_old).

    ``const_expr`` may reference ``_ds`` (this superstep's dangling mass):
    the superstep cross-joins a broadcast 1-row aggregate instead of
    embedding the iteration's dangling constant as a literal — whole-stage
    codegen inlines literal values into the generated source, so a
    per-iteration literal forced a fresh Janino compile EVERY superstep
    (measured 0.31 → 0.23 s/superstep steady and several seconds of
    cold-pass compile cascade on the sf0.1 link graph once removed).

    Broadcast-state path (V ≤ BROADCAST_STATE_MAX_V): ecoef is persisted
    hash-partitioned by DST (see _prepare), so the broadcast edge join
    preserves that partitioning into `groupBy(dst)` and the message
    aggregation runs WITHOUT an exchange; the only per-superstep exchange
    is the V-row state side of the message join (nparts partitions, so the
    aggregated message side reuses its stored partitioning). Measured on
    RMAT-17 (V=131k, E=2.1M): 0.63 → 0.44 s/superstep vs the union form.

    Shuffle-state path (huge V): edge contributions and the V-row carried
    state ride ONE fused union + map-side-combined groupBy(vertex) — no
    V-row message broadcast and no join-back (carried columns travel as
    max() over their single non-null value; the message sum gains one
    exact-neutral 0.0 carry term).
    """
    r_src = ranks.select(F.col("vertex").alias("src"), "r")
    dang = ranks.agg(
        F.sum(F.when(F.col("is_dangling"), F.col("r")).otherwise(0.0)).alias("_ds")
    )
    if bcast:
        msgs = (
            ecoef.join(F.broadcast(r_src), on="src")
            .groupBy("dst")
            .agg(F.sum(F.col("coef") * F.col("r")).alias("msg"))
            .withColumnRenamed("dst", "vertex")
        )
        return (
            ranks.join(msgs, on="vertex", how="left")
            .crossJoin(F.broadcast(dang))
            .select(
                *state_cols,
                (
                    const_expr
                    + F.lit(alpha) * F.coalesce(F.col("msg"), F.lit(0.0))
                ).alias("r"),
                F.col("r").alias("r_old"),
            )
        )
    carry_cols = [c for c in state_cols if c != "vertex"]
    contrib = ecoef.join(r_src.repartition(nparts, "src"), on="src").select(
        F.col("dst").alias("vertex"),
        (F.col("coef") * F.col("r")).alias("m"),
        *[F.lit(None).cast("boolean" if c == "is_dangling" else "double").alias(c)
          for c in carry_cols],
        F.lit(None).cast("double").alias("r_old"),
    )
    carry = ranks.select(
        "vertex", F.lit(0.0).alias("m"), *carry_cols, F.col("r").alias("r_old")
    )
    return (
        contrib.unionByName(carry)
        .groupBy("vertex")
        .agg(
            F.sum("m").alias("msg"),
            *[F.max(c).alias(c) for c in carry_cols],
            F.max("r_old").alias("r_old"),
        )
        .crossJoin(F.broadcast(dang))
        .select(
            *state_cols,
            (const_expr + F.lit(alpha) * F.col("msg")).alias("r"),
            "r_old",
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
    iteration_timings: list | None = None,
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
    bcast = V <= BROADCAST_STATE_MAX_V
    vtab, ecoef, nparts = _prepare(
        graph, num_partitions, part_key="dst" if bcast else "src"
    )

    def to_internal(df: DataFrame, val_col: str) -> DataFrame:
        if graph.renumbered:
            return graph.nmap.add_internal_vertex_id(
                df.withColumnRenamed("vertex", "__ext__"), "__ext__", "vertex"
            ).select("vertex", val_col)
        return df.select(F.col("vertex").cast("long").alias("vertex"), val_col)

    # --- personalization (pagerank_impl.cuh:173-185, :244-261) ---
    pers = None
    state_cols = ["vertex", "is_dangling"]
    if personalization is not None:
        p = to_internal(personalization, "values")
        psum = p.agg(F.sum("values")).collect()[0][0]
        pers = p.select("vertex", (F.col("values") / F.lit(float(psum))).alias("p"))
        vtab = vtab.join(pers, on="vertex", how="left").select(
            "vertex",
            "out_weight",
            "is_dangling",
            F.coalesce(F.col("p"), F.lit(0.0)).alias("p"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        state_cols.append("p")

    # --- init ranks (pagerank_impl.cuh:154-171) ---
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    start_iter, ranks, dangling_sum = 0, None, None
    if ckpt is not None:
        state = ckpt.latest(spark)
        if state is not None:
            start_iter, ranks_df, metrics = state
            dangling_sum = metrics["dangling_sum"]
            ranks = ranks_df
            if pers is not None:  # re-attach p (not checkpointed)
                ranks = ranks.drop("p").join(
                    vtab.select("vertex", "p"), on="vertex", how="left"
                )
            ranks = ranks.select(*state_cols, "r").localCheckpoint(eager=False)
    if ranks is None:
        if nstart is not None:
            ns = to_internal(nstart, "values")
            s = ns.agg(F.sum("values")).collect()[0][0]
            init = vtab.join(ns, on="vertex", how="left").select(
                *state_cols,
                (F.coalesce(F.col("values"), F.lit(0.0)) / F.lit(float(s))).alias("r"),
            )
        else:
            init = vtab.select(*state_cols, F.lit(1.0 / V).alias("r"))
        ranks = init.localCheckpoint(eager=False)

    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    converged = fixed_iterations is not None  # fixed mode never "fails"
    it = start_iter
    delta = None
    # the dangling constant K = _ds*alpha + (1-alpha) is derived IN-PLAN
    # from a broadcast 1-row aggregate over the carried ranks (see
    # _superstep docstring) — identical float op sequence to the old
    # driver-side K, but the generated code is iteration-invariant, and
    # fixed-iteration mode needs no per-superstep driver round-trip at all
    k_expr = F.col("_ds") * F.lit(alpha) + F.lit(1.0 - alpha)
    const_expr = (
        k_expr * F.col("p") if pers is not None else k_expr / F.lit(float(V))
    )
    # stats are only needed to test convergence (tol mode) or to stamp
    # checkpoint metrics; plain fixed-iteration runs skip the collect
    need_stats = fixed_iterations is None or ckpt is not None
    # plain fixed-iteration runs chain supersteps LAZILY and materialize
    # every few iterations (ppr-style): with no per-superstep driver
    # action left, the per-iteration eager materialization was the only
    # remaining job — bursts cut the job count further. When the caller
    # asks for per-iteration timings (the bench's steady-state metric),
    # every superstep materializes eagerly so the timings stay honest.
    trunc_every = 1 if iteration_timings is not None else 4
    pending: list = []  # lazy frames since the last materialized state
    import time as _time
    with no_aqe(spark, nparts):
        while it < n_iter:
            _t0 = _time.time()
            it += 1
            stepped = _superstep(
                ecoef, ranks, state_cols, alpha, const_expr, nparts, bcast
            )
            if need_stats:
                new = stepped.localCheckpoint(eager=False)
                # ONE action per superstep: L1 delta + next dangling mass
                stats = new.agg(
                    F.sum(F.abs(F.col("r") - F.col("r_old"))).alias("delta"),
                    F.sum(
                        F.when(F.col("is_dangling"), F.col("r")).otherwise(0.0)
                    ).alias("dang"),
                ).collect()[0]
                delta, dangling_sum = (
                    float(stats["delta"]),
                    float(stats["dang"] or 0.0),
                )
                # `new` is materialized by the stats action; the superseded
                # rank state can be freed immediately (see plans.release_plan)
                release_plan(ranks)
            else:
                eager = (it % trunc_every == 0) or (it == n_iter)
                new = stepped.localCheckpoint(eager=eager)
                # every frame in `pending` (including the current `ranks`)
                # is superseded once `new` materializes — the burst
                # materializes the whole pending lazy chain as part of its
                # lineage, so all of them can be freed together then
                pending.append(ranks)
                if eager:
                    for f in pending:
                        release_plan(f)
                    pending.clear()
                ranks = new
                if iteration_timings is not None:
                    iteration_timings.append(_time.time() - _t0)
                continue
            ranks = new
            if iteration_timings is not None:
                iteration_timings.append(_time.time() - _t0)
            if ckpt is not None and (it % checkpoint_every == 0):
                ranks = ckpt.save(
                    ranks.select("vertex", "is_dangling", "r"),
                    it,
                    {"delta": delta, "dangling_sum": dangling_sum},
                )
                if pers is not None:
                    ranks = ranks.join(vtab.select("vertex", "p"), on="vertex")
                ranks = ranks.select(*state_cols, "r").localCheckpoint(eager=False)
            if fixed_iterations is None and delta < tol:
                converged = True
                break
    if not converged and fail_on_nonconvergence:
        raise PageRankConvergenceError(
            f"PageRank failed to converge in {n_iter} iterations (L1 delta={delta})"
        )
    out = ranks.select("vertex", F.col("r").alias("pagerank"))
    return graph.unrenumber(out, "vertex")
