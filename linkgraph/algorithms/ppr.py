"""Batched personalized PageRank (random-walk-with-restart) for many seeds.

The reference's pagerank takes ONE personalization vector per call
(link_analysis/pagerank.py:22-31); production link recommendation wants the
restart-to-seed variant for MANY seeds in one pass. This operator runs k
seeds in a single DataFrame program with long-format state
(seed, vertex, r): only REACHED vertices carry rows, so early supersteps
are frontier-sized, not k x V.

Update rule per seed s (the reference's personalized update,
pagerank_impl.cuh:244-261, with the whole personalization mass on s):

    r'(v) = alpha * sum_{u->v} w(u,v)/outw(u) * r(u)
            + [v = s] * ((1 - alpha) + alpha * dangling_s)

Mass conservation makes the dangling term FREE: with r0 = 1 at the seed,
total mass per seed is exactly 1 every iteration (alpha*T + (1-alpha) = 1
at T = 1), so

    dangling_s = 1 - (sum of this superstep's propagated messages)/alpha
    restart row r = 1 - sum(messages_s)

and no dangling-vertex flag, vertex-table join, or driver action is needed
in the loop.

Fixed iteration count, ZERO per-iteration driver actions: the alpha^T tail
bound (|r_T - r*|_1 <= 2 * alpha^T per seed) makes T a precision knob, so
the loop is T chained lazy stages; on a 1000-executor cluster nothing
synchronizes until the caller's single final action. Plans are truncated
every few supersteps to keep the lazy DAG O(1) deep.

100-TB shape per superstep: one shuffle of the state onto the persisted
hash-partitioned coefficient edge table (the same table pagerank.py
reuses every superstep) + ONE map-side-combined (seed, vertex)
aggregation carrying the propagated messages, their negated mirrors at
the seed vertex (the restart mass 1 - Σmsgs computed in-aggregate), and
the constant +1 seed rows — no message-table persist, no per-seed
restart join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, _prepare, no_aqe


def batched_personalized_pagerank(
    graph: Graph,
    seeds: list,
    alpha: float = 0.85,
    iterations: int = 10,
    num_partitions: int | None = None,
    truncate_every: int = 4,
) -> DataFrame:
    """DF[vertex-typed seed, vertex, ppr] — one personalized PageRank vector
    per seed, rows only for vertices with mass > 0 (the reached set, a
    deterministic function of the edge set and iteration count). `seed` and
    `vertex` are external ids if the graph was renumbered.
    """
    state = _ppr_state(graph, seeds, alpha, iterations, num_partitions, truncate_every)
    out = state.select("seed", "vertex", F.col("r").alias("ppr"))
    out = graph.unrenumber(out, "vertex")
    return graph.unrenumber(out, "seed").select("seed", "vertex", "ppr")


def _ppr_state(
    graph: Graph,
    seeds: list,
    alpha: float = 0.85,
    iterations: int = 10,
    num_partitions: int | None = None,
    truncate_every: int = 4,
) -> DataFrame:
    """Internal-id state DF[seed, vertex, r] — the superstep loop itself.
    Kept separate so ppr_topk can rank on the numeric internal ids before
    unrenumbering (string external ids can't ride the negate-for-ascending
    struct-sort trick)."""
    if not seeds:
        raise ValueError("ppr needs at least one seed")
    if len(set(seeds)) != len(seeds):
        raise ValueError("duplicate seed vertices")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    spark = graph.edges.sparkSession
    # same size gate as pagerank (computed before _prepare so the edge
    # table can be persisted dst-partitioned in broadcast mode, making the
    # per-superstep (seed, dst) aggregation exchange-free — hashpartitioning
    # on dst alone satisfies the (seed, dst) clustering)
    bcast = graph.number_of_vertices() * len(set(seeds)) <= BROADCAST_STATE_MAX_V
    _vtab, ecoef, nparts = _prepare(
        graph, num_partitions, part_key="dst" if bcast else "src"
    )

    seed_df = spark.createDataFrame(
        [(s,) for s in sorted(seeds)], ["__ext__"]
    )
    if graph.renumbered:
        internal = graph.nmap.add_internal_vertex_id(
            seed_df, "__ext__", "seed"
        ).select("seed")
        if internal.count() != len(seeds):
            raise ValueError("ppr seed vertex not in graph")
        seeds_int = internal
    else:
        seeds_int = seed_df.select(F.col("__ext__").cast("long").alias("seed"))
        # same membership guard as the renumbered branch: a non-numeric or
        # out-of-universe seed must fail loudly, not yield a degenerate
        # self-mass-1 vector (k-row action, setup only)
        V = graph.number_of_vertices()
        bad = seeds_int.filter(
            F.col("seed").isNull() | (F.col("seed") < 0) | (F.col("seed") >= V)
        ).count()
        if bad:
            raise ValueError("ppr seed vertex not in graph")
    seeds_int = F.broadcast(seeds_int.select("seed"))

    # r0 = 1 at the seed itself (classic RWR start; total mass 1 per seed).
    state = seeds_int.select("seed", F.col("seed").alias("vertex"), F.lit(1.0).alias("r"))

    with no_aqe(spark, nparts):
        # Fused superstep: ONE aggregation per iteration. The restart row
        # r(seed) = 1 - Σ messages is folded into the same groupBy by
        # emitting, per joined edge, BOTH the +c contribution at the
        # destination and a mirrored -c row at the seed vertex, plus a
        # constant +1 seed row: sum at the seed = msg_at_seed - Σc + 1 —
        # algebraically the restart formula, same row set (the mirror rows
        # only land on the (seed, seed) key the +1 row creates anyway).
        # This removes the per-iteration message persist (single consumer
        # now), the per-seed restart aggregation and its broadcast
        # left-join (measured 34 → 23 jobs and 5.2 → 4.5 s warm on the
        # sf0.1 bench query; the residual floor is the 10 inherently
        # sequential supersteps at ~2 stage launches each). Hub skew on
        # the (seed, seed) mirror key is bounded by map-side partial
        # aggregation: at most one combined row per map partition per seed.
        ones = seeds_int.select(
            "seed", F.col("seed").alias("vertex"), F.lit(1.0).alias("r")
        )
        for it in range(1, iterations + 1):
            st_src = state.select(F.col("vertex").alias("src"), "seed", "r")
            st_src = (
                F.broadcast(st_src) if bcast else st_src.repartition(nparts, "src")
            )
            c = F.col("coef") * F.col("r") * F.lit(alpha)
            pairs = (
                ecoef.join(st_src, on="src")
                .select(
                    "seed",
                    F.explode(
                        F.array(
                            F.struct(F.col("dst").alias("vertex"), c.alias("r")),
                            F.struct(
                                F.col("seed").alias("vertex"), (-c).alias("r")
                            ),
                        )
                    ).alias("x"),
                )
                .select("seed", F.col("x.vertex").alias("vertex"), F.col("x.r").alias("r"))
            )
            new = (
                pairs.unionByName(ones)
                .groupBy("seed", "vertex")
                .agg(F.sum("r").alias("r"))
            )
            new = new.localCheckpoint(
                eager=(it % truncate_every == 0 or it == iterations)
            )
            state = new

    return state


def ppr_topk(
    graph: Graph,
    seeds: list,
    k: int = 10,
    alpha: float = 0.85,
    iterations: int = 10,
    include_seed: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """DF[seed, vertex, ppr, rnk] — top-k recommendation targets per seed by
    personalized PageRank mass, seed itself excluded unless asked for.

    Two-phase top-k (partition-local prefilter, then a <= P*k-row merge) —
    never a full per-seed sort; ties broken by vertex id ascending so the
    result is deterministic under any partitioning. Ranking happens on the
    INTERNAL numeric ids (external ids may be strings), so on a renumbered
    graph ties break by internal (degree-desc) id — deterministic for a
    given graph."""
    full = _ppr_state(
        graph, seeds, alpha=alpha, iterations=iterations, num_partitions=num_partitions
    ).select("seed", "vertex", F.col("r").alias("ppr"))
    if not include_seed:
        full = full.filter(F.col("seed") != F.col("vertex"))
    # sort key: ppr desc, vertex asc — encode vertex ascending inside the
    # descending struct sort by negating it (internal ids are numeric).
    item = F.struct(F.col("ppr"), (-F.col("vertex")).alias("nv"), F.col("vertex"))
    part = (
        full.groupBy("seed", F.spark_partition_id().alias("__pid__"))
        .agg(F.slice(F.sort_array(F.collect_list(item), asc=False), 1, k).alias("top"))
        .select("seed", F.explode("top").alias("t"))
        .select("seed", F.col("t.ppr").alias("ppr"), F.col("t.vertex").alias("vertex"))
    )
    final = (
        part.groupBy("seed")
        .agg(F.slice(F.sort_array(F.collect_list(item), asc=False), 1, k).alias("top"))
        .select("seed", F.posexplode("top").alias("pos", "t"))
        .select(
            "seed",
            F.col("t.vertex").alias("vertex"),
            F.col("t.ppr").alias("ppr"),
            (F.col("pos") + 1).cast("long").alias("rnk"),
        )
    )
    final = graph.unrenumber(final, "vertex")
    return graph.unrenumber(final, "seed").select("seed", "vertex", "ppr", "rnk")


def trustrank(
    graph: Graph,
    trusted: list,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1.0e-5,
    fixed_iterations: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina, Pedersen, VLDB 2004): PageRank
    with the restart biased to a trusted seed set — the classic link-spam
    demotion primitive. DF[vertex, trust] over ALL vertices.

    Physically this IS the reference's personalized PageRank
    (link_analysis/pagerank.py:22-31 personalization path, implemented in
    pagerank.py here): one vector, restart mass split uniformly over the
    seeds, dangling mass re-seeded to the trusted set. Same superstep plan,
    same checkpointable loop — zero new physical machinery."""
    from .pagerank import pagerank

    seeds = sorted(set(trusted))
    if not seeds:
        raise ValueError("trustrank needs at least one trusted vertex")
    spark = graph.edges.sparkSession
    pers = spark.createDataFrame([(s, 1.0) for s in seeds], ["vertex", "values"])
    out = pagerank(
        graph,
        alpha=alpha,
        personalization=pers,
        max_iter=max_iter,
        tol=tol,
        fixed_iterations=fixed_iterations,
        num_partitions=num_partitions,
    )
    return out.select("vertex", F.col("pagerank").alias("trust"))
