"""Random walks with deterministic seeded sampling — full reference surface.

Reference: sampling/random_walks.py:19-118 (`random_walks(G, start_vertices,
max_depth, use_padding)` returning vertex paths, edge-weight paths, and path
sizes; `rw_path(num_paths, sizes)` returning the offset/size metadata that
slices the flat arrays); kernel cpp/src/sampling/random_walks.cuh (1309 LoC).

Spark shape (SURVEY §2.3): per step, join the walk frontier with the edge
table on the current vertex and pick ONE outgoing edge per walk by a
deterministic pseudo-random rank reduced with a hash aggregation (min over
a struct — no window sort, no RNG state): every run of the same
(graph, starts, seed) yields identical paths, which is what the engine's
determinism/resume contract requires (the reference uses device RNG and is
NOT reproducible across runs; we strengthen that).

Sampling is WEIGHTED on weighted graphs: next-hop probability ∝ edge weight
via the Efraimidis–Spirakis A-Res key — rank = ln(u)/w with u a seeded hash
mapped to (0,1), taking the per-walk maximum (equivalently the minimum of
-ln(u)/w). Unweighted graphs reduce to the uniform min-hash pick.

Output rows carry the traversed edge's weight (``edge_weight``; null at
step 0 — the reference's weight path has size-1 entries per walk).
``use_padding=True`` pads every walk to max_depth+1 rows with vertex = -1
and edge_weight 0.0, mirroring the reference's padded layout. ``rw_path``
reproduces the reference's (vertex_offset, weight_size, path_size) metadata
from the unpadded result.

Walks that reach a sink vertex stop early (matching the reference's
truncated-path semantics with use_padding=False).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import truncate_plan
from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions

# rank_mode="lcg" constants — the draw is plain BIGINT arithmetic
# ((A·walk + B·step + C·dst + seed) mod P) so an ANSI-SQL oracle can
# reproduce the walk BIT-identically (xxhash64 has no SQL twin); used by the
# driver-contract query, xxhash remains the default for sampling quality.
RW_LCG_A = 1103515245
RW_LCG_B = 12345
RW_LCG_C = 2654435761
RW_LCG_P = 2147483647


def random_walks(
    graph: Graph,
    start_vertices: list,
    max_depth: int = 4,
    seed: int = 42,
    use_padding: bool = False,
    num_partitions: int | None = None,
    rank_mode: str = "xxhash",
) -> DataFrame:
    """DF[walk_id, step, vertex, edge_weight] — one row per visited vertex
    per walk (step 0 = start, edge_weight = weight of the edge taken INTO
    this vertex, null at step 0). External ids when the graph is renumbered.
    With ``use_padding`` every walk has exactly max_depth+1 rows, padded
    with vertex = -1 / edge_weight = 0.0 like the reference's padded paths.
    """
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    edges = (
        graph.edges.select("src", "dst", w.alias("w"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if graph.renumbered:
        internal = [graph._to_internal(v) for v in start_vertices]
        if any(v is None for v in internal):
            raise ValueError("start vertex not in graph")
    else:
        internal = [int(v) for v in start_vertices]
    n_walks = len(internal)
    bcast = n_walks <= BROADCAST_STATE_MAX_V

    cur = truncate_plan(
        spark.createDataFrame(
            [(i, 0, v) for i, v in enumerate(internal)],
            "walk_id LONG, step INT, vertex LONG",
        ).withColumn("edge_weight", F.lit(None).cast("double")),
        eager=False,
    )
    paths = cur
    with no_aqe(spark, nparts):
        for step in range(1, max_depth + 1):
            f_src = cur.select("walk_id", F.col("vertex").alias("src"))
            f_src = (
                F.broadcast(f_src) if bcast else f_src.repartition(nparts, "src")
            )
            cand = edges.join(f_src, on="src")
            # seeded uniform in (0, 1): hash magnitude, never exactly 0 or 1
            if rank_mode == "lcg":
                r_int = (
                    F.lit(RW_LCG_A) * F.col("walk_id")
                    + F.lit(RW_LCG_B * step)
                    + F.lit(RW_LCG_C) * F.col("dst")
                    + F.lit(seed)
                ) % F.lit(RW_LCG_P)
                u = (r_int + F.lit(1)) / F.lit(float(RW_LCG_P + 2))
            else:
                u = (
                    F.abs(F.xxhash64("walk_id", F.lit(step), "dst", F.lit(seed)))
                    % F.lit(2**31)
                    + F.lit(1)
                ) / F.lit(float(2**31 + 2))
            if graph.weighted:
                # A-Res weighted pick: max u^(1/w) == min -ln(u)/w
                rank = -F.log(u) / F.col("w")
            else:
                rank = u
            nxt = truncate_plan(
                cand.withColumn("rnd", rank)
                .groupBy("walk_id")
                .agg(F.min(F.struct("rnd", "dst", "w")).alias("t"))
                .select(
                    "walk_id",
                    F.lit(step).cast("int").alias("step"),
                    F.col("t.dst").alias("vertex"),
                    F.col("t.w").cast("double").alias("edge_weight"),
                ),
                eager=False,  # single consumer: the count below
            )
            if nxt.count() == 0:
                break
            paths = truncate_plan(paths.unionByName(nxt), eager=False)
            cur = nxt
    edges.unpersist()
    out = paths
    if use_padding:
        grid = (
            spark.createDataFrame(
                [(i,) for i in range(n_walks)], "walk_id LONG"
            ).crossJoin(
                spark.range(max_depth + 1).select(F.col("id").cast("int").alias("step"))
            )
        )
        out = grid.join(out, on=["walk_id", "step"], how="left").select(
            "walk_id",
            "step",
            F.coalesce(F.col("vertex"), F.lit(-1)).cast("long").alias("vertex"),
            F.when(F.col("step") == 0, F.lit(None).cast("double"))
            .otherwise(F.coalesce(F.col("edge_weight"), F.lit(0.0)))
            .alias("edge_weight"),
        )
    if graph.renumbered:
        if use_padding:
            padded = out.filter(F.col("vertex") == -1)
            real = graph.unrenumber(out.filter(F.col("vertex") != -1), "vertex")
            out = real.unionByName(
                padded.select("walk_id", "step", "vertex", "edge_weight")
            )
        else:
            out = graph.unrenumber(out, "vertex")
    return out.select("walk_id", "step", "vertex", "edge_weight")


def rw_path(paths: DataFrame) -> DataFrame:
    """Reference rw_path (sampling/random_walks.py:121-160): per-walk
    (vertex_offset, weight_size, path_size) metadata for slicing the flat
    path arrays. ``paths`` is an UNPADDED random_walks result."""
    sizes = paths.groupBy("walk_id").agg(F.count("*").alias("path_size"))
    w_off = Window.orderBy("walk_id").rowsBetween(Window.unboundedPreceding, -1)
    return sizes.select(
        "walk_id",
        F.coalesce(F.sum("path_size").over(w_off), F.lit(0))
        .cast("long")
        .alias("vertex_offset"),
        (F.col("path_size") - 1).cast("long").alias("weight_size"),
        F.col("path_size").cast("long").alias("path_size"),
    )


def node2vec_walks(
    graph: Graph,
    start_vertices: list,
    max_depth: int = 4,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    num_partitions: int | None = None,
    rank_mode: str = "xxhash",
) -> DataFrame:
    """Second-order (node2vec, Grover & Leskovec 2016) biased walks:
    DF[walk_id, step, vertex, edge_weight] — same output contract as
    ``random_walks``. The next-hop weight of edge (cur -> x) given the
    previous vertex t is  w · 1/p if x == t,  w if x is a neighbor of t,
    w · 1/q otherwise. Training-pipeline extension beyond the reference
    (its 21.x snapshot ships uniform/weighted walks only —
    sampling/random_walks.py:19-118).

    Distributed shape: per step ONE edges-join on the frontier plus ONE
    left join against the distinct adjacency keyed by (prev, dst) for the
    is-neighbor test — the second-order state is just the (walk_id, prev,
    cur) triple, never a per-walk neighbor set. Sampling is the same
    partitioning-independent seeded A-Res draw as ``random_walks``
    (``rank_mode="lcg"`` keeps it SQL/python-replicable)."""
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    edges = (
        graph.edges.select("src", "dst", w.alias("w"))
        .repartition(nparts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj = (
        edges.select(F.col("src").alias("prev"), "dst")
        .distinct()
        .withColumn("is_nbr", F.lit(True))
        .repartition(nparts, "prev")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if graph.renumbered:
        internal = [graph._to_internal(v) for v in start_vertices]
        if any(v is None for v in internal):
            raise ValueError("start vertex not in graph")
    else:
        internal = [int(v) for v in start_vertices]
    n_walks = len(internal)
    bcast = n_walks <= BROADCAST_STATE_MAX_V

    cur = truncate_plan(
        spark.createDataFrame(
            [(i, 0, v) for i, v in enumerate(internal)],
            "walk_id LONG, step INT, vertex LONG",
        )
        .withColumn("edge_weight", F.lit(None).cast("double"))
        .withColumn("prev", F.lit(None).cast("long")),
        eager=False,
    )
    paths = cur.select("walk_id", "step", "vertex", "edge_weight")
    with no_aqe(spark, nparts):
        for step in range(1, max_depth + 1):
            f_src = cur.select(
                "walk_id", F.col("vertex").alias("src"), F.col("prev")
            )
            f_src = (
                F.broadcast(f_src) if bcast else f_src.repartition(nparts, "src")
            )
            cand = edges.join(f_src, on="src").join(
                adj, on=["prev", "dst"], how="left"
            )
            if rank_mode == "lcg":
                r_int = (
                    F.lit(RW_LCG_A) * F.col("walk_id")
                    + F.lit(RW_LCG_B * step)
                    + F.lit(RW_LCG_C) * F.col("dst")
                    + F.lit(seed)
                ) % F.lit(RW_LCG_P)
                u = (r_int + F.lit(1)) / F.lit(float(RW_LCG_P + 2))
            else:
                u = (
                    F.abs(F.xxhash64("walk_id", F.lit(step), "dst", F.lit(seed)))
                    % F.lit(2**31)
                    + F.lit(1)
                ) / F.lit(float(2**31 + 2))
            bias = F.when(F.col("prev").isNull(), F.lit(1.0)).otherwise(
                F.when(F.col("dst") == F.col("prev"), F.lit(1.0 / p)).otherwise(
                    F.when(F.col("is_nbr"), F.lit(1.0)).otherwise(F.lit(1.0 / q))
                )
            ) * F.col("w")
            rank = -F.log(u) / bias
            nxt = truncate_plan(
                cand.withColumn("rnd", rank)
                .groupBy("walk_id")
                .agg(F.min(F.struct("rnd", "dst", "w", "src")).alias("t"))
                .select(
                    "walk_id",
                    F.lit(step).cast("int").alias("step"),
                    F.col("t.dst").alias("vertex"),
                    F.col("t.w").cast("double").alias("edge_weight"),
                    F.col("t.src").alias("prev"),
                ),
                eager=False,  # single consumer: the count below
            )
            if nxt.count() == 0:
                break
            paths = truncate_plan(
                paths.unionByName(
                    nxt.select("walk_id", "step", "vertex", "edge_weight")
                ),
                eager=False,
            )
            cur = nxt
    edges.unpersist()
    adj.unpersist()
    out = paths
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    return out.select("walk_id", "step", "vertex", "edge_weight")


def skipgram_pairs(
    walks: DataFrame,
    window: int = 2,
    walk_col: str = "walk_id",
    step_col: str = "step",
    vertex_col: str = "vertex",
) -> DataFrame:
    """DF[center, context, cnt] — skip-gram (center, context) pair counts
    from a walk table: the DeepWalk/node2vec training-data artifact
    (Perozzi et al. 2014 §4.2; every position is a center, contexts are the
    positions within ``window`` steps on either side, both directed pairs
    emitted).

    100-TB shape: ONE walk-keyed shuffle (groups bounded by walk length,
    never by vertex degree — a hub appearing in 10^6 walks lands in 10^6
    different groups), a zero-shuffle array expansion for the pair lists,
    and one map-side-combined (center, context) count agg where hot pairs
    collapse before the shuffle. No self-join of the corpus-scale walk
    table.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    seq = (
        walks.groupBy(F.col(walk_col).alias("walk_id"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(step_col).alias("s"),
                                        F.col(vertex_col).alias("v")))
            ).alias("seq")
        )
        .select(F.col("seq.v").alias("vs"))
    )
    # forward pairs (i < j <= i+window); both directions materialize by
    # emitting (a,b) and (b,a) per forward pair
    fwd = F.flatten(
        F.transform(
            F.col("vs"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("vs"),
                    i + F.lit(2),
                    F.least(F.lit(window), F.size(F.col("vs")) - i - 1),
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = seq.select(F.explode(fwd).alias("p")).select("p.a", "p.b")
    both = pairs.select(F.col("a").alias("center"), F.col("b").alias("context")).unionAll(
        pairs.select(F.col("b").alias("center"), F.col("a").alias("context"))
    )
    return both.groupBy("center", "context").agg(F.count("*").alias("cnt"))


def negative_samples(
    vocab: DataFrame,
    n_samples: int,
    seed: int = 0,
    chunk: int = 1 << 16,
    vertex_col: str = "vertex",
    weight_col: str = "weight",
    bucket_bits: int = 8,
) -> DataFrame:
    """DF[sample_id, vertex] — ``n_samples`` weight-proportional draws from
    the vocabulary: the word2vec/node2vec NEGATIVE-sampling table (Mikolov
    et al. 2013 §2.2) that pairs with :func:`skipgram_pairs` to complete
    the embedding-training data artifact (callers key block j of k_neg
    consecutive samples to training pair j). Deterministic: draw i lands at
    integer position ``lcg(i + seed) mod total_weight`` of the concatenated
    weight stream, and the vertex owning that position wins — the exact
    inverse-CDF rule, replayable in SQL. (The classic degree^0.75
    smoothing is a float; apply it upstream by passing a pre-smoothed
    integer weight column — the sampler itself stays integer-exact.)

    100-TB shape: the cumulative weight stream is materialized as a
    ``pack_sequences`` span manifest (two-level bucket-histogram prefix
    sum — no global sort), so locating a sample is ONE equi-join on the
    weight-stream chunk id: draws hash to chunks, manifest rows cover
    chunks, containment is a map-side filter. No range join, no broadcast
    of the vertex-scale vocabulary, fan-out per chunk bounded by
    chunk/avg_weight + 1 span rows.

    Reference N/A (no sampling-table op in the 2021 fork); composes with
    ``random_walks`` + ``skipgram_pairs`` (sampling/random_walks.py:19-118
    is the walk surface the pairs come from).
    """
    from ..text.pipeline import LCG_A, LCG_C, LCG_M, pack_sequences

    if n_samples < 1:
        raise ValueError("n_samples must be >= 1")
    if chunk < 1:
        raise ValueError("chunk must be >= 1")

    spans = pack_sequences(
        vocab, window=chunk, id_col=vertex_col, weight_col=weight_col,
        bucket_bits=bucket_bits,
    ).select(
        "chunk_id",
        F.col(vertex_col),
        "chunk_off",
        "n_toks",
    )
    total = vocab.agg(F.sum(F.col(weight_col).cast("long"))).collect()[0][0]
    if not total or total <= 0:
        raise ValueError("vocabulary weights must sum to a positive total")

    spark = vocab.sparkSession
    # position space is bounded by the 31-bit LCG modulus: every stream
    # position >= 2^31 has zero draw probability, so weight-proportional
    # sampling requires total <= 2^31 (~2.1e9 total weight); guard loudly
    # instead of silently truncating the distribution
    if int(total) > LCG_M:
        raise ValueError(
            f"total weight {total} exceeds the sampler's 2^31 position space"
            " — shard the vocabulary or use per-shard samplers"
        )
    pos = ((F.col("id") + F.lit(int(seed))) * F.lit(LCG_A) + F.lit(LCG_C)) % F.lit(
        LCG_M
    ) % F.lit(int(total))
    # integer DIV for the chunk decomposition (same convention as
    # pack_sequences): the float path is exact only below 2^53
    draws = spark.range(int(n_samples)).select(
        F.col("id").alias("sample_id"), pos.alias("_pos")
    ).select(
        "sample_id",
        F.expr(f"_pos DIV {int(chunk)}").alias("chunk_id"),
        (F.col("_pos") % F.lit(int(chunk))).alias("off"),
    )
    return (
        draws.join(spans, on="chunk_id")
        .filter(
            (F.col("off") >= F.col("chunk_off"))
            & (F.col("off") < F.col("chunk_off") + F.col("n_toks"))
        )
        .select("sample_id", F.col(vertex_col).alias("vertex"))
    )
