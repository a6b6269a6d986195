"""Approximate-nearest-neighbor search over an embedding column.

Two strategies over DF[id, embedding: array<float>]:

- ``cosine_topk`` — exact brute force: the (small) query set is broadcast
  against the (large) candidate table; the dot product is a built-in
  ``aggregate(zip_with(...))`` expression (JVM-side, no Python); top-k per
  query uses a TWO-PHASE reduction — per-partition top-k inside a hash
  aggregate (min-heap-like via sorted slice), then a final merge — so no
  single task ever sees all candidates for a query (a per-query window sort
  would single-task each query's full candidate set at 10^12 scale).

- ``lsh_cosine_topk`` — the scale path: h random-hyperplane sign bits
  (Charikar 2002) bucket the candidates; each query probes its own bucket
  (plus optional multi-probe neighbors at Hamming distance 1), then exact
  cosine reranks within the bucket. Recall/cost tuned by ``nbits``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT = (
    "aggregate(zip_with(qe, be, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(transform({c}, x -> cast(x as double) * cast(x as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v))"
)


def _with_norm(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    return df.withColumn(out, F.expr(_NORM.format(c=vec_col)))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """DF[query_id, neighbor_id, cosine, rnk] — exact brute-force top-k.

    ``queries``: DF with the same id/vec columns (typically a small subset).
    """
    q = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
        ),
        "qe",
        "qn",
    )
    b = _with_norm(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("be")
        ),
        "be",
        "bn",
    )
    cond = F.lit(True) if not exclude_self else F.col("query_id") != F.col("neighbor_id")
    sims = (
        b.join(F.broadcast(q), cond)
        .select(
            "query_id",
            "neighbor_id",
            (F.expr(_DOT) / (F.col("qn") * F.col("bn"))).alias("cosine"),
        )
    )
    # two-phase top-k: partition-local top-k, then global merge of <= P*k rows
    part = (
        sims.groupBy("query_id", F.spark_partition_id().alias("__pid__"))
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct(F.col("cosine"), F.col("neighbor_id"))),
                    asc=False,
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.explode("top").alias("t"))
        .select("query_id", F.col("t.cosine").alias("cosine"), F.col("t.neighbor_id").alias("neighbor_id"))
    )
    final = (
        part.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct(F.col("cosine"), F.col("neighbor_id"))),
                    asc=False,
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "query_id",
            F.col("t.neighbor_id").alias("neighbor_id"),
            F.col("t.cosine").alias("cosine"),
            (F.col("pos") + 1).cast("long").alias("rnk"),
        )
    )
    return final


def hyperplane_signatures(
    embeddings: DataFrame,
    nbits: int = 16,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """DF[id, bucket] — random-hyperplane sign signature as an int bucket."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim)).astype(np.float64)

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.vstack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            bits = (vecs @ planes.T) > 0  # (n, nbits)
            bucket = np.zeros(len(pdf), dtype=np.int64)
            for i in range(nbits):
                bucket |= bits[:, i].astype(np.int64) << i
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": bucket})

    return embeddings.select(id_col, vec_col).mapInPandas(
        sig, f"{id_col} long, bucket long"
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 12,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket (plus Hamming-1 probe buckets), exact cosine rerank inside."""
    dim = len(embeddings.select(vec_col).first()[0])
    sig_b = hyperplane_signatures(embeddings, nbits, dim, id_col, vec_col, seed)
    sig_q = hyperplane_signatures(queries, nbits, dim, id_col, vec_col, seed)
    if multiprobe:
        probes = sig_q.select(
            F.col(id_col),
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(nbits)
                    ],
                )
            ).alias("bucket"),
        )
    else:
        probes = sig_q
    cand = (
        probes.withColumnRenamed(id_col, "query_id")
        .join(sig_b.withColumnRenamed(id_col, "neighbor_id"), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_rerank_topk(cand, embeddings, queries, k, id_col, vec_col)


def _exact_rerank_topk(
    cand: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared ANN tail: exact cosine over candidate (query, neighbor) pairs
    + per-query top-k — one codepath for every bucketed tier (LSH, IVF) so
    rerank semantics can never diverge between them."""
    q = _with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")),
        "qe",
        "qn",
    )
    b = _with_norm(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("be")
        ),
        "be",
        "bn",
    )
    sims = (
        cand.join(F.broadcast(q), on="query_id")
        .join(b, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.expr(_DOT) / (F.col("qn") * F.col("bn"))).alias("cosine"),
        )
    )
    return (
        sims.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("cosine", "neighbor_id")), asc=False
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "query_id",
            F.col("t.neighbor_id").alias("neighbor_id"),
            F.col("t.cosine").alias("cosine"),
            (F.col("pos") + 1).cast("long").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def ivf_train_centroids(
    embeddings: DataFrame,
    n_cells: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_per_cell: int = 64,
    max_iter: int = 20,
    seed: int = 42,
) -> np.ndarray:
    """Train the spherical-k-means coarse quantizer on a deterministic
    sample (the standard IVF recipe — FAISS trains its quantizer on a
    bounded sample too, so driver-side numpy here is the honest analogue,
    not a scale cheat: the sample is ``n_cells * sample_per_cell`` rows
    regardless of corpus size). Sampling is xxhash-keyed, so the same
    centroids come out at any partitioning. Returns (n_cells, dim) UNIT
    row vectors."""
    from .deterministic import hash_uniform

    n_sample = n_cells * sample_per_cell
    # orderBy(hash, id): the SAME n_sample rows in the SAME order at any
    # partitioning — filter+limit would take a partition-order-dependent
    # subset and break the determinism guarantee (and this needs no count)
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(hash_uniform(F.col(id_col), seed), F.col(id_col))
        .limit(n_sample)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train IVF centroids on an empty embeddings table")
    x = np.vstack([np.asarray(r[1], dtype=np.float64) for r in rows])
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(max_iter):
        assign = np.argmax(x @ cents.T, axis=1)
        new = np.zeros_like(cents)
        for c in range(len(cents)):
            m = x[assign == c]
            new[c] = m.mean(axis=0) if len(m) else cents[c]
        new /= np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        if np.allclose(new, cents, atol=1e-9):
            cents = new
            break
        cents = new
    return cents


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DF[id, cell] — top-``nprobe`` cells by centroid dot product per
    vector (nprobe=1 for indexing, >1 for query probing). Arrow-batched;
    centroids ride to executors as a closure constant (n_cells × dim
    doubles)."""
    c = centroids.astype(np.float64)
    p = min(nprobe, c.shape[0])  # fewer trained cells than probes on tiny corpora

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.vstack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            dots = vecs @ c.T  # (n, n_cells)
            top = np.argsort(-dots, axis=1)[:, :p]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(p),
                    "cell": top.reshape(-1),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, cell long"
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 64,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: candidates restricted to the query's
    ``nprobe`` nearest quantizer cells, exact cosine rerank inside —
    the inverted-list partitioning FAISS-style IVF uses, expressed as a
    cell equi-join. Complements ``lsh_cosine_topk``: IVF adapts its
    partition boundaries to the data (trained quantizer) where LSH uses
    data-oblivious hyperplanes."""
    cents = ivf_train_centroids(
        embeddings, n_cells, id_col, vec_col, seed=seed
    )
    lists = ivf_assign(embeddings, cents, 1, id_col, vec_col)
    probes = ivf_assign(queries, cents, nprobe, id_col, vec_col)
    cand = (
        probes.withColumnRenamed(id_col, "query_id")
        .join(lists.withColumnRenamed(id_col, "neighbor_id"), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_rerank_topk(cand, embeddings, queries, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (the dedup tier over vectors)
# ---------------------------------------------------------------------------

def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.8,
    method: str = "lsh",
    nbits: int = 8,
    ntables: int = 4,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """DF[a_id, b_id, cosine] — unordered pairs (``a_id < b_id``) whose
    embedding cosine is ≥ ``threshold``. The vector analogue of the text
    dedup tiers in ``linkgraph.text.dedup``.

    method="exact"
        All-pairs verify. Quadratic in the corpus — the correctness tier
        for tests/small corpora only; at 100-TB scale use ``method="lsh"``.
    method="lsh"
        Candidates = pairs that share a random-hyperplane sign bucket in
        ANY of ``ntables`` independent tables (OR-amplification, Charikar
        2002), optionally widened by Hamming-1 multiprobe on one side;
        exact cosine verify inside. Each table is a bucket equi-join —
        one shuffle keyed by bucket, never all-pairs — so cost scales with
        Σ bucket² rather than N². Recall rises with ``ntables``/multiprobe
        and falls with ``nbits``; for a near-dup threshold τ the per-bit
        collision probability is 1 − arccos(τ)/π.
    """
    a = _with_norm(
        embeddings.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("qe")),
        "qe",
        "qn",
    )
    b = _with_norm(
        embeddings.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("be")),
        "be",
        "bn",
    )
    if method == "exact":
        cand = (
            embeddings.select(F.col(id_col).alias("a_id"))
            .join(
                embeddings.select(F.col(id_col).alias("b_id")),
                F.col("a_id") < F.col("b_id"),
            )
        )
    elif method == "lsh":
        # ALL tables' signatures in ONE Arrow pass (one parquet scan, one
        # vectorized matmul per batch), long format (id, t, bucket); the
        # candidate step is then a single self-join shuffle keyed by
        # (t, bucket) — never one scan+UDF per table per join side.
        dim = len(embeddings.select(vec_col).first()[0])
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((ntables, nbits, dim)).astype(np.float64)

        def sig_all(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vecs = np.vstack(pdf[vec_col].map(np.asarray).to_numpy()).astype(
                    np.float64
                )
                n = len(pdf)
                out_t = np.repeat(np.arange(ntables, dtype=np.int64), n)
                out_id = np.tile(pdf[id_col].to_numpy(), ntables)
                buckets = np.empty(ntables * n, dtype=np.int64)
                for t in range(ntables):
                    bits = (vecs @ planes[t].T) > 0
                    bk = np.zeros(n, dtype=np.int64)
                    for i in range(nbits):
                        bk |= bits[:, i].astype(np.int64) << i
                    buckets[t * n : (t + 1) * n] = bk
                yield pd.DataFrame({id_col: out_id, "t": out_t, "bucket": buckets})

        sig = embeddings.select(id_col, vec_col).mapInPandas(
            sig_all, f"{id_col} long, t long, bucket long"
        )
        left = sig.select(F.col(id_col).alias("a_id"), "t", "bucket")
        if multiprobe:
            left = left.select(
                "a_id",
                "t",
                F.explode(
                    F.array(
                        F.col("bucket"),
                        *[
                            F.col("bucket").bitwiseXOR(F.lit(1 << i))
                            for i in range(nbits)
                        ],
                    )
                ).alias("bucket"),
            )
        cand = (
            left.join(
                sig.select(F.col(id_col).alias("b_id"), "t", "bucket"),
                on=["t", "bucket"],
            )
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .distinct()
        )
    else:
        raise ValueError(f"unknown method {method!r} (use 'exact' or 'lsh')")
    return (
        cand.join(a, on="a_id")
        .join(b, on="b_id")
        .select(
            "a_id",
            "b_id",
            (F.expr(_DOT) / (F.col("qn") * F.col("bn"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("a_id", "b_id", "cosine")
    )


# ---------------------------------------------------------------------------
# SQL-replicable LSH tier (LCG planes, exact integer arithmetic)
# ---------------------------------------------------------------------------

# Constants for the LCG-derived hyperplanes. Same design as the random-walk
# rank_mode="lcg" (linkgraph/algorithms/random_walks.py): plain BIGINT
# arithmetic so an ANSI-SQL oracle reproduces every bucket bit-identically.
LSH_LCG_A = 1103515245
LSH_LCG_C = 2654435761
LSH_LCG_P = 2147483647
LSH_LCG_HALF = (LSH_LCG_P - 1) // 2


def lcg_hyperplane_buckets(
    embeddings: DataFrame,
    nbits: int = 12,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    quantize: int = 1000,
) -> DataFrame:
    """DF[id, bucket] — hyperplane sign buckets whose plane components come
    from an integer LCG and whose dot products are exact BIGINT sums over
    ``round(x*quantize)`` components. Every operation is integer-exact, so
    a DuckDB oracle replays the buckets value-for-value (numpy/xxhash
    planes have no SQL twin). Production ANN should prefer
    ``hyperplane_signatures`` (Gaussian planes are angularly uniform); this
    tier exists so the LSH bucketing itself — not just its rerank tail —
    is driver-verifiable. Entirely JVM-side (one whole-stage codegen
    projection, no UDF)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    bucket = f"""
    aggregate(sequence(0, {nbits - 1}), cast(0 as bigint), (acc, j) ->
      acc + shiftleft(CASE WHEN
        aggregate(sequence(1, {dim}), cast(0 as bigint), (a2, i) ->
          a2 + element_at(qv, i) *
            ((cast({LSH_LCG_A} as bigint) * (j * {dim} + i)
              + cast({LSH_LCG_C} as bigint) + cast({seed} as bigint))
             % cast({LSH_LCG_P} as bigint) - cast({LSH_LCG_HALF} as bigint))
        ) > 0 THEN cast(1 as bigint) ELSE cast(0 as bigint) END, j))
    """
    qv = F.expr(
        f"transform({vec_col}, x -> cast(round(cast(x as double) * {quantize}) as bigint))"
    )
    return embeddings.select(F.col(id_col), qv.alias("qv")).select(
        F.col(id_col), F.expr(bucket).alias("bucket")
    )


# ---------------------------------------------------------------------------
# distributed Lloyd k-means + SemDeDup semantic dedup
# ---------------------------------------------------------------------------

KMEANS_SCALE = 1000
KMEANS_LCG_A = 1103515245
KMEANS_LCG_C = 12345
KMEANS_LCG_M = 2**31
# Above this many k*d centroid entries the assignment switches from a
# Catalyst literal expression to a broadcast numpy argmax (same integer
# semantics). SemDeDup at corpus scale needs k in the thousands (Abbas et
# al. 2023); a k x d literal array would blow Catalyst's constant pool /
# codegen long before the data is big.
KMEANS_LITERAL_MAX_ENTRIES = 4096
# PQ's literal path fans out m x k zip_with dot products PER ROW — the
# intermediate arrays make it allocation-bound (measured: 3x slower than
# the Arrow/numpy sweep at m=4,k=16,ds=16 on 600k vecs, and flat from 8
# to 32 threads because the allocator saturates before the cores do), so
# PQ flips to numpy far earlier than plain k-means assignment. Both paths
# are bit-identical (pinned in tests/test_pq.py).
PQ_LITERAL_MAX_ENTRIES = 256
# Hard cap on the ADC query batch collected to the driver (each query
# becomes an m x k integer lookup table in the scoring expression).
PQ_MAX_QUERY_BATCH = 4096


def _round_half_away(x: float) -> int:
    """Spark's ROUND (HALF_UP) == DuckDB's round() == C std::round: half
    away from zero ON THE DOUBLE VALUE. Python's built-in round is
    banker's rounding — never use it here. The classic floor(x+0.5)
    shortcut is also wrong on one boundary class: for the largest double
    BELOW k-0.5 (e.g. 0.49999999999999994), x+0.5 rounds UP to k in IEEE
    arithmetic, yielding k where std::round (and DuckDB, and Spark) yield
    k-1 — exactly the kind of one-ulp dialect divergence the PQ/k-means
    oracle contract must exclude, so correct it explicitly."""
    import math
    from fractions import Fraction

    # exact binary rational of the double — float add/subtract of 0.5
    # re-rounds and silently erases the very boundary being handled
    f = Fraction(x)
    half = Fraction(1, 2)
    return int(math.floor(f + half)) if x >= 0 else int(math.ceil(f - half))


def _unit_quantized(vec: list, scale: int) -> list[int]:
    """Integer unit vector at `scale`: round(scale * v_i / |v|). All inputs
    are integers, so |v| = sqrt(exact int) and the division are correctly-
    rounded doubles — bit-identical in Spark, DuckDB, and Python."""
    import math

    nrm = math.sqrt(sum(int(v) * int(v) for v in vec))
    if nrm == 0.0:
        return [int(v) for v in vec]
    return [_round_half_away(scale * int(v) / nrm) for v in vec]


def _kmeans_full(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
):
    """Spherical k-means over integer-quantized vectors — EXACT arithmetic
    end to end, so the DuckDB oracle replays every assignment bit-for-bit:

    - vectors quantize once to round(scale·x) bigints;
    - centroids live as integer unit vectors at the same scale
      (`_unit_quantized`);
    - assignment = argmax of the INTEGER dot product, ties to the lower
      cluster id — a whole-stage-codegen map over a k×d literal when k·d
      is small, a broadcast numpy argmax in `mapInPandas` above
      `KMEANS_LITERAL_MAX_ENTRIES` (see `_assign_frame`; bit-identical);
    - update = one map-side-combined groupBy(cluster) with d integer sums;
      only the k×d sufficient statistics ever reach the driver (the same
      bounded-driver-state pattern as the IVF trainer and Lanczos);
    - initial centroids are the k vectors with the smallest LCG(id) —
      deterministic under any partitioning, SQL-replicable.

    Per iteration: ONE shuffle (k-group aggregation; partial aggregation
    makes the tiny group count a non-issue) + one k·d-row collect. At 100 TB
    the data passes stay identical; only k·d scalars sync per round.

    Returns (assign DF[id_col, cluster], centroids list[list[int]], qdf).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    from pyspark.storagelevel import StorageLevel

    head = embeddings.select(vec_col).first()
    if head is None:
        raise ValueError("cannot run k-means on an empty embeddings table")
    dim = len(head[0])
    qv = F.expr(
        f"transform({vec_col}, x -> cast(round(cast(x as double) * {scale}) as bigint))"
    )
    q = (
        embeddings.select(F.col(id_col).alias("id"), qv.alias("qv"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    seed_rows = (
        q.orderBy(
            (F.col("id") * KMEANS_LCG_A + KMEANS_LCG_C) % KMEANS_LCG_M, F.col("id")
        )
        .limit(k)
        .collect()
    )
    if not seed_rows:
        raise ValueError("cannot run k-means on an empty embeddings table")
    cents = [_unit_quantized(r.qv, scale) for r in seed_rows]

    for _ in range(iterations):
        af = _assign_frame(q, cents)
        sums = (
            af.groupBy("cluster")
            .agg(*[F.sum(F.col("qv")[i]).alias(f"s{i}") for i in range(dim)])
            .collect()
        )
        by_c = {r.cluster: [r[f"s{i}"] for i in range(dim)] for r in sums}
        bc = getattr(af, "_lg_bc", None)
        if bc is not None:  # stats collected — this iteration's broadcast is dead
            bc.unpersist()
        new = []
        for c in range(len(cents)):
            s = by_c.get(c)
            uq = _unit_quantized(s, scale) if s is not None else None
            # empty cluster, or a degenerate zero-sum: keep the old centroid
            new.append(uq if uq is not None and any(uq) else cents[c])
        cents = new

    assign = _assign_frame(q, cents).select(
        F.col("id").alias(id_col), "cluster", "dot_c"
    )
    return assign, cents, q


def _assign_frame(q: DataFrame, cents: list[list[int]]) -> DataFrame:
    """DF[id, qv, cluster, dot_c]: argmax over the INTEGER centroid dot
    products, ties to the lower cluster id.

    Two physically different, bit-identical paths gated on k*d:

    - small (<= KMEANS_LITERAL_MAX_ENTRIES entries): one whole-stage-codegen
      map over a k x d literal array — no shuffle, no Python;
    - large: the quantized centroid matrix is BROADCAST once and each Arrow
      batch does one int64 matmul + argmax inside ``mapInPandas``
      (numpy argmax returns the first maximal index = lowest cluster id,
      exactly the literal path's tie rule). Plan size is O(1) in k, so
      SemDeDup's corpus-scale k regime (thousands of clusters) never hits
      Catalyst's constant pool.
    """
    k = len(cents)
    dim = len(cents[0]) if k else 0
    if k * dim <= KMEANS_LITERAL_MAX_ENTRIES:
        lit = F.array(
            *[
                F.struct(
                    F.lit(c).cast("long").alias("c"),
                    F.array(*[F.lit(int(v)).cast("long") for v in vec]).alias("qc"),
                )
                for c, vec in enumerate(cents)
            ]
        )
        scored = F.transform(
            lit,
            lambda s: F.struct(
                F.aggregate(
                    F.zip_with(F.col("qv"), s.qc, lambda x, y: x * y),
                    F.lit(0).cast("long"),
                    lambda a, v: a + v,
                ).alias("dot"),
                (-s.c).alias("nc"),
            ),
        )
        best = F.array_max(scored)
        return q.select(
            "id", "qv", (-best.nc).alias("cluster"), best.dot.alias("dot_c")
        )

    cmat = np.asarray(cents, dtype=np.int64)  # k x d, broadcast once
    bc = q.sparkSession.sparkContext.broadcast(cmat)
    id_type = dict(q.dtypes)["id"]
    schema = f"id {id_type}, qv array<bigint>, cluster bigint, dot_c bigint"

    def assign_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qmat = np.stack(pdf["qv"].to_numpy()).astype(np.int64, copy=False)  # n x d
            dots = qmat @ mat.T  # n x k int64
            cl = np.argmax(dots, axis=1)  # first max = lowest cluster id
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "qv": pdf["qv"],
                    "cluster": cl.astype(np.int64),
                    "dot_c": dots[np.arange(len(cl)), cl],
                }
            )

    out = q.select("id", "qv").mapInPandas(assign_batches, schema)
    # handle for the caller: per-iteration assignment frames are fully
    # consumed by the sufficient-stats collect, after which the broadcast
    # can be released (the final frame's broadcast must outlive the
    # returned lazy plan and is left to ContextCleaner)
    out._lg_bc = bc
    return out


def kmeans_embeddings(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DF[id_col, cluster] — deterministic distributed spherical k-means
    (see `_kmeans_full`). The corpus-clustering primitive behind curation
    pipelines (SemDeDup, prototypicality filtering, topic balancing)."""
    assign, _cents, q = _kmeans_full(embeddings, k, iterations, id_col, vec_col)
    out = assign.select(id_col, "cluster")
    q.unpersist()
    return out


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    k: int = 8,
    iterations: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus
    with k-means, then inside each cluster drop near-duplicate groups down
    to one representative — the member FARTHEST from its cluster centroid
    (the paper's keep rule; low centroid-similarity ≈ least prototypical,
    keeps the tail), ties to the smaller id.

    DF[id_col, cluster, keep]. Near-dup groups are connected components of
    the within-cluster pair graph {cosine ≥ threshold}; the quadratic
    candidate stage is bounded per cluster — the whole point of clustering
    first — and the threshold compare is integer cross-multiplied
    (den²·dot² ≥ num²·|a|²·|b|², dot>0) so it is exact in both engines.

    100-TB shape: k-means passes (above) + ONE cluster-keyed self-join for
    pairs + a min-label loop whose state is only the ids that appear in
    some pair (duplicate-scale, not corpus-scale).
    """
    from fractions import Fraction

    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator

    assign, _cents, q = _kmeans_full(embeddings, k, iterations, id_col, vec_col)
    a = assign.select(
        F.col(id_col).alias("id"), "cluster", "dot_c"
    ).join(q, on="id")
    n2 = F.expr("aggregate(transform(qv, x -> x*x), cast(0 as bigint), (a2, v) -> a2 + v)")
    a = a.withColumn("n2", n2).persist()

    left = a.select(
        F.col("id").alias("a_id"), "cluster",
        F.col("qv").alias("ae"), F.col("n2").alias("an2"),
    )
    right = a.select(
        F.col("id").alias("b_id"), "cluster",
        F.col("qv").alias("be"), F.col("n2").alias("bn2"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("ae"), F.col("be"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = (
        left.join(right, on="cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", dot.alias("dot"), "an2", "bn2")
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(den * den) * F.col("dot") * F.col("dot")
                >= F.lit(num * num) * F.col("an2") * F.col("bn2")
            )
        )
        .select("a_id", "b_id")
        .persist()
    )

    # connected components over ONLY the ids that appear in a pair
    # (duplicate-scale min-label propagation, loops to fixpoint)
    sym = pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")).unionByName(
        pairs.select(F.col("b_id").alias("u"), F.col("a_id").alias("v"))
    ).persist()
    lab = sym.select(F.col("u").alias("id")).distinct().withColumn("lbl", F.col("id"))
    while True:
        nxt = (
            sym.join(lab.withColumnRenamed("id", "u"), on="u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        merged = (
            lab.join(nxt, on="id", how="left")
            .select("id", F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            merged.alias("m")
            .join(lab.alias("o"), on="id")
            .filter(F.col("m.lbl") != F.col("o.lbl"))
            .count()
        )
        lab = merged
        if changed == 0:
            break
    # lab is localCheckpoint-ed — the pair graph is no longer needed
    pairs.unpersist()
    sym.unpersist()

    # keep rule: per duplicate group, the member farthest from its centroid
    # = MIN COSINE to the assigned centroid (the paper's rule). Within a
    # group every member shares one cluster, so the centroid norm is a
    # constant positive factor and cos ranks as dot_c / sqrt(|v|²); both
    # operands are exact integers, so the double is correctly rounded and
    # bit-identical cross-engine. (Members of a pair have dot > 0, hence
    # n2 > 0 — no division by zero.) Ties to the smaller id.
    member = a.select(
        "id",
        (F.col("dot_c") / F.sqrt(F.col("n2").cast("double"))).alias("cos_c"),
    ).join(lab, on="id")
    rep = member.groupBy("lbl").agg(
        F.min(F.struct(F.col("cos_c"), F.col("id"))).alias("r")
    ).select(F.col("lbl"), F.col("r.id").alias("keep_id"))
    dup_keep = lab.join(rep, on="lbl").select(
        "id", (F.col("id") == F.col("keep_id")).alias("keep")
    )
    out = (
        a.select("id", "cluster")
        .join(dup_keep, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce(F.col("keep"), F.lit(True)).alias("keep"),
        )
        .localCheckpoint(eager=True)
    )
    # output is materialized — release every cached intermediate
    a.unpersist()
    q.unpersist()
    return out


def prototypicality_scores(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DF[id_col, cluster, proto] — SSL-prototype difficulty score (Sorscher
    et al. 2022, "Beyond neural scaling laws": cosine similarity to the
    assigned k-means centroid; high = prototypical/easy, low = hard/tail).
    Data pruning keeps the hard tail at large corpus scale.

    Physical shape: the k-means passes plus ONE whole-stage-codegen map —
    the score is the integer assignment dot divided by the two exactly-
    computed norms (sqrt of exact integers), so no extra shuffle, no rank
    window, and the value is bit-identical in Spark, Python, and DuckDB.
    Consumers threshold or sample on `proto` map-side.
    """
    import math

    assign, cents, q = _kmeans_full(embeddings, k, iterations, id_col, vec_col)
    cnorms = [math.sqrt(sum(v * v for v in c)) for c in cents]
    cn = F.element_at(
        F.array(*[F.lit(float(x)) for x in cnorms]),
        F.col("cluster").cast("int") + 1,
    )
    n2 = F.expr(
        "aggregate(transform(qv, x -> x*x), cast(0 as bigint), (a2, v) -> a2 + v)"
    )
    scored = (
        assign.select(F.col(id_col).alias("id"), "cluster", "dot_c")
        .join(q, on="id")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            (F.col("dot_c") / (F.sqrt(n2.cast("double")) * cn)).alias("proto"),
        )
    )
    return scored


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance (ADC) top-k
# ---------------------------------------------------------------------------
# The FAISS-style compression tier past IVF (Jégou et al. 2011): vectors
# compress to m subspace codes (m·log2(k) bits each), queries scan the code
# table with per-subspace lookup tables instead of full d-dim arithmetic.
# Reference N/A (no PQ op in the 2021 fork) — included because a 100 TB
# embedding store cannot rerank against raw vectors.


def _pq_code_col(j: int, ds: int, cents: list[list[int]]):
    """Codegen Column: L2 argmin code for subspace ``j`` against raw
    integer codewords, ties to the lower code —
    argmin |x-c|^2 == argmax (2*x.c - |c|^2), pure integers."""
    lit = F.array(
        *[
            F.struct(
                F.lit(c).cast("long").alias("c"),
                F.lit(int(sum(v * v for v in vec))).cast("long").alias("n2"),
                F.array(*[F.lit(int(v)).cast("long") for v in vec]).alias("qc"),
            )
            for c, vec in enumerate(cents)
        ]
    )
    sv = F.slice(F.col("qv"), j * ds + 1, ds)
    scored = F.transform(
        lit,
        lambda s: F.struct(
            (
                F.lit(2).cast("long")
                * F.aggregate(
                    F.zip_with(sv, s.qc, lambda x, y: x * y),
                    F.lit(0).cast("long"),
                    lambda a, v: a + v,
                )
                - s.n2
            ).alias("sc"),
            (-s.c).alias("nc"),
        ),
    )
    return -F.array_max(scored).nc


def pq_train_encode(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
):
    """Train m per-subspace L2 codebooks and encode every vector.

    Returns ``(codes, codebooks, q)``: codes = DF[id, codes array<bigint>]
    (codes[j] = codeword index in subspace j), codebooks =
    list[m][k][d/m] raw integer codewords, q = the persisted quantized
    table (caller unpersists when done — same contract as `_kmeans_full`).

    Exact arithmetic end to end: vectors quantize to round(scale*x)
    bigints; assignment is integer L2 argmin (ties to the lower code);
    the update is the plain coordinate mean rounded half-away — all
    SQL-replicable, so the driver oracle replays every code bit-for-bit.

    Scale (100 TB): ONE pass over the persisted quantized table per
    iteration — all m subspaces assign in the same job (their k-means runs
    are independent, so batching them per iteration is bit-identical to
    m sequential loops), and the m·k·(d/m+1) sufficient statistics come
    back in one map-side-combined aggregate (small path: explode to
    (j, code, sv) rows that collapse in partial agg and never hit the
    wire; large path: a broadcast numpy sweep emits per-batch PARTIAL
    stats — k·d ints per batch — so the shuffle moves partials, not
    rows). Encoding is ONE extra pass emitting all m codes — no
    per-subspace joins anywhere. Storage: m codes per vector instead of d
    floats (32x at d=64/m=4/k=16).
    """
    if m < 1 or k < 1 or iterations < 1:
        raise ValueError("m, k, iterations must all be >= 1")
    from pyspark.storagelevel import StorageLevel

    head = embeddings.select(vec_col).first()
    if head is None:
        raise ValueError("cannot train PQ on an empty embeddings table")
    dim = len(head[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    ds = dim // m

    qv = F.expr(
        f"transform({vec_col}, x -> cast(round(cast(x as double) * {scale}) as bigint))"
    )
    q = (
        embeddings.select(F.col(id_col).alias("id"), qv.alias("qv"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seed_rows = (
        q.orderBy(
            (F.col("id") * KMEANS_LCG_A + KMEANS_LCG_C) % KMEANS_LCG_M, F.col("id")
        )
        .limit(k)
        .collect()
    )
    if not seed_rows:
        raise ValueError("cannot train PQ on an empty embeddings table")

    codebooks = [
        [[int(v) for v in r.qv[j * ds : (j + 1) * ds]] for r in seed_rows]
        for j in range(m)
    ]
    use_literal = m * k * ds <= PQ_LITERAL_MAX_ENTRIES
    for _ in range(iterations):
        # ONE fused pass: every subspace's assignment + sufficient stats in
        # the same job (the m k-means runs are independent, so this is
        # bit-identical to m sequential per-subspace loops)
        if use_literal:
            entries = F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("j"),
                        _pq_code_col(j, ds, codebooks[j]).alias("code"),
                        F.slice(F.col("qv"), j * ds + 1, ds).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
            ex = q.select(F.explode(entries).alias("e")).select(
                "e.j", "e.code", "e.sv"
            )
            stats = (
                ex.groupBy("j", "code")
                .agg(
                    F.count("*").alias("n"),
                    *[F.sum(F.col("sv")[i]).alias(f"s{i}") for i in range(ds)],
                )
                .collect()
            )
            bc = None
        else:
            import numpy as np
            import pandas as pd

            books = np.asarray(codebooks, dtype=np.int64)  # m x k x ds
            n2s = (books * books).sum(axis=2)  # m x k
            bc = q.sparkSession.sparkContext.broadcast((books, n2s, ds))

            def stat_batches(batches):
                bks, nn2, dsz = bc.value
                mm, kk = bks.shape[0], bks.shape[1]
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    qmat = np.stack(pdf["qv"].to_numpy()).astype(np.int64, copy=False)
                    out = []
                    for jj in range(mm):
                        sub = qmat[:, jj * dsz : (jj + 1) * dsz]
                        cs = np.argmax(2 * (sub @ bks[jj].T) - nn2[jj], axis=1)
                        acc = np.zeros((kk, dsz), dtype=np.int64)
                        np.add.at(acc, cs, sub)  # exact int64 partials
                        cnt = np.bincount(cs, minlength=kk)
                        for c in range(kk):
                            if cnt[c]:
                                out.append(
                                    (jj, c, int(cnt[c]), *acc[c].tolist())
                                )
                    cols = ["j", "code", "n"] + [f"s{i}" for i in range(dsz)]
                    yield pd.DataFrame(out, columns=cols)

            schema = "j long, code long, n long, " + ", ".join(
                f"s{i} long" for i in range(ds)
            )
            partials = q.select("qv").mapInPandas(stat_batches, schema)
            stats = (
                partials.groupBy("j", "code")
                .agg(
                    F.sum("n").alias("n"),
                    *[F.sum(f"s{i}").alias(f"s{i}") for i in range(ds)],
                )
                .collect()
            )
        by_jc = {(r.j, r.code): r for r in stats}
        for j in range(m):
            new = []
            # len(codebooks[j]) not k: with fewer than k training rows the
            # seed list is short (LIMIT k), same degenerate case
            # kmeans_embeddings handles with range(len(cents))
            for c in range(len(codebooks[j])):
                r = by_jc.get((j, c))
                if r is None or r.n == 0:
                    new.append(codebooks[j][c])  # empty cluster: keep
                else:
                    new.append(
                        [_round_half_away(r[f"s{i}"] / r.n) for i in range(ds)]
                    )
            codebooks[j] = new
        if bc is not None:
            bc.unpersist()

    # one pass emitting all m codes (no joins): small path = m codegen
    # argmin expressions; large path = one broadcast numpy sweep
    if use_literal:
        codes = q.select(
            "id",
            F.array(*[_pq_code_col(j, ds, codebooks[j]) for j in range(m)]).alias(
                "codes"
            ),
        )
    else:
        import numpy as np
        import pandas as pd

        books = np.asarray(codebooks, dtype=np.int64)  # m x k x ds
        n2s = (books * books).sum(axis=2)  # m x k
        bc = q.sparkSession.sparkContext.broadcast((books, n2s, ds))
        id_type = dict(q.dtypes)["id"]

        def encode_batches(batches):
            bks, nn2, dsz = bc.value
            mm = bks.shape[0]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                qmat = np.stack(pdf["qv"].to_numpy()).astype(np.int64, copy=False)
                cs = np.empty((len(pdf), mm), dtype=np.int64)
                for jj in range(mm):
                    sub = qmat[:, jj * dsz : (jj + 1) * dsz]
                    cs[:, jj] = np.argmax(2 * (sub @ bks[jj].T) - nn2[jj], axis=1)
                yield pd.DataFrame({"id": pdf["id"].to_numpy(), "codes": list(cs)})

        codes = q.select("id", "qv").mapInPandas(
            encode_batches, f"id {id_type}, codes array<bigint>"
        )
    return codes, codebooks, q


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    m: int = 4,
    k: int = 16,
    topk: int = 5,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
    rerank: int | None = None,
) -> DataFrame:
    """ADC top-k: DF[query_id, neighbor_id, score, rnk] where score is the
    integer ADC inner product sum_j T[q][j][code_j(x)] (the dot of the
    query against the PQ reconstruction). Ties rank by higher neighbor id
    (sort_array desc on (score, id) — mirrored in the oracle).

    ``rerank=R`` adds the standard refinement tier: the ADC pass keeps the
    top-R candidates per query, then ONE bounded join against the raw
    quantized vectors re-scores them by exact integer dot and the final
    top-k ranks by the exact score (same tie rule). R >> k recovers
    near-exact recall while the full base table is still only ever scanned
    as m-byte codes.

    Scale (100 TB): the base side is ONE scan of the m-byte-per-vector code
    table — never the raw vectors; each query contributes an m x k integer
    lookup table (built on the driver from the collected query batch, which
    must be small — this is the per-query-batch unit real ANN serving
    shards on). Top-k is the partial-aggregate collect_list/slice idiom —
    per-partition top-k before the single gather, never a full sort.
    """
    codes, books, q = pq_train_encode(
        embeddings, m, k, iterations, id_col, vec_col, scale
    )
    # materialize the code table NOW so the quantize+encode pass really runs
    # once (the docstring's one-scan claim): the returned DataFrame is lazy,
    # and unpersisting q before the caller's action would recompute encoding
    codes = codes.localCheckpoint(eager=True)
    q.unpersist()
    dim = len(books[0][0]) * m
    ds = dim // m
    qv = F.expr(
        f"transform({vec_col}, x -> cast(round(cast(x as double) * {scale}) as bigint))"
    )
    # the query batch is DRIVER state (an m x k int table per query): cap it
    # loudly instead of letting an unbounded query side OOM the driver —
    # larger query sets shard into batches of this size, the unit real ANN
    # serving shards on (same bounded-driver-state rule as the trainers)
    q_rows = (
        queries.select(F.col(id_col).alias("qid"), qv.alias("qq"))
        .limit(PQ_MAX_QUERY_BATCH + 1)
        .collect()
    )
    if not q_rows:
        raise ValueError("pq_adc_topk needs at least one query row")
    if len(q_rows) > PQ_MAX_QUERY_BATCH:
        raise ValueError(
            f"pq_adc_topk query batch exceeds {PQ_MAX_QUERY_BATCH} rows; "
            "shard the query set and call per batch"
        )

    # per-query lookup tables: T[j][c] = dot(query_sub_j, codeword_jc)
    qlit = F.array(
        *[
            F.struct(
                F.lit(int(r.qid)).cast("long").alias("qid"),
                F.array(
                    *[
                        F.lit(
                            int(
                                sum(
                                    int(r.qq[j * ds + i]) * int(books[j][c][i])
                                    for i in range(ds)
                                )
                            )
                        ).cast("long")
                        for j in range(m)
                        for c in range(k)
                    ]
                ).alias("t"),
            )
            for r in q_rows
        ]
    )
    adc = None
    for j in range(m):
        term = F.element_at(
            F.col("s.t"),
            (F.lit(j * k) + F.element_at(F.col("codes"), j + 1) + 1).cast("int"),
        )
        adc = term if adc is None else adc + term
    scored = (
        codes.select("id", F.explode(qlit).alias("s"), "codes")
        .select(F.col("s.qid").alias("query_id"), F.col("id").alias("neighbor_id"),
                adc.alias("score"))
    )
    def _topk_of(df, keep):
        return (
            df.groupBy("query_id")
            .agg(
                F.slice(
                    F.sort_array(
                        F.collect_list(F.struct("score", "neighbor_id")), asc=False
                    ),
                    1,
                    keep,
                ).alias("top")
            )
            .select("query_id", F.posexplode("top").alias("pos", "t"))
            .select(
                "query_id",
                F.col("t.neighbor_id").alias("neighbor_id"),
                F.col("t.score").alias("score"),
                (F.col("pos") + 1).cast("long").alias("rnk"),
            )
        )

    if rerank is None:
        return _topk_of(scored, topk)

    # ADC -> exact rerank (Jegou et al., "Product Quantization for Nearest
    # Neighbor Search" §IV-C, the IVFADC+R refinement): keep the ADC top-R
    # candidates per query, then re-score exactly against the raw quantized
    # vectors — ONE join bounded to R rows per query (the base table is cut
    # to the candidate set before any wide op), integer dot products all the
    # way so the oracle replays every score. Lifts recall@k from the
    # no-rerank ADC floor to near-exact at R >> k.
    if rerank < topk:
        raise ValueError(f"rerank={rerank} must be >= topk={topk}")
    cand = _topk_of(scored, rerank).drop("score", "rnk")
    qdf = embeddings.sparkSession.createDataFrame(
        [(int(r.qid), [int(v) for v in r.qq]) for r in q_rows],
        "query_id long, qq array<bigint>",
    )
    base_q = embeddings.select(F.col(id_col).alias("neighbor_id"), qv.alias("xq"))
    exact = (
        cand.join(base_q, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with("qq", "xq", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
    )
    return _topk_of(exact, topk)
