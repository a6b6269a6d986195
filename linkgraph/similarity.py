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
