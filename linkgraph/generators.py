"""Synthetic graph generators — Spark-native RMAT.

Reference: generators/rmat.py:228-318 + cpp/src/generators/
generate_rmat_edgelist.cu (recursive-bisection quadrant sampling); benchmark
parameters a=0.1, b=0.2, c=0.3, seed 42, edgefactor 16
(benchmarks/python_e2e/cugraph_funcs.py:20-58). Used as the throughput /
scaling benchmark workload, matching the reference's e2e benchmark harness.

Implementation: fully distributed and deterministic — ``spark.range`` over
edge ids, ``mapInPandas`` draws all ``scale`` quadrant decisions as one
vectorized numpy computation per batch, seeded per edge id block so output is
independent of partitioning (required for the two-parallelism scaling run to
process the identical graph).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edgefactor: int = 16,
    a: float = 0.1,
    b: float = 0.2,
    c: float = 0.3,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """V = 2^scale vertices, E = V * edgefactor edges, schema src/dst long."""
    n_edges = (1 << scale) * edgefactor
    parts = partitions or spark.sparkContext.defaultParallelism
    d = 1.0 - a - b - c
    # per-bit quadrant probabilities: P(src_bit=1) = c+d; P(dst_bit=1 | src_bit)
    p_src1 = c + d
    p_dst1_given_src0 = b / (a + b)
    p_dst1_given_src1 = d / (c + d)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            n = len(ids)
            src = np.zeros(n, dtype=np.int64)
            dst = np.zeros(n, dtype=np.int64)
            for bit in range(scale):
                # per-edge uniforms keyed on absolute edge id: any
                # partitioning sees the same values
                rs = _hash_uniform(ids, seed * 1000003 + 2 * bit)
                rd = _hash_uniform(ids, seed * 1000003 + 2 * bit + 1)
                sbit = (rs < p_src1).astype(np.int64)
                p_d = np.where(sbit == 1, p_dst1_given_src1, p_dst1_given_src0)
                dbit = (rd < p_d).astype(np.int64)
                src = (src << 1) | sbit
                dst = (dst << 1) | dbit
            yield pd.DataFrame({"src": src, "dst": dst})

    return spark.range(0, n_edges, 1, parts).mapInPandas(gen, "src long, dst long")


def _hash_uniform(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform(0,1) per id — splitmix64-style integer hash,
    independent of partitioning (unlike a sequential RNG stream)."""
    x = ids.astype(np.uint64) + np.uint64(salt & 0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def erdos_renyi_edges(
    spark: SparkSession,
    n: int,
    p: float,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """G(n, p) — every unordered pair kept independently with probability p.

    Reference: cpp/src/generators/erdos_renyi_generator.cu (per-candidate
    Bernoulli over the n^2 grid). Here: ``spark.range`` over the n(n-1)/2
    unordered-pair indices, a seeded per-pair uniform, and a vectorized
    triangular decode — deterministic and partitioning-independent like
    rmat_edges. Work is O(n^2) scan pre-filter, the generator's inherent
    cost; rows surviving are ~p*n^2/2.
    """
    n_pairs = n * (n - 1) // 2
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            keep = _hash_uniform(ids, seed * 1000003) < p
            ids = ids[keep]
            # triangular decode: pair id -> (i, j), i > j; float estimate
            # then exact integer correction (safe past 2^53 ids)
            i = np.floor((1.0 + np.sqrt(1.0 + 8.0 * ids.astype(np.float64))) / 2.0).astype(
                np.int64
            )
            base = i * (i - 1) // 2
            over = base > ids
            i = i - over.astype(np.int64)
            base = i * (i - 1) // 2
            under = ids - base >= i
            i = i + under.astype(np.int64)
            base = i * (i - 1) // 2
            j = ids - base
            yield pd.DataFrame({"src": j.astype(np.int64), "dst": i})

    return spark.range(0, n_pairs, 1, parts).mapInPandas(gen, "src long, dst long")


def path_graph_edges(spark: SparkSession, n: int) -> DataFrame:
    """Path 0-1-...-(n-1) (cpp/src/generators/simple_generators.cu)."""
    from pyspark.sql import functions as F

    return spark.range(max(n - 1, 0)).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )


def mesh_graph_edges(spark: SparkSession, rows: int, cols: int) -> DataFrame:
    """2-D mesh/grid: vertex r*cols+c, edges right and down
    (cpp/src/generators/simple_generators.cu mesh)."""
    from pyspark.sql import functions as F

    v = spark.range(rows * cols).select(
        F.col("id").alias("src"),
        (F.col("id") % cols).alias("c"),
        F.floor(F.col("id") / cols).alias("r"),
    )
    right = v.filter(F.col("c") < cols - 1).select("src", (F.col("src") + 1).alias("dst"))
    down = v.filter(F.col("r") < rows - 1).select(
        "src", (F.col("src") + cols).alias("dst")
    )
    return right.unionByName(down)
