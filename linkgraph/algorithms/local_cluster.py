"""Local graph clustering — PPR sweep cut (Andersen-Chung-Lang 2006).

The standard local community detector around a seed vertex: run
personalized PageRank from the seed on the undirected graph, order
vertices by the degree-normalized score p/deg, and return the prefix of
that sweep with minimum conductance phi(S) = cut(S) / min(vol(S),
vol(V \\ S)). ACL prove the sweep finds a cut whose conductance is within
O(sqrt(phi_opt)) of optimal while touching only the PPR support — the
"local" in local clustering.

Absent from the reference fork (no local-clustering routine in the 2021
snapshot; spectral balanced cut is its global cousin) — specced from the
published algorithm on top of the engine's batched PPR.

Determinism / oracle parity: the sweep orders by (round(p * 1e7) / deg)
— a double derived from identical integers in both engines — with
vertex-id tie-break; cut, volume, and the conductance argmin are exact
BIGINT prefix sums and cross-engine-identical double ratios; the scaled
output phi_e9 is computed with INTEGER half-up rounding, never a float.

100-TB shape: the PPR loop is the audited zero-action-per-superstep
program from ppr.py; everything after it is SUPPORT-scale, not
corpus-scale — the sweep window sorts only the vertices the walk
reached (the 2T-hop ball around the seed), the cut deltas come from one
E-scale join of the edge table against the support ranking (filtered to
rows touching the support before any window), and the argmin is one
support-row takeOrdered. No corpus-scale sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph
from .ppr import batched_personalized_pagerank

PPR_SCALE = 10**7  # matches the ppr driver query's proven parity scale

# Default sweep-support cap: the PPR support of a 10-iteration alpha=0.85
# walk on a web graph can quietly grow to graph scale, and the sweep window
# is unpartitioned by construction (it ranks ONE seed's support). 1e6 rows
# is far beyond any local community and still a single-task-safe sort.
# Pass max_support=None to uncap explicitly.
DEFAULT_MAX_SUPPORT = 1_000_000


def local_cluster(
    graph: Graph,
    seed: int,
    alpha: float = 0.85,
    iterations: int = 10,
    num_partitions: int | None = None,
    max_support: int | None = DEFAULT_MAX_SUPPORT,
) -> DataFrame:
    """DF[vertex, rank, cut, den, phi_e9] — the minimum-conductance sweep
    prefix around ``seed``. ``cut``/``den`` are the exact integer
    conductance numerator/denominator (in symmetric edge-row units);
    ``phi_e9 = (2e9*cut + den) // (2*den)`` (half-up integer rounding).

    ``max_support`` truncates the sweep to the top-M support vertices by
    the sweep's own ordering (a distributed TakeOrdered, never a global
    sort) — the standard ACL bound when the walk reaches a large fraction
    of the graph. Truncation is EXACT for the prefixes it keeps: cut and
    volume of a rank-k prefix never depend on vertices ranked beyond k,
    so the result equals the untruncated sweep whenever the untruncated
    argmin lands within the first M ranks (local communities do). The cap
    defaults to ``DEFAULT_MAX_SUPPORT`` (1e6) and warns loudly when it
    binds; pass ``max_support=None`` to uncap explicitly.
    """
    if graph.directed:
        raise ValueError("local_cluster expects an undirected graph")
    if graph.renumbered and graph.nmap is not None and len(graph.nmap.key_cols) > 1:
        raise NotImplementedError(
            "local_cluster does not support composite vertex keys"
        )
    spark = graph.edges.sparkSession

    ppr = batched_personalized_pagerank(
        graph, [seed], alpha=alpha, iterations=iterations,
        num_partitions=num_partitions,
    )
    p = (
        ppr.select(
            "vertex",
            F.round(F.col("ppr") * PPR_SCALE).cast("long").alias("p7"),
        )
        .filter(F.col("p7") > 0)
    )

    edges = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if graph.renumbered:
        # batched PPR emits EXTERNAL ids; bring the edge table to the same
        # id space so the sweep joins line up (single-key guard above)
        edges = graph.unrenumber(graph.unrenumber(edges, "src"), "dst")
    deg = edges.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").alias("deg")
    )
    # sweep ranking — SUPPORT-scale window (PPR-reached vertices only)
    base = p.join(deg, on="vertex")
    if max_support is not None:
        base = base.orderBy(
            (F.col("p7").cast("double") / F.col("deg")).desc(),
            F.col("vertex").asc(),
        ).limit(max_support)
    sweep = (
        base.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    (F.col("p7").cast("double") / F.col("deg")).desc(),
                    F.col("vertex").asc(),
                )
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if max_support is not None and sweep.count() >= max_support:
        import warnings

        warnings.warn(
            f"local_cluster: PPR support reached the max_support cap "
            f"({max_support}); the sweep is truncated — the result is exact "
            f"only if the conductance argmin lands within the kept prefix. "
            f"Raise max_support (or pass None) to widen the sweep.",
            stacklevel=2,
        )

    # cut deltas: each symmetric edge row enters the cut at the smaller
    # endpoint rank and leaves it when the larger endpoint joins the
    # prefix (never, if the other endpoint is outside the support)
    ra = sweep.select(F.col("vertex").alias("src"), F.col("rank").alias("ra"))
    rb = sweep.select(F.col("vertex").alias("dst"), F.col("rank").alias("rb"))
    er = (
        edges.join(ra, on="src", how="left")
        .join(rb, on="dst", how="left")
        .filter(F.col("ra").isNotNull() | F.col("rb").isNotNull())
    )
    plus = er.groupBy(
        F.least(
            F.coalesce("ra", F.lit(1 << 40)), F.coalesce("rb", F.lit(1 << 40))
        ).alias("rank")
    ).agg(F.count("*").alias("cp"))
    minus = (
        er.filter(F.col("ra").isNotNull() & F.col("rb").isNotNull())
        .groupBy(F.greatest("ra", "rb").alias("rank"))
        .agg(F.count("*").alias("cm"))
    )
    total_vol = edges.count()  # sym rows = 2|E_und|

    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        sweep.join(plus, on="rank", how="left")
        .join(minus, on="rank", how="left")
        .select(
            "vertex",
            "rank",
            F.sum("deg").over(w).alias("vol"),
            F.sum(
                F.coalesce("cp", F.lit(0)) - F.coalesce("cm", F.lit(0))
            ).over(w).alias("cut"),
        )
        .withColumn("den", F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cand = cum.filter(F.col("den") > 0)
    best_rows = (
        cand.orderBy(
            (F.col("cut").cast("double") / F.col("den")).asc(), F.col("rank").asc()
        )
        .limit(1)
        .collect()
    )
    if not best_rows:
        empty = sweep.limit(0).select(
            "vertex",
            F.lit(0).cast("long").alias("rank"),
            F.lit(0).cast("long").alias("cut"),
            F.lit(0).cast("long").alias("den"),
            F.lit(0).cast("long").alias("phi_e9"),
        )
        empty = empty.localCheckpoint(eager=True)
        sweep.unpersist()
        cum.unpersist()
        return empty
    b = best_rows[0]
    cut, den, k = int(b.cut), int(b.den), int(b.rank)
    phi_e9 = (2 * 10**9 * cut + den) // (2 * den)
    out = cum.filter(F.col("rank") <= k).select(
        "vertex",
        F.col("rank").cast("long").alias("rank"),
        F.lit(cut).cast("long").alias("cut"),
        F.lit(den).cast("long").alias("den"),
        F.lit(phi_e9).cast("long").alias("phi_e9"),
    )
    # ids are already external (PPR unrenumbers; edges were aligned above)
    out = out.localCheckpoint(eager=True)
    sweep.unpersist()
    cum.unpersist()
    return out
