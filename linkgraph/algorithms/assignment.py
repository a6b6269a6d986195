"""Linear assignment: `hungarian(G, workers)` / `dense_hungarian(costs, ...)`.

Reference surface: linear_assignment/lap.py:18-133 (`hungarian` over a
weighted bipartite graph, `dense_hungarian` over a row-major cost matrix;
kernel cpp/src/linear_assignment/hungarian.cu, 363 LoC — a single-GPU
date-matching LAP solver). Semantics: minimum-total-cost matching that
assigns every assignable worker exactly one job; returns (cost,
DF[vertex, assignment]) with only worker vertices in `vertex`.

Spark-first design: the HUNGARIAN algorithm's augmenting paths are
inherently sequential, so this module implements the AUCTION algorithm
(Bertsekas 1988) instead — the standard parallel/distributed LAP method and
the one whose supersteps map onto DataFrame ops:

- each round, every unassigned worker computes its best and second-best
  job value (net of current prices) from its OWN edge rows — one E-scale
  join + two hash aggregations — and bids best−second+ε on its best job;
- each job takes the highest bid (one groupBy), bumping its price and
  evicting the previous holder;
- ε-scaling phases (prices persist, assignments reset) keep the round
  count polynomial; with integer costs the final phase runs at
  ε < 1/(n+1), which makes the result EXACTLY optimal (Bertsekas' bound:
  auction with ε yields cost within n·ε of optimal).

Everything is a join/agg on edge- or vertex-scale DataFrames — no driver
state beyond the ε schedule, so the same code runs at cluster scale; the
reference's GPU kernel is instead bounded by one device's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import truncate_plan
from ..structure.graph import Graph
from .pagerank import no_aqe, pick_partitions


def _auction(
    spark,
    edges: DataFrame,  # DF[worker, job, cost] — one row per allowed pair
    epsilon: float | None,
    integer_costs: bool,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run ε-scaled auction; returns DF[worker, job] for matched workers."""
    nparts = pick_partitions(spark, edges.count(), num_partitions)
    edges = (
        edges.select("worker", "job", F.col("cost").cast("double").alias("cost"))
        .repartition(nparts, "worker")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = edges.select("worker").distinct().count()
    stats = edges.agg(
        F.max(F.abs("cost")).alias("c"), F.countDistinct("job").alias("nj")
    ).collect()[0]
    c_max = float(stats["c"] or 1.0)
    if n == 0:
        edges.unpersist()
        return spark.createDataFrame([], "worker LONG, job LONG")

    # Feasibility padding: one PRIVATE dummy job per worker (negative id) at
    # a cost (n+1)·c_max that any real edge beats, so a perfect matching
    # always exists and the auction provably terminates; workers matched to
    # their dummy are the "cannot be assigned" set (filtered on return).
    # Dominance argument: using a real edge saves ≥ dummy − c_max > n·c_max,
    # more than any real-cost reshuffle can lose, so the real part of the
    # optimum is unchanged.
    dummy_cost = (n + 1) * c_max + 1.0
    dummies = (
        edges.select("worker")
        .distinct()
        .select("worker", (-F.col("worker") - 1).alias("job"), F.lit(dummy_cost).alias("cost"))
    )
    edges_padded = (
        edges.unionByName(dummies)
        .repartition(nparts, "worker")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.unpersist()
    edges = edges_padded
    c_max = dummy_cost

    # Single phase at the optimality ε. Classic ε-scaling (phases from C/2
    # down) is INCOMPATIBLE with the private-dummy feasibility padding:
    # high-ε phases inflate real-job prices while uncontested dummies stay
    # at 0, and since auction prices never decrease, later phases park
    # every worker on its dummy. One phase at the final ε keeps the exact
    # optimality guarantee; the round count is higher in adversarial
    # bidding wars but each round is one join+two aggs at any scale.
    final_eps = (1.0 / (n + 1)) if integer_costs else (epsilon or 1.0e-6)
    eps_schedule = [final_eps]

    prices = truncate_plan(
        edges.select("job").distinct().withColumn("price", F.lit(0.0))
    )
    asg = spark.createDataFrame([], "worker LONG, job LONG")
    big = 2.0 * c_max * (n + 1) + 1.0  # degree-1 workers: unbeatable bid
    with no_aqe(spark, nparts):
        for eps in eps_schedule:
            asg = truncate_plan(spark.createDataFrame([], "worker LONG, job LONG"))
            # rounds: each matches ≥1 new worker or raises ≥1 price by ≥ε;
            # bounded by n · (price range / ε) — the ε-scaling keeps it small
            while True:
                unassigned = edges.select("worker").distinct().join(
                    asg.select("worker"), on="worker", how="left_anti"
                )
                if unassigned.count() == 0:
                    break
                cand = (
                    edges.join(unassigned, on="worker")
                    .join(prices, on="job")
                    .select(
                        "worker",
                        "job",
                        (-F.col("cost") - F.col("price")).alias("v"),
                        "price",
                    )
                )
                best = cand.groupBy("worker").agg(
                    F.max(F.struct("v", "job", "price")).alias("b")
                )
                second = (
                    cand.join(best, on="worker")
                    .filter(F.col("job") != F.col("b.job"))
                    .groupBy("worker")
                    .agg(F.max("v").alias("v2"))
                )
                bids = (
                    best.join(second, on="worker", how="left")
                    .select(
                        "worker",
                        F.col("b.job").alias("job"),
                        (
                            F.col("b.price")
                            + F.col("b.v")
                            - F.coalesce(F.col("v2"), F.col("b.v") - F.lit(big))
                            + F.lit(eps)
                        ).alias("bid"),
                    )
                )
                winners = truncate_plan(
                    bids.groupBy("job").agg(
                        F.max(F.struct("bid", "worker")).alias("w")
                    ).select(
                        "job", F.col("w.worker").alias("worker"), F.col("w.bid").alias("bid")
                    ),
                    eager=False,
                )
                # price update + eviction of previous holders, one pass each
                prices = truncate_plan(
                    prices.join(winners.select("job", "bid"), on="job", how="left")
                    .select(
                        "job", F.coalesce("bid", "price").alias("price")
                    )
                )
                asg = truncate_plan(
                    asg.join(winners.select("job"), on="job", how="left_anti")
                    .unionByName(winners.select("worker", "job"))
                )
    edges.unpersist()
    return asg.filter(F.col("job") >= 0)


def hungarian(
    graph: Graph, workers, epsilon: float | None = None
) -> tuple[float, DataFrame]:
    """Minimum-cost assignment of `workers` to the remaining vertices over
    the weighted bipartite `graph`. Returns (total_cost,
    DF[vertex, assignment]) — reference lap.py:18-92 contract."""
    if not graph.weighted:
        raise ValueError("hungarian requires edge weights (costs)")
    spark = graph.edges.sparkSession
    if graph.renumbered:
        internal = [graph._to_internal(v) for v in workers]
        if any(v is None for v in internal):
            raise ValueError("worker vertex not in graph")
    else:
        internal = [int(v) for v in workers]
    wdf = spark.createDataFrame([(v,) for v in internal], "worker LONG")
    pairs = graph.edges.join(
        F.broadcast(wdf), on=graph.edges["src"] == wdf["worker"]
    ).select(
        F.col("src").alias("worker"),
        F.col("dst").alias("job"),
        F.col("weight").alias("cost"),
    )
    # jobs must be outside the worker set (bipartite contract)
    pairs = pairs.join(
        F.broadcast(wdf.select(F.col("worker").alias("job"))),
        on="job",
        how="left_anti",
    )
    # parallel edges (MultiGraph skips dedup): the cheapest one defines the
    # pair's cost — also keeps the matched-join below one-row-per-pair
    pairs = pairs.groupBy("worker", "job").agg(F.min("cost").alias("cost"))
    int_costs = (
        pairs.filter(F.col("cost") != F.floor("cost")).limit(1).count() == 0
    )
    asg = _auction(spark, pairs, epsilon, int_costs)
    matched = asg.join(
        pairs.withColumnRenamed("job", "assignment").withColumnRenamed(
            "worker", "vertex"
        ),
        on=(F.col("worker") == F.col("vertex")) & (F.col("job") == F.col("assignment")),
    ).select("vertex", "assignment", "cost")
    cost = matched.agg(F.sum("cost")).collect()[0][0] or 0.0
    out = matched.select("vertex", "assignment")
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
        out = graph.unrenumber(out, "assignment")
    return float(cost), out


def dense_hungarian(
    costs, num_rows: int, num_columns: int, epsilon: float | None = None, spark=None
) -> tuple[float, list]:
    """Row-major dense cost matrix → (total_cost, assignment list) where
    assignment[i] is the column matched to row i (reference lap.py:95-133).
    `costs` is any flat sequence of length num_rows·num_columns."""
    if spark is None:
        from ..session import get_spark

        spark = get_spark()
    flat = list(costs)
    if len(flat) != num_rows * num_columns:
        raise ValueError("costs length != num_rows * num_columns")
    rows = [
        (i, j, float(flat[i * num_columns + j]))
        for i in range(num_rows)
        for j in range(num_columns)
    ]
    pairs = spark.createDataFrame(rows, "worker LONG, job LONG, cost DOUBLE")
    int_costs = all(float(c).is_integer() for c in flat)
    asg = _auction(spark, pairs, epsilon, int_costs)
    got = {r.worker: r.job for r in asg.collect()}
    assignment = [got.get(i, -1) for i in range(num_rows)]
    total = sum(
        flat[i * num_columns + j] for i, j in enumerate(assignment) if j >= 0
    )
    return float(total), assignment
