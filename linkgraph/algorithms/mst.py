"""Minimum / maximum spanning tree (forest) — distributed Borůvka.

Reference: tree/minimum_spanning_tree.py:61-138 (`minimum_spanning_tree(G,
algorithm='boruvka')`; maximum = negated weights, :36-58); kernel
cpp/src/tree/mst.cu (RAFT Borůvka).

Borůvka rounds (O(log V)): every component picks its minimum-weight outgoing
edge (a min_by hash aggregation — deterministic tie-break on
(weight, src, dst)), the picked edges merge components via pointer-jumping
style relabeling (min-label propagation over the picked edges, which form a
forest so it converges in O(log V) inner hops), repeat until no component
has an outgoing edge. Works per-component on disconnected graphs (spanning
forest), exactly like the reference's RAFT implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans import release_plan
from ..structure.graph import Graph
from ..structure.symmetrize import symmetrize_edges
from .pagerank import no_aqe


def minimum_spanning_tree(graph: Graph, max_rounds: int = 64) -> DataFrame:
    """Returns the MSF edge list DF[src, dst, weight] (upper-triangle rows,
    external ids if renumbered)."""
    if not graph.weighted:
        raise ValueError("minimum_spanning_tree requires a weighted graph")
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst", "weight")
    if graph.directed:
        edges = symmetrize_edges(edges, weight="weight", symmetrize=True)
    edges = edges.filter(F.col("src") != F.col("dst")).localCheckpoint(eager=True)

    comp = (
        graph.vertices().select("vertex", F.col("vertex").alias("c")).localCheckpoint(eager=True)
    )
    chosen = None
    with no_aqe(spark):
        for _ in range(max_rounds):
            lab = edges.join(
                comp.select(F.col("vertex").alias("src"), F.col("c").alias("c_src")),
                on="src",
            ).join(
                comp.select(F.col("vertex").alias("dst"), F.col("c").alias("c_dst")),
                on="dst",
            ).filter(F.col("c_src") != F.col("c_dst"))
            if lab.limit(1).count() == 0:
                break
            # min outgoing edge per component, deterministic tie-break
            pick = (
                lab.select(
                    F.col("c_src").alias("comp"),
                    F.struct(
                        "weight",
                        F.least("src", "dst").alias("lo"),
                        F.greatest("src", "dst").alias("hi"),
                        "src",
                        "dst",
                        "c_src",
                        "c_dst",
                    ).alias("e"),
                )
                .unionByName(
                    lab.select(
                        F.col("c_dst").alias("comp"),
                        F.struct(
                            "weight",
                            F.least("src", "dst").alias("lo"),
                            F.greatest("src", "dst").alias("hi"),
                            "src",
                            "dst",
                            "c_src",
                            "c_dst",
                        ).alias("e"),
                    )
                )
                .groupBy("comp")
                .agg(F.min("e").alias("e"))
                .select("e.*")
                .select("lo", "hi", "weight", "c_src", "c_dst")
                .distinct()
                .localCheckpoint(eager=True)
            )
            new_edges = pick.select(
                F.col("lo").alias("src"), F.col("hi").alias("dst"), "weight"
            ).distinct()
            old_chosen = chosen
            chosen = (
                new_edges
                if chosen is None
                else chosen.unionByName(new_edges).distinct()
            ).localCheckpoint(eager=True)
            release_plan(old_chosen)  # folded into the new eager union
            # merge components: min-label propagation over picked comp pairs
            merge = pick.select(
                F.col("c_src").alias("a"), F.col("c_dst").alias("b")
            )
            merge = merge.unionByName(
                merge.select(F.col("b").alias("a"), F.col("a").alias("b"))
            ).localCheckpoint(eager=True)
            labels = comp.select(F.col("c").alias("a")).distinct().select(
                "a", F.col("a").alias("l")
            ).localCheckpoint(eager=True)
            labels_ck = labels
            while True:
                msgs = (
                    merge.join(labels.select(F.col("a"), F.col("l")), on="a")
                    .groupBy("b")
                    .agg(F.min("l").alias("m"))
                    .withColumnRenamed("b", "a")
                )
                new_l = (
                    labels.join(msgs, on="a", how="left")
                    .select(
                        "a",
                        F.least(F.col("l"), F.coalesce(F.col("m"), F.col("l"))).alias("l"),
                        (F.col("m") < F.col("l")).alias("ch"),
                    )
                    .localCheckpoint(eager=True)
                )
                changed = new_l.filter(F.col("ch")).count()
                release_plan(labels_ck)  # new_l materialized by the count
                labels_ck = new_l
                labels = new_l.select("a", "l")
                if changed == 0:
                    break
            old_comp = comp
            comp = (
                comp.join(labels.withColumnRenamed("a", "c"), on="c")
                .select("vertex", F.col("l").alias("c"))
                .localCheckpoint(eager=True)
            )
            # round-locals folded into the new eager comp / chosen states
            release_plan(old_comp)
            release_plan(labels_ck)
            release_plan(pick)
            release_plan(merge)
    if chosen is None:
        chosen = edges.select("src", "dst", "weight").limit(0)
    out = chosen
    if graph.renumbered:
        out = graph.unrenumber(graph.unrenumber(out, "src"), "dst")
    return out


def maximum_spanning_tree(graph: Graph, max_rounds: int = 64) -> DataFrame:
    """Negate weights, run MST, restore (minimum_spanning_tree.py:36-58)."""
    neg = Graph(
        edges=graph.edges.withColumn("weight", -F.col("weight")),
        directed=graph.directed,
        weighted=True,
        renumbered=graph.renumbered,
        nmap=graph.nmap,
    )
    res = minimum_spanning_tree(neg, max_rounds)
    return res.withColumn("weight", -F.col("weight"))
