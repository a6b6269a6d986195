"""Whole-graph summary measures: reciprocity, degree assortativity,
degree histogram.

Standard web-graph / network-science measures (Newman 2002 for
assortativity; reciprocity is the classic directed-graph statistic).
Reference N/A — the 2021 cuGraph fork has no whole-graph measure API
beyond degrees; these extend the engine's analytics surface with the
summaries a crawl-graph health dashboard actually reads.

100-TB shape (all three):
- reciprocity is ONE map-side-combined aggregation over the edge list
  keyed by the canonical (min,max) pair — no join, no second pass;
- assortativity is two co-partitioned E-scale joins (edge->degree on src,
  then on dst) followed by ONE global agg whose sufficient statistics are
  six scalars — partial aggregation collapses everything map-side;
- degree_histogram is V-scale: one degree agg + one count agg, both
  map-side combinable.

Everything is exact integer arithmetic until the final scalar ratio, so
the DuckDB driver oracles replay every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..structure.graph import Graph


def reciprocity(g: Graph) -> DataFrame:
    """1-row DF[m, recip, reciprocity_e6]: the fraction of directed edges
    (u,v), u != v, whose reverse (v,u) is also present.

    Plan: canonicalize each edge to its unordered pair key and aggregate
    direction flags — one shuffle keyed by the pair, partial aggregation
    bounds hub pairs, never a self-join.
    """
    if not g.directed:
        raise ValueError("reciprocity is defined for directed graphs")
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    pairs = (
        e.groupBy(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .agg(
            F.max((F.col("src") < F.col("dst")).cast("int")).alias("fwd"),
            F.max((F.col("src") > F.col("dst")).cast("int")).alias("rev"),
        )
    )
    return pairs.agg(
        (F.sum(F.col("fwd") + F.col("rev"))).cast("long").alias("m"),
        (F.lit(2) * F.sum(F.col("fwd") * F.col("rev"))).cast("long").alias("recip"),
    ).select(
        "m",
        "recip",
        F.round(
            F.lit(1000000.0) * F.col("recip") / F.col("m")
        ).cast("long").alias("reciprocity_e6"),
    )


def degree_assortativity(g: Graph) -> DataFrame:
    """1-row DF[m, sx, sy, sxx, syy, sxy, assortativity_e6]: Pearson
    degree-degree correlation over the (symmetrized) edge list — Newman
    2002's r, the standard "do hubs link to hubs" web-graph statistic.

    The six sufficient statistics are exact BIGINT sums over edges of the
    endpoint degrees; r is derived from them in one final scalar
    expression, so the oracle replays the integers exactly and the scaled
    float identically.
    """
    e = g.edges.select("src", "dst")
    if g.directed:
        # degree-out vs degree-in across directed edges
        dx = e.groupBy("src").agg(F.count("*").alias("dsrc"))
        dy = e.groupBy("dst").agg(F.count("*").alias("ddst"))
        ed = e.join(dx, on="src").join(dy, on="dst")
        pair = ed.select(F.col("dsrc").alias("x"), F.col("ddst").alias("y"))
    else:
        deg = (
            e.select(F.col("src").alias("v"))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )
        pair = (
            e.join(deg.select(F.col("v").alias("src"), F.col("d").alias("x")), on="src")
            .join(deg.select(F.col("v").alias("dst"), F.col("d").alias("y")), on="dst")
            .select("x", "y")
        )
    stats = pair.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt((F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return stats.select(
        "m",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        F.when(den == 0, F.lit(None))
        .otherwise(F.round(F.lit(1000000.0) * num.cast("double") / den))
        .cast("long")
        .alias("assortativity_e6"),
    )


def degree_histogram(g: Graph, direction: str = "total") -> DataFrame:
    """DF[degree, n_vertices]: exact degree distribution including
    isolated vertices (the reference's max+1 universe rule,
    simpleGraph.py:497-499). direction in {'in', 'out', 'total'}."""
    if direction == "in":
        deg = g.in_degree()
    elif direction == "out":
        deg = g.out_degree()
    elif direction == "total":
        deg = g.degree()
    else:
        raise ValueError("direction must be 'in', 'out', or 'total'")
    return (
        deg.groupBy(F.col("degree").cast("long").alias("degree"))
        .agg(F.count("*").cast("long").alias("n_vertices"))
    )
