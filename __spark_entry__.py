"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (PageRank over the lineitem-derived
link graph at sf0.001). ``queries()`` / ``oracle_sql()`` expose the engine's
operator surface with exactly-equivalent DuckDB SQL (see
linkgraph/queries.py for the parity design rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: link graph from lineitem at sf0.001 -> renumbered PageRank
    -> top 20 vertices (exercises renumber + unrenumber + dangling mass)."""
    from linkgraph.algorithms.pagerank import pagerank
    from linkgraph.queries import link_edges
    from linkgraph.structure.graph import Graph

    edges = link_edges(spark, "/root/testdata/sf0.001")
    g = Graph.from_edgelist(edges, directed=True, renumber=True)
    pr = pagerank(g, alpha=0.85, tol=1e-6, max_iter=100)
    return (
        pr.orderBy(F.desc("pagerank"), F.asc("vertex"))
        .limit(20)
        .select("vertex", F.round(F.col("pagerank") * 1e7).cast("long").alias("pr_e7"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from linkgraph.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from linkgraph.queries import ORACLES

    return dict(ORACLES)
