"""Edge symmetrization / deduplication with cuGraph semantics.

Reference semantics (python/cugraph/cugraph/structure/symmetrize.py:67-150):
- undirected graphs store every edge in BOTH directions;
- duplicate (src, dst) rows collapse keeping the MINIMUM weight
  (symmetrize.py:85 `groupby(...).min()`), for directed graphs too
  (simpleGraph.py:161-174 passes symmetrize=not directed but always dedups);
- multigraphs skip dedup entirely (symmetrize.py:82-83);
- self-loops are kept (simpleGraph.py:771-782).

Spark mapping: unionByName + groupBy(src,dst).agg(min(...)) — a single hash
aggregation with map-side partial combine; at 100 TB the partial agg bounds
per-reducer rows for hub keys to one row per map partition, so no extra skew
handling is needed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "weight",
    symmetrize: bool = True,
    multi: bool = False,
) -> DataFrame:
    """Return the deduped (and optionally symmetrized) edge DataFrame."""
    cols = [src, dst] + ([weight] if weight else [])
    df = edges.select(*cols)
    if symmetrize:
        rev = df.select(
            F.col(dst).alias(src), F.col(src).alias(dst), *([weight] if weight else [])
        )
        df = df.unionByName(rev)
    if multi:
        return df
    if weight:
        return df.groupBy(src, dst).agg(F.min(weight).alias(weight))
    return df.distinct()


def upper_triangle(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge view: only src <= dst rows (simpleGraph.py:273-278)."""
    return edges.filter(F.col(src) <= F.col(dst))
