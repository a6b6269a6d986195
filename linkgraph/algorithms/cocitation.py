"""Co-citation and bibliographic coupling — the classic directed-web-graph
similarity projections (Small 1973; Kessler 1963).

Beyond the 2021 fork's surface (the reference repo carries the
jaccard/overlap family over an undirected neighborhood —
link_prediction/jaccard.py:23-185 — but no directed citation projections);
these are the standard link-graph signals web search and citation analysis
compute at crawl scale:

    cocitation(u, v) = |{w : w->u and w->v}|   (cited together)
    coupling(u, v)   = |{w : u->w and v->w}|   (cite the same targets)

Relational mapping: each is ONE self-join of the deduped edge table through
the shared endpoint (the wedge plan triangles/jaccard already use) + one
map-side-combined pair count; pairs are emitted once as (first < second).

Scale shape (the honest part): the output itself is quadratic in the degree
of the shared endpoint — a hub page with 10^5 in-links contributes 10^10
coupled pairs, and no plan avoids materializing what the semantics demand.
The standard mitigations are first-class knobs:

- ``max_degree`` drops shared endpoints above a degree cap BEFORE the
  self-join (one aggregate + one semi-join, E-scale), the web-scale default
  — mega-hubs (navbars, footers) carry no topical signal and dominate cost.
- ``min_count`` is applied AFTER the pair aggregation (it cannot be pushed
  below it) but in the same job, so singleton pairs never hit the shuffle's
  output side; with partial aggregation the per-mapper combine already
  collapses repeat pairs.

Both joins are hash joins on the wedge key; no windows, no UDFs, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..structure.graph import Graph


def _pair_project(
    edges: DataFrame,
    wedge_key: str,
    pair_col: str,
    out_name: str,
    min_count: int,
    max_degree: int | None,
) -> DataFrame:
    """Count (first, second) pairs sharing a ``wedge_key`` endpoint."""
    e = edges.select(wedge_key, pair_col).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if max_degree is not None:
        keep = (
            e.groupBy(wedge_key)
            .agg(F.count("*").alias("__deg__"))
            .filter(F.col("__deg__") <= max_degree)
            .select(wedge_key)
        )
        e = e.join(keep, on=wedge_key, how="leftsemi")
    a = e.select(wedge_key, F.col(pair_col).alias("first"))
    b = e.select(wedge_key, F.col(pair_col).alias("second"))
    out = (
        a.join(b, on=wedge_key)
        .filter(F.col("first") < F.col("second"))
        .groupBy("first", "second")
        .agg(F.count("*").alias(out_name))
        .filter(F.col(out_name) >= min_count)
    )
    return out


def _finish(graph: Graph, df: DataFrame) -> DataFrame:
    if graph.renumbered:
        # re-canonicalize in EXTERNAL id order (internal order is degree-desc,
        # not external order); each unordered pair appears exactly once, so a
        # least/greatest swap is a pure map
        cnt = df.columns[-1]
        df = graph.unrenumber(df, "first")
        df = graph.unrenumber(df, "second")
        df = df.select(
            F.least("first", "second").alias("first"),
            F.greatest("first", "second").alias("second"),
            cnt,
        )
    return df


def cocitation(
    graph: Graph,
    min_count: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """DF[first, second, cocitation]: #common in-neighbors per vertex pair.

    ``max_degree`` caps the OUT-degree of the citing page w (a page linking
    to everything co-cites everything); ``min_count`` floors the emitted
    pair count. Pairs are canonical (first < second), internal-id order.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if not graph.directed:
        raise ValueError("cocitation requires a directed graph")
    out = _pair_project(
        graph.edges, "src", "dst", "cocitation", min_count, max_degree
    )
    return _finish(graph, out)


def bibliographic_coupling(
    graph: Graph,
    min_count: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """DF[first, second, coupling]: #common out-neighbors per vertex pair.

    ``max_degree`` caps the IN-degree of the shared target w (everything
    cites the mega-hub, so it couples everything).
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if not graph.directed:
        raise ValueError("bibliographic_coupling requires a directed graph")
    out = _pair_project(
        graph.edges, "dst", "src", "coupling", min_count, max_degree
    )
    return _finish(graph, out)


def butterfly_count(
    graph: Graph,
    side: str = "src",
    max_degree: int | None = None,
) -> DataFrame:
    """DF[vertex, butterflies] — per-vertex butterfly (2x2-biclique / 4-cycle)
    participation for the ``side`` partition of a directed bipartite graph
    (Wang et al., VLDB 2019: the standard bipartite cohesion motif; the
    dense analogue `structure.bicliques.find_bicliques` enumerates, this
    counts).

    A butterfly is a pair of ``side`` vertices sharing two distinct
    neighbors: vertex u participates in sum_v C(shared(u, v), 2)
    butterflies. Derived from the SAME wedge pair projection as
    cocitation/coupling — one self-join + map-side-combined pair count —
    then one vertex-keyed agg of C(cnt, 2); at web scale ``max_degree``
    drops mega-hub wedge centers exactly as the projections do.

    side="src": pairs of sources sharing out-neighbors (coupling wedges);
    side="dst": pairs of targets sharing in-neighbors (cocitation wedges).
    Counts are exact BIGINTs; total butterflies = sum(butterflies) / 2.
    """
    if side not in ("src", "dst"):
        raise ValueError("side must be 'src' or 'dst'")
    if side == "src":
        pairs = bibliographic_coupling(graph, max_degree=max_degree)
        cnt = "coupling"
    else:
        pairs = cocitation(graph, max_degree=max_degree)
        cnt = "cocitation"
    # BIGINT div, not /: float division would lose exactness past 2^53
    bfly = F.expr(f"({cnt} * ({cnt} - 1)) div 2").alias("b")
    both = pairs.select(F.col("first").alias("vertex"), bfly).unionAll(
        pairs.select(F.col("second").alias("vertex"), bfly)
    )
    return (
        both.groupBy("vertex")
        .agg(F.sum("b").alias("butterflies"))
        .filter(F.col("butterflies") > 0)
    )
