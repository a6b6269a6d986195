"""Typed graph-class surface: DiGraph, MultiGraph, Tree, n-partite classes.

Reference: python/cugraph/cugraph/structure/graph_classes.py:32-830. The
reference models these as mutable classes whose constructors set property
flags consumed later by ``from_cudf_edgelist``; here they are thin
``Graph`` subclasses whose ``from_edgelist`` forces the corresponding flag,
so every algorithm keeps taking plain ``Graph`` (the flags ride on the
instance, exactly like the reference's ``graph_properties`` dataclass).

Semantics replicated:
- ``DiGraph`` / ``MultiDiGraph`` are deprecated aliases that warn and force
  ``directed=True`` (graph_classes.py:611-618, 636-645);
- ``MultiGraph`` keeps parallel edges — dedup is skipped during
  symmetrization (our ``multi=True`` path, symmetrize.py:82-83 parity);
- ``Tree`` carries the ``tree`` property flag (graph_classes.py:646-653;
  the reference never validates it — we additionally expose ``is_tree()``
  that checks E = V−1 and connectivity with the engine's own counts + WCC);
- ``NPartiteGraph`` / ``BiPartiteGraph`` store named vertex partitions via
  ``add_nodes_from(nodes, bipartite=..., multipartite=...)`` and expose
  them with ``sets()`` (graph_classes.py:655-830; npartiteGraphImpl keeps
  the same dict-of-series bookkeeping);
- module-level predicates ``is_directed/is_multigraph/is_multipartite/
  is_bipartite`` (graph_classes.py:832-862).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import Graph


@dataclass
class MultiGraph(Graph):
    """Graph keeping parallel edges between the same vertex pair."""

    multi: bool = True

    @classmethod
    def from_edgelist(cls, edges, *args, **kw):
        kw["multi"] = True
        return super().from_edgelist(edges, *args, **kw)

    def is_multigraph(self) -> bool:
        return True


@dataclass
class DiGraph(Graph):
    """Deprecated alias for Graph(directed=True) (graph_classes.py:611)."""

    directed: bool = True

    def __post_init__(self):
        warnings.warn(
            "DiGraph is deprecated, use Graph with directed=True instead",
            DeprecationWarning,
            stacklevel=2,
        )

    @classmethod
    def from_edgelist(cls, edges, *args, **kw):
        kw["directed"] = True
        return super().from_edgelist(edges, *args, **kw)


@dataclass
class MultiDiGraph(MultiGraph):
    """Deprecated alias for MultiGraph(directed=True) (graph_classes.py:636)."""

    directed: bool = True

    def __post_init__(self):
        warnings.warn(
            "MultiDiGraph is deprecated, use MultiGraph with directed=True instead",
            DeprecationWarning,
            stacklevel=2,
        )

    @classmethod
    def from_edgelist(cls, edges, *args, **kw):
        kw["directed"] = True
        return super().from_edgelist(edges, *args, **kw)


@dataclass
class Tree(Graph):
    """Graph carrying the reference's ``tree`` property flag."""

    tree: bool = True

    def is_tree(self) -> bool:
        """E = V−1 and one connected component. The reference stores the
        flag without validating (graph_classes.py:646-653); this check uses
        the engine's own counts + WCC so callers can assert it."""
        from ..algorithms.wcc import weakly_connected_components

        v = self.number_of_vertices()
        if self.number_of_edges() != v - 1:
            return False
        n_comp = (
            weakly_connected_components(self)
            .agg(F.countDistinct("labels"))
            .collect()[0][0]
        )
        return n_comp == 1


@dataclass
class NPartiteGraph(Graph):
    """Graph with named vertex partitions (graph_classes.py:655-830)."""

    bipartite: bool = False
    multipartite: bool = True
    _partitions: dict = field(default_factory=dict, repr=False)

    def add_nodes_from(
        self, nodes, bipartite: str | None = None, multipartite: str | None = None
    ) -> None:
        """Store ``nodes`` (list or DF[vertex]) as the partition named by
        ``bipartite``/``multipartite`` (reference :759-791 keeps the same
        name→series dict; passing neither registers the full node set)."""
        if bipartite is not None and multipartite is not None:
            raise ValueError("pass either bipartite or multipartite, not both")
        if bipartite is not None and not self.bipartite:
            raise ValueError("Graph is not bipartite (reference :771-773)")
        name = bipartite or multipartite or "all_nodes"
        if isinstance(nodes, DataFrame):
            df = nodes.select(F.col(nodes.columns[0]).alias("vertex"))
        else:
            spark = self.edges.sparkSession
            df = spark.createDataFrame([(v,) for v in nodes], ["vertex"])
        self._partitions[name] = df

    def sets(self) -> dict:
        """name → DF[vertex] partition map (reference npartiteGraphImpl)."""
        return dict(self._partitions)

    def is_multipartite(self) -> bool:
        return True

    def is_bipartite(self) -> bool:
        return self.bipartite


@dataclass
class BiPartiteGraph(NPartiteGraph):
    bipartite: bool = True

    def add_nodes_from(self, nodes, bipartite: str | None = None, **kw) -> None:
        if bipartite is None and "multipartite" not in kw:
            raise ValueError("BiPartiteGraph partitions need bipartite=<name>")
        named = {k for k in self._partitions if k != "all_nodes"}
        if bipartite is not None and bipartite not in named and len(named) >= 2:
            # validate BEFORE storing — a rejected call must not corrupt sets()
            raise ValueError("bipartite graph cannot have more than 2 partitions")
        super().add_nodes_from(nodes, bipartite=bipartite, **kw)


@dataclass
class BiPartiteDiGraph(BiPartiteGraph):
    directed: bool = True

    @classmethod
    def from_edgelist(cls, edges, *args, **kw):
        kw["directed"] = True
        return super().from_edgelist(edges, *args, **kw)


@dataclass
class NPartiteDiGraph(NPartiteGraph):
    directed: bool = True

    @classmethod
    def from_edgelist(cls, edges, *args, **kw):
        kw["directed"] = True
        return super().from_edgelist(edges, *args, **kw)


def is_directed(G: Graph) -> bool:
    return G.directed


def is_multigraph(G: Graph) -> bool:
    return G.multi


def is_multipartite(G: Graph) -> bool:
    return bool(getattr(G, "multipartite", False))


def is_bipartite(G: Graph) -> bool:
    return bool(getattr(G, "bipartite", False))
