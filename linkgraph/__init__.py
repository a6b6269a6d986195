"""linkgraph — a PySpark-native link-graph analytics engine.

From-scratch re-implementation of the core capability surface of the
reference cuGraph snapshot (see SURVEY.md), expressed as idiomatic Spark
DataFrame programs: PageRank, weakly connected components, label
propagation, triangle counting, plus the structure layer (symmetrize,
dense renumbering, degrees, subgraph/two-hop) and the web-page input
boundary (deterministic corpus + vectorized extraction UDFs).
"""

from .corpus import generate_pages
from .extract import extract_links, extract_text, pages_to_edges
from .session import get_spark
from .structure.graph import Graph
from .structure.renumber import NumberMap, build_number_map, renumber_edges
from .structure.symmetrize import symmetrize_edges, upper_triangle
from .algorithms.pagerank import PageRankConvergenceError, pagerank
from .algorithms.wcc import connected_components, weakly_connected_components
from .algorithms.lpa import label_propagation
from .algorithms.triangles import triangle_count

__all__ = [
    "Graph",
    "NumberMap",
    "PageRankConvergenceError",
    "build_number_map",
    "connected_components",
    "extract_links",
    "extract_text",
    "generate_pages",
    "get_spark",
    "label_propagation",
    "pagerank",
    "pages_to_edges",
    "renumber_edges",
    "symmetrize_edges",
    "triangle_count",
    "upper_triangle",
    "weakly_connected_components",
]

__version__ = "0.1.0"
