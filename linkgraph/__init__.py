"""linkgraph — a PySpark-native link-graph analytics engine.

From-scratch re-implementation of the core capability surface of the
reference cuGraph snapshot (see SURVEY.md), expressed as idiomatic Spark
DataFrame programs: PageRank, weakly connected components, label
propagation, triangle counting, BFS/SSSP, Katz, HITS, link-prediction
coefficients, k-core, ego graphs, hypergraph transform — plus the structure
layer (symmetrize, dense renumbering, degrees, subgraph/two-hop), the
web-page input boundary (deterministic corpus + vectorized extraction UDFs),
and training-data-pipeline ops (dedup tiers, text analysis, ANN search).
"""

from .corpus import generate_pages
from .crawl import crawl_delta, edge_delta_from_crawls, latest_snapshot
from .extract import (
    anchor_text_index,
    extract_anchors,
    extract_links,
    extract_text,
    pages_to_edges,
    top_anchor_terms,
)
from .generators import (
    erdos_renyi_edges,
    mesh_graph_edges,
    path_graph_edges,
    rmat_edges,
)
from .session import get_spark
from .structure.graph import Graph
from .structure.hypergraph import hypergraph
from .structure.renumber import NumberMap, build_number_map, renumber_edges
from .structure.symmetrize import symmetrize_edges, upper_triangle
from .algorithms.pagerank import PageRankConvergenceError, pagerank
from .algorithms.ppr import batched_personalized_pagerank, ppr_topk, trustrank
from .algorithms.wcc import (
    connected_components,
    incremental_wcc,
    weakly_connected_components,
)
from .algorithms.lpa import label_propagation
from .algorithms.triangles import triangle_count
from .algorithms.traversal import (
    bfs,
    filter_unreachable,
    bfs_edges,
    concurrent_bfs,
    multi_source_bfs,
    shortest_path,
    shortest_path_length,
    sssp,
)
from .algorithms.katz import KatzConvergenceError, katz_centrality
from .algorithms.eigenvector import (
    EigenvectorConvergenceError,
    eigenvector_centrality,
)
from .algorithms.hits import hits
from .algorithms.salsa import salsa
from .algorithms.anf import (
    closeness_centrality,
    effective_diameter,
    harmonic_centrality,
    neighborhood_function,
)
from .algorithms.bowtie import bowtie_structure
from .algorithms.cocitation import (
    bibliographic_coupling,
    butterfly_count,
    cocitation,
)
from .algorithms.link_prediction import (
    adamic_adar,
    cosine,
    jaccard,
    jaccard_w,
    link_scores,
    overlap,
    overlap_w,
    preferential_attachment,
    resource_allocation,
    sorensen,
    sorensen_w,
)
from .algorithms.cores import core_number, k_core
from .algorithms.egonet import batched_ego_graphs, ego_graph
from .algorithms.ktruss import k_truss, ktruss_subgraph
from .algorithms.random_walks import (
    negative_samples,
    node2vec_walks,
    random_walks,
    rw_path,
    skipgram_pairs,
)
from .algorithms.sampling import uniform_neighbor_sample
from .algorithms.scc import strongly_connected_components
from .algorithms.betweenness import betweenness_centrality, edge_betweenness_centrality
from .algorithms.ecg import ecg
from .algorithms.leiden import leiden
from .algorithms.louvain import louvain
from .algorithms.clustering_metrics import (
    analyze_clustering_edge_cut,
    analyze_clustering_modularity,
    analyze_clustering_ratio_cut,
)
from .algorithms.assignment import dense_hungarian, hungarian
from .layout import force_atlas2
from .algorithms.spectral import (
    spectral_balanced_cut_clustering,
    spectral_modularity_maximization_clustering,
    spectralBalancedCutClustering,
    spectralModularityMaximizationClustering,
)
from .structure.graph import (
    from_numpy_array,
    from_numpy_matrix,
    from_pandas_adjacency,
    from_pandas_edgelist,
)
from .structure.bicliques import find_bicliques
from .structure.contract import contract_vertices, host_edges, host_of
from .structure.delta import apply_edge_delta
from .structure.graph_classes import (
    BiPartiteDiGraph,
    BiPartiteGraph,
    DiGraph,
    MultiDiGraph,
    MultiGraph,
    NPartiteDiGraph,
    NPartiteGraph,
    Tree,
    is_bipartite,
    is_directed,
    is_multigraph,
    is_multipartite,
)
from .algorithms.mst import maximum_spanning_tree, minimum_spanning_tree
from .multimodal import (
    audio_features,
    decode_image_stats,
    generate_media,
    resize_images,
    sample_video_frames,
)
from .storage import graph_from_bucketed, load_edges_bucketed, save_edges_bucketed
from .streaming import (
    stream_exact_dedup,
    stream_hourly_event_rollup,
    stream_pages_to_edges,
)
from .similarity import (
    cosine_topk,
    embedding_near_dup,
    hyperplane_signatures,
    ivf_assign,
    ivf_cosine_topk,
    ivf_train_centroids,
    kmeans_embeddings,
    lsh_cosine_topk,
    pq_adc_topk,
    pq_train_encode,
    prototypicality_scores,
    semantic_dedup,
)
from .text.analysis import (
    bpe_ish_token_count,
    fingerprint,
    fm_distinct_estimate,
    fm_distinct_sketches,
    language_id,
    quality_metrics,
    repetition_metrics,
    tfidf_top_terms,
    token_count,
    word_shingles,
)
from .compat import (
    analyzeClustering_edge_cut,
    analyzeClustering_modularity,
    analyzeClustering_ratio_cut,
    from_adjlist,
    from_cudf_edgelist,
    from_edgelist,
    is_weighted,
    jaccard_coefficient,
    overlap_coefficient,
    sorensen_coefficient,
    strong_connected_component,
    subgraph,
    symmetrize,
    symmetrize_ddf,
    symmetrize_df,
    to_numpy_array,
    to_numpy_matrix,
    to_pandas_adjacency,
    to_pandas_edgelist,
    triangles,
)
from . import comms, raft, utils
from .raft import raft_include_test
from .text.dedup import (
    exact_dedup,
    line_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_lcg_signatures,
    simhash_near_pairs,
    simhash_signatures,
    span_dedup,
)
from .algorithms.densest import densest_subgraph
from .algorithms.local_cluster import local_cluster
from .algorithms.graph_measures import (
    degree_assortativity,
    degree_histogram,
    reciprocity,
)
from .algorithms.mis import maximal_independent_set
from .algorithms.coloring import greedy_color
from .algorithms.triangles import (
    clustering_coefficient,
    four_clique_count,
    triangle_counts,
)
from .text.pipeline import (
    bloom_decontaminate,
    c4_line_filter,
    ccnet_perplexity,
    decontaminate,
    dsir_gumbel_topk,
    dsir_weights,
    hashed_linear_quality,
    pack_sequences,
    pii_redact,
    shard_assignment,
    shard_plan,
    stratified_sample,
    token_budget_sample,
    write_shards,
)
from .text.bpe import bpe_encode, bpe_train, word_histogram
from .text.lm import ngram_lm_counts
from .text.retrieval import bm25_topk, build_postings
from .text.urls import canonicalize_url, url_dedup

__all__ = [
    "Graph",
    "BiPartiteDiGraph",
    "BiPartiteGraph",
    "DiGraph",
    "MultiDiGraph",
    "MultiGraph",
    "NPartiteDiGraph",
    "NPartiteGraph",
    "Tree",
    "is_bipartite",
    "is_directed",
    "is_multigraph",
    "is_multipartite",
    "KatzConvergenceError",
    "NumberMap",
    "PageRankConvergenceError",
    "batched_ego_graphs",
    "apply_edge_delta",
    "contract_vertices",
    "host_edges",
    "host_of",
    "analyze_clustering_edge_cut",
    "analyze_clustering_modularity",
    "analyze_clustering_ratio_cut",
    "analyzeClustering_edge_cut",
    "analyzeClustering_modularity",
    "analyzeClustering_ratio_cut",
    "betweenness_centrality",
    "edge_betweenness_centrality",
    "bfs",
    "bpe_ish_token_count",
    "build_number_map",
    "connected_components",
    "incremental_wcc",
    "core_number",
    "audio_features",
    "cosine_topk",
    "decode_image_stats",
    "closeness_centrality",
    "effective_diameter",
    "harmonic_centrality",
    "ego_graph",
    "exact_dedup",
    "anchor_text_index",
    "extract_anchors",
    "extract_links",
    "extract_text",
    "top_anchor_terms",
    "filter_unreachable",
    "from_numpy_array",
    "from_numpy_matrix",
    "from_pandas_adjacency",
    "from_pandas_edgelist",
    "fingerprint",
    "generate_media",
    "generate_pages",
    "get_spark",
    "hits",
    "hypergraph",
    "hyperplane_signatures",
    "adamic_adar",
    "bibliographic_coupling",
    "bowtie_structure",
    "cocitation",
    "cosine",
    "jaccard",
    "jaccard_w",
    "link_scores",
    "k_truss",
    "ktruss_subgraph",
    "k_core",
    "katz_centrality",
    "EigenvectorConvergenceError",
    "eigenvector_centrality",
    "label_propagation",
    "language_id",
    "louvain",
    "leiden",
    "ecg",
    "hungarian",
    "dense_hungarian",
    "force_atlas2",
    "find_bicliques",
    "spectral_balanced_cut_clustering",
    "spectral_modularity_maximization_clustering",
    "spectralBalancedCutClustering",
    "spectralModularityMaximizationClustering",
    "lsh_cosine_topk",
    "embedding_near_dup",
    "ivf_assign",
    "ivf_cosine_topk",
    "ivf_train_centroids",
    "kmeans_embeddings",
    "pq_adc_topk",
    "pq_train_encode",
    "prototypicality_scores",
    "semantic_dedup",
    "minhash_dedup",
    "multi_source_bfs",
    "bfs_edges",
    "concurrent_bfs",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "overlap",
    "overlap_w",
    "preferential_attachment",
    "resource_allocation",
    "maximum_spanning_tree",
    "minimum_spanning_tree",
    "pagerank",
    "batched_personalized_pagerank",
    "ppr_topk",
    "trustrank",
    "pages_to_edges",
    "quality_metrics",
    "random_walks",
    "neighborhood_function",
    "butterfly_count",
    "node2vec_walks",
    "ngram_lm_counts",
    "skipgram_pairs",
    "negative_samples",
    "bpe_train",
    "bpe_encode",
    "word_histogram",
    "pack_sequences",
    "uniform_neighbor_sample",
    "rw_path",
    "renumber_edges",
    "rmat_edges",
    "salsa",
    "erdos_renyi_edges",
    "path_graph_edges",
    "mesh_graph_edges",
    "shortest_path",
    "shortest_path_length",
    "simhash_near_pairs",
    "simhash_signatures",
    "span_dedup",
    "line_dedup",
    "triangle_counts",
    "four_clique_count",
    "degree_assortativity",
    "degree_histogram",
    "densest_subgraph",
    "local_cluster",
    "maximal_independent_set",
    "greedy_color",
    "reciprocity",
    "simhash_lcg_signatures",
    "clustering_coefficient",
    "pii_redact",
    "c4_line_filter",
    "ccnet_perplexity",
    "decontaminate",
    "bloom_decontaminate",
    "dsir_gumbel_topk",
    "dsir_weights",
    "hashed_linear_quality",
    "stratified_sample",
    "token_budget_sample",
    "shard_assignment",
    "shard_plan",
    "write_shards",
    "canonicalize_url",
    "bm25_topk",
    "build_postings",
    "url_dedup",
    "sorensen",
    "sorensen_w",
    "strongly_connected_components",
    "sssp",
    "save_edges_bucketed",
    "load_edges_bucketed",
    "graph_from_bucketed",
    "stream_exact_dedup",
    "stream_hourly_event_rollup",
    "stream_pages_to_edges",
    "sample_video_frames",
    "resize_images",
    "symmetrize_edges",
    "token_count",
    "repetition_metrics",
    "tfidf_top_terms",
    "triangle_count",
    "triangles",
    "from_adjlist",
    "from_cudf_edgelist",
    "from_edgelist",
    "is_weighted",
    "jaccard_coefficient",
    "overlap_coefficient",
    "sorensen_coefficient",
    "strong_connected_component",
    "subgraph",
    "symmetrize",
    "symmetrize_ddf",
    "symmetrize_df",
    "to_numpy_array",
    "to_numpy_matrix",
    "to_pandas_adjacency",
    "to_pandas_edgelist",
    "upper_triangle",
    "weakly_connected_components",
    "word_shingles",
    "fm_distinct_sketches",
    "fm_distinct_estimate",
    "comms",
    "raft",
    "raft_include_test",
    "utils",
    "get_versions",
]

__version__ = "0.2.0"


def get_versions() -> dict:
    """Versioneer-shaped version dict (reference _version.py get_versions —
    the last name on the reference's public import list, __init__.py:113)."""
    return {
        "version": __version__,
        "full-revisionid": None,
        "dirty": None,
        "error": None,
        "date": None,
    }
