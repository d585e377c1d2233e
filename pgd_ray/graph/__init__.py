"""Graph core: edge normalization, degrees/stats, partitioned CSR,
graphlet decomposition, iterative engines (PageRank / CC / LP / k-core)."""

from pgd_ray.graph.csr import CSRGraph, build_csr, csr_from_edge_arrays
from pgd_ray.graph.degrees import assortativity, degree_table, graph_stats
from pgd_ray.graph.graphlets import (
    GraphletKernel,
    MacroCounts,
    check_identities,
    edge_triangles,
    gfd,
    graphlet_macro,
    graphlet_macro_approx,
    graphlet_micro,
)
from pgd_ray.graph.iterative import (
    IterativeEngine,
    connected_components,
    kcore,
    label_propagation,
    max_core,
    pagerank,
    worker_pool,
)
from pgd_ray.graph.normalize import (
    canonicalize,
    dedup_edges,
    densify,
    drop_self_loops,
    normalize_edges,
    symmetrize,
    vertex_ids,
)

__all__ = [
    "CSRGraph", "build_csr", "csr_from_edge_arrays",
    "assortativity", "degree_table", "graph_stats",
    "GraphletKernel", "MacroCounts", "check_identities", "edge_triangles",
    "gfd", "graphlet_macro", "graphlet_macro_approx", "graphlet_micro",
    "IterativeEngine", "connected_components", "kcore", "label_propagation",
    "max_core", "pagerank", "worker_pool",
    "canonicalize", "dedup_edges", "densify", "drop_self_loops",
    "normalize_edges", "symmetrize", "vertex_ids",
]
