"""Graph core: edge normalization, degrees/stats, partitioned CSR,
graphlet decomposition, iterative engines (PageRank / CC / LP / k-core)."""

from pgd_ray.graph.csr import CSRGraph, build_csr, csr_from_edge_arrays
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
    "CSRGraph",
    "build_csr",
    "csr_from_edge_arrays",
    "canonicalize",
    "dedup_edges",
    "densify",
    "drop_self_loops",
    "normalize_edges",
    "symmetrize",
    "vertex_ids",
]
