"""Checkpoint / lineage state.

The iterative engines' checkpoint format (atomic ``state_NNNNNN.npy``
+ ``manifest.json`` with per-round metrics and block lineage) lives on
``pgd_ray.graph.iterative.IterativeEngine``; the CSR checkpoint (Arrow
tensors in parquet) on ``pgd_ray.graph.csr.CSRGraph``.  Re-exported
here for discoverability."""

from pgd_ray.graph.csr import CSRGraph
from pgd_ray.graph.iterative import IterativeEngine

__all__ = ["CSRGraph", "IterativeEngine"]
