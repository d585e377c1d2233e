"""End-to-end pipelines."""

from pgd_ray.pipelines.flagship import flagship, graph_from_edges

__all__ = ["flagship", "graph_from_edges"]
