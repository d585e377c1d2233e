"""Pluggable per-edge ordering key functions (scheduling / skew)."""

from pgd_ray.functions.ordering import ORDERINGS, edge_ordering_keys, sort_edges

__all__ = ["ORDERINGS", "edge_ordering_keys", "sort_edges"]
